"""Polygon intersection kernels, from scratch (no GEOS).

Implements the geometry behind the reference's duplicate-building join
(``conflateBuildings.overlapDB`` conflateBuildings.py:106-112:
``ST_INTERSECTS`` + ``ST_Area(ST_INTERSECTION)``): convex polygon
clipping via Sutherland–Hodgman (public algorithm, 1974) and shoelace
area. Sufficient for building-footprint work where footprints are
convex or near-convex; a general polygon engine would swap in a
Weiler–Atherton / Vatti clipper behind the same API.
"""

from __future__ import annotations

import numpy as np


def shoelace_area(poly: np.ndarray) -> float:
    """Signed area (positive = CCW) of a ring (n, 2)."""
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def ensure_ccw(poly: np.ndarray) -> np.ndarray:
    return poly if shoelace_area(poly) >= 0 else poly[::-1]


def convex_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: subject polygon clipped by CONVEX ``clip``.
    Both (n, 2) arrays; returns the intersection ring (possibly empty)."""
    clip = ensure_ccw(np.asarray(clip, dtype=np.float64))
    output = list(np.asarray(subject, dtype=np.float64))
    n = len(clip)
    for i in range(n):
        if not output:
            break
        a = clip[i]
        b = clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        input_pts = output
        output = []
        prev = input_pts[-1]
        prev_in = ex * (prev[1] - a[1]) - ey * (prev[0] - a[0]) >= 0
        for cur in input_pts:
            cur_in = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0]) >= 0
            if cur_in != prev_in:
                # edge crossing: solve intersection with clip edge
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                denom = ex * dy - ey * dx
                if denom != 0:
                    t = (ex * (a[1] - prev[1]) - ey * (a[0] - prev[0])) / denom
                    output.append(np.array([prev[0] + t * dx, prev[1] + t * dy]))
            if cur_in:
                output.append(cur)
            prev, prev_in = cur, cur_in
    return np.asarray(output) if output else np.empty((0, 2))


def intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| for convex a, b — the ST_Area(ST_INTERSECTION) analog."""
    inter = convex_clip(ensure_ccw(np.asarray(a, dtype=np.float64)), b)
    return abs(shoelace_area(inter))


def bbox_of(poly: np.ndarray) -> tuple[float, float, float, float]:
    p = np.asarray(poly, dtype=np.float64)
    return float(p[:, 0].min()), float(p[:, 1].min()), float(p[:, 0].max()), float(p[:, 1].max())


def split_polygon_span(ring: np.ndarray,
                       max_span_deg: float) -> list[np.ndarray]:
    """Slice a CONVEX ring into convex pieces whose bboxes span at most
    ``max_span_deg`` per axis, by clipping against an axis-aligned grid
    of boxes (Sutherland–Hodgman with a rectangle clip window — each
    piece stays convex). Pieces PARTITION the polygon (disjoint
    interiors, union = original), so intersection areas over the
    pieces SUM exactly to the whole-polygon intersection area — the
    invariant the oversized-polygon conflation path relies on
    (stages/overlap.py, r5). Within-span inputs return ``[ring]``
    unchanged; a degenerate (zero-area) oversized ring also returns
    ``[ring]`` so the caller's raise-not-truncate contract still
    fires."""
    ring = ensure_ccw(np.asarray(ring, dtype=np.float64))
    if max_span_deg <= 0:
        raise ValueError("max_span_deg must be positive")
    x0, y0, x1, y1 = bbox_of(ring)
    if (x1 - x0) <= max_span_deg and (y1 - y0) <= max_span_deg:
        return [ring]
    nx = int(np.ceil((x1 - x0) / max_span_deg))
    ny = int(np.ceil((y1 - y0) / max_span_deg))
    out: list[np.ndarray] = []
    for i in range(nx):
        bx0 = x0 + i * max_span_deg
        bx1 = min(bx0 + max_span_deg, x1)
        for j in range(ny):
            by0 = y0 + j * max_span_deg
            by1 = min(by0 + max_span_deg, y1)
            box = np.array([[bx0, by0], [bx1, by0], [bx1, by1], [bx0, by1]])
            piece = convex_clip(ring, box)
            if len(piece) >= 3 and abs(shoelace_area(piece)) > 0.0:
                out.append(piece)
    return out if out else [ring]
