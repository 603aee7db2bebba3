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
