"""Vectorized geodesic / planar distance, slope and angle kernels.

Replaces the reference's per-call scalar geometry
(``conflator.getDistance`` conflator.py:456-531, ``getSlope``
conflator.py:361-454, haversine at conflatePOI.py:122-124) with numpy
array kernels that run once per Arrow batch. The reference rebuilds a
pyproj Transformer on *every* distance call (conflator.py:477-480, its
biggest known perf sink); here projection is pure math and amortized.
"""

from __future__ import annotations

import numpy as np

EARTH_R = 6371008.8  # mean Earth radius, meters (spherical model)

#: line-vs-point forced no-match sentinel, mirroring conflator.py:505-508
NO_MATCH_DIST = 12345678.9


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, elementwise over arrays."""
    lon1, lat1, lon2, lat2 = (np.asarray(a, dtype=np.float64) for a in (lon1, lat1, lon2, lat2))
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = rl2 - rl1
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def haversine_cross_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """All-pairs distance matrix (n1, n2) in meters."""
    return haversine_m(
        np.asarray(lon1)[:, None], np.asarray(lat1)[:, None],
        np.asarray(lon2)[None, :], np.asarray(lat2)[None, :],
    )


def equirect_m2(lon1, lat1, lon2, lat2, lat0: float) -> np.ndarray:
    """Squared planar distance (m^2), equirectangular approximation at
    reference latitude ``lat0``.

    Uses only *, -, + (IEEE-exactly-rounded ops) so an external SQL
    oracle computing the same formula gets bit-identical doubles — the
    parity trick the driver's value-hash check relies on.
    """
    kx = 111320.0 * float(np.cos(np.radians(lat0)))
    ky = 110540.0
    dx = (np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64)) * kx
    dy = (np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)) * ky
    return dx * dx + dy * dy


def point_segment_dist2(px, py, ax, ay, bx, by) -> np.ndarray:
    """Squared planar distance from points to segments (broadcastable)."""
    px, py, ax, ay, bx, by = (np.asarray(a, dtype=np.float64) for a in (px, py, ax, ay, bx, by))
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    t = np.where(l2 > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(l2 > 0, l2, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def polyline_min_dist_m(line_a: np.ndarray, line_b: np.ndarray) -> float:
    """Minimum distance between two polylines (meters), matching the
    reference's "min over exploded segments" semantics
    (conflator.py:490-531) on a local planar projection.

    ``line_a``/``line_b``: (n, 2) arrays of lon/lat vertices.
    """
    lat0 = float(np.mean(line_a[:, 1]))
    kx = 111320.0 * float(np.cos(np.radians(lat0)))
    ky = 110540.0

    def project(line):
        return line[:, 0] * kx, line[:, 1] * ky

    ax, ay = project(line_a)
    bx, by = project(line_b)
    # vertices of A vs segments of B and vice versa — for non-crossing
    # lines this equals true segment-segment min distance; crossing
    # lines have distance ~0 which vertex sampling approximates well
    # at the thresholds involved (7 m).
    d1 = point_segment_dist2(ax[:, None], ay[:, None], bx[None, :-1], by[None, :-1], bx[None, 1:], by[None, 1:]) if len(bx) > 1 else np.full((len(ax), 1), np.inf)
    d2 = point_segment_dist2(bx[:, None], by[:, None], ax[None, :-1], ay[None, :-1], ax[None, 1:], ay[None, 1:]) if len(ax) > 1 else np.full((len(bx), 1), np.inf)
    best = min(d1.min() if d1.size else np.inf, d2.min() if d2.size else np.inf)
    if not np.isfinite(best):  # both degenerate: point-point
        best = (ax[0] - bx[0]) ** 2 + (ay[0] - by[0]) ** 2
    return float(np.sqrt(best))


def slope_angle(a_start: np.ndarray, a_end: np.ndarray, b_start: np.ndarray, b_end: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Slope difference and intersection angle between direction vectors.

    Vectorized analog of ``Conflator.getSlope`` (conflator.py:361-454):
    ``slope = slope1 - slope2``; ``angle = atan((s2-s1)/(1+s2*s1))`` in
    degrees; NaN → 0; identical endpoints → (0, 0).
    Inputs are (n, 2) arrays of planar (x, y) endpoint coordinates.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        s1 = (a_end[:, 1] - a_start[:, 1]) / (a_end[:, 0] - a_start[:, 0])
        s2 = (b_end[:, 1] - b_start[:, 1]) / (b_end[:, 0] - b_start[:, 0])
        slope = s1 - s2
        angle = np.degrees(np.arctan((s2 - s1) / (1.0 + s2 * s1)))
    slope = np.nan_to_num(slope, nan=0.0, posinf=0.0, neginf=0.0)
    angle = np.nan_to_num(angle, nan=0.0, posinf=0.0, neginf=0.0)
    same = np.all(a_start == b_start, axis=1) & np.all(a_end == b_end, axis=1)
    slope = np.where(same, 0.0, slope)
    angle = np.where(same, 0.0, angle)
    return slope, angle
