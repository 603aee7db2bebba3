"""Antimeridian (±180°) geometry splitting.

A polyline whose vertices jump across the date line (consecutive lon
delta > 180°) has a raw-coordinate bbox spanning ~360°: the partition
machinery would either trim its cell cover (losing in-band pairs, the
r2 AXIS_CAP gap) or blow the replication band up to half the planet.
The geographically-correct treatment is to SPLIT such a geometry at
the meridian into parts whose lons are continuous in [-180, 180] —
each part then covers a narrow cell band and conflates locally on both
sides of the date line.

The reference (hotosm/osm-merge) never handles this case — its AOIs
are US forests — so the semantics here are ours: distance to a split
feature is the min over its parts (pinned by the brute-force oracle in
tests/test_antimeridian.py).
"""

from __future__ import annotations

import numpy as np


def crosses_antimeridian(lon: np.ndarray) -> bool:
    """True iff any consecutive vertex pair jumps more than 180° in
    longitude (i.e. the shorter arc crosses the date line)."""
    return bool(len(lon) > 1 and np.any(np.abs(np.diff(lon)) > 180.0))


def _unwrap(lon: np.ndarray) -> np.ndarray:
    """Make consecutive lon deltas minimal (|Δ| ≤ 180) by adding ±360
    from the first crossing onward; the result is continuous but may
    leave [-180, 180]."""
    d = np.diff(lon)
    step = np.where(d > 180.0, -360.0, np.where(d < -180.0, 360.0, 0.0))
    return lon + np.concatenate(([0.0], np.cumsum(step)))


def split_antimeridian(coords: np.ndarray) -> list[np.ndarray]:
    """Split a (n, 2) lon/lat polyline at every date-line crossing.

    Non-crossing inputs are returned as ``[coords]`` unchanged. Each
    returned part has all lons within [-180, 180]; a part that ends at
    the meridian carries the endpoint as +180 (westbound: -180) and the
    next part starts at the opposite sign, both at the interpolated
    crossing latitude — so no part's internal lon span exceeds the true
    geometry's extent.
    """
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    lon = coords[:, 0]
    if not crosses_antimeridian(lon):
        return [coords]
    ulon = _unwrap(lon)
    lat = coords[:, 1]

    def wrap(x: float) -> float:
        return float(((x + 180.0) % 360.0) - 180.0)

    parts: list[list[list[float]]] = []
    cur = [[wrap(ulon[0]), float(lat[0])]]

    def push(part: list, pt: list) -> None:
        if not part or part[-1] != pt:  # drop zero-length segments
            part.append(pt)

    for i in range(len(ulon) - 1):
        a, b = float(ulon[i]), float(ulon[i + 1])
        la, lb = float(lat[i]), float(lat[i + 1])
        # meridian lines in the unwrapped frame: L = 180 + 360k within
        # (a, b] by travel order — a vertex landing EXACTLY on the
        # meridian (L == b) splits there too, carrying ±180 endpoints
        # on each part's own side
        lo, hi = (a, b) if a <= b else (b, a)
        k_lo = int(np.ceil((lo - 180.0) / 360.0))
        k_hi = int(np.floor((hi - 180.0) / 360.0))
        bounds = [180.0 + 360.0 * k for k in range(k_lo, k_hi + 1)
                  if lo <= 180.0 + 360.0 * k <= hi
                  and 180.0 + 360.0 * k != a]
        if a > b:
            bounds.reverse()
        on_vertex = False
        for L in bounds:
            t = (L - a) / (b - a)
            latx = la + t * (lb - la)
            eastbound = b > a
            # end the current part AT the meridian on its own side …
            push(cur, [180.0 if eastbound else -180.0, latx])
            parts.append(cur)
            # … and start the next part on the far side
            cur = [[-180.0 if eastbound else 180.0, latx]]
            on_vertex = L == b
        if not on_vertex:  # an on-meridian vertex was already emitted
            push(cur, [wrap(b), lb])
    parts.append(cur)
    # drop degenerate single-vertex parts produced by a vertex exactly
    # on the meridian (its neighbors keep the geometry intact)
    out = [np.asarray(p, dtype=np.float64) for p in parts if len(p) >= 2]
    return out if out else [np.asarray(parts[0], dtype=np.float64)]
