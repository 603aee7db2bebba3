"""Hierarchical grid-cell spatial index (H3/S2 analog), pure numpy.

The reference partitions work geographically only via its shell-script
task-grid fan-out (``tm-splitter.py:74-129`` + ``contrib/update.sh``);
the engine's equivalent — and the core of its scalability story — is a
hierarchical lon/lat grid cell id used as THE shuffle key for the
conflation join, dedup and grouping.

Design (documented so the partitioning assumption is explicit):

* resolution ``r`` divides longitude [-180, 180) into ``2**r`` columns
  and latitude [-90, 90) into ``2**(r-1)`` rows — square cells of
  ``360/2**r`` degrees. ``r=15`` → ~0.011° ≈ 1.22 km at the equator
  (the H3 res-8 regime named in BASELINE.json).
* cell id packs ``(res, iy, ix)`` into a non-negative int64:
  ``res<<58 | iy<<29 | ix`` — ids at different resolutions never
  collide, parent/child is a shift, and ids sort spatially row-major.
* ``k_ring`` gives the 8 neighbors (k=1) with longitude wraparound and
  latitude clamping — used to replicate build-side rows so matches that
  straddle a cell boundary are never missed
  (docs/calculations.md:120-127 is the reference's admission of the
  boundary problem).

The cell-size-at-resolution guarantee the join relies on: for a match
threshold ``d`` meters, choose ``res = res_for_distance(d)`` so the
cell edge is >= d everywhere in latitude covered; then every pair
within ``d`` co-locates within one k-ring(1) replication.
"""

from __future__ import annotations

import numpy as np

RES_BITS = 6
Y_BITS = 29
X_BITS = 29
MAX_RES = 28

#: meters per degree of latitude (spherical, R=6371008.8)
M_PER_DEG_LAT = 111194.92664455873


def cell_edge_deg(res: int) -> float:
    return 360.0 / (1 << res)


def cell_edge_m(res: int, lat: float = 0.0) -> float:
    """Worst-case (latitudinal) edge length in meters at ``res``."""
    return cell_edge_deg(res) * M_PER_DEG_LAT


def res_for_distance(distance_m: float, max_res: int = MAX_RES) -> int:
    """Finest resolution whose cell edge is still >= ``distance_m``.

    Guarantees k-ring(1) candidate completeness for a distance join at
    ``distance_m`` (in the latitudinal direction; longitudinal cells
    only get wider toward the equator on our equirectangular grid —
    they *shrink* in meters toward the poles, so extreme-latitude AOIs
    should pass an explicit coarser res).
    """
    res = 0
    while res < max_res and cell_edge_m(res + 1) >= distance_m:
        res += 1
    return res


def xy_to_cell(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(X_BITS + Y_BITS))
        | (iy.astype(np.int64) << np.int64(X_BITS))
        | ix.astype(np.int64)
    )


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    ix = cell & np.int64((1 << X_BITS) - 1)
    iy = (cell >> np.int64(X_BITS)) & np.int64((1 << Y_BITS) - 1)
    res = cell >> np.int64(X_BITS + Y_BITS)
    return ix, iy, res


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized point → cell id. Half-open cells; lon wrapped to [-180,180)."""
    s = cell_edge_deg(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon + 180.0) / s).astype(np.int64)
    iy = np.floor((lat + 90.0) / s).astype(np.int64)
    nx = np.int64(1 << res)
    ny = np.int64(1 << max(res - 1, 0))
    ix = np.mod(ix, nx)
    iy = np.clip(iy, 0, ny - 1)
    return xy_to_cell(ix, iy, res)


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ix, iy, res = cell_to_xy(cell)
    s = 360.0 / np.power(2.0, res.astype(np.float64))
    lon = -180.0 + (ix.astype(np.float64) + 0.5) * s
    lat = -90.0 + (iy.astype(np.float64) + 0.5) * s
    return lon, lat


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    ix, iy, res = cell_to_xy(cell)
    shift = res - np.int64(parent_res)
    return xy_to_cell(ix >> shift, iy >> shift, parent_res)


# k=1 ring offsets excluding self
_RING1 = np.array(
    [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)],
    dtype=np.int64,
)


def k_ring(cell: np.ndarray, include_self: bool = True) -> np.ndarray:
    """Neighbors of each cell: shape (n, 9) (or (n, 8) without self).

    Longitude wraps; out-of-range latitudes repeat the home cell so the
    output stays rectangular (duplicates are harmless for replication —
    the matcher dedups by (primary, secondary) id pair implicitly since
    each primary row lives in exactly one cell).
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    if len(cell) == 0:
        n_out = 9 if include_self else 8
        return np.empty((0, n_out), dtype=np.int64)
    ix, iy, res = cell_to_xy(cell)
    r = int(res[0])
    nx = np.int64(1 << r)
    ny = np.int64(1 << max(r - 1, 0))
    dx = _RING1[:, 0][None, :]
    dy = _RING1[:, 1][None, :]
    jx = np.mod(ix[:, None] + dx, nx)
    jy = iy[:, None] + dy
    valid = (jy >= 0) & (jy < ny)
    jy = np.where(valid, jy, iy[:, None])
    jx = np.where(valid, jx, ix[:, None])
    ring = xy_to_cell(jx, jy, r)
    if include_self:
        return np.concatenate([cell[:, None], ring], axis=1)
    return ring


def bucket_of(cell: np.ndarray, num_buckets: int, salt: np.ndarray | int = 0) -> np.ndarray:
    """Shuffle bucket for a cell id (optionally salted for hot cells).

    Folding the cell space into ``num_buckets`` hash buckets keeps the
    number of groups (and thus per-group scheduling overhead) bounded
    regardless of AOI size; the matcher re-groups by exact cell with
    numpy inside each bucket.
    """
    from osm_merge_ray.util import splitmix64

    h = splitmix64(np.asarray(cell, dtype=np.uint64))
    h = h ^ np.asarray(salt, dtype=np.uint64)
    return (splitmix64(h) % np.uint64(num_buckets)).astype(np.int64)
