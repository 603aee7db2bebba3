"""EPSG:3857 web-mercator projection + the tm-splitter square tile grid.

Reimplements the *semantics* of the reference's task-grid tiling
(``tm-splitter.py:74-129``: project AOI to EPSG:3857, cut into
``meters``-sized squares — default 50 km, ``tm-splitter.py:225-226`` —
left-to-right, bottom-to-top with ``numpy.arange``) as a pure
projection: a feature's ``tile_id`` is computed directly from its
centroid, so tile assignment is a vectorized ``map_batches`` column —
no join against a grid FeatureCollection, no second shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis used by EPSG:3857


def merc_x(lon) -> np.ndarray:
    return _R * np.radians(np.asarray(lon, dtype=np.float64))


def merc_y(lat) -> np.ndarray:
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    return _R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def inv_merc_lon(x) -> np.ndarray:
    return np.degrees(np.asarray(x, dtype=np.float64) / _R)


def inv_merc_lat(y) -> np.ndarray:
    return np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _R)) - np.pi / 2.0)


@dataclass(frozen=True)
class TileGrid:
    """A square grid over an AOI bbox in EPSG:3857 meters.

    Mirrors ``splitBySquare`` (tm-splitter.py:74-129): columns =
    ``arange(xmin, xmax, size)`` left→right, rows bottom→top; tile
    index is row-major ``row * ncols + col``. The reference then clips
    each square to the AOI; we keep squares intact and expose
    ``ncols``/``nrows`` so a driver can enumerate the same grid.
    """

    xmin: float
    ymin: float
    xmax: float
    ymax: float
    size_m: float = 50_000.0

    @classmethod
    def from_bbox_lonlat(cls, lon_min, lat_min, lon_max, lat_max, size_m=50_000.0) -> "TileGrid":
        return cls(
            float(merc_x(lon_min)), float(merc_y(lat_min)),
            float(merc_x(lon_max)), float(merc_y(lat_max)), float(size_m),
        )

    @property
    def ncols(self) -> int:
        return max(1, int(np.ceil((self.xmax - self.xmin) / self.size_m)))

    @property
    def nrows(self) -> int:
        return max(1, int(np.ceil((self.ymax - self.ymin) / self.size_m)))

    def tile_of_lonlat(self, lon, lat) -> np.ndarray:
        """Vectorized tile id per point; points outside the bbox clamp
        to the border tile (the reference drops empty tiles only, never
        features)."""
        col = np.floor((merc_x(lon) - self.xmin) / self.size_m).astype(np.int64)
        row = np.floor((merc_y(lat) - self.ymin) / self.size_m).astype(np.int64)
        col = np.clip(col, 0, self.ncols - 1)
        row = np.clip(row, 0, self.nrows - 1)
        return row * np.int64(self.ncols) + col

    def tile_bbox_3857(self, tile_id: int) -> tuple[float, float, float, float]:
        row, col = divmod(int(tile_id), self.ncols)
        x0 = self.xmin + col * self.size_m
        y0 = self.ymin + row * self.size_m
        return (x0, y0, x0 + self.size_m, y0 + self.size_m)
