"""Raster/vector tile assignment + partitioned, resumable output.

``tm-splitter.py:74-129`` builds a grid FeatureCollection and
``make_tasks`` (tm-splitter.py:131-190) writes one file per grid
polygon. Here tile assignment is a pure vectorized projection of the
centroid (no join, no extra shuffle), and the "one file per task"
semantics is the partitioned parquet write.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm_merge_ray.geo.mercator import TileGrid


def make_assign_tiles(grid: TileGrid):
    def assign(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        tid = grid.tile_of_lonlat(lon, lat)
        return t.append_column("tile_id", pa.array(tid, pa.int64()))

    return assign


def assign_tiles(ds, grid: TileGrid):
    return ds.map_batches(make_assign_tiles(grid), batch_format="pyarrow")


def write_tiled(ds, out_dir: str, partition_col: str = "tile_id"):
    """Partitioned parquet output — one directory per tile so a resumed
    run (state/checkpoint.py) can skip finished partitions (the engine
    analog of the reference's one-file-per-task layout)."""
    ds.write_parquet(out_dir, partition_cols=[partition_col])
