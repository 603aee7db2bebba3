"""Aspect-ratio bucketing for image training batches.

Diffusion/vision training groups images into a fixed set of
(width, height) resolution buckets so batches contain one shape
(NovelAI-style aspect bucketing — public technique); each image goes
to the bucket whose aspect ratio is closest to its own.

The assignment rule is defined INTEGER-EXACTLY so it has a bit-exact
SQL twin (the repo's Q20 quantization discipline): the distance of
image (w, h) to bucket (wb, hb) is

    m = (|w*hb - h*wb| << 20) // (h * hb)

(= |w/h - wb/hb| * 2^20 floor-quantized; all operands non-negative so
numpy and DuckDB ``//`` agree), argmin over buckets with ties to the
LOWEST bucket id. Overflow-safe for dims < ~1e6.

No reference analog (hotosm/osm-merge has no image ops) — part of the
beyond-reference image-pipeline family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: default bucket table (SDXL-style ~512^2 pixel budget), ordered —
#: the tie-break prefers earlier entries
DEFAULT_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 512), (448, 576), (576, 448), (384, 640), (640, 384),
    (320, 832), (832, 320),
)


def aspect_bucket_assign(ds, buckets=DEFAULT_BUCKETS,
                         id_column: str = "image_id",
                         w_column: str = "w", h_column: str = "h"):
    """(id, w, h, bucket_id, bucket_w, bucket_h) per image — one
    shuffle-free fused map; the N x B metric matrix is one numpy
    broadcast per batch."""
    bw = np.asarray([b[0] for b in buckets], dtype=np.int64)
    bh = np.asarray([b[1] for b in buckets], dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        w = t.column(w_column).to_numpy().astype(np.int64)
        h = t.column(h_column).to_numpy().astype(np.int64)
        if (h <= 0).any() or (w <= 0).any():
            raise ValueError("aspect_bucket_assign: non-positive dims")
        # (N, B) quantized |w/h - wb/hb|
        num = np.abs(w[:, None] * bh[None, :] - h[:, None] * bw[None, :])
        m = (num << np.int64(20)) // (h[:, None] * bh[None, :])
        best = m.argmin(axis=1)  # first minimum = lowest bucket id
        return pa.table({
            id_column: t.column(id_column),
            w_column: pa.array(w, pa.int64()),
            h_column: pa.array(h, pa.int64()),
            "bucket_id": pa.array(best.astype(np.int64), pa.int64()),
            "bucket_w": pa.array(bw[best], pa.int64()),
            "bucket_h": pa.array(bh[best], pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def buckets_sql_values(buckets=DEFAULT_BUCKETS) -> str:
    """The bucket table as SQL VALUES rows (bucket_id, bw, bh)."""
    return ", ".join(f"({i}, {w}, {h})"
                     for i, (w, h) in enumerate(buckets))


def bucket_batch_plan(ds, batch_size: int, buckets=DEFAULT_BUCKETS,
                      id_column: str = "image_id",
                      w_column: str = "w", h_column: str = "h",
                      num_buckets: int = 64):
    """Deterministic per-bucket training-batch plan: assign aspect
    buckets, order each bucket's images by mixed id hash (layout-
    independent — never by block arrival), and cut batches of
    ``batch_size``. Output: (id, bucket_id, bucket_w, bucket_h, rank,
    batch_idx) — rank is the 0-based hash-order position within the
    bucket, batch_idx = rank // batch_size (non-negative ``//``, so the
    SQL twin agrees bit-for-bit).

    Shape: the aspect assignment is a fused map; the global rank is ONE
    bucketed reduce over light integer rows (all rows of one aspect
    bucket co-locate — there are only len(buckets) aspect buckets, so
    the reduce is as skewed as the corpus's aspect distribution; with
    7 buckets this is a deliberate small-domain grouping, the same cost
    class as the tile-pyramid mosaic)."""
    import pandas as pd

    from osm_merge_ray.ops import grouped_reduce
    from osm_merge_ray.sketch import kmv_mix

    bs = int(batch_size)
    if bs <= 0:
        raise ValueError("batch_size must be positive")
    assigned = aspect_bucket_assign(ds, buckets=buckets,
                                    id_column=id_column,
                                    w_column=w_column, h_column=h_column)

    def add_mix(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy().astype(np.int64)
        return t.append_column(
            "h_mix", pa.array(kmv_mix(ids), pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bid, grp in df.groupby("bucket_id", sort=False):
            g = grp.sort_values(["h_mix", id_column], kind="mergesort")
            r = np.arange(len(g), dtype=np.int64)
            g = g.assign(rank=r, batch_idx=r // bs)
            out.append(g)
        res = pd.concat(out) if out else df.assign(
            rank=pd.Series(dtype=np.int64),
            batch_idx=pd.Series(dtype=np.int64))
        return res.drop(columns=["h_mix"])

    return grouped_reduce(assigned.map_batches(add_mix,
                                               batch_format="pyarrow"),
                          ["bucket_id"], per_bucket,
                          num_buckets=num_buckets)
