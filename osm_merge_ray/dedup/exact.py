"""Exact deduplication: hash-partition + keep-first.

Pattern: vectorized content hash inside ``map_batches`` (never ship
full text through the shuffle when a 64-bit hash suffices at trillion
scale — we shuffle (hash, doc_id) only), then ``groupby(hash)`` keep
the minimum doc_id. Engine analog of the reference's id-membership
building dedup (conflateBuildings.py:114-124), generalized to content.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm_merge_ray.util import hash64_str


def add_content_hash(t: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    h = hash64_str(t.column(column).to_pylist()).astype(np.int64)
    return t.append_column(out, pa.array(h, pa.int64()))


def dedup_exact(ds, column: str = "text", id_column: str = "doc_id"):
    """Survivors: min id per distinct content. Returns (survivor id,
    group size) keyed by content hash — join back to the full rows by id
    if payloads are needed (keeps the shuffle narrow: 16 bytes/row)."""
    from osm_merge_ray.ops import grouped_reduce

    light = ds.map_batches(
        lambda t: add_content_hash(t, column).select([id_column, "content_hash"]),
        batch_format="pyarrow",
    )

    def combine(df):
        return df.groupby("content_hash", as_index=False).agg(
            keep_id=(id_column, "min"), n_copies=(id_column, "size")
        )

    return grouped_reduce(light, ["content_hash"], combine)
