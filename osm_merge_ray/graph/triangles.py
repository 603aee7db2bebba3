"""Distributed triangle counting (wedge join + closing-edge verify).

The third graph-analytics family next to connected components and
PageRank: per-node triangle participation over an undirected edge set —
the local-clustering signal data-curation uses to tell genuine dense
near-dup groups from chains of borderline pairs.

Algorithm (Cohen, "Graph twiddling in a MapReduce world", 2009): with
edges stored once in (lo, hi) orientation, join edges on the middle
vertex to enumerate wedges a < b < c, then semi-join each wedge's
(a, c) back against the edge set — every triangle is found exactly
once. Both steps are bucketed hash joins; the closing join keys on a
64-bit hash of the vertex pair and string-verifies the actual ids, so
hash collisions cannot create phantom triangles. The id-ordered
orientation is the simple variant (degree-ordering is the known upgrade
for power-law skew; the wedge count is the quadratic term either way
and is bounded per bucket, not per driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.util import splitmix64


def _pair_hash(a: np.ndarray, c: np.ndarray) -> np.ndarray:
    ha = splitmix64(a.astype(np.int64).view(np.uint64))
    hc = splitmix64(c.astype(np.int64).view(np.uint64)
                    ^ np.uint64(0x9E3779B97F4A7C15))
    return (ha ^ hc).view(np.int64)


def triangle_counts(edges_ds, id_a: str = "id_a", id_b: str = "id_b",
                    num_buckets: int = 64):
    """(node, n_triangles) for every node in >= 1 triangle. ``edges_ds``
    rows must be unique with id_a < id_b (both pair-generation families
    here emit exactly that)."""
    from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce

    def as_left(t: pa.Table) -> pa.Table:
        return pa.table({"mid": t.column(id_b).cast(pa.int64()),
                         "a": t.column(id_a).cast(pa.int64())})

    def as_right(t: pa.Table) -> pa.Table:
        return pa.table({"mid": t.column(id_a).cast(pa.int64()),
                         "c": t.column(id_b).cast(pa.int64())})

    e = edges_ds.select_columns([id_a, id_b]).materialize()
    wedges = bucketed_hash_join(
        e.map_batches(as_left, batch_format="pyarrow"),
        e.map_batches(as_right, batch_format="pyarrow"),
        key="mid", num_buckets=num_buckets)

    def wedge_key(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        c = t.column("c").to_numpy()
        return pa.table({"ck": pa.array(_pair_hash(a, c), pa.int64()),
                         "a": pa.array(a, pa.int64()),
                         "mid": t.column("mid").cast(pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def edge_key(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy()
        b = t.column(id_b).to_numpy()
        return pa.table({"ck": pa.array(_pair_hash(a, b), pa.int64()),
                         "ea": pa.array(a.astype(np.int64), pa.int64()),
                         "eb": pa.array(b.astype(np.int64), pa.int64())})

    closed = bucketed_hash_join(
        wedges.map_batches(wedge_key, batch_format="pyarrow"),
        e.map_batches(edge_key, batch_format="pyarrow"),
        key="ck", num_buckets=num_buckets)

    def verify_and_count(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["a"] == df["ea"]) & (df["c"] == df["eb"])
        tri = df[ok]
        nodes = np.concatenate([tri["a"].to_numpy(), tri["mid"].to_numpy(),
                                tri["c"].to_numpy()]).astype(np.int64)
        if len(nodes) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "n_triangles": pd.Series(dtype=np.int64)})
        u, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "n_triangles": cnt.astype(np.int64)})

    partials = closed.map_batches(
        lambda t: pa.Table.from_pandas(verify_and_count(t.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow")
    return grouped_reduce(
        partials, ["node"],
        lambda df: df.groupby("node", as_index=False)
        .agg(n_triangles=("n_triangles", "sum")),
        num_buckets=num_buckets)
