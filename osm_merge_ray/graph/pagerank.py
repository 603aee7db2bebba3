"""Integer-quantized PageRank over an edge list (Page et al., 1999).

Graph centrality as a Ray pipeline — the second iterative graph
algorithm family next to connected components (dedup/cluster.py), used
in data curation to weight documents by their position in a similarity
graph (well-connected ≈ canonical; isolated ≈ outlier).

All arithmetic is int64 with explicit floor divisions, so a fixed
iteration count unrolls into a bit-exact DuckDB twin (the engine's
float-boundary rule: integer-quantize anything a SQL oracle must
reproduce). Ranks are Q20 fixed-point (scale 2^20); per iteration

    r'(v) = BASE + damping_num * inflow(v) // damping_den
    inflow(v) = sum over in-edges (u,v) of r(u) // deg(u)

with BASE = scale * (den - num) // den. Dangling mass is dropped (not
redistributed) — deterministic and mirrorable; the usual 1/N
redistribution needs a global float sum that no SQL twin reproduces
bit-for-bit.

Distributed shape: degree is computed once (grouped count) and joined
onto the edges; each iteration is one bucketed hash join (ranks onto
edge sources) + one grouped sum (inflow per destination) + one left
join back onto the node set — the same bounded-shuffle machinery as
connected components, rounds fixed at ``iters`` instead of data-driven.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank_integer(edges_ds, nodes_ds, node_column: str = "doc_id",
                     iters: int = 5, damping_num: int = 85,
                     damping_den: int = 100, scale: int = 1 << 20,
                     num_buckets: int = 64):
    """(node, pagerank_q20) after ``iters`` exact integer iterations.
    ``edges_ds`` rows (id_a, id_b) are treated as undirected; nodes
    with no edges keep rank BASE each round."""
    from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce

    base = scale * (damping_den - damping_num) // damping_den

    def und(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy().astype(np.int64)
        b = t.column("id_b").to_numpy().astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b]), pa.int64()),
                         "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = edges_ds.map_batches(und, batch_format="pyarrow")

    def count_deg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", as_index=False).agg(deg=("dst", "size"))
        g["deg"] = g["deg"].astype(np.int64)
        return g

    deg = grouped_reduce(edges.select_columns(["src", "dst"]), ["src"],
                         count_deg, num_buckets=num_buckets)
    # (src, dst, deg) — degree rides along so iterations need only one
    # rank join each
    edges_deg = bucketed_hash_join(edges, deg, key="src",
                                   num_buckets=num_buckets).materialize()

    # Enforce the one-row-per-node contract here rather than trusting the
    # caller: a node appearing in several input blocks (e.g. cmd_graph's
    # per-batch np.unique over a multi-file edge parquet) would otherwise
    # get duplicate rank rows, and each iteration's edges-x-ranks join
    # multiplies inflow by the duplication factor.
    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["v"])

    nodes = grouped_reduce(
        nodes_ds.map_batches(
            lambda t: pa.table({"v": t.column(node_column).cast(pa.int64())}),
            batch_format="pyarrow"),
        ["v"], _distinct, num_buckets=num_buckets).materialize()
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(len(t), scale, dtype=np.int64))),
        batch_format="pyarrow")

    for _ in range(iters):
        j = bucketed_hash_join(
            edges_deg,
            ranks.map_batches(
                lambda t: pa.table({"src": t.column("v"), "r": t.column("r")}),
                batch_format="pyarrow"),
            key="src", num_buckets=num_buckets)

        def inflow(df: pd.DataFrame) -> pd.DataFrame:
            flow = df["r"].to_numpy() // df["deg"].to_numpy()
            g = pd.DataFrame({"v": df["dst"].astype(np.int64), "flow": flow})
            out = g.groupby("v", as_index=False).agg(inflow=("flow", "sum"))
            out["inflow"] = out["inflow"].astype(np.int64)
            return out

        infl = grouped_reduce(j, ["dst"], inflow, num_buckets=num_buckets)
        joined = bucketed_hash_join(nodes, infl, key="v",
                                    num_buckets=num_buckets, how="left")

        def update(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            iv = pc.fill_null(t.column("inflow").cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            r = base + damping_num * iv // damping_den
            return pa.table({"v": t.column("v").cast(pa.int64()),
                             "r": pa.array(r, pa.int64())})

        ranks = joined.map_batches(update, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table({node_column: t.column("v"),
                            "pagerank_q20": t.column("r")}),
        batch_format="pyarrow")
