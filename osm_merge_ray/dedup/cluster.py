"""Connected components over near-dup pairs → dedup clusters.

Pair generation (exact / minhash / simhash / jaccard / embedding)
yields EDGES; production dedup needs the transitive closure: one
cluster id per document and a kept representative (min id) per
cluster. This is the "keep one copy of each near-dup group" step every
large-scale training-data pipeline runs after candidate pairing.

Algorithm: iterative min-label propagation (hash-to-min). Labels start
as the node id; each round every node takes the min label over itself
and its neighbors — one bucketed hash join (edge × label) plus one
grouped min per round, both Ray-Data-native shuffles of (int64, int64)
rows. Labels are monotonically non-increasing, so the cheap global
``sum(label)`` aggregate is a sound fixpoint test (unchanged sum ⟺ no
label moved). Rounds needed = graph diameter — near-dup clusters are
dense and shallow, so a handful of rounds in practice; the
O(log n)-round large-star/small-star variant (Kiveris et al., 2014) is
the drop-in upgrade if a corpus ever exhibits long chains.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components(edges_ds, nodes_ds, node_column: str = "doc_id",
                         max_iters: int = 50, num_buckets: int = 64):
    """Cluster id (min reachable node id) for every node.

    ``edges_ds``: (id_a, id_b) pair rows (undirected semantics);
    ``nodes_ds``: one row per node (singletons become their own
    cluster). Returns a Dataset of (<node_column>, cluster_id).
    """
    from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce

    def und(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = edges_ds.map_batches(und, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        ids = t.column(node_column).cast(pa.int64())
        return pa.table({"node": ids, "label": ids})

    labels = nodes_ds.map_batches(init_labels, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    converged = False
    for _ in range(max_iters):
        # neighbor labels: edge (src, dst) joined with label(src) → (dst, label)
        j = bucketed_hash_join(
            edges,
            labels.map_batches(
                lambda t: pa.table({"src": t.column("node"),
                                    "label": t.column("label")}),
                batch_format="pyarrow"),
            key="src", num_buckets=num_buckets)
        cand = j.map_batches(
            lambda t: pa.table({"node": t.column("dst"),
                                "label": t.column("label")}),
            batch_format="pyarrow")
        merged = cand.union(labels)
        labels = grouped_reduce(
            merged, ["node"],
            lambda df: df.groupby("node", as_index=False)["label"].min(),
            num_buckets=num_buckets,
        ).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels only decrease → sound fixpoint
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds the iteration budget); raise "
            "max_iters — returning partial labels would silently split "
            "dup clusters"
        )

    return labels.map_batches(
        lambda t: pa.table({node_column: t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow")


def dedup_keep_representatives(docs_ds, clusters_ds, node_column: str = "doc_id",
                               num_buckets: int = 64):
    """Semi-join docs to their cluster representative (min id): rows
    whose id == cluster_id survive — the canonical keep-one-per-group
    dedup output."""
    from osm_merge_ray.ops import bucketed_hash_join

    keep = clusters_ds.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column(node_column), t.column("cluster_id"))
        ).select([node_column]),
        batch_format="pyarrow")
    return bucketed_hash_join(docs_ds, keep, key=node_column,
                              num_buckets=num_buckets, how="inner")
