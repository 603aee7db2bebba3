"""Connected components over near-dup pairs → dedup clusters.

Pair generation (exact / minhash / simhash / jaccard / embedding)
yields EDGES; production dedup needs the transitive closure: one
cluster id per document and a kept representative (min id) per
cluster. This is the "keep one copy of each near-dup group" step every
large-scale training-data pipeline runs after candidate pairing.

Two algorithms, same output contract (cluster id = min reachable id):

* ``method="star"`` (default, the scale path): alternating
  large-star / small-star contraction (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC 2014) — O(log n) rounds on
  ANY graph shape, each round two bucketed group-reduces over (int64,
  int64) edge rows. Long chains (the min-propagation killer) converge
  logarithmically.
* ``method="minprop"``: iterative min-label propagation (hash-to-min) —
  one join + one grouped min per round, rounds = graph diameter. Kept
  as the independent cross-check (tests assert star ≡ minprop) only:
  measured 4x SLOWER than star even on shallow near-dup graphs (sf0.1
  A/B: 5.6 s vs 24 s — its per-round bucketed join + fixpoint
  materializations outweigh the lower round count), so star is the
  right choice at every graph shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _und_dedup(edges_ds):
    """(id_a, id_b) pairs → deduped undirected edge rows (src, dst),
    self-loops dropped."""
    from osm_merge_ray.ops import dedup_pairs

    def und(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        keep = src != dst
        ua, ub, _ = dedup_pairs(src[keep], dst[keep])
        return pa.table({"src": pa.array(ua, pa.int64()),
                         "dst": pa.array(ub, pa.int64())})

    return edges_ds.map_batches(und, batch_format="pyarrow")


def _edge_signature(edges) -> tuple[int, int]:
    """Cheap canonical-edge-multiset fixpoint signature: (count, sum of
    a 64-bit mix over (src, dst)) — two tiny aggregates, no driver
    materialization of edges."""
    from osm_merge_ray.util import splitmix64

    def mix(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().view(np.uint64)
        d = t.column("dst").to_numpy().view(np.uint64)
        h = splitmix64(s ^ splitmix64(d)).view(np.int64)
        # per-batch partial sum → the global aggregate sees tiny rows
        return pa.table({"h": pa.array([int(h.sum())], pa.int64()),
                         "n": pa.array([len(h)], pa.int64())})

    # one execution: the partials are one tiny row per batch — finish
    # the sum on the driver instead of running the map twice
    p = edges.map_batches(mix, batch_format="pyarrow").to_pandas()
    if len(p) == 0:  # fully empty dataset: no batches reach mix at all
        return 0, 0
    return int(p["n"].sum()), int(p["h"].sum())


def _star_round(df: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One star operation over a bucket of grouped edges (all rows of a
    given ``u`` co-located): per-u min over neighbors, emit the star
    edges — fully vectorized (sort + reduceat)."""
    from osm_merge_ray.ops import dedup_pairs, first_in_groups

    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = first_in_groups(u)
    start_idx = np.flatnonzero(starts)
    gid = np.cumsum(starts) - 1
    minv = np.minimum.reduceat(v, start_idx)
    m = np.minimum(minv, u[start_idx])  # min over {u} ∪ Γ(u)
    if large:
        # Large-Star: every neighbor v > u links to m
        keep = v > u
        src = v[keep]
        dst = m[gid[keep]]
    else:
        # Small-Star: neighbors (all <= u here) and u itself link to m
        keep = v != m[gid]
        src = np.concatenate([v[keep], u[start_idx]])
        dst = np.concatenate([m[gid[keep]], m])
        self_ok = src != dst
        src, dst = src[self_ok], dst[self_ok]
    ua, ub, _ = dedup_pairs(src, dst)
    return pd.DataFrame({"src": ua, "dst": ub})


def connected_components_star(edges_ds, nodes_ds, node_column: str = "doc_id",
                              max_iters: int = 50, num_buckets: int = 64):
    """Large-star/small-star connected components (Kiveris 2014):
    converges in O(log n) rounds regardless of component diameter.
    Same contract as ``connected_components``."""
    from osm_merge_ray.ops import grouped_reduce

    edges = _und_dedup(edges_ds).materialize()
    sig = _edge_signature(edges)
    converged = sig[0] == 0

    def as_large(t: pa.Table) -> pa.Table:
        # large-star groups by u over BOTH directions (already both-way)
        return pa.table({"u": t.column("src"), "v": t.column("dst")})

    def as_small(t: pa.Table) -> pa.Table:
        # small-star groups by the larger endpoint
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({"u": pa.array(np.maximum(s, d), pa.int64()),
                         "v": pa.array(np.minimum(s, d), pa.int64())})

    for _ in range(max_iters):
        if converged:
            break
        lg = grouped_reduce(
            edges.map_batches(as_large, batch_format="pyarrow"), ["u"],
            lambda df: _star_round(df, large=True), num_buckets=num_buckets)
        # re-undirect for the next grouping (star ops reason over Γ(u))
        both = lg.map_batches(
            lambda t: pa.table({
                "src": pa.array(np.concatenate([t.column("src").to_numpy(),
                                                t.column("dst").to_numpy()]),
                                pa.int64()),
                "dst": pa.array(np.concatenate([t.column("dst").to_numpy(),
                                                t.column("src").to_numpy()]),
                                pa.int64())}),
            batch_format="pyarrow")
        sm = grouped_reduce(
            both.map_batches(as_small, batch_format="pyarrow"), ["u"],
            lambda df: _star_round(df, large=False), num_buckets=num_buckets)
        edges = sm.map_batches(
            lambda t: pa.table({
                "src": pa.array(np.concatenate([t.column("src").to_numpy(),
                                                t.column("dst").to_numpy()]),
                                pa.int64()),
                "dst": pa.array(np.concatenate([t.column("dst").to_numpy(),
                                                t.column("src").to_numpy()]),
                                pa.int64())}),
            batch_format="pyarrow").materialize()
        new_sig = _edge_signature(edges)
        if new_sig == sig:
            converged = True
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds — raise max_iters (expected only on adversarial "
            "inputs; rounds needed is O(log n))")

    # at the fixpoint every non-min node carries a direct edge to its
    # component min: label = min(self, neighbors). All-int64 union +
    # grouped min (no left join → no float null-padding of big ids).
    from osm_merge_ray.ops import grouped_reduce as gr

    nbr = edges.map_batches(
        lambda t: pa.table({"node": t.column("src"),
                            "label": t.column("dst")}),
        batch_format="pyarrow")
    self_lab = nodes_ds.map_batches(
        lambda t: pa.table({"node": t.column(node_column).cast(pa.int64()),
                            "label": t.column(node_column).cast(pa.int64())}),
        batch_format="pyarrow")
    labels = gr(
        nbr.union(self_lab), ["node"],
        lambda df: df.groupby("node", as_index=False)["label"].min(),
        num_buckets=num_buckets)
    return labels.map_batches(
        lambda t: pa.table({node_column: t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow")


def connected_components(edges_ds, nodes_ds, node_column: str = "doc_id",
                         max_iters: int = 50, num_buckets: int = 64,
                         method: str = "star"):
    """Cluster id (min reachable node id) for every node.

    ``edges_ds``: (id_a, id_b) pair rows (undirected semantics);
    ``nodes_ds``: one row per node (singletons become their own
    cluster). Returns a Dataset of (<node_column>, cluster_id).
    ``method="star"`` (default) runs the O(log n)-round contraction;
    ``"minprop"`` runs diameter-bounded min-label propagation.
    """
    if method == "star":
        return connected_components_star(edges_ds, nodes_ds,
                                         node_column=node_column,
                                         max_iters=max_iters,
                                         num_buckets=num_buckets)
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


def cluster_representatives(clusters_ds, quality_ds, node_column: str = "doc_id",
                            quality_column: str = "n_tokens",
                            num_buckets: int = 64):
    """Quality-based representative per cluster: the member with the
    HIGHEST ``quality_column`` (ties → lowest id), plus the cluster
    size. Min-id keep-one (``dedup_keep_representatives``) discards a
    long clean copy in favour of a truncated one whenever the truncated
    copy got the smaller id; trainers instead keep the best-quality
    member of each near-dup group (SemDeDup / Gopher-style pipelines).

    Shape: one bucketed hash join (cluster labels × per-doc quality,
    both potentially corpus-sized) then a grouped arg-max reduction —
    rows of one cluster meet in exactly one bucket, no driver
    materialization. Quality must be an integer column so the arg-max
    is deterministic and SQL-mirrorable (window row_number twin).
    """
    from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce

    joined = bucketed_hash_join(clusters_ds, quality_ds, key=node_column,
                                num_buckets=num_buckets, how="inner")

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([quality_column, node_column],
                            ascending=[False, True], kind="stable")
        g = df.groupby("cluster_id", sort=False)
        out = g.head(1).rename(columns={
            node_column: "rep_id", quality_column: "rep_" + quality_column})
        size = g.size().rename("cluster_size").reset_index()
        out = out.merge(size, on="cluster_id")
        out["cluster_size"] = out["cluster_size"].astype(np.int64)
        return out[["cluster_id", "rep_id", "rep_" + quality_column,
                    "cluster_size"]]

    return grouped_reduce(joined, ["cluster_id"], best,
                          num_buckets=num_buckets)
