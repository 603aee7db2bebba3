"""SemDeDup-style semantic deduplication (Abbas et al., 2023 — public).

Cluster the embedding space with k-means, then search for near-dup
pairs ONLY within each cluster: pairwise cosine is all-pairs *per
cluster*, so the quadratic term is (N/k)^2 per cluster instead of N^2
globally — the published recipe for pruning web-scale corpora by
semantic similarity (complementary to ``sim/embed_lsh`` which buckets
by random hyperplanes instead of learned centroids).

Ray shape: centroid assignment is a stateless ``map_batches`` against
a broadcast (``ray.put``) quantized centroid matrix; each cluster then
meets in one ``groupby(cid).map_groups`` task that does one numpy
matmul. Assignment uses exact int64 dot products over
``floor(x * 2^20)``-quantized values with a (dot desc, cid asc)
tie-break, and similarities are round-6 cosines — both identically
computable in DuckDB, so the whole operator sits under the bit-exact
driver gate (pipelines/queries.py SQL_SEMDEDUP).

At 100 TB: centroids come from ``sim/knn.train_centroids_distributed``
(only k seeds + k×blocks partials ever reach the driver) with k sized
so N/k keeps per-cluster matmuls in worker memory; a skew-guard raises
on clusters exceeding ``max_cluster_rows`` rather than silently OOMing
(re-run with more centroids, the documented SemDeDup remedy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def assign_clusters(ds, cents: np.ndarray, id_column: str = "vec_id",
                    vec_column: str = "embedding"):
    """(id, cid) per vector: nearest centroid by exact int64 dot
    product over 2^20-quantized values, ties to the lowest cid —
    identical to sim/knn.ivf_fixed_topk's list assignment."""
    import ray

    cq = np.floor(np.asarray(cents, dtype=np.float64) * (1 << 20)).astype(np.int64)
    ref = ray.put(cq)

    def assign(t: pa.Table) -> pa.Table:
        cqm = ray.get(ref)
        m = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in t.column(vec_column).to_pylist()])
        mq = np.floor(m * (1 << 20)).astype(np.int64)
        lists = np.argmax(mq @ cqm.T, axis=1)  # first max = cid-asc ties
        return pa.table({
            id_column: t.column(id_column),
            vec_column: t.column(vec_column),
            "cid": pa.array(lists.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup_pairs(ds, cents: np.ndarray, threshold: float = 0.35,
                         id_column: str = "vec_id",
                         vec_column: str = "embedding",
                         max_cluster_rows: int = 100_000):
    """All within-cluster pairs with round-6 cosine >= threshold:
    (cid, id_a, id_b, sim), id_a < id_b. Cross-cluster near-dups are
    deliberately not searched — that recall trade IS SemDeDup (raise
    the centroid count to shrink it). ``max_cluster_rows`` raises on a
    degenerate cluster instead of attempting an O(rows^2) matmul."""

    with_cid = assign_clusters(ds, cents, id_column, vec_column)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cid": pd.Series(dtype=np.int64),
            "id_a": pd.Series(dtype=np.int64),
            "id_b": pd.Series(dtype=np.int64),
            "sim": pd.Series(dtype=np.float64),
        })
        if len(df) < 2:
            return empty
        if len(df) > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup_pairs: cluster {int(df['cid'].iloc[0])} has "
                f"{len(df)} rows > max_cluster_rows={max_cluster_rows}; "
                "increase the centroid count (SemDeDup's remedy for "
                "oversized clusters) or raise the guard explicitly")
        order = np.argsort(df[id_column].to_numpy(), kind="stable")
        ids = df[id_column].to_numpy()[order]
        m = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in df[vec_column].to_numpy()[order]])
        # dot/(|a|*|b|) in the same textual order as the SQL twin
        # (normalize-then-dot rounds differently at round-6 boundaries).
        # Row-chunked: a full D x D sims matrix is ~0.5 GB at D=8k and
        # with round() temps pushed concurrent group tasks into store
        # spill (measured: 500k vecs went 400 s -> seconds chunked);
        # per-element arithmetic is identical, so results are bit-equal.
        norms = np.linalg.norm(m, axis=1)
        chunk = max(1, (1 << 22) // max(len(ids), 1))  # ~32 MB blocks
        ia_l, ib_l, sv_l = [], [], []
        for r0 in range(0, len(ids), chunk):
            r1 = min(r0 + chunk, len(ids))
            block = np.round((m[r0:r1] @ m.T)
                             / (norms[r0:r1, None] * norms[None, :]), 6)
            bi, bj = np.nonzero(block >= threshold)
            keep = (bi + r0) < bj  # upper triangle only
            ia_l.append(bi[keep] + r0)
            ib_l.append(bj[keep])
            sv_l.append(block[bi[keep], bj[keep]])
        ia = np.concatenate(ia_l) if ia_l else np.empty(0, dtype=np.int64)
        ib = np.concatenate(ib_l) if ib_l else np.empty(0, dtype=np.int64)
        sv = np.concatenate(sv_l) if sv_l else np.empty(0, dtype=np.float64)
        return pd.DataFrame({
            "cid": np.full(len(ia), int(df["cid"].iloc[0]), dtype=np.int64),
            "id_a": ids[ia].astype(np.int64),
            "id_b": ids[ib].astype(np.int64),
            "sim": sv,
        })

    return with_cid.groupby("cid").map_groups(pairs, batch_format="pandas")
