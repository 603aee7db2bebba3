"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — baseline: the (small) query matrix is
  broadcast once via ``ray.put``; each ``map_batches`` task computes a
  numpy matmul of its batch against it and emits per-batch partial
  top-k; a final tiny groupby keeps the global top-k per query. Exact.
* ``ivf_topk`` — scale path: k-means-ish coarse quantizer (trained on
  a driver-side sample), each row assigned to its nearest centroid
  inside ``map_batches``; queries probe only ``nprobe`` nearest lists.
  Approximate; recall measured against brute force in tests.

Similarities are quantized (``round(sim, 6)``) before ranking with a
deterministic id tie-break, so results are stable across execution
plans and reproducible against a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    return np.vstack([np.asarray(x, dtype=np.float64) for x in arr.to_pylist()])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def _emit_topk(sims: np.ndarray, ids: np.ndarray, qids: np.ndarray,
               mask_fn, cap: int) -> pa.Table:
    """Shared per-batch top-k emission — THE determinism contract every
    kNN variant (and its SQL oracle) pins: round-6 sims, (sim desc,
    id asc) selection via lexsort, at most ``cap`` rows per query.
    ``mask_fn(j) -> bool[n]`` selects each query's eligible rows."""
    out_q, out_n, out_s = [], [], []
    for j in range(sims.shape[1]):
        idx = np.flatnonzero(mask_fn(j))
        if len(idx) == 0:
            continue
        s = sims[:, j]
        top = idx[np.lexsort((ids[idx], -s[idx]))][:cap]
        out_q.extend([qids[j]] * len(top))
        out_n.extend(ids[top].tolist())
        out_s.extend(s[top].tolist())
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "neighbor_id": pa.array(out_n, pa.int64()),
        "sim": pa.array(out_s, pa.float64()),
    })


def _final_topk(k: int):
    """Shared per-query global reducer: (sim desc, neighbor asc), rank."""
    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"],
                            ascending=[False, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return final


def _empty_topk():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64()),
    }))


def brute_force_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 5,
                     id_column: str = "vec_id", vec_column: str = "embedding",
                     exclude_self: bool = True):
    """Exact cosine top-k for each query vector. Returns a Dataset of
    (query_id, neighbor_id, sim, rank)."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def partial(t: pa.Table) -> pa.Table:
        qm, qids = ray.get(q_ref)
        m = _normalize(_as_matrix(t.column(vec_column)))
        ids = t.column(id_column).to_numpy()
        sims = np.round(m @ qm.T, 6)  # (n, nq), quantized for determinism

        def mask(j):
            return ids != qids[j] if exclude_self else np.ones(len(ids), bool)

        return _emit_topk(sims, ids, qids, mask, k)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pandas")


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Plain Lloyd k-means on the unit sphere (deterministic init by
    seeded choice). Driver-side on a sample — the classic IVF recipe."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    init = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def train_centroids_distributed(ds, n_centroids: int, iters: int = 8,
                                seed: int = 42, vec_column: str = "embedding",
                                init_sample: int = 4096) -> np.ndarray:
    """Distributed Lloyd iterations: centroids broadcast via ``ray.put``
    each round; every batch emits per-centroid partial (sum, count)
    rows; the driver only ever sees k x n_blocks partials. This is the
    full-scale path — only the k seed vectors are sampled centrally.
    """
    import ray

    sample = np.vstack([
        np.asarray(r[vec_column], dtype=np.float64)
        for r in ds.limit(init_sample).take_all()
    ])
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    c = x[np.sort(rng.choice(len(x), size=min(n_centroids, len(x)), replace=False))].copy()

    for _ in range(iters):
        ref = ray.put(c)

        def partials(t: pa.Table) -> pa.Table:
            cents = ray.get(ref)
            m = _normalize(_as_matrix(t.column(vec_column)))
            assign = np.argmax(m @ cents.T, axis=1)
            rows_c, rows_n, rows_s = [], [], []
            for j in np.unique(assign):
                sel = m[assign == j]
                rows_c.append(int(j))
                rows_n.append(len(sel))
                rows_s.append(sel.sum(axis=0).tolist())
            return pa.table({
                "cid": pa.array(rows_c, pa.int32()),
                "n": pa.array(rows_n, pa.int64()),
                "vsum": pa.array(rows_s, pa.list_(pa.float64())),
            })

        agg = ds.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros_like(c)
        counts = np.zeros(len(c))
        for r in agg:
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        newc = c.copy()
        newc[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(newc, axis=1, keepdims=True)
        c = newc / np.where(norms == 0, 1.0, norms)
    return c


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4, sample_size: int = 2048,
             id_column: str = "vec_id", vec_column: str = "embedding",
             exclude_self: bool = True, distributed_train: bool = True):
    """IVF-style approximate top-k: rows in non-probed lists are skipped
    inside each map task (at cluster scale the list id becomes the
    partition key so non-probed lists are never read). The quantizer is
    trained by distributed Lloyd iterations by default
    (train_centroids_distributed — only k seed vectors ever reach the
    driver); pass ``distributed_train=False`` for the small-data
    driver-sample fast path."""
    import ray

    if distributed_train:
        cents = train_centroids_distributed(ds, n_centroids, vec_column=vec_column)
    else:
        sample = np.vstack([
            np.asarray(r[vec_column], dtype=np.float64)
            for r in ds.limit(sample_size).take_all()
        ])
        cents = train_centroids(sample, n_centroids)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    state = ray.put((qn, np.asarray(query_ids), cents, probe))

    def partial(t: pa.Table) -> pa.Table:
        qm, qids, c, pr = ray.get(state)
        m = _normalize(_as_matrix(t.column(vec_column)))
        ids = t.column(id_column).to_numpy()
        lists = np.argmax(m @ c.T, axis=1)
        sims = np.round(m @ qm.T, 6)

        def mask(j):
            mk = np.isin(lists, pr[j])
            if exclude_self:
                mk &= ids != qids[j]
            return mk

        return _emit_topk(sims, ids, qids, mask, k)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pandas")


def ivf_fixed_topk(ds, queries: np.ndarray, query_ids: np.ndarray,
                   cents: np.ndarray, k: int = 5, nprobe: int = 3,
                   id_column: str = "vec_id", vec_column: str = "embedding"):
    """IVF top-k with a FIXED quantizer and integer assignment — the
    SQL-mirrorable oracle twin of ``ivf_topk``:

    * centroids are given (the caller passes e.g. the first n vectors
      by id — no training), quantized ``floor(f64(x) * 2^20)``;
    * list assignment / probing use exact int64 dot products with a
      deterministic (dot desc, centroid asc) tie-break — no float
      argmax boundary can differ from the DuckDB twin;
    * final ranking is the round-6 f64 cosine, (sim desc, id asc).

    The trained/probed ``ivf_topk`` stays the production path; this
    pins the IVF *structure* (inverted lists, probing, per-list rank)
    under the driver's bit-exact gate."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    qq = np.floor(q * (1 << 20)).astype(np.int64)
    cq = np.floor(np.asarray(cents, dtype=np.float64) * (1 << 20)).astype(np.int64)
    # probe lists per query: top nprobe by (int dot desc, cid asc)
    qdots = qq @ cq.T  # (nq, nc) exact
    probe = np.apply_along_axis(
        lambda row: np.lexsort((np.arange(len(row)), -row))[:nprobe], 1, qdots)
    qn = np.linalg.norm(q, axis=1)
    state = ray.put((q, qn, np.asarray(query_ids), cq, probe))

    def partial(t: pa.Table) -> pa.Table:
        qm, qnorm, qids, cqm, pr = ray.get(state)
        m = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in t.column(vec_column).to_pylist()])
        ids = t.column(id_column).to_numpy()
        mq = np.floor(m * (1 << 20)).astype(np.int64)
        adots = mq @ cqm.T                      # (n, nc) exact
        lists = np.argmax(adots, axis=1)        # first max = cid-asc tie-break
        sims = np.round((m @ qm.T) / (np.linalg.norm(m, axis=1)[:, None]
                                      * qnorm[None, :]), 6)

        def mask(j):
            return np.isin(lists, pr[j]) & (ids != qids[j])

        # per-batch cap >= global k keeps partials small, never lossy
        # (max() guards k > 64 — a fixed 64 would silently truncate)
        return _emit_topk(sims, ids, qids, mask, max(64, k))

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pandas")


def ivf_build_index(ds, out_dir: str, n_centroids: int = 16,
                    vec_column: str = "embedding",
                    distributed_train: bool = True) -> np.ndarray:
    """Materialize the IVF inverted lists as a PARTITIONED parquet index
    (one hive partition per list id) — the cluster-scale layout where a
    probed query READS only its nprobe partitions and non-probed lists
    never leave storage (previously a per-task filter, now real
    partition pruning). Centroids (tiny) are saved next to the data.
    A pre-existing ``out_dir`` is removed first — Ray's write_parquet
    APPENDS uniquely-named files, so rebuilding in place would silently
    mix stale and fresh list assignments. Returns the centroid matrix."""
    import os
    import shutil

    if os.path.isdir(out_dir):
        entries = os.listdir(out_dir)
        looks_like_index = (not entries or "centroids.npy" in entries
                            or any(e.startswith("list_id=") for e in entries))
        if not looks_like_index:
            # refuse to delete a directory that is not a prior index —
            # a mistyped/reused path must not nuke unrelated data
            # (ADVICE r2 #5)
            raise ValueError(
                f"refusing to remove {out_dir!r}: it exists but does not "
                "look like a prior IVF index (no centroids.npy / "
                "list_id=* layout)")
        shutil.rmtree(out_dir, ignore_errors=True)

    if distributed_train:
        cents = train_centroids_distributed(ds, n_centroids, vec_column=vec_column)
    else:
        sample = np.vstack([
            np.asarray(r[vec_column], dtype=np.float64)
            for r in ds.limit(2048).take_all()])
        cents = train_centroids(sample, n_centroids)

    import ray
    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_as_matrix(t.column(vec_column)))
        lists = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return t.append_column("list_id", pa.array(lists, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["list_id"])
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    return cents


def ivf_query_index(index_dir: str, queries: np.ndarray, query_ids: np.ndarray,
                    k: int = 5, nprobe: int = 4, id_column: str = "vec_id",
                    vec_column: str = "embedding"):
    """Query the partitioned IVF index: only the union of the queries'
    probed list partitions is READ (hive-partition pruning pushed into
    the parquet scan); each map task then scores its rows against the
    queries probing its list. Results identical to ``ivf_topk`` with
    the same centroids."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probed = set(int(x) for x in np.unique(probe))

    import glob

    from ray.data.datasource.partitioning import Partitioning

    # hive-partition pruning at the FILE level: only the probed lists'
    # partition directories contribute files to the read — a non-probed
    # list never leaves storage
    files = sorted(
        f for lid in sorted(probed)
        for f in glob.glob(os.path.join(index_dir, f"list_id={lid}", "*.parquet"))
    )
    if not files:  # every probed list is empty — parity with ivf_topk
        return _empty_topk()
    ds = rd.read_parquet(files,
                         partitioning=Partitioning("hive", base_dir=index_dir))
    state = ray.put((qn, np.asarray(query_ids), probe))

    def partial(t: pa.Table) -> pa.Table:
        qm, qids, pr = ray.get(state)
        m = _normalize(_as_matrix(t.column(vec_column)))
        ids = t.column(id_column).to_numpy()
        # hive partition values arrive as strings
        lists = np.asarray(
            [int(x) for x in t.column("list_id").to_pylist()], dtype=np.int64)
        sims = np.round(m @ qm.T, 6)

        def mask(j):
            return np.isin(lists, pr[j]) & (ids != qids[j])

        return _emit_topk(sims, ids, qids, mask, k)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pandas")
