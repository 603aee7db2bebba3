"""Deterministic per-group quota sampling.

``quota_sample`` keeps exactly ``min(k, n_group)`` rows per group,
chosen by rank of an integer hash of the row id — the quota/balancing
step of a data-mixture pipeline ("at most k docs per source/domain in
the eval slice"). The hash-threshold Bernoulli sampler
(``source_weighted_sample``) keeps a *fraction* and its output size is
only a distribution; quotas need exact counts.

Reference analog: the reference subsamples per input file with fixed
caps (osm-merge conflator task splitting); this generalizes it to any
group key.

Scale shape (the same two-level pattern as the kNN / CMS top-k):
each input block keeps only its own k smallest (hash, id) pairs per
group present in that block — the true global top-k per group is a
subset of the union of per-block top-ks — then a ``grouped_reduce``
over ``num_buckets`` shuffle buckets does the final per-group top-k
and assigns 1-based ranks. Driver/shuffle transfer is bounded by
``num_blocks * groups_per_block * k`` light rows, never the corpus.

Determinism: the rank hash is the engine's ``kmv_mix`` (two affine-mod
2^41-1 rounds + xorshifts — int64-exact in both numpy and DuckDB BIGINT,
see sketch.py), ties broken by id, so the sample is reproducible
across runs, re-partitioning, and cluster sizes, and the SQL twin is
``ROW_NUMBER() OVER (PARTITION BY g ORDER BY mix, id) <= k`` bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _topk_per_group(codes: np.ndarray, mix: np.ndarray, ids: np.ndarray,
                    k: int) -> tuple[np.ndarray, np.ndarray]:
    """Row indices of the k smallest (mix, id) per group code, plus the
    0-based within-group rank of each kept row. Vectorized: one lexsort
    + segment arithmetic, no per-group Python loop."""
    order = np.lexsort((ids, mix, codes))
    sc = codes[order]
    # within-group 0-based position along the sorted run
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    run_len = np.diff(np.r_[starts, len(sc)])
    pos = np.arange(len(sc)) - np.repeat(starts, run_len)
    keep = pos < k
    return order[keep], pos[keep]


def quota_sample(ds, group_col: str, k: int, id_column: str = "doc_id",
                 num_buckets: int = 64):
    """Dataset -> Dataset of (group_col, id_column, h_mix, r) with
    exactly min(k, group size) rows per group, r = 1..k the hash rank."""
    from osm_merge_ray.ops import grouped_reduce
    from osm_merge_ray.sketch import kmv_mix

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy().astype(np.int64)
        grp = t.column(group_col)
        codes, uniq = pd.factorize(grp.to_pandas(), sort=False)
        mix = kmv_mix(ids)
        idx, _ = _topk_per_group(codes, mix, ids, k)
        return pa.table({
            group_col: grp.take(pa.array(idx, pa.int64())),
            id_column: pa.array(ids[idx], pa.int64()),
            "h_mix": pa.array(mix[idx], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(df[group_col], sort=False)
        ids = df[id_column].to_numpy(np.int64)
        mix = df["h_mix"].to_numpy(np.int64)
        idx, pos = _topk_per_group(codes, mix, ids, k)
        out = df.iloc[idx].reset_index(drop=True)
        out["r"] = (pos + 1).astype(np.int64)
        return out

    return grouped_reduce(partials, [group_col], final,
                          num_buckets=num_buckets)
