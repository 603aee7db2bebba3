"""KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002).

The mergeable cardinality sketch with EXACT integer semantics: hash
every key with an affine permutation ``h = (a*x + b) mod M`` (gcd(a,M)
= 1 → injective, so distinct hashes == distinct keys), keep the k
smallest distinct hashes; the k-th smallest estimates the cardinality
as ``(k-1) * M // h_k`` (uniform order statistics), and when fewer
than k distinct hashes exist the sketch IS the exact answer.

Unlike HyperLogLog (whose estimator needs float log/harmonic means no
SQL twin reproduces bit-for-bit), every KMV step is int64 arithmetic —
sort, limit, floor-divide — so the sketch sits under the driver's
bit-exact gate (pipelines/queries.py SQL_DISTINCT_SKETCH).

Distributed shape: each block contributes its bottom-k distinct hashes
(a fixed-size partial — k int64s per block reach the merge regardless
of row count, the same driver-transfer bound as the Bloom build); the
global bottom-k is the bottom-k of the union of partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.util import POLY41_MOD

def kmv_mix(x: np.ndarray, mod: int = POLY41_MOD) -> np.ndarray:
    """41-bit integer mixer from SQL-safe ops only (affine mod M +
    invertible xorshift, twice): a bare affine hash of sequential ids
    is an arithmetic progression mod M whose bottom-k violates KMV's
    uniform-order-statistics assumption (measured 100x over-estimate);
    this mix lands 2-15% error across sequential/strided/sparse key
    sets. Every step is int64 +,*,%,xor,>> — identically computable
    in DuckDB BIGINT. Effectively injective on [0, M) (xorshift is
    invertible at fixed width; empirically unique on 5M keys)."""
    m = np.int64(mod)
    h = (np.int64(69069) * x + np.int64(12345)) % m
    h = h ^ (h >> np.int64(21))
    h = (np.int64(920461) * h + np.int64(7)) % m
    return h ^ (h >> np.int64(13))


def kmv_bottom_k(ds, column: str, k: int = 256,
                 mod: int = POLY41_MOD) -> np.ndarray:
    """Global k smallest distinct mixed hashes of ``column`` (int64
    keys), sorted ascending; fewer than k when the column has fewer
    distinct values. Driver transfer: k values per block."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(column).to_numpy().astype(np.int64)
        u = np.unique(kmv_mix(x, mod))  # sorted
        return pa.table({"h": pa.array(u[:k], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = np.unique(np.concatenate(
        [bt.column("h").to_numpy() for bt in
         parts.iter_batches(batch_format="pyarrow", batch_size=8192)]
        or [np.empty(0, dtype=np.int64)]))
    return merged[:k]


def kmv_estimate(bottom: np.ndarray, k: int = 256,
                 mod: int = POLY41_MOD) -> tuple[int, int, int]:
    """(kth_min, n_sketch, est_distinct): exact when the sketch is not
    full, ``(k-1) * M // h_k`` otherwise."""
    n = len(bottom)
    if n == 0:
        return 0, 0, 0
    kth = int(bottom[-1])
    if n < k:
        return kth, n, n
    return kth, n, (k - 1) * mod // kth


def exact_distinct(ds, column: str, num_buckets: int = 64) -> int:
    """Exact distinct count, distributed over the RAW keys (no hash
    assumptions): per-block distinct, per-bucket nunique partials (the
    driver sees num_buckets ints), summed."""
    from osm_merge_ray.ops import grouped_reduce

    def krows(t: pa.Table) -> pa.Table:
        x = t.column(column).to_numpy().astype(np.int64)
        return pa.table({"h": pa.array(np.unique(x), pa.int64())})

    hs = ds.map_batches(krows, batch_format="pyarrow")
    parts = grouped_reduce(
        hs, ["h"],
        lambda df: pd.DataFrame({"n": [np.int64(df["h"].nunique())]}),
        num_buckets=num_buckets)
    return int(parts.sum("n") or 0)


def distinct_sketch(ds, columns: list[str], k: int = 256,
                    include_exact: bool = False) -> pd.DataFrame:
    """One row per column: (key, kth_min, n_sketch, est_distinct[,
    n_distinct]) — the bounded-transfer sketch estimate, optionally
    side by side with the exact distributed distinct count.

    ``include_exact=False`` (the default, and the scale path) does ONE
    pass per column with blocks x k transfer. ``include_exact=True``
    adds a second, corpus-cardinality pass (every distinct key crosses
    the shuffle) — useful to audit the estimator's error at small
    scale, self-defeating at 100 TB; the oracle-parity query opts in
    explicitly because its compared projection pins ``n_distinct``."""
    rows = []
    for c in columns:
        bottom = kmv_bottom_k(ds, c, k=k)
        kth, n_sk, est = kmv_estimate(bottom, k=k)
        row = {"key": c, "kth_min": kth, "n_sketch": n_sk,
               "est_distinct": est}
        if include_exact:
            row["n_distinct"] = exact_distinct(ds, c)
        rows.append(row)
    return pd.DataFrame(rows)


CMS_SALTS = (0, 7919, 104729, 1299709)  # d=4 rows, inline in the SQL twin


def cms_build(ds, column: str, w: int = 1024,
              salts: tuple = CMS_SALTS) -> np.ndarray:
    """Count-Min Sketch (Cormode & Muthukrishnan, 2005): a (d, w) grid
    of counters; row j counts at cell kmv_mix(x ^ salt_j) % w. Every
    block ships ONE dense (d, w) int64 grid (d*w*8 bytes, independent
    of row count — the Bloom-build transfer bound); grids sum exactly,
    so the sketch is deterministic and mergeable."""
    import pyarrow as pa

    d = len(salts)

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(column).to_numpy().astype(np.int64)
        grid = np.zeros((d, w), dtype=np.int64)
        for j, s in enumerate(salts):
            cells = (kmv_mix(x ^ np.int64(s)) % np.int64(w)).astype(np.int64)
            np.add.at(grid[j], cells, 1)
        return pa.table({"grid": pa.array([grid.tobytes()], pa.binary())})

    total = np.zeros((d, w), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1024):
        for buf in b.column("grid").to_pylist():
            total += np.frombuffer(buf, dtype=np.int64).reshape(d, w)
    return total


def cms_estimate(grid: np.ndarray, keys: np.ndarray, w: int = 1024,
                 salts: tuple = CMS_SALTS) -> np.ndarray:
    """Point-query estimates: min over rows — always >= the true count
    (all arithmetic int64, identical in the SQL twin)."""
    keys = keys.astype(np.int64)
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for j, s in enumerate(salts):
        cells = (kmv_mix(keys ^ np.int64(s)) % np.int64(w)).astype(np.int64)
        est = np.minimum(est, grid[j][cells])
    return est


def grouped_distinct_sketch(ds, group_col: str, key_col: str, k: int = 64,
                            mod: int = POLY41_MOD,
                            num_buckets: int = 64,
                            include_exact: bool = False) -> pd.DataFrame:
    """Per-GROUP KMV distinct sketch: one row per group value with
    (kth_min, n_sketch, est_distinct[, n_distinct]) — "approx distinct
    users per key" at bounded transfer, the grouped counterpart of
    ``distinct_sketch``. Per-block partials keep only the k smallest
    distinct mixed hashes per group present in the block (the global
    bottom-k per group is a subset of the union of per-block
    bottom-ks), so the shuffle carries blocks x groups x k light rows,
    never the raw keys. Output is one row per group — the result
    itself is group-cardinality, so the driver-side frame is no larger
    than any consumer of it.

    ``include_exact=True`` adds a second raw-key pass (same
    no-hash-assumptions discipline as ``exact_distinct``) whose
    shuffle carries every distinct (group, key) pair — corpus
    cardinality, which defeats the sketch's transfer bound at scale.
    Default False: the sketch-only run is exactly one corpus scan.
    The oracle-parity query (events_group_distinct) opts in because
    its compared projection pins ``n_distinct``."""
    from osm_merge_ray.ops import grouped_reduce

    def _empty(t: pa.Table, value_col: str) -> pa.Table:
        # zero-row block: keep the group column's own Arrow type
        return pa.table({group_col: t.column(group_col),
                         value_col: pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # zero-row parquet files / filtered blocks
            return _empty(t, "h")
        g = t.column(group_col).to_pandas()
        x = t.column(key_col).to_numpy().astype(np.int64)
        h = kmv_mix(x, mod)
        codes, uniq = pd.factorize(g, sort=False)
        if (codes < 0).any():  # factorize's NaN sentinel would alias
            raise ValueError(   # the LAST group via uniq[-1] — refuse
                f"grouped_distinct_sketch: null values in group column "
                f"{group_col!r}; filter or fill them upstream")
        order = np.lexsort((h, codes))
        sc, sh = codes[order], h[order]
        first = np.r_[True, (sc[1:] != sc[:-1]) | (sh[1:] != sh[:-1])]
        sc, sh = sc[first], sh[first]  # distinct (group, h), sorted
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        run_len = np.diff(np.r_[starts, len(sc)])
        pos = np.arange(len(sc)) - np.repeat(starts, run_len)
        sel = pos < k
        return pa.table({
            # cast to the INPUT column's Arrow type: a pandas-inferred
            # type (plain string) unioned with an empty block's verbatim
            # type (e.g. large_string from polars-written parquet) would
            # feed Ray's sort groupby a mixed schema (review r5; the
            # CLAUDE.md pad-both-sides invariant)
            group_col: pa.array(np.asarray(uniq)[sc[sel]]).cast(
                t.column(group_col).type),
            "h": pa.array(sh[sel], pa.int64()),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.drop_duplicates([group_col, "h"])
               .sort_values([group_col, "h"]))
        d = d[d.groupby(group_col).cumcount() < k]
        agg = d.groupby(group_col, sort=False)["h"] \
               .agg(kth_min="max", n_sketch="size").reset_index()
        n = agg["n_sketch"].to_numpy(np.int64)
        kth = agg["kth_min"].to_numpy(np.int64)
        agg["kth_min"] = kth
        agg["n_sketch"] = n
        agg["est_distinct"] = np.where(
            n < k, n, np.int64(k - 1) * np.int64(mod) // np.maximum(kth, 1))
        return agg

    sketch = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], combine, num_buckets=num_buckets).to_pandas()

    if not include_exact:
        return sketch.sort_values(group_col).reset_index(drop=True)

    def kpairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(t, "u")
        g = t.column(group_col).to_pandas()
        x = t.column(key_col).to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(g, sort=False)
        if (codes < 0).any():
            raise ValueError(
                f"grouped_distinct_sketch: null values in group column "
                f"{group_col!r}; filter or fill them upstream")
        order = np.lexsort((x, codes))
        sc, sx = codes[order], x[order]
        first = np.r_[True, (sc[1:] != sc[:-1]) | (sx[1:] != sx[:-1])]
        return pa.table({
            group_col: pa.array(np.asarray(uniq)[sc[first]]).cast(
                t.column(group_col).type),
            "u": pa.array(sx[first], pa.int64()),
        })

    exact = grouped_reduce(
        ds.map_batches(kpairs, batch_format="pyarrow"),
        [group_col],
        lambda df: df.groupby(group_col, sort=False)["u"].nunique()
                     .astype(np.int64).rename("n_distinct").reset_index(),
        num_buckets=num_buckets).to_pandas()

    out = sketch.merge(exact, on=group_col).sort_values(group_col)
    return out.reset_index(drop=True)
