"""Exact n-gram Jaccard similarity join (the verifiable dedup path).

Word-k-gram inverted index as a Ray pipeline: explode docs to
``(gram, doc_id, n_grams)`` rows, ``groupby(gram)`` emits co-occurring
pairs with a partial intersection count, then a second small groupby
sums intersections and computes ``J = inter / (na + nb - inter)``.
SQL-expressible 1:1 (DuckDB unnest + joins) → a driver-verifiable
oracle for the whole near-dup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.ops import same_key_pairs
from osm_merge_ray.util import hash64_str, splitmix64

_NUM_BUCKETS = 64


def _gram_rows(t: pa.Table, k: int, id_column: str, text_column: str) -> pa.Table:
    """Explode docs to (gram_hash, doc_id, n_grams, bucket). Only the
    64-bit gram hash leaves the map task — never the gram string
    (narrow shuffle; collision odds ~n_grams^2 / 2^64)."""
    ids = t.column(id_column).to_pylist()
    texts = t.column(text_column).to_pylist()
    g_out: list[str] = []
    id_out, n_out = [], []
    for did, s in zip(ids, texts):
        words = (s or "").split(" ")
        grams = (
            {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}
            if len(words) >= k else ({" ".join(words)} if s else set())
        )
        g_out.extend(grams)
        id_out.extend([did] * len(grams))
        n_out.extend([len(grams)] * len(grams))
    gh = hash64_str(g_out).astype(np.int64)
    bucket = (splitmix64(gh.view(np.uint64)) % np.uint64(_NUM_BUCKETS)).astype(np.int64)
    return pa.table({
        "gram_hash": pa.array(gh, pa.int64()),
        id_column: pa.array(id_out),
        "n_grams": pa.array(n_out, pa.int64()),
        "bucket": pa.array(bucket, pa.int64()),
    })


_EMPTY_PARTIALS = {
    "id_a": np.int64, "id_b": np.int64,
    "na": np.int64, "nb": np.int64, "inter": np.int64,
}


def _bucket_pair_partials(df: pd.DataFrame, id_column: str,
                          max_df: int | None = None,
                          dense_max_docs: int = 8192,
                          dense_min_pairs: int = 1_000_000) -> pd.DataFrame:
    """Per-bucket pair partials: exact intersection counts for every
    co-occurring doc pair, no per-gram Python loop.

    Two exact formulations, picked by bucket shape:

    * **dense** (<= ``dense_max_docs`` distinct docs in the bucket):
      build the 0/1 doc×gram incidence matrix and let BLAS compute
      ``M @ M.T`` — intersection counts for ALL pairs in one matmul.
      A stop-gram with df=g contributes g columns of flops instead of
      g^2 materialized pair rows, so low-entropy corpora (where every
      doc shares the top grams) don't melt down: the r3 bench's
      winnow bucket went ~20s → <1s on exactly this shape.
    * **sparse fallback**: enumerate same-gram pairs and count
      duplicates via one int64 lexsort — O(sum df^2 log) but memory
      ~rows, for buckets too wide for a D^2 matrix. Arbitrary int64
      ids (the old packed (a<<31)|b key corrupted ids >= 2^31).

    ``max_df`` drops grams shared by more than that many docs BEFORE
    either path (the standard web-corpus stop-gram cap). A gram lives
    in exactly one bucket (bucketed by gram hash), so the document
    frequency here is exact.
    """
    gh = df["gram_hash"].to_numpy()
    ids = df[id_column].to_numpy()
    ng = df["n_grams"].to_numpy()
    if max_df is not None and len(gh):
        u, inv, cnt = np.unique(gh, return_inverse=True, return_counts=True)
        keep = cnt[inv] <= max_df
        gh, ids, ng = gh[keep], ids[keep], ng[keep]
    empty = pd.DataFrame({c: pd.Series(dtype=t)
                          for c, t in _EMPTY_PARTIALS.items()})
    if len(gh) == 0:
        return empty

    uid, di = np.unique(ids, return_inverse=True)
    if len(uid) < 2:
        return empty
    ugh, gi, gdf = np.unique(gh, return_inverse=True, return_counts=True)
    # dense only when the pair enumeration would actually be the
    # bottleneck (sum df^2 dominates) AND the incidence matrix is small
    # (high-entropy gram sets make G huge and the matmul a loss)
    pairs_sparse = int((gdf.astype(np.int64) ** 2).sum())
    if (len(uid) <= dense_max_docs and len(ugh) <= 4096
            and pairs_sparse > dense_min_pairs):
        m = np.zeros((len(uid), len(ugh)), dtype=np.float32)
        m[di, gi] = 1.0  # duplicate (doc, gram) rows collapse to 1
        inter = m @ m.T  # exact: counts <= n_grams << 2^24
        ia, ib = np.nonzero(inter)
        keep = ia < ib  # uid is sorted, so rank order == id order
        ia, ib = ia[keep], ib[keep]
        ngd = np.empty(len(uid), dtype=np.int64)
        ngd[di] = ng  # n_grams is constant per doc
        return pd.DataFrame({
            "id_a": uid[ia].astype(np.int64),
            "id_b": uid[ib].astype(np.int64),
            "na": ngd[ia], "nb": ngd[ib],
            "inter": inter[ia, ib].astype(np.int64),
        })

    ia, ib = same_key_pairs(gh, gh)
    keep = ids[ia] < ids[ib]
    ia, ib = ia[keep], ib[keep]
    if len(ia) == 0:
        return empty
    order = np.lexsort((ids[ib], ids[ia]))
    a_s, b_s = ids[ia[order]], ids[ib[order]]
    new = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    starts = np.flatnonzero(new)
    cnt = np.diff(np.r_[starts, len(a_s)]).astype(np.int64)
    first = order[starts]
    return pd.DataFrame({
        "id_a": ids[ia[first]].astype(np.int64),
        "id_b": ids[ib[first]].astype(np.int64),
        "na": ng[ia[first]].astype(np.int64),
        "nb": ng[ib[first]].astype(np.int64),
        "inter": cnt,
    })


def jaccard_pairs(ds, k: int = 3, threshold: float = 0.5,
                  id_column: str = "doc_id", text_column: str = "text",
                  max_df: int | None = None):
    """All doc pairs with word-k-gram Jaccard >= threshold.

    ``max_df`` (recommended at web scale) drops grams shared by more
    than that many docs before pair enumeration — a gram with df=g
    emits g^2 partial pairs, so one stop-gram can dominate the whole
    job. With ``max_df`` set the result is *approximate*: a dropped
    gram slightly underestimates intersections for pairs that shared
    it (the standard precision/cost trade; leave None for the exact,
    SQL-oracle-checked semantics).
    """
    from osm_merge_ray.ops import grouped_reduce

    grams = ds.map_batches(
        lambda t: _gram_rows(t, k, id_column, text_column), batch_format="pyarrow"
    )
    partials = grams.groupby("bucket").map_groups(
        lambda df: _bucket_pair_partials(df, id_column, max_df),
        batch_format="pandas",
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["id_a", "id_b"], as_index=False).agg(
            inter=("inter", "sum"), na=("na", "max"), nb=("nb", "max")
        )

    sums = grouped_reduce(partials, ["id_a", "id_b"], combine)

    def finalize(t: pa.Table) -> pa.Table:
        inter = t.column("inter").to_numpy().astype(np.float64)
        na = t.column("na").to_numpy().astype(np.float64)
        nb = t.column("nb").to_numpy().astype(np.float64)
        j = inter / (na + nb - inter)
        out = t.append_column("jaccard", pa.array(j, pa.float64()))
        return out.filter(pa.array(j >= threshold))

    return sums.map_batches(finalize, batch_format="pyarrow")
