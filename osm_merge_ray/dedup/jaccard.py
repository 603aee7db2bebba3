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


def _bucket_pair_partials(df: pd.DataFrame, id_column: str,
                          max_df: int | None = None) -> pd.DataFrame:
    """Vectorized per-bucket pair partials: same-gram pair enumeration
    via sort+searchsorted, partial intersection counts via np.unique on
    the packed pair key — no per-gram Python loop.

    ``max_df`` drops grams shared by more than that many docs BEFORE
    pair enumeration (a gram with df=g emits g^2 pairs — the standard
    web-corpus stop-gram cap). A gram lives in exactly one bucket
    (bucketed by gram hash), so the document frequency here is exact.
    """
    gh = df["gram_hash"].to_numpy()
    ids = df[id_column].to_numpy()
    ng = df["n_grams"].to_numpy()
    if max_df is not None and len(gh):
        u, inv, cnt = np.unique(gh, return_inverse=True, return_counts=True)
        keep = cnt[inv] <= max_df
        gh, ids, ng = gh[keep], ids[keep], ng[keep]
    ia, ib = same_key_pairs(gh, gh)
    keep = ids[ia] < ids[ib]
    ia, ib = ia[keep], ib[keep]
    empty = pd.DataFrame({
        "id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64),
        "na": pd.Series(dtype=np.int64), "nb": pd.Series(dtype=np.int64),
        "inter": pd.Series(dtype=np.int64),
    })
    if len(ia) == 0:
        return empty
    # structured unique — no packed-int range limit (ids can be any
    # int64; the old (a<<31)|b pack corrupted ids >= 2^31, ADVICE r2)
    m = np.empty((len(ia), 2), dtype=np.int64)
    m[:, 0] = ids[ia]
    m[:, 1] = ids[ib]
    v = m.view([("a", np.int64), ("b", np.int64)]).ravel()
    _, first, cnt = np.unique(v, return_index=True, return_counts=True)
    return pd.DataFrame({
        "id_a": ids[ia[first]].astype(np.int64),
        "id_b": ids[ib[first]].astype(np.int64),
        "na": ng[ia[first]].astype(np.int64),
        "nb": ng[ib[first]].astype(np.int64),
        "inter": cnt.astype(np.int64),
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
