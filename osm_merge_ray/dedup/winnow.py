"""Winnowing fingerprint-overlap near-duplicate pairs (MOSS-style).

Schleimer et al., "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003): each document keeps the distinct
per-window minima of its character-k-gram poly41 hashes (the same
selection ``text.analysis.Fingerprint`` XOR-combines into one value);
two documents are near-duplicates when the Jaccard overlap of their
*selected hash sets* clears a threshold. Winnowing guarantees any
shared substring of length >= window + k - 1 contributes at least one
shared selected hash, so overlap is a position-robust containment
signal — the classic plagiarism/boilerplate detector, complementary to
word-gram Jaccard (``dedup/jaccard.py``) which is order-insensitive.

Ray shape (identical skeleton to jaccard's inverted index): explode
docs to ``(gram_hash, doc_id, n_grams, bucket)`` rows — only the int64
selected hashes leave the map task, a few per window of text, so the
shuffle is much lighter than the full-gram index — then per-bucket
vectorized pair partials and a small grouped-reduce. poly41 keeps every
hash < 2^41 and identically computable in DuckDB BIGINT, so the whole
pipeline has an exact SQL twin (pipelines/queries.py SQL_WINNOW_PAIRS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.dedup.jaccard import _NUM_BUCKETS, _bucket_pair_partials
from osm_merge_ray.util import splitmix64


def _sel_rows(t: pa.Table, k: int, window: int, id_column: str,
              text_column: str) -> pa.Table:
    """Explode docs to (gram_hash=selected winnow minimum, doc_id,
    n_grams=|selected set|, bucket). Column names deliberately match
    jaccard's ``_gram_rows`` so ``_bucket_pair_partials`` is reused
    verbatim downstream."""
    from osm_merge_ray.text.analysis import winnow_select

    ids = t.column(id_column).to_pylist()
    texts = t.column(text_column).to_pylist()
    h_parts: list[np.ndarray] = []
    id_out: list[int] = []
    n_out: list[int] = []
    for did, s in zip(ids, texts):
        sel = winnow_select(s or "", k, window)
        if len(sel) == 0:
            continue
        h_parts.append(sel)
        id_out.extend([did] * len(sel))
        n_out.extend([len(sel)] * len(sel))
    gh = (np.concatenate(h_parts) if h_parts else np.empty(0, dtype=np.int64))
    bucket = (splitmix64(gh.view(np.uint64)) % np.uint64(_NUM_BUCKETS)).astype(np.int64)
    # type the id column from the input: a batch where every text
    # winnows to zero selections would otherwise emit a null-typed id
    # that fails Arrow schema unification downstream (union/groupby)
    return pa.table({
        "gram_hash": pa.array(gh, pa.int64()),
        id_column: pa.array(id_out, type=t.column(id_column).type),
        "n_grams": pa.array(n_out, pa.int64()),
        "bucket": pa.array(bucket, pa.int64()),
    })


def winnow_pairs(ds, k: int = 8, window: int = 16, threshold: float = 0.5,
                 id_column: str = "doc_id", text_column: str = "text",
                 max_df: int | None = None):
    """All doc pairs whose winnow-selected fingerprint sets have
    Jaccard overlap >= threshold.

    Selected sets are ~|grams|/window hashes per doc, so the exchange
    is ~window× lighter than the full k-gram index; ``max_df`` (drop
    selected hashes shared by more than that many docs — boilerplate
    winnows to the same minima in every copy) bounds the per-hash pair
    blowup at web scale, at the cost of slightly underestimating
    overlap for pairs that shared a dropped hash. Leave None for the
    exact, SQL-oracle-checked semantics.
    """
    from osm_merge_ray.ops import grouped_reduce

    rows = ds.map_batches(
        lambda t: _sel_rows(t, k, window, id_column, text_column),
        batch_format="pyarrow",
    )
    partials = rows.groupby("bucket").map_groups(
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
        out = t.append_column("overlap", pa.array(j, pa.float64()))
        return out.filter(pa.array(j >= threshold))

    return sums.map_batches(finalize, batch_format="pyarrow")
