"""Incremental (delta) exact dedup: a new batch vs a historical corpus.

Production pipelines rarely re-dedup the whole corpus; each ingest
batch is checked against what is already stored. Exact-match variant:
a new document is a duplicate iff its text equals some corpus
document's text.

Shape: a distributed Bloom filter over corpus text hashes
(``ops.build_bloom_distributed`` — each block ships one fixed-size
bitmap, driver transfer independent of corpus rows) prefilters the
batch; Bloom has NO false negatives, so misses are exactly-new and
skip the join entirely. Only Bloom hits (the duplicates plus an
``fp_rate`` sliver) enter a bucketed hash join against the corpus,
where string equality removes hash collisions and Bloom false
positives — the result is exact, the Bloom only shrinks the shuffle.
At 100 TB the join's right side is the corpus *candidate buckets
only*; with a dup-scarce batch almost nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.util import hash64_str


def _with_text_hash(t: pa.Table, text_column: str) -> np.ndarray:
    return hash64_str(t.column(text_column).to_pylist())


def incremental_dedup(batch_ds, corpus_ds, id_column: str = "doc_id",
                      text_column: str = "text", corpus_rows: int | None = None,
                      num_buckets: int = 64, fp_rate: float = 1e-4):
    """(id, is_dup) per batch document — is_dup iff its text exists in
    the corpus. ``corpus_rows`` sizes the Bloom (a pruned ``count()``
    when omitted)."""
    from osm_merge_ray.ops import (build_bloom_distributed,
                                   bucketed_hash_join, grouped_reduce)

    if corpus_rows is None:
        corpus_rows = corpus_ds.count()
    bloom = build_bloom_distributed(
        corpus_ds, lambda t: _with_text_hash(t, text_column),
        capacity=max(corpus_rows, 1), fp_rate=fp_rate)
    import ray

    bloom_ref = ray.put(bloom)

    out_schema = pa.schema([(id_column, pa.int64()), ("is_dup", pa.bool_())])

    def split(t: pa.Table):
        bf = ray.get(bloom_ref)
        hit = bf.contains_hashes(_with_text_hash(t, text_column)) \
            if len(t) else np.zeros(0, dtype=bool)
        return hit

    def misses(t: pa.Table) -> pa.Table:
        hit = split(t)
        ids = t.column(id_column).to_numpy()[~hit]
        return pa.table({id_column: pa.array(ids, pa.int64()),
                         "is_dup": pa.array(np.zeros(len(ids), dtype=bool))},
                        schema=out_schema)

    def hits(t: pa.Table) -> pa.Table:
        hit = split(t)
        kept = t.filter(pa.array(hit))
        th = _with_text_hash(kept, text_column).view(np.int64)
        return pa.table({id_column: kept.column(id_column).cast(pa.int64()),
                         text_column: kept.column(text_column),
                         "th": pa.array(th, pa.int64())})

    def corpus_keyed(t: pa.Table) -> pa.Table:
        th = _with_text_hash(t, text_column).view(np.int64)
        return pa.table({"th": pa.array(th, pa.int64()),
                         "corpus_text": t.column(text_column)})

    new_rows = batch_ds.map_batches(misses, batch_format="pyarrow")
    cand = batch_ds.map_batches(hits, batch_format="pyarrow")
    corpus_k = corpus_ds.map_batches(corpus_keyed, batch_format="pyarrow")

    joined = bucketed_hash_join(cand, corpus_k, key="th",
                                num_buckets=num_buckets, how="left")

    def confirm(df: pd.DataFrame) -> pd.DataFrame:
        eq = df["corpus_text"].notna() & (df["corpus_text"] == df[text_column])
        g = pd.DataFrame({id_column: df[id_column].astype(np.int64),
                          "is_dup": eq})
        return g.groupby(id_column, as_index=False).agg(is_dup=("is_dup", "max"))

    confirmed = grouped_reduce(joined, [id_column], confirm,
                               num_buckets=num_buckets)
    # grouped_reduce emits Arrow; pin the exact union schema anyway
    confirmed = confirmed.map_batches(
        lambda t: pa.table({id_column: t.column(id_column).cast(pa.int64()),
                            "is_dup": t.column("is_dup").cast(pa.bool_())},
                           schema=out_schema),
        batch_format="pyarrow")
    return new_rows.union(confirmed)
