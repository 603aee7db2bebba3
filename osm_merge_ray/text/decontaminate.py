"""Train-set decontamination against an eval/test set by shared word
k-grams — the standard "remove benchmark contamination before
training" pass (GPT-3 appendix C / PaLM-style n-gram overlap): a train
document sharing >= ``min_hits`` distinct k-grams with any eval
document is flagged (and typically dropped or span-scrubbed).

Ray-Data-first: both sides explode to 64-bit gram-HASH rows inside
``map_batches`` (the gram string never leaves the map task — same
narrow-shuffle trick as dedup/jaccard.py), eval grams dedupe per hash
bucket, and one bucketed inner hash-join + grouped count marks the
contaminated train docs. Eval sets are small relative to a 100 TB
train corpus, so the joined side stays tiny; the train side streams.

No reference analog (hotosm/osm-merge has no text ops) — this is part
of the beyond-reference LLM-pipeline family (SURVEY §2-plus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.dedup.jaccard import _gram_rows
from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce


def contamination_report(train_ds, eval_ds, k: int = 5,
                         id_column: str = "doc_id",
                         text_column: str = "text",
                         min_hits: int = 1,
                         num_buckets: int = 64):
    """(doc_id, n_grams, n_shared) for every train doc sharing >=
    ``min_hits`` DISTINCT word-k-grams with the eval corpus.

    ``n_grams`` is the doc's own distinct-gram count, so consumers can
    threshold on the overlap fraction (``n_shared / n_grams``) instead
    of the absolute count.
    """
    train_g = train_ds.map_batches(
        lambda t: _gram_rows(t, k, id_column, text_column),
        batch_format="pyarrow")
    eval_g = eval_ds.map_batches(
        lambda t: _gram_rows(t, k, id_column, text_column)
        .select(["gram_hash"]), batch_format="pyarrow")

    # distinct eval grams (grams of one hash land in one bucket)
    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"gram_hash": np.unique(df["gram_hash"].to_numpy())})

    eval_u = grouped_reduce(eval_g, ["gram_hash"], uniq,
                            num_buckets=num_buckets)

    hits = bucketed_hash_join(
        train_g.select_columns(["gram_hash", id_column, "n_grams"]),
        eval_u, key="gram_hash", num_buckets=num_buckets, how="inner")

    def count_shared(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(id_column, as_index=False).agg(
            n_grams=("n_grams", "max"), n_shared=("gram_hash", "nunique"))
        out["n_shared"] = out["n_shared"].astype(np.int64)
        return out[out["n_shared"] >= min_hits]

    return grouped_reduce(hits, [id_column], count_shared,
                          num_buckets=num_buckets)


def decontaminate(train_ds, eval_ds, k: int = 5, id_column: str = "doc_id",
                  text_column: str = "text", min_hits: int = 1,
                  num_buckets: int = 64):
    """Train docs with contaminated rows REMOVED (exact bucketed
    anti-join on the contamination report — the flagged set is tiny, so
    the join ships mostly clean-side rows once)."""
    bad = contamination_report(train_ds, eval_ds, k=k, id_column=id_column,
                               text_column=text_column, min_hits=min_hits,
                               num_buckets=num_buckets)
    return bucketed_hash_join(
        train_ds, bad.select_columns([id_column]), key=id_column,
        num_buckets=num_buckets, how="anti")
