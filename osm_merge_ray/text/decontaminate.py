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
                         num_buckets: int = 64,
                         broadcast_max_grams: int = 4_000_000):
    """(doc_id, n_grams, n_shared) for every train doc sharing >=
    ``min_hits`` DISTINCT word-k-grams with the eval corpus.

    ``n_grams`` is the doc's own distinct-gram count, so consumers can
    threshold on the overlap fraction (``n_shared / n_grams``) instead
    of the absolute count.

    Fast path (r4): eval sets are benchmark-sized, so when the distinct
    eval-gram set fits under ``broadcast_max_grams`` (32 MB of int64 at
    the default) it is broadcast once via ``ray.put`` and the whole
    report becomes ONE fused map over the train docs — explode, sorted-
    set probe, per-doc hit count — with zero shuffles and no gram row
    ever leaving its map task. Above the cap (or at 0, disabling the
    path) the original bucketed inner-join + grouped count runs.
    """
    eval_g = eval_ds.map_batches(
        lambda t: _gram_rows(t, k, id_column, text_column)
        .select(["gram_hash"]), batch_format="pyarrow")

    # distinct eval grams (grams of one hash land in one bucket)
    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"gram_hash": np.unique(df["gram_hash"].to_numpy())})

    eval_u = grouped_reduce(eval_g, ["gram_hash"], uniq,
                            num_buckets=num_buckets).materialize()

    if broadcast_max_grams and eval_u.count() <= broadcast_max_grams:
        import ray

        ev = np.sort(
            eval_u.to_pandas()["gram_hash"].to_numpy().astype(np.int64))
        ref = ray.put(ev)

        def report(t: pa.Table) -> pa.Table:
            ev = ray.get(ref)
            g = _gram_rows(t, k, id_column, text_column)
            gh = g.column("gram_hash").to_numpy()
            ids = g.column(id_column).to_numpy(zero_copy_only=False)
            ng = g.column("n_grams").to_numpy()
            if len(ev) and len(gh):
                pos = np.minimum(np.searchsorted(ev, gh), len(ev) - 1)
                hit = ev[pos] == gh
            else:
                hit = np.zeros(len(gh), dtype=bool)
            # _gram_rows emits DISTINCT grams per doc, and a doc's rows
            # never split across batches — bincount over the doc index
            # IS the distinct-shared count
            u, inv = np.unique(ids, return_inverse=True)
            n_shared = np.bincount(
                inv, weights=hit.astype(np.int64),
                minlength=len(u)).astype(np.int64)
            n_grams_doc = np.zeros(len(u), dtype=np.int64)
            n_grams_doc[inv] = ng
            keep = n_shared >= min_hits
            return pa.table({
                id_column: pa.array(u[keep],
                                    type=g.schema.field(id_column).type),
                "n_grams": pa.array(n_grams_doc[keep], pa.int64()),
                "n_shared": pa.array(n_shared[keep], pa.int64()),
            })

        return train_ds.map_batches(report, batch_format="pyarrow")

    train_g = train_ds.map_batches(
        lambda t: _gram_rows(t, k, id_column, text_column),
        batch_format="pyarrow")
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
                  num_buckets: int = 64,
                  broadcast_max_flagged: int = 4_000_000):
    """Train docs with contaminated rows REMOVED.

    The flagged-id set is tiny relative to the corpus, so when it fits
    under ``broadcast_max_flagged`` (and ids are integers) it is
    broadcast and the removal is a map-side sorted-set filter — the
    heavy text rows never enter a shuffle (r4; previously a bucketed
    anti-join shipped the full train side once). Above the cap, the
    exact bucketed anti-join runs."""
    bad = contamination_report(train_ds, eval_ds, k=k, id_column=id_column,
                               text_column=text_column, min_hits=min_hits,
                               num_buckets=num_buckets)
    # light (id, n_grams, n_shared) rows only — safe to pin once so the
    # count gate and the collect don't re-execute the report
    bad = bad.materialize()
    if bad.count() == 0:
        # nothing flagged: a clean corpus passes through untouched
        # (an empty materialized dataset can drop its column metadata,
        # so neither removal path below may touch it)
        return train_ds
    id_kind = None
    try:
        sch = bad.schema()
        id_type = dict(zip(sch.names, sch.types))[id_column]
        id_kind = "i" if pa.types.is_integer(id_type) else "other"
    except Exception:
        id_kind = "other"
    if (broadcast_max_flagged and id_kind == "i"
            and bad.count() <= broadcast_max_flagged):
        import ray

        bad_ids = np.sort(
            bad.to_pandas()[id_column].to_numpy().astype(np.int64))
        ref = ray.put(bad_ids)

        def anti(t: pa.Table) -> pa.Table:
            b = ray.get(ref)
            ids = t.column(id_column).to_numpy().astype(np.int64)
            if len(b) and len(ids):
                pos = np.minimum(np.searchsorted(b, ids), len(b) - 1)
                keep = b[pos] != ids
            else:
                keep = np.ones(len(ids), dtype=bool)
            return t.filter(pa.array(keep))

        return train_ds.map_batches(anti, batch_format="pyarrow")
    return bucketed_hash_join(
        train_ds, bad.select_columns([id_column]), key=id_column,
        num_buckets=num_buckets, how="anti")
