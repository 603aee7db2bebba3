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
    return _remove_flagged(train_ds, bad, id_column, num_buckets,
                           broadcast_max_flagged)


def _remove_flagged(train_ds, bad, id_column: str, num_buckets: int,
                    broadcast_max_flagged: int):
    """Drop train rows whose id appears in the (light) flagged set —
    broadcast sorted-probe when small integer ids, bucketed anti-join
    otherwise (shared by the word-gram and substring removers)."""
    # light (id, ...) rows only — safe to pin once so the count gate
    # and the collect don't re-execute the report
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


def substring_decontaminate(train_ds, eval_ds, min_len: int = 24,
                            id_column: str = "doc_id",
                            text_column: str = "text", min_hits: int = 1,
                            num_buckets: int = 64,
                            broadcast_max_grams: int = 4_000_000,
                            broadcast_max_flagged: int = 4_000_000):
    """Train docs sharing a >= ``min_len``-char substring with the eval
    corpus REMOVED (the removal counterpart of
    ``substring_contamination_report``, same broadcast discipline)."""
    bad = substring_contamination_report(
        train_ds, eval_ds, min_len=min_len, id_column=id_column,
        text_column=text_column, min_hits=min_hits,
        num_buckets=num_buckets, broadcast_max_grams=broadcast_max_grams)
    return _remove_flagged(train_ds, bad, id_column, num_buckets,
                           broadcast_max_flagged)


def _lgram_hits_partial(t: pa.Table, min_len: int, id_column: str,
                        text_column: str, ev: np.ndarray,
                        min_hits: int) -> pa.Table:
    """Per-doc substring-hit stats against the broadcast sorted eval
    L-gram set: n_lgrams (stride-1 char grams), n_shared (hit
    positions) and max_run_chars (longest consecutive hit run + L-1,
    an upper bound on the longest common substring; see
    substring_contamination_report)."""
    from osm_merge_ray.util import poly41_grams

    ids_out, n_l, n_s, n_r = [], [], [], []
    for did, s in zip(t.column(id_column).to_pylist(),
                      t.column(text_column).to_pylist()):
        h = poly41_grams(s or "", min_len)
        if len(h) == 0:
            continue
        if len(ev):
            pos = np.minimum(np.searchsorted(ev, h), len(ev) - 1)
            hit = ev[pos] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        ns = int(hit.sum())
        if ns < min_hits:
            continue
        # longest consecutive run of hits: boundaries of True islands
        d = np.diff(np.r_[0, hit.astype(np.int8), 0])
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        run = int((ends - starts).max()) if len(starts) else 0
        ids_out.append(did)
        n_l.append(len(h))
        n_s.append(ns)
        n_r.append(run + min_len - 1 if run else 0)
    return pa.table({
        id_column: pa.array(ids_out, type=t.column(id_column).type),
        "n_lgrams": pa.array(n_l, pa.int64()),
        "n_shared": pa.array(n_s, pa.int64()),
        "max_run_chars": pa.array(n_r, pa.int64()),
    })


def substring_contamination_report(train_ds, eval_ds, min_len: int = 24,
                                   id_column: str = "doc_id",
                                   text_column: str = "text",
                                   min_hits: int = 1,
                                   num_buckets: int = 64,
                                   broadcast_max_grams: int = 4_000_000):
    """EXACT-substring decontamination (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    suffix-array exact-substring criterion, re-expressed as a
    stride-1 character-L-gram probe): a train doc is flagged iff it
    shares a character substring of length >= ``min_len`` with the
    eval corpus. This is exact because any common substring of length
    >= L contains a common substring of length exactly L, and the
    probe tests EVERY length-L window (stride 1, poly41 rolling hash —
    identically computable in DuckDB, so the report has a bit-exact
    SQL twin). Catches verbatim leaks that word-k-gram Jaccard misses
    (re-tokenized boundaries, concatenated text, punctuation drift).

    Output per flagged doc: ``n_lgrams`` (own window count),
    ``n_shared`` (hit windows), ``max_run_chars`` = longest
    consecutive hit run + L - 1 — an UPPER bound on the longest
    common substring with eval (a true common substring of length S
    yields exactly S - L + 1 consecutive hits from one eval
    occurrence; unrelated neighbouring hits can only lengthen a run).

    Shape: the eval side reduces to its distinct L-gram hash set
    (benchmark-sized) and is broadcast via ``ray.put`` when under
    ``broadcast_max_grams``; the whole report is then ONE fused map
    over the train corpus — no gram row ever leaves its task. Above
    the cap, a bucketed join fallback ships (gram, doc, pos) rows —
    corpus-scale; prefer raising the cap or a larger ``min_len``.
    """
    from osm_merge_ray.util import poly41_grams

    def ev_partial(t: pa.Table) -> pa.Table:
        parts = [poly41_grams(s or "", min_len)
                 for s in t.column(text_column).to_pylist()]
        g = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=np.int64))
        return pa.table({"gram_hash": pa.array(g, pa.int64())})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"gram_hash": np.unique(df["gram_hash"].to_numpy())})

    eval_u = grouped_reduce(
        eval_ds.map_batches(ev_partial, batch_format="pyarrow"),
        ["gram_hash"], uniq, num_buckets=num_buckets).materialize()

    if broadcast_max_grams and eval_u.count() <= broadcast_max_grams:
        import ray

        ev = np.sort(
            eval_u.to_pandas()["gram_hash"].to_numpy().astype(np.int64))
        ref = ray.put(ev)

        def report(t: pa.Table) -> pa.Table:
            return _lgram_hits_partial(t, min_len, id_column, text_column,
                                       ray.get(ref), min_hits)

        return train_ds.map_batches(report, batch_format="pyarrow")

    # join fallback: explode train windows WITH positions (heavy —
    # corpus x doc-length rows; the broadcast path is the scale path)
    def tr_rows(t: pa.Table) -> pa.Table:
        ids, gh, pos, nl = [], [], [], []
        for did, s in zip(t.column(id_column).to_pylist(),
                          t.column(text_column).to_pylist()):
            h = poly41_grams(s or "", min_len)
            if len(h) == 0:
                continue
            ids.extend([did] * len(h))
            gh.append(h)
            pos.append(np.arange(len(h), dtype=np.int64))
            nl.extend([len(h)] * len(h))
        g = np.concatenate(gh) if gh else np.empty(0, dtype=np.int64)
        p = np.concatenate(pos) if pos else np.empty(0, dtype=np.int64)
        return pa.table({
            "gram_hash": pa.array(g, pa.int64()),
            id_column: pa.array(ids, type=t.column(id_column).type),
            "pos": pa.array(p, pa.int64()),
            "n_lgrams": pa.array(nl, pa.int64()),
        })

    hits = bucketed_hash_join(
        train_ds.map_batches(tr_rows, batch_format="pyarrow"),
        eval_u, key="gram_hash", num_buckets=num_buckets, how="inner")

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did, grp in df.groupby(id_column, sort=False):
            p = np.sort(grp["pos"].to_numpy().astype(np.int64))
            p = np.unique(p)
            ns = len(p)
            if ns < min_hits:
                continue
            brk = np.flatnonzero(np.diff(p) > 1)
            run = int(np.max(np.diff(np.r_[-1, brk, ns - 1]))) if ns else 0
            out.append({id_column: did,
                        "n_lgrams": np.int64(grp["n_lgrams"].iloc[0]),
                        "n_shared": np.int64(ns),
                        "max_run_chars": np.int64(
                            run + min_len - 1 if run else 0)})
        cols = [id_column, "n_lgrams", "n_shared", "max_run_chars"]
        return pd.DataFrame(out, columns=cols)

    return grouped_reduce(hits, [id_column], per_doc,
                          num_buckets=num_buckets)
