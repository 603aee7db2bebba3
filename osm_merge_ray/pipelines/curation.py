"""End-to-end LLM corpus curation: the pipeline a pretraining team
actually runs, composed from the engine's verified operators —

    1. quality filter        (Gopher-style heuristics, text/analysis.py)
    2. near-dup clustering   (word-3-gram Jaccard -> connected
                              components, dedup/jaccard.py + cluster.py)
    3. representative keep   (highest-token member per cluster,
                              dedup/cluster.cluster_representatives)
    4. decontamination       (drop docs sharing eval-set word k-grams,
                              text/decontaminate.py)
    5. sequence packing      (global token offsets + context windows,
                              text/packing.py)

Every stage is individually bit-exact against a DuckDB twin, so the
COMPOSITION is too (pipelines/queries.py SQL_CURATE) — the full
curation run sits under the driver's hash gate, not just its pieces.

Scale shape: the text corpus is never materialized; each stage
re-streams the pruned read (texts pass through map-side only), and
everything that shuffles is light rows — gram hashes, (int64, int64)
cluster labels, per-bucket token totals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _survivors(train_ds, eval_ds, jaccard_k: int, jaccard_threshold: float,
               decontam_k: int, id_column: str, text_column: str,
               num_buckets: int, redact: bool = False,
               substring_min_len: int | None = None):
    """Stages 1-4 (quality -> near-dup cluster -> representative keep ->
    decontaminate): the curated (id, text) document set. ``redact``
    prepends PII redaction (text/redact.py) so every downstream stage —
    including the packed output — sees tokenized PII, the real-world
    ordering (redact before the corpus is deduped or published).
    ``substring_min_len`` (r5) appends the EXACT-substring remover after
    the word-gram pass — catches boundary-fused verbatim eval leaks the
    k-gram containment misses; None (the default, and the oracle-parity
    query's setting) keeps the word-gram-only semantics."""
    import pyarrow.compute as pc

    from osm_merge_ray.dedup.cluster import (cluster_representatives,
                                             connected_components)
    from osm_merge_ray.dedup.jaccard import jaccard_pairs
    from osm_merge_ray.ops import bucketed_hash_join
    from osm_merge_ray.text.analysis import quality_score
    from osm_merge_ray.text.decontaminate import decontaminate

    if redact:
        from osm_merge_ray.text.redact import redact_pii

        # plain-function stage: fuses with the read; counts dropped,
        # only the rewritten text flows on
        train_ds = redact_pii(train_ds, text_column=text_column) \
            .select_columns([id_column, text_column])

    def keep_quality(t: pa.Table) -> pa.Table:
        scored = quality_score(t)
        return scored.filter(scored.column("quality_keep")) \
            .select([id_column, text_column])

    kept = train_ds.map_batches(keep_quality, batch_format="pyarrow")

    pairs = jaccard_pairs(kept, k=jaccard_k, threshold=jaccard_threshold,
                          id_column=id_column, text_column=text_column)
    kept_ids = kept.select_columns([id_column])
    # star contraction (the default): measured 4x faster than
    # min-propagation even on shallow near-dup graphs — minprop's
    # per-round bucketed join + fixpoint checks outweigh its lower
    # round count (A/B at sf0.1: 5.6 s vs 24 s)
    clusters = connected_components(pairs, kept_ids, node_column=id_column)

    def ntok(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t.column(text_column), " "))
        return pa.table({id_column: t.column(id_column),
                         "n_tokens": n.cast(pa.int64())})

    reps = cluster_representatives(clusters, kept.map_batches(
        ntok, batch_format="pyarrow"), node_column=id_column,
        num_buckets=num_buckets)
    rep_ids = reps.map_batches(
        lambda t: pa.table({id_column: t.column("rep_id").cast(pa.int64())}),
        batch_format="pyarrow")
    survivors = bucketed_hash_join(kept, rep_ids, key=id_column,
                                   num_buckets=num_buckets, how="inner")

    clean = decontaminate(survivors, eval_ds, k=decontam_k,
                          id_column=id_column, text_column=text_column,
                          num_buckets=num_buckets)
    if substring_min_len is not None:
        from osm_merge_ray.text.decontaminate import substring_decontaminate

        clean = substring_decontaminate(
            clean, eval_ds, min_len=substring_min_len,
            id_column=id_column, text_column=text_column,
            num_buckets=num_buckets)
    return clean


def curate_corpus(train_ds, eval_ds, max_len: int = 2048,
                  jaccard_k: int = 3, jaccard_threshold: float = 0.2,
                  decontam_k: int = 3, id_column: str = "doc_id",
                  text_column: str = "text", num_buckets: int = 64,
                  redact: bool = False,
                  substring_min_len: int | None = None):
    """(id, n_tokens, start_tok, win_first, win_last) for every
    document that survives curation; offsets are over the id-ordered
    concatenation of the survivors only. ``redact=True`` prepends PII
    redaction, so offsets count the REDACTED token stream;
    ``substring_min_len`` appends exact-substring decontamination."""
    from osm_merge_ray.text.packing import pack_sequences

    clean = _survivors(train_ds, eval_ds, jaccard_k, jaccard_threshold,
                       decontam_k, id_column, text_column, num_buckets,
                       redact=redact, substring_min_len=substring_min_len)
    return pack_sequences(clean, max_len=max_len, id_column=id_column,
                          text_column=text_column, num_buckets=num_buckets)


def _params_fingerprint(params: dict) -> str:
    import hashlib
    import json

    return hashlib.sha256(
        json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]


def _count_and_signature(ds, id_column: str, text_column: str):
    """(row_count, order-independent int64 content hash) in one pruned
    pass. Per row the signature term is siphash(id) XOR siphash(text)
    (pandas hash_array, fixed key — deterministic across processes);
    terms combine by wrap-around int64 sum, so the value is independent
    of block layout but changes when any row's id or text changes —
    closing the r3 ADVICE gap where a same-row-count content change
    passed the resume fingerprint guard. One small (n, s) partial per
    block reaches the driver."""
    import pandas as pd

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df[id_column].to_numpy(dtype=object))
        h = h ^ pd.util.hash_array(
            df[text_column].astype(str).to_numpy(dtype=object))
        s = h.view(np.int64)
        with np.errstate(over="ignore"):
            tot = int(s.sum(dtype=np.int64)) if len(s) else 0
        return pd.DataFrame({"n": [np.int64(len(df))],
                             "s": [np.int64(tot)]})

    parts = ds.map_batches(part, batch_format="pandas").take_all()
    n = int(sum(int(p["n"]) for p in parts))
    sig = int(np.sum(np.array([p["s"] for p in parts] or [0],
                              dtype=np.int64), dtype=np.int64))
    return n, sig


def run_curation_checkpointed(train_ds, eval_ds, out_dir: str,
                              resume: bool = True, max_len: int = 2048,
                              jaccard_k: int = 3,
                              jaccard_threshold: float = 0.2,
                              decontam_k: int = 3,
                              id_column: str = "doc_id",
                              text_column: str = "text",
                              num_buckets: int = 64,
                              redact: bool = False,
                              substring_min_len: int | None = None) -> dict:
    """Curation with checkpointing at two granularities (r3 VERDICT #4):

    * ``surv_ids`` — the SURVIVOR-ID SET (quality -> near-dup cluster
      -> representative keep -> decontaminate, ids only). Inherently
      global (connected components spans buckets), so this stage is
      stage-level atomic (tmp-dir rename) like before — but it now
      persists only light int64 ids, never document text.
    * ``survivors`` — survivor DOCUMENTS, written PER ID-HASH BUCKET
      with the flagship's manifest discipline
      (state/checkpoint.write_bucket_partition): quality-kept docs are
      re-derived map-side (fused with the read, no shuffle), bucket-
      shuffled once together with the id set, and each bucket's join
      output lands atomically with its own lineage record. A run
      killed mid-stage resumes by recomputing ONLY the missing buckets
      — at corpus scale this stage moves the heavy text bytes, so it
      is where per-bucket resume pays.
    * ``plan`` — the packing plan (global prefix scan), stage-level.

    A resume under different parameters or different input CONTENT
    refuses (fingerprint guard incl. content signatures), since stale
    survivors would silently produce a wrong plan.

    Returns {"survivors": n, "plan_rows": n, "stages_run": [...],
    "buckets_done_now": n, "buckets_skipped": n}.
    """
    import json
    import os
    import shutil

    import ray.data as rd

    man_dir = os.path.join(out_dir, "_manifest")
    man_path = os.path.join(man_dir, "curation.json")
    os.makedirs(man_dir, exist_ok=True)

    # rows + content signature for BOTH inputs (one pruned pass each):
    # a changed eval corpus, or changed train content at an unchanged
    # row count, must refuse to reuse stale survivors
    train_rows, train_sig = _count_and_signature(
        train_ds, id_column, text_column)
    eval_rows, eval_sig = _count_and_signature(
        eval_ds, id_column, text_column)
    fp = _params_fingerprint({
        "max_len": max_len, "jaccard_k": jaccard_k,
        "jaccard_threshold": jaccard_threshold, "decontam_k": decontam_k,
        "id_column": id_column, "text_column": text_column,
        "num_buckets": num_buckets, "train_rows": train_rows,
        "train_sig": train_sig, "eval_rows": eval_rows,
        "eval_sig": eval_sig, "redact": redact,
        "substring_min_len": substring_min_len,
    })
    if redact:
        # wrap ONCE, after the content signature (which fingerprints
        # the RAW input): both the survivor-id derivation and the
        # per-bucket text re-derivation below must see redacted text,
        # or the persisted survivors would leak the unredacted PII
        from osm_merge_ray.text.redact import redact_pii

        train_ds = redact_pii(train_ds, text_column=text_column) \
            .select_columns([id_column, text_column])
    man = {}
    if os.path.exists(man_path):
        try:
            with open(man_path) as fh:
                man = json.load(fh)
        except (json.JSONDecodeError, OSError):
            man = {}
        prior = man.get("fingerprint")
        if prior is not None and prior != fp:
            raise ValueError(
                f"curation checkpoint {out_dir!r} was written under "
                f"different parameters or input (fingerprint {prior} != "
                f"{fp}); stale survivors would produce a wrong plan — "
                "use a fresh out_dir")
    man.setdefault("fingerprint", fp)

    def save_manifest():
        tmp = man_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(man, fh)
        os.replace(tmp, man_path)

    def atomic_write(ds, name: str):
        final = os.path.join(out_dir, name)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        # pre-create so a fully-filtered (empty) stage still produces a
        # valid empty partition dir instead of a rename failure
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        os.rename(tmp, final)
        return final

    def n_rows(d: str) -> int:
        import pyarrow.parquet as pq

        files = [os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".parquet")]
        return sum(pq.read_metadata(f).num_rows for f in files)

    import time

    from osm_merge_ray.state import checkpoint as CK
    from osm_merge_ray.text.analysis import quality_score
    from osm_merge_ray.util import splitmix64

    stages_run = []
    ids_dir = os.path.join(out_dir, "surv_ids")
    surv_dir = os.path.join(out_dir, "survivors")
    if not (resume and man.get("surv_ids_done") and os.path.isdir(ids_dir)):
        clean = _survivors(train_ds, eval_ds, jaccard_k, jaccard_threshold,
                           decontam_k, id_column, text_column, num_buckets,
                           substring_min_len=substring_min_len)
        ids_only = clean.map_batches(
            lambda t: pa.table(
                {id_column: t.column(id_column).cast(pa.int64())}),
            batch_format="pyarrow")
        atomic_write(ids_only, "surv_ids")
        man["surv_ids_done"] = True
        # a recomputed id set invalidates every survivor bucket and the
        # plan: skipping either would materialize/pack a STALE set
        shutil.rmtree(surv_dir, ignore_errors=True)
        man["survivors_done"] = False
        man["plan_done"] = False
        save_manifest()
        stages_run.append("surv_ids")

    done_b = CK.finished_buckets(surv_dir) if resume else set()
    buckets_done_now = 0
    if not (resume and man.get("survivors_done") and os.path.isdir(surv_dir)):
        nb = np.uint64(num_buckets)

        def kept_rows(t: pa.Table) -> pa.Table:
            scored = quality_score(t)
            t2 = scored.filter(scored.column("quality_keep"))
            ids = t2.column(id_column).to_numpy().astype(np.int64)
            b = (splitmix64(ids.view(np.uint64)) % nb).astype(np.int64)
            return pa.table({
                id_column: pa.array(ids, pa.int64()),
                text_column: t2.column(text_column),
                "bucket": pa.array(b, pa.int64()),
                "side": pa.array(np.zeros(len(ids), dtype=np.int8), pa.int8()),
            })

        def id_rows(t: pa.Table) -> pa.Table:
            ids = t.column(id_column).to_numpy().astype(np.int64)
            b = (splitmix64(ids.view(np.uint64)) % nb).astype(np.int64)
            # pad to the SAME explicit schema as kept_rows: Ray's
            # sort-based groupby concatenates blocks without null-fill
            return pa.table({
                id_column: pa.array(ids, pa.int64()),
                text_column: pa.array([""] * len(ids), pa.string()),
                "bucket": pa.array(b, pa.int64()),
                "side": pa.array(np.ones(len(ids), dtype=np.int8), pa.int8()),
            })

        both = train_ds.map_batches(kept_rows, batch_format="pyarrow").union(
            rd.read_parquet(ids_dir).map_batches(
                id_rows, batch_format="pyarrow"))

        if done_b:
            done_arr = np.array(sorted(done_b), dtype=np.int64)

            def drop_done(t: pa.Table) -> pa.Table:
                keep = ~np.isin(t.column("bucket").to_numpy(), done_arr)
                return t.filter(pa.array(keep))

            both = both.map_batches(drop_done, batch_format="pyarrow")

        import pandas as pd

        def join_and_write(df: pd.DataFrame) -> pd.DataFrame:
            t0 = time.time()
            b = int(df["bucket"].iloc[0])
            want = df.loc[df["side"] == 1, id_column].to_numpy()
            docs = df[df["side"] == 0]
            sel = docs[docs[id_column].isin(want)]
            table = pa.table({
                id_column: pa.array(
                    sel[id_column].to_numpy().astype(np.int64), pa.int64()),
                text_column: pa.array(sel[text_column].tolist(), pa.string()),
            })
            CK.write_bucket_partition(surv_dir, b, table,
                                      input_rows=len(df),
                                      wall_s=time.time() - t0, cells=[b])
            return pd.DataFrame({"bucket": [b], "rows": [table.num_rows]})

        metrics = both.groupby("bucket").map_groups(
            join_and_write, batch_format="pandas").to_pandas()
        buckets_done_now = len(metrics)
        man["survivors_done"] = True
        man["plan_done"] = False
        save_manifest()
        stages_run.append("survivors")

    def surv_files() -> list[str]:
        if not os.path.isdir(surv_dir):
            return []
        return [os.path.join(surv_dir, d, f)
                for d in sorted(os.listdir(surv_dir))
                if d.startswith("bucket=") and not d.endswith(".tmp")
                for f in sorted(os.listdir(os.path.join(surv_dir, d)))
                if f.endswith(".parquet")]

    def n_surv() -> int:
        import pyarrow.parquet as pq

        return sum(pq.read_metadata(f).num_rows for f in surv_files())

    plan_dir = os.path.join(out_dir, "plan")
    if not (resume and man.get("plan_done") and os.path.isdir(plan_dir)):
        from osm_merge_ray.text.packing import pack_sequences

        files = surv_files()
        if not files or n_surv() == 0:
            # everything was filtered: a valid (empty) plan, not a read
            # error — the caller sees survivors == plan_rows == 0
            plan = rd.from_items([]).map_batches(lambda t: t)
        else:
            plan = pack_sequences(rd.read_parquet(files), max_len=max_len,
                                  id_column=id_column,
                                  text_column=text_column,
                                  num_buckets=num_buckets)
        atomic_write(plan, "plan")
        man["plan_done"] = True
        save_manifest()
        stages_run.append("plan")

    return {
        "survivors": n_surv(),
        "plan_rows": n_rows(plan_dir),
        "stages_run": stages_run,
        "buckets_done_now": buckets_done_now,
        "buckets_skipped": len(done_b),
    }
