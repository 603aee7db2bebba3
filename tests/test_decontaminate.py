"""Decontamination (train vs eval word-k-gram overlap) vs a brute-force
set oracle, plus the end-to-end anti-join removal path."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_merge_ray.text.decontaminate import contamination_report, decontaminate


def _grams(s: str, k: int) -> set:
    words = (s or "").split(" ")
    if len(words) >= k:
        return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}
    return {" ".join(words)} if s else set()


def _mk_corpus(n=120, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 25)))
             for _ in range(n)]
    # plant exact eval-sentence inclusions in some train docs
    texts[11] = texts[0] + " " + texts[11]
    texts[55] = "unique phrase " + texts[0]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("k,min_hits", [(3, 1), (5, 2)])
def test_contamination_report_matches_bruteforce(ray_session, k, min_hits):
    df = _mk_corpus()
    ev = df[df.doc_id % 10 == 0]
    tr = df[df.doc_id % 10 != 0]

    out = contamination_report(
        rd.from_pandas(tr), rd.from_pandas(ev), k=k, min_hits=min_hits,
        num_buckets=8).to_pandas().sort_values("doc_id").reset_index(drop=True)

    eval_grams = set().union(*(_grams(s, k) for s in ev.text)) if len(ev) else set()
    exp_rows = []
    for did, s in zip(tr.doc_id, tr.text):
        g = _grams(s, k)
        shared = len(g & eval_grams)
        if shared >= min_hits:
            exp_rows.append((did, len(g), shared))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "n_grams", "n_shared"])

    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(
        out.astype({"n_grams": np.int64, "n_shared": np.int64}),
        exp.astype({"doc_id": np.int64, "n_grams": np.int64,
                    "n_shared": np.int64}))


def test_decontaminate_removes_flagged_only(ray_session):
    df = _mk_corpus()
    ev = df[df.doc_id % 10 == 0]
    tr = df[df.doc_id % 10 != 0]
    flagged = set(contamination_report(
        rd.from_pandas(tr), rd.from_pandas(ev), k=3,
        num_buckets=8).to_pandas().doc_id)
    clean = decontaminate(rd.from_pandas(tr), rd.from_pandas(ev), k=3,
                          num_buckets=8).to_pandas()
    assert set(clean.doc_id) == set(tr.doc_id) - flagged
    assert flagged  # planted inclusions must be caught
    assert 11 in flagged and 55 in flagged
    # clean rows keep the full original schema/values
    merged = clean.merge(tr, on="doc_id", suffixes=("", "_orig"))
    assert (merged.text == merged.text_orig).all()


def test_broadcast_path_equals_join_path(ray_session):
    """r4: the broadcast fast paths (eval-gram set + flagged-id set via
    ray.put) must emit exactly the bucketed-join paths' rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from osm_merge_ray.text.decontaminate import (contamination_report,
                                                  decontaminate)

    rng = np.random.default_rng(3)
    words = [f"t{i}" for i in range(50)]
    train = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "text": [" ".join(rng.choice(words, 8)) for _ in range(200)],
    })
    evals = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64) + 1000,
        # half the eval docs copy train texts → real contamination
        "text": [train["text"][i] if i % 2 == 0
                 else " ".join(rng.choice(words, 8)) for i in range(20)],
    })
    tds, eds = rd.from_pandas(train), rd.from_pandas(evals)

    key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
    fast = key(contamination_report(tds, eds, k=3).to_pandas())
    slow = key(contamination_report(tds, eds, k=3,
                                    broadcast_max_grams=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow.astype(fast.dtypes.to_dict()))
    assert len(fast) >= 10  # the planted copies are flagged

    dfast = key(decontaminate(tds, eds, k=3).to_pandas())
    dslow = key(decontaminate(tds, eds, k=3,
                              broadcast_max_flagged=0).to_pandas())
    pd.testing.assert_frame_equal(dfast, dslow.astype(dfast.dtypes.to_dict()))
    assert len(dfast) < 200


def _lgrams(s: str, L: int) -> set:
    return {s[i:i + L] for i in range(len(s) - L + 1)} if len(s) >= L else set()


def test_substring_report_matches_bruteforce(ray_session):
    """r5: stride-1 char-L-gram probe == brute-force string-set oracle
    (n_shared, max_run upper bound), broadcast and join paths equal."""
    from osm_merge_ray.text.decontaminate import substring_contamination_report

    L = 12
    df = _mk_corpus(80)
    evals = df[df["doc_id"] % 10 == 0]
    train = df[df["doc_id"] % 10 != 0]

    ev_set = set()
    for s in evals["text"]:
        ev_set |= _lgrams(s, L)

    want = {}
    for did, s in zip(train["doc_id"], train["text"]):
        hits = [s[i:i + L] in ev_set for i in range(len(s) - L + 1)]
        ns = sum(hits)
        if ns:
            run, best = 0, 0
            for h in hits:
                run = run + 1 if h else 0
                best = max(best, run)
            want[did] = (len(hits), ns, best + L - 1)

    def run_path(cap):
        out = substring_contamination_report(
            rd.from_pandas(train).repartition(4),
            rd.from_pandas(evals).repartition(3),
            min_len=L, broadcast_max_grams=cap).to_pandas()
        return {r.doc_id: (r.n_lgrams, r.n_shared, r.max_run_chars)
                for r in out.itertuples()}

    got = run_path(4_000_000)            # broadcast path
    assert got == want
    assert run_path(1) == want           # join fallback path


def test_substring_catches_leak_word_kgram_misses(ray_session):
    """The motivating case (r4 VERDICT #5): a verbatim eval substring
    embedded WITHOUT clean word boundaries — word-3-gram containment
    sees no shared gram, the char-L-gram probe flags it."""
    from osm_merge_ray.text.decontaminate import substring_contamination_report

    eval_df = pd.DataFrame({
        "doc_id": np.array([0], dtype=np.int64),
        "text": ["the secret answerkey is fortytwo exactly"]})
    train_df = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": [
            # 25-char verbatim leak glued to junk on both ends: the
            # fused boundary words leave only a 2-word intact run, so
            # NO word 3-gram is shared — but the substring is verbatim
            "xxcret answerkey is fortytwyy",
            "completely unrelated text with no overlap at all",
        ]})
    tr = rd.from_pandas(train_df)
    ev = rd.from_pandas(eval_df)

    word = contamination_report(tr, ev, k=3).to_pandas()
    # word-gram misses the leak entirely (empty report drops columns)
    assert len(word) == 0 or 1 not in set(word["doc_id"])

    sub = substring_contamination_report(tr, ev, min_len=24).to_pandas()
    assert set(sub["doc_id"]) == {1}      # substring probe catches it
    row = sub.set_index("doc_id").loc[1]
    # shared region is 25 chars: upper bound >= truth, >= min_len
    assert row["max_run_chars"] >= 25
    assert row["n_shared"] >= 25 - 24 + 1


def test_curation_substring_stage_removes_fused_leak(ray_session):
    """r5: curate_corpus(substring_min_len=...) drops a boundary-fused
    verbatim eval leak that the default word-gram pass keeps; all other
    survivors are unchanged."""
    from osm_merge_ray.pipelines.curation import curate_corpus

    leak = "xxcret answerkey is fortytwyy glued into a longer document"
    train = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [f"ordinary training document number {i} with plenty of "
                 f"unique words w{i}a w{i}b w{i}c w{i}d" for i in range(19)]
                + [leak]})
    evals = pd.DataFrame({
        "doc_id": np.array([1000], dtype=np.int64),
        "text": ["the secret answerkey is fortytwo exactly"]})

    base = curate_corpus(rd.from_pandas(train), rd.from_pandas(evals),
                         max_len=64).to_pandas()
    assert 19 in set(base["doc_id"])     # word-gram pass keeps the leak

    strict = curate_corpus(rd.from_pandas(train), rd.from_pandas(evals),
                           max_len=64, substring_min_len=24).to_pandas()
    assert 19 not in set(strict["doc_id"])
    assert set(strict["doc_id"]) == set(base["doc_id"]) - {19}


def test_checkpointed_curation_substring_fingerprint(ray_session, tmp_path):
    """substring_min_len participates in the resume fingerprint: a
    resume under a different value must refuse."""
    from osm_merge_ray.pipelines.curation import run_curation_checkpointed

    train = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": [f"document {i} alpha beta gamma w{i}x w{i}y w{i}z"
                 for i in range(12)]})
    evals = pd.DataFrame({
        "doc_id": np.array([500], dtype=np.int64),
        "text": ["held out evaluation text nothing shared"]})
    out = str(tmp_path / "cur")
    m = run_curation_checkpointed(rd.from_pandas(train),
                                  rd.from_pandas(evals), out,
                                  substring_min_len=24)
    assert m["survivors"] > 0
    with pytest.raises(ValueError, match="fingerprint"):
        run_curation_checkpointed(rd.from_pandas(train),
                                  rd.from_pandas(evals), out,
                                  substring_min_len=32)
