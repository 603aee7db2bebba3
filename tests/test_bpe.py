"""Real-BPE tokenization: trainer determinism, merge-loop semantics,
pretokenizer parity with the DuckDB oracle's RE2, and end-to-end
engine-vs-recursive-CTE equality on a corpus slice."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from osm_merge_ray.text.bpe import (
    BPE_PRETOKEN_PAT,
    BpeTokenCounter,
    bpe_oracle_sql,
    bpe_token_count,
    merge_all,
    merges,
    pretokenize,
    train_bpe,
)


def test_trainer_deterministic_and_sane():
    m1 = train_bpe("low lower lowest low low newer newest new", 10)
    m2 = train_bpe("low lower lowest low low newer newest new", 10)
    assert m1 == m2
    # the most frequent pair of the classic example merges first
    assert ("l", "o") in m1 and ("lo", "w") in m1
    assert len(merges()) == 200
    assert len(set(merges())) == 200  # ranks unique


def test_merge_all_left_to_right_non_overlapping():
    # "aaa" with merge (a,a): first two merge, third survives — the
    # same occurrences a string replace on the delimited form merges
    assert merge_all(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_all(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert merge_all(["x"], "a", "b") == ["x"]


def test_merge_loop_matches_manual():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2}
    # abcd: (a,b) -> ab,c,d ; (ab,c) -> abc,d ; no (abc,d) rank -> 2
    assert bpe_token_count("abcd", ranks, {}) == 2
    # cd alone: (c,d) applies -> 1 token
    assert bpe_token_count("cd", ranks, {}) == 1
    assert bpe_token_count("", ranks, {}) == 0
    assert bpe_token_count("z", ranks, {}) == 1


def test_counts_never_exceed_chars_and_compress_common_words():
    ranks = {p: r for r, p in enumerate(merges())}
    for w in (" the", " table", " value", " query", "xyzzy"):
        n = bpe_token_count(w, ranks, {})
        assert 1 <= n <= len(w)
    # seed-corpus words compress to one or two tokens
    assert bpe_token_count(" the", ranks, {}) == 1


def test_pretokenizer_matches_duckdb_re2():
    con = duckdb.connect()
    samples = [
        "the quick brown fox", "it's we're  they've", "a1 22b  c;; d",
        "  leading and trailing  ", "", "tabs\tand\nnewlines",
    ]
    for s in samples:
        dd = con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, BPE_PRETOKEN_PAT]
        ).fetchone()[0]
        assert pretokenize(s) == dd


def test_engine_matches_recursive_cte_oracle():
    texts = [
        "the value of the table is the key to the fast scan",
        "it's a small part of a big row group",
        "unseen zz@@ chars $% and 12345 numbers",
        "",
        "the the the",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    eng = BpeTokenCounter()(t)
    con = duckdb.connect()
    con.register("documents", t)
    got = dict(con.execute(bpe_oracle_sql()).fetchall())
    want = dict(zip(eng["doc_id"].to_pylist(), eng["n_bpe_tokens"].to_pylist()))
    assert got == want


def test_cache_is_correct():
    ranks = {p: r for r, p in enumerate(merges())}
    cache: dict[str, int] = {}
    a = bpe_token_count(" table", ranks, cache)
    b = bpe_token_count(" table", ranks, cache)
    assert a == b and " table" in cache


def test_train_bpe_distributed_matches_reference(ray_session):
    """r5: distributed merge-training == single-process train_bpe_counts
    over the same per-document word multiset, layout-invariant, with
    the adversarial cases (overlapping 'aaaa', contractions, empty
    docs, punctuation runs) planted."""
    from collections import Counter

    import ray.data as rd

    from osm_merge_ray.text.bpe import (pretokenize, train_bpe_counts,
                                        train_bpe_distributed)

    docs = ["the cat sat on the mat", "the bat and the cat chat",
            "it's the that then there these 123 456 !!", "aaa aaab aaaa",
            "merge merge merges merged merging", ""] * 7
    t = pa.table({"text": pa.array(docs, pa.string())})

    words = Counter()
    for d in docs:
        words.update(pretokenize(d))
    ref = train_bpe_counts(words, 10)

    def run(nblocks, nb):
        ds = rd.from_arrow(t).repartition(nblocks)
        return train_bpe_distributed(ds, n_merges=10, num_buckets=nb)

    out = run(5, 7)
    assert out["r"].tolist() == list(range(10))
    assert [tuple(x) for x in out[["a", "b", "pair_count"]].values] == ref
    # layout invariance: blocks and buckets must not change the result
    assert run(1, 3).equals(out)
    assert run(11, 16).equals(out)


def test_train_bpe_distributed_early_stop_and_min_count(ray_session):
    import ray.data as rd

    from osm_merge_ray.text.bpe import train_bpe_distributed

    # single-char vocabulary after 1 merge: 'ab' exhausts all pairs
    t = pa.table({"text": pa.array(["ab ab ab"], pa.string())})
    out = train_bpe_distributed(rd.from_arrow(t), n_merges=5)
    # merges stop when no pairs remain (' a' 'b' then exhaustion path);
    # the trainer must not loop or pad
    assert len(out) < 5 or out["pair_count"].min() >= 1

    # min_count prunes rare words from the trained multiset
    t2 = pa.table({"text": pa.array(["zz " * 50 + "rareword"], pa.string())})
    pruned = train_bpe_distributed(rd.from_arrow(t2), n_merges=2,
                                   min_count=5)
    assert all("rareword".find(a + b) < 0
               for a, b in pruned[["a", "b"]].values)


def test_bpe_train_sql_twin_matches_engine(ray_session):
    """The k-unrolled SQL stages replay training bit-exactly."""
    import duckdb
    import ray.data as rd

    from osm_merge_ray.text.bpe import bpe_train_sql, train_bpe_distributed

    docs = ["she sells sea shells by the sea shore",
            "peter piper picked a peck of pickled peppers",
            "it's a test, isn't it? 42 42 42"] * 3
    t = pa.table({"text": pa.array(docs, pa.string())})
    eng = train_bpe_distributed(rd.from_arrow(t).repartition(4),
                                n_merges=6, num_buckets=8)
    con = duckdb.connect()
    con.register("documents", t)
    sql = con.execute(bpe_train_sql(6)).df()
    assert sql[["a", "b"]].values.tolist() == eng[["a", "b"]].values.tolist()
    assert sql["pair_count"].astype("int64").tolist() == \
        eng["pair_count"].tolist()


def test_trained_vocab_counts_and_cli_loop(ray_session, tmp_path):
    """r5: train -> apply loop — BpeTokenCounter(merge_table=...) uses
    the learned merges, and the bpe-train -> bpe-count CLI composition
    reproduces a hand-replayed count."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from osm_merge_ray.cli import main as cli_main
    from osm_merge_ray.text.bpe import (BpeTokenCounter, bpe_token_count,
                                        pretokenize, train_bpe_distributed)

    docs = ["aaa bbb aaa bbb ccc", "aaa aaa aaa", "bbb ccc bbb"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(docs, pa.string())})
    learned = train_bpe_distributed(rd.from_arrow(t), n_merges=4)
    table = list(zip(learned["a"], learned["b"]))

    counted = BpeTokenCounter(merge_table=table)(t)
    ranks = {p: r for r, p in enumerate(table)}
    for i, s in enumerate(docs):
        cache: dict = {}
        want = sum(bpe_token_count(w, ranks, cache) for w in pretokenize(s))
        assert counted["n_bpe_tokens"][i].as_py() == want
    # trained merges actually fire (counts < raw char counts)
    assert counted["n_bpe_tokens"][1].as_py() < len(docs[1])

    # CLI loop
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(t, str(corpus))
    merges_p = tmp_path / "merges.parquet"
    assert cli_main(["bpe-train", "-i", str(corpus), "-o", str(merges_p),
                     "--merges", "4"]) == 0
    out = tmp_path / "counts"
    assert cli_main(["bpe-count", "-i", str(corpus), "-o", str(out),
                     "--merges", str(merges_p)]) == 0
    got = pq.read_table(str(out)).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_bpe_tokens"] == counted["n_bpe_tokens"][1].as_py()


def test_train_raises_on_delimiter_pretokens(ray_session):
    """r5 review: a pretoken containing U+001F would collide with the
    state delimiter and silently corrupt pair counts — the trainer
    must raise instead (same raise-not-truncate contract as the
    partition cover)."""
    import ray
    import ray.data as rd

    from osm_merge_ray.text.bpe import train_bpe_distributed

    t = pa.table({"text": pa.array(["ab ab \x1f! \x1f! \x1f! \x1f!"],
                                   pa.string())})
    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match="state delimiter"):
        train_bpe_distributed(rd.from_arrow(t), n_merges=2)


def test_bpe_count_custom_text_column(ray_session, tmp_path):
    """r5 review: bpe-count --text-column must reach the counter (it
    previously hardcoded 'text' and crashed)."""
    import pyarrow.parquet as pq

    from osm_merge_ray.cli import main as cli_main
    from osm_merge_ray.text.bpe import BpeTokenCounter

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "body": pa.array(["the fast scan"], pa.string())})
    want = BpeTokenCounter()(t.rename_columns(["doc_id", "text"]))[
        "n_bpe_tokens"][0].as_py()
    corpus = tmp_path / "c.parquet"
    pq.write_table(t, str(corpus))
    out = tmp_path / "counts"
    assert cli_main(["bpe-count", "-i", str(corpus), "-o", str(out),
                     "--text-column", "body"]) == 0
    got = pq.read_table(str(out)).to_pandas()
    assert got["n_bpe_tokens"].tolist() == [want]


def test_local_and_distributed_training_paths_identical(ray_session):
    """r5: the driver-local round loop (vocab under driver_max_words)
    and the distributed rounds (cap=0 forces them) produce the same
    merge table bit for bit."""
    import ray.data as rd

    from osm_merge_ray.text.bpe import train_bpe_distributed

    docs = ["the cat sat on the mat", "aaa aaab aaaa",
            "it's the that then 42 42", ""] * 5
    t = pa.table({"text": pa.array(docs, pa.string())})
    ds = rd.from_arrow(t).repartition(4)
    local = train_bpe_distributed(ds, n_merges=8, num_buckets=8)
    dist = train_bpe_distributed(ds, n_merges=8, num_buckets=8,
                                 driver_max_words=0)
    assert local.equals(dist)
