"""repetition_stats vs a brute-force Counter oracle."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.text.analysis import repetition_stats


def test_repetition_stats_matches_counter_oracle():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(s)))
             for s in rng.integers(1, 40, size=80)]
    texts += ["spam spam spam spam spam",          # heavy repetition
              "a b a b a b a b",                   # heavy 2-gram repetition
              "x",                                 # single word
              "one two three four"]                # all unique
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = repetition_stats(t).to_pandas()

    for i, s in enumerate(texts):
        ws = s.split(" ")
        wc = Counter(ws)
        gc = Counter(zip(ws, ws[1:]))
        row = out.iloc[i]
        assert row.n_words == len(ws)
        assert row.n_uniq_words == len(wc)
        assert row.max_word_count == max(wc.values())
        assert row.max_2gram_count == (max(gc.values()) if gc else 0)
        assert row.dup_word_frac == (len(ws) - len(wc)) / len(ws)

    # the planted rows behave as filters expect
    spam = out[out.doc_id == 80].iloc[0]
    assert spam.max_word_count == 5 and spam.dup_word_frac == 0.8
    ab = out[out.doc_id == 81].iloc[0]
    assert ab.max_2gram_count == 4


def test_repetition_stats_empty_batch():
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    assert repetition_stats(t).num_rows == 0


def test_inverted_index_min_max_df(ray_session):
    """r4: inverted_index postings + df, with min_df/max_df stop-list
    pruning applied before the postings string is built."""
    import pandas as pd
    import ray.data as rd

    from osm_merge_ray.text.analysis import inverted_index

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["common alpha", "common beta alpha", "common gamma"],
    })
    full = inverted_index(rd.from_pandas(docs)).to_pandas()
    idx = dict(zip(full["term"], zip(full["df"], full["postings"])))
    assert idx["common"] == (3, "1,2,3")
    assert idx["alpha"] == (2, "1,2")
    assert idx["beta"] == (1, "2") and idx["gamma"] == (1, "3")

    capped = inverted_index(rd.from_pandas(docs), min_df=2,
                            max_df=2).to_pandas()
    assert set(capped["term"]) == {"alpha"}  # common (df 3) and hapaxes cut
