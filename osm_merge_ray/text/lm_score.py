"""Count-based bigram language-model quality scoring.

The CCNet / KenLM-style curation signal, reduced to exact integer
arithmetic: train bigram counts on the corpus itself, then score each
document by how typical its bigrams are,

    lm_score(doc) = sum over doc bigrams (w1, w2) of
                    k * floor(Q * c(w1 w2) / c(w1 ·))

where ``c(w1 w2)`` is the corpus-wide bigram count, ``c(w1 ·)`` the
count of bigrams starting with ``w1`` (so the ratio is the conditional
MLE p(w2|w1)), ``k`` the in-document multiplicity and Q = 2^20 a fixed
quantizer. Everything is non-negative int64 — floor-div equals
trunc-div, so the DuckDB twin is bit-exact (CLAUDE.md invariant).
A low ``avg_q20`` (= lm_score // n_bigrams) flags gibberish /
boilerplate exactly the way a perplexity threshold does, without a
float log anywhere near the comparison path.

Shape at 100 TB: ONE exploded pass per consumer builds per-document
(bigram, multiplicity) rows batch-locally (documents never straddle
batches, so the per-doc counts are exact without a shuffle); the two
count tables are ``grouped_reduce`` hash-bucket reductions; the two
count joins are ``bucketed_hash_join`` (both sides corpus-sized — a
broadcast would not survive an open vocabulary); the final per-doc sum
is one more grouped reduction. No driver-side materialization, no
native high-cardinality groupby (the >5k-distinct-group cliff).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

Q_SCALE = 1 << 20


def _doc_bigrams(t: pa.Table, text_column: str, id_column: str) -> pa.Table:
    """Per-document distinct bigrams with multiplicity: rows of
    (id, w1, b, k) where b = 'w1 w2'. Tokenization is a plain
    single-space split, identical to string_split(text, ' ')."""
    ids = t.column(id_column).to_numpy()
    texts = t.column(text_column).to_pylist()
    id_rep: list[np.ndarray] = []
    w1s: list[str] = []
    bgs: list[str] = []
    for i, s in zip(ids.tolist(), texts):
        ws = (s or "").split(" ")
        n = len(ws) - 1
        if n <= 0:
            continue
        id_rep.append(np.full(n, i, dtype=np.int64))
        w1s.extend(ws[:-1])
        bgs.extend(f"{a} {b}" for a, b in zip(ws[:-1], ws[1:]))
    if not id_rep:
        return pa.table({id_column: pa.array([], pa.int64()),
                         "w1": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "k": pa.array([], pa.int64())})
    df = pd.DataFrame({id_column: np.concatenate(id_rep),
                       "w1": w1s, "b": bgs})
    g = (df.groupby([id_column, "w1", "b"], sort=False)
         .size().rename("k").reset_index())
    g["k"] = g["k"].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def bigram_lm_scores(ds, text_column: str = "text",
                     id_column: str = "doc_id", num_buckets: int = 64):
    """Dataset of documents -> Dataset of (id, n_bigrams, lm_score,
    avg_q20). Documents with fewer than two tokens have no bigram and
    are absent from the output (score undefined, like perplexity)."""
    from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce

    src = ds.map_batches(
        lambda t: _doc_bigrams(t, text_column, id_column),
        batch_format="pyarrow")

    def bigram_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("b", sort=False)
             .agg(w1=("w1", "first"), n2=("k", "sum")).reset_index())
        g["n2"] = g["n2"].astype(np.int64)
        return g

    def prefix_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("w1", sort=False)["n2"].sum().rename("n1")
        return g.reset_index()

    # ONE count table from the exploded rows; the prefix table is its
    # per-first-word rollup (c(w1 ·) = Σ_b c2(b)), so the corpus is
    # exploded for the join and the counts — twice, not three times.
    # The count table (distinct bigrams, k collapsed) is the light
    # projection worth materializing: both derived consumers (c1, the
    # join) would otherwise replay the full explode chain under
    # lineage.
    c2 = grouped_reduce(src.select_columns(["w1", "b", "k"]), ["b"],
                        bigram_counts, num_buckets=num_buckets).materialize()
    c1 = grouped_reduce(c2.select_columns(["w1", "n2"]), ["w1"],
                        prefix_counts, num_buckets=num_buckets)

    j = bucketed_hash_join(src, c2.select_columns(["b", "n2"]), key="b",
                           num_buckets=num_buckets)
    j = bucketed_hash_join(j.select_columns([id_column, "w1", "k", "n2"]),
                           c1, key="w1", num_buckets=num_buckets)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"].to_numpy(np.int64)
        n2 = df["n2"].to_numpy(np.int64)
        n1 = df["n1"].to_numpy(np.int64)
        # all operands non-negative -> // == SQL integer division
        term = k * ((Q_SCALE * n2) // n1)
        out = pd.DataFrame({id_column: df[id_column], "_t": term, "_k": k})
        g = out.groupby(id_column, sort=False).sum().reset_index()
        g["n_bigrams"] = g.pop("_k").astype(np.int64)
        g["lm_score"] = g.pop("_t").astype(np.int64)
        g["avg_q20"] = g["lm_score"] // g["n_bigrams"]
        return g[[id_column, "n_bigrams", "lm_score", "avg_q20"]]

    return grouped_reduce(j.select_columns([id_column, "k", "n2", "n1"]),
                          [id_column], per_doc, num_buckets=num_buckets)
