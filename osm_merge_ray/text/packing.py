"""Sequence-packing planner: concat-then-chunk token offsets.

The standard LLM pretraining layout (GPT-style): documents are
concatenated in a canonical order (doc_id) and the token stream is cut
into fixed ``max_len`` context windows. The planner computes, per
document, its global start offset in the stream and the first/last
window it lands in — the metadata a loader needs to pack batches
without materializing the concatenated corpus anywhere.

Distributed exact prefix sum in two levels (the classic scan):

1. one pruned pass computes per-range-bucket token totals — only
   ``num_buckets`` partial sums ever reach the driver;
2. the driver turns them into exclusive bucket offsets (a ~64-int
   closure, broadcast by value), and a ``grouped_reduce`` over the
   range bucket does the in-bucket cumsum — every row of a bucket
   meets in exactly one task, nothing else is materialized.

Range bucketing is by ``doc_id * B // (max_id + 1)`` so the physical
plan is independent of cluster size (the --scaling invariant). All
arithmetic is int64 → the SQL twin (window cumsum + integer division)
is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(ds, max_len: int = 2048, id_column: str = "doc_id",
                   text_column: str = "text", num_buckets: int = 64):
    """Per doc: n_tokens (whitespace), start_tok (0-based offset in the
    doc_id-ordered concatenated stream), win_first/win_last (the
    ``max_len`` windows the doc spans)."""
    from osm_merge_ray.ops import grouped_reduce

    def ntok(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t.column(text_column), " "))
        return pa.table({id_column: t.column(id_column),
                         "n_tokens": n.cast(pa.int64())})

    # light (id, n_tokens) projection is consumed three times (max id,
    # bucket totals, final scan) — materialize once (~16 B/row) so the
    # text read+tokenize doesn't re-execute per consumer
    counts = ds.map_batches(ntok, batch_format="pyarrow").materialize()
    if counts.count() == 0:
        # empty corpus (e.g. every document filtered upstream): return a
        # valid empty plan instead of crashing on max(id) == None —
        # curate_corpus and the `pack` CLI reach this path
        import ray.data as rd

        sch = counts.schema()
        try:
            id_type = dict(zip(sch.names, sch.types))[id_column]
        except (AttributeError, KeyError, TypeError):
            id_type = pa.int64()  # empty-plan schema may be typeless
        return rd.from_arrow(pa.table({
            id_column: pa.array([], id_type),
            "n_tokens": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "win_first": pa.array([], pa.int64()),
            "win_last": pa.array([], pa.int64()),
        }))
    max_id = int(counts.max(id_column))

    def with_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy().astype(np.int64)
        b = ids * np.int64(num_buckets) // np.int64(max_id + 1)
        return t.append_column("rbucket", pa.array(b, pa.int64()))

    bucketed = counts.map_batches(with_bucket, batch_format="pyarrow")

    # level 1: per-bucket totals — num_buckets rows total reach the driver
    totals = {int(r["rbucket"]): int(r["sum(n_tokens)"])
              for r in bucketed.groupby("rbucket").sum("n_tokens").take_all()}
    offsets = np.zeros(num_buckets, dtype=np.int64)
    acc = 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += totals.get(b, 0)
    off_list = offsets.tolist()  # by-value closure, ~num_buckets ints

    # level 2: in-bucket exclusive cumsum + the bucket's global offset.
    # A shuffle bucket may hold several complete range buckets (hash
    # bucketing), so cumsum per rbucket segment after one lexsort.
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rbucket", id_column], kind="stable")
        rb = df["rbucket"].to_numpy().astype(np.int64)
        n = df["n_tokens"].to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(n)[:-1]])
        seg_start = np.flatnonzero(np.r_[True, rb[1:] != rb[:-1]])
        sizes = np.diff(np.r_[seg_start, len(rb)])
        cum -= np.repeat(cum[seg_start], sizes)  # restart cumsum per segment
        start = np.asarray(off_list, dtype=np.int64)[rb] + cum
        return pd.DataFrame({
            id_column: df[id_column].to_numpy(),
            "n_tokens": n,
            "start_tok": start.astype(np.int64),
            "win_first": (start // max_len).astype(np.int64),
            "win_last": ((start + n - 1) // max_len).astype(np.int64),
        })

    return grouped_reduce(bucketed, ["rbucket"], scan)
