"""Data-mixture planning: per-source token budgets and epoch factors.

The planning half of weighted mixture training (the application half —
hash-threshold Bernoulli downsampling — is ``source_weighted_sample``):
given target source weights and a total token budget, compute for each
source its measured token mass, its share of the budget, and the
up/down-sampling factor (epochs) a loader must apply,

    target_tokens_s = (budget * w_s) // W          W = Σ w_s
    epochs_q20_s    = (2^20 * target_tokens_s) // n_tokens_s

All integer arithmetic on non-negative operands, so the DuckDB twin is
bit-exact. epochs_q20 > 2^20 means the source repeats (upsampling),
below means subsampling — feed it straight into the Bernoulli sampler.

Shape at 100 TB: token counting is pre-aggregated inside each batch
(one partial row per (batch, source)), so the shuffle carries
per-source partials, not documents; the final table is one row per
SOURCE — small by construction (a corpus has thousands of sources, not
billions), which is the only part that touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

Q20 = 1 << 20


def mixture_plan(ds, token_budget: int,
                 weights: dict[str, int] | None = None,
                 default_weight: int = 1,
                 source_column: str = "source", text_column: str = "text",
                 num_buckets: int = 16) -> pd.DataFrame:
    """Dataset of (source, text) docs -> one plan row per source:
    (source, n_docs, n_tokens, weight, target_tokens, epochs_q20),
    sorted by source. ``weights`` maps source -> positive int weight
    (missing sources get ``default_weight``)."""
    from osm_merge_ray.ops import grouped_reduce

    def partial(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t.column(text_column), ""), " "))
        df = pd.DataFrame({
            "source": t.column(source_column).to_pylist(),
            "n_tokens": n.to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).sum().reset_index()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_tokens"] = g["n_tokens"].astype(np.int64)
        return g

    roll = grouped_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                          ["source"], combine,
                          num_buckets=num_buckets).to_pandas()
    roll = roll.sort_values("source").reset_index(drop=True)
    w = (roll["source"].map(weights or {}).fillna(default_weight)
         .astype(np.int64))
    total_w = int(w.sum())
    roll["weight"] = w
    roll["target_tokens"] = (int(token_budget) * w) // total_w
    roll["epochs_q20"] = (Q20 * roll["target_tokens"]) // roll["n_tokens"]
    return roll[["source", "n_docs", "n_tokens", "weight",
                 "target_tokens", "epochs_q20"]]
