"""Sliding-window document chunking plan.

Long documents are split into fixed-size token windows with overlap
before training/embedding (the standard RAG / long-context
preprocessing step: window W, stride S = W - overlap). This operator
emits the integer PLAN — ``(doc_id, chunk_idx, start_tok, n_toks)``
rows — not the chunk text: the plan is light enough to shuffle/join at
100 TB, and the text slice is a map-side gather wherever the chunk
bytes are actually needed (the same plan-not-payload discipline as
text/packing.py).

Chunk count per doc: 1 when ``n_tokens <= window``, else
``1 + ceil((n_tokens - window) / stride)`` — every token is covered,
consecutive chunks share exactly ``overlap`` tokens, and the final
chunk is the only one allowed to be short. All arithmetic is
non-negative int64 (the repo's // parity invariant), so the plan has a
bit-exact DuckDB twin (pipelines/queries.py SQL_CHUNK_PLAN).

No reference analog (hotosm/osm-merge has no text ops) — part of the
beyond-reference LLM-pipeline family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_plan(ds, window: int = 256, overlap: int = 32,
               id_column: str = "doc_id", text_column: str = "text"):
    """One row per (doc, chunk): ``chunk_idx`` (0-based), ``start_tok``
    and ``n_toks`` over the doc's space-split token stream. Shuffle-free:
    a single fused map over the corpus; rows out ~ corpus tokens /
    stride."""
    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    stride = window - overlap

    def plan(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(t.column(text_column), ""), " ")
        n = np.asarray(pc.list_value_length(toks)).astype(np.int64)
        # ceil-div on non-negative operands only (// parity invariant)
        extra = np.maximum(n - window, 0)
        n_chunks = 1 + (extra + stride - 1) // stride
        total = int(n_chunks.sum())
        rows = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        # cumsum-minus-counts start offsets: length-correct even for a
        # ZERO-ROW block (the [0]+cumsum[:-1] idiom broadcasts (1,)
        # against (0,) and crashes — review r5)
        offs = np.cumsum(n_chunks) - n_chunks
        cidx = np.arange(total, dtype=np.int64) - np.repeat(offs, n_chunks)
        start = cidx * stride
        length = np.minimum(start + window, n[rows]) - start
        return pa.table({
            id_column: t.column(id_column).take(rows),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "n_toks": pa.array(length, pa.int64()),
        })

    return ds.map_batches(plan, batch_format="pyarrow")
