"""JSON-Lines corpus source/sink — the interchange format training
corpora actually arrive in (one JSON object per line: Common-Crawl
derivatives, HF dataset exports, eval sets).

Reader shape: Ray's native ``read_json`` handles the line-delimited
layout with one task per file and pushes column pruning into the Arrow
JSON parser; this wrapper only normalizes the result to the engine's
documents contract (``doc_id:int64, text:string`` + passthrough
columns). Rows without a usable id get a deterministic one derived
from the text content (splitmix64 of the FNV-1a fold, top bit cleared
so ids are always NON-NEGATIVE per the repo's integer-parity
invariant — stable across re-reads and re-partitioning, no RNG
state), so downstream dedup / join stages always have an int64 key.
This covers BOTH the column-absent case and per-row nulls in a ragged
corpus (some lines missing the id field: read_json unifies the schema
with nulls) — the emitted doc_id column is never nullable.

Derived ids are CONTENT-ADDRESSED: byte-identical texts deliberately
share an id (they are exact duplicates — downstream exact-dedup
collapses them anyway), so doc_id is unique per distinct text, not per
row. Callers needing strictly row-unique keys must supply a real
``id_column``.

Writer: ``ds.write_json`` — one shard per block, resumable layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _derive_ids(texts: list[str]) -> np.ndarray:
    from osm_merge_ray.util import hash64_str, splitmix64

    # shift BEFORE the signed cast: an arithmetic shift after the cast
    # would preserve the sign bit and make ~half of all ids negative
    return (splitmix64(hash64_str(texts)) >> np.uint64(1)).astype(np.int64)


def read_jsonl(paths, text_column: str = "text",
               id_column: str = "doc_id"):
    """Read a JSONL corpus into the documents contract.

    ``text_column`` names the field holding the document body (renamed
    to ``text``); ``id_column`` the int64 id field (renamed to
    ``doc_id``; derived from content when absent). All other fields
    pass through unchanged."""
    import ray.data as rd

    ds = rd.read_json(paths)

    def norm(t: pa.Table) -> pa.Table:
        names = list(t.column_names)
        if text_column not in names:
            raise ValueError(
                f"JSONL rows lack the text field {text_column!r}; "
                f"got fields {names}")
        if text_column != "text":
            # a pre-existing stray "text" field (common in CC/HF
            # exports carrying raw + cleaned bodies) would collide with
            # the rename and poison the schema — drop it: the caller
            # explicitly named text_column as the body
            if "text" in names:
                t = t.drop_columns(["text"])
                names = list(t.column_names)
            t = t.rename_columns(
                ["text" if n == text_column else n for n in names])
        names = list(t.column_names)
        txt = pc.fill_null(t.column("text"), "").cast(pa.string())
        t = t.set_column(names.index("text"), "text", txt)
        if id_column in names and id_column != "doc_id":
            if "doc_id" in names:
                t = t.drop_columns(["doc_id"])
            t = t.rename_columns(
                ["doc_id" if n == id_column else n for n in t.column_names])
        if "doc_id" in t.column_names:
            ids = t.column("doc_id").cast(pa.int64()).combine_chunks()
            if ids.null_count:  # ragged corpus: some lines lacked the
                # id field — fill each null row from ITS OWN text, the
                # same derivation the column-absent path uses
                null_mask = pc.is_null(ids).to_numpy(zero_copy_only=False)
                vals = ids.fill_null(0).to_numpy(zero_copy_only=False) \
                          .astype(np.int64, copy=True)
                null_texts = pc.filter(
                    txt, pa.array(null_mask)).to_pylist()
                vals[null_mask] = _derive_ids(null_texts)
                ids = pa.array(vals, pa.int64())
            t = t.set_column(t.column_names.index("doc_id"), "doc_id", ids)
        else:
            ids = _derive_ids(txt.to_pylist())
            t = t.append_column("doc_id", pa.array(ids, pa.int64()))
        return t

    return ds.map_batches(norm, batch_format="pyarrow")


def write_jsonl(ds, path: str) -> None:
    """Partitioned JSONL out: one ``.json`` shard per block."""
    ds.write_json(path)
