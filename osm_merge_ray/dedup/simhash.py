"""SimHash near-dup fingerprints (Charikar 2002; Manku et al., WWW 2007).

64-bit fingerprint = sign of the per-bit sum of token-hash bit vectors.
Near-dups = fingerprints within a small hamming radius; candidate
generation uses the Manku trick — groupby on each of 4 16-bit bands
(any pair within hamming<=3 shares at least one exact band).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.image.phash import hamming64
from osm_merge_ray.util import hash64_str


def simhash64(texts) -> np.ndarray:
    """Vectorized-ish simhash over word tokens."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        toks = (s or "").split(" ")
        if not toks:
            out[i] = 0
            continue
        h = hash64_str(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in range(64):
            if score[b] > 0:
                fp |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(fp.astype(np.int64))
    return out


def add_simhash(t: pa.Table, text_column: str = "text") -> pa.Table:
    fp = simhash64(t.column(text_column).to_pylist())
    return t.append_column("simhash", pa.array(fp, pa.int64()))


def simhash_pairs(ds, id_column: str = "doc_id", text_column: str = "text",
                  max_hamming: int = 3):
    """Candidate pairs within ``max_hamming`` via 4x16-bit band groupby
    (exact for radius <= 3 by pigeonhole), verified with the true
    hamming distance inside the group stage."""
    def band_rows(t: pa.Table) -> pa.Table:
        t = add_simhash(t, text_column)
        fp = t.column("simhash").to_numpy().view(np.uint64)
        ids = t.column(id_column)
        parts = []
        for band in range(4):
            bh = ((fp >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "band_id": pa.array(np.full(len(bh), band, dtype=np.int32), pa.int32()),
                "band_hash": pa.array(bh, pa.int64()),
                id_column: ids,
                "simhash": t.column("simhash"),
            }))
        return pa.concat_tables(parts)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        from osm_merge_ray.ops import same_key_pairs
        from osm_merge_ray.util import splitmix64

        key = splitmix64(
            df["band_hash"].to_numpy().view(np.uint64)
            ^ splitmix64(df["band_id"].to_numpy().astype(np.uint64))
        ).view(np.int64)
        ids = df[id_column].to_numpy()
        fps = df["simhash"].to_numpy()
        ia, ib = same_key_pairs(key, key)
        keep = ids[ia] < ids[ib]
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        ham = hamming64(fps[ia], fps[ib])
        ok = ham <= max_hamming
        ia, ib, ham = ia[ok], ib[ok], ham[ok]
        packed = (ids[ia].astype(np.int64) << np.int64(31)) | ids[ib].astype(np.int64)
        _, first = np.unique(packed, return_index=True)
        return pd.DataFrame({
            "id_a": ids[ia[first]].astype(np.int64),
            "id_b": ids[ib[first]].astype(np.int64),
            "hamming": ham[first],
        })

    from osm_merge_ray.ops import grouped_reduce
    from osm_merge_ray.util import splitmix64 as _smx

    def with_bucket(t: pa.Table) -> pa.Table:
        key = _smx(
            t.column("band_hash").to_numpy().view(np.uint64)
            ^ _smx(t.column("band_id").to_numpy().astype(np.uint64))
        )
        b = (key % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas")
    )
    return grouped_reduce(
        pairs, ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False).agg(
            hamming=("hamming", "min")
        ),
    )
