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


def simhash(texts, n_bits: int = 64, hasher=hash64_str) -> np.ndarray:
    """Vectorized-ish simhash over word tokens.

    ``hasher`` maps a token list to a per-token hash array; the default
    is the 64-bit FNV path. Pass ``util.poly41_str`` with ``n_bits=40``
    for the SQL-mirrorable variant a DuckDB oracle can recompute
    bit-for-bit (poly hash < 2^41 fits BIGINT)."""
    out = np.empty(len(texts), dtype=np.int64)
    shifts = np.arange(n_bits, dtype=np.uint64)[None, :]
    for i, s in enumerate(texts):
        toks = (s or "").split(" ")
        if not toks:
            out[i] = 0
            continue
        h = np.asarray(hasher(toks)).astype(np.uint64)
        bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in range(n_bits):
            if score[b] > 0:
                fp |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(fp.astype(np.int64))
    return out


def simhash64(texts) -> np.ndarray:
    return simhash(texts, n_bits=64, hasher=hash64_str)


def add_simhash(t: pa.Table, text_column: str = "text", n_bits: int = 64,
                hasher=hash64_str) -> pa.Table:
    fp = simhash(t.column(text_column).to_pylist(), n_bits=n_bits, hasher=hasher)
    return t.append_column("simhash", pa.array(fp, pa.int64()))


def band_plan(n_bits: int, num_bands: int) -> list[tuple[int, int]]:
    """(shift, width) per band: ``num_bands`` contiguous slices covering
    ``n_bits``, uniform width with the LAST band absorbing the
    remainder. num_bands = radius + 1 is the pigeonhole guarantee that
    any pair within the hamming radius shares at least one exact band
    (Manku et al., WWW 2007)."""
    w = n_bits // num_bands
    plan = [(b * w, w) for b in range(num_bands - 1)]
    plan.append(((num_bands - 1) * w, n_bits - (num_bands - 1) * w))
    return plan


def fingerprint_band_pairs(ds, id_column: str = "doc_id",
                           fp_column: str = "simhash",
                           max_hamming: int = 3, n_bits: int = 64,
                           num_bands: int | None = None):
    """Banded Hamming near-dup pairs over ANY int64 fingerprint column
    (simhash text fingerprints, image pHash, audio fingerprints...):
    explode to (band_id, band_hash, id, fp) light rows, bucket-shuffle
    by band key, verify true hamming distance inside the group stage,
    grouped min-dedup. Exact for radius <= num_bands - 1 (pigeonhole);
    the fingerprint column rides along (8 B) so verification never
    refetches. Reference analog: the geometry-identical early exit
    (conflator.py:229-234) generalized to a banded near-match index,
    the image-modality sibling of dedup/minhash.py's LSH."""
    if num_bands is None:
        num_bands = max_hamming + 1
    plan = band_plan(n_bits, num_bands)

    def band_rows(t: pa.Table) -> pa.Table:
        fp = t.column(fp_column).to_numpy().view(np.uint64)
        ids = t.column(id_column)
        parts = []
        for band, (shift, width) in enumerate(plan):
            mask = np.uint64((1 << width) - 1)
            bh = ((fp >> np.uint64(shift)) & mask).astype(np.int64)
            parts.append(pa.table({
                "band_id": pa.array(np.full(len(bh), band, dtype=np.int32), pa.int32()),
                "band_hash": pa.array(bh, pa.int64()),
                id_column: ids,
                "simhash": pa.array(fp.view(np.int64), pa.int64()),
            }))
        return pa.concat_tables(parts)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        from osm_merge_ray.ops import dedup_pairs, same_key_pairs
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
        ua, ub, first = dedup_pairs(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": ua, "id_b": ub, "hamming": ham[first]})

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


def simhash_pairs(ds, id_column: str = "doc_id", text_column: str = "text",
                  max_hamming: int = 3, n_bits: int = 64, hasher=hash64_str):
    """Candidate pairs within ``max_hamming`` via 4-band groupby
    (band width = n_bits/4; exact for radius <= 3 by pigeonhole),
    verified with the true hamming distance inside the group stage.
    Thin wrapper: simhash column first, then the generic banded
    machinery (``fingerprint_band_pairs``) it shares with image-pHash
    near-dup."""

    def with_fp(t: pa.Table) -> pa.Table:
        return add_simhash(t, text_column, n_bits=n_bits, hasher=hasher)

    return fingerprint_band_pairs(
        ds.map_batches(with_fp, batch_format="pyarrow"),
        id_column=id_column, fp_column="simhash",
        max_hamming=max_hamming, n_bits=n_bits, num_bands=4)
