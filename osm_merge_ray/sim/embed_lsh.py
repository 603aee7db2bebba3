"""Random-hyperplane LSH for embedding-cosine near-dup at scale.

The broadcast all-pairs path (``dedup_embedding_q``) is exact but
O(N^2/cluster) — fine to ~10^5 vectors. The scale path is Charikar's
random-hyperplane LSH (STOC 2002): a 64-bit sign code whose hamming
distance estimates angle; candidates come from banded code groupby
(same one-shuffle shape as MinHash-LSH / SimHash), verified with the
true cosine inside the bucket. P(bit agree) = 1 - theta/pi, so a
cosine-0.9 pair agrees on ~95.3% of bits — with 8 bands x 8 bits the
candidate recall at cos>=0.9 is ~1 - (1 - 0.953^8)^8 ≈ 0.96.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.ops import dedup_pairs, grouped_reduce, same_key_pairs
from osm_merge_ray.util import splitmix64


def _planes(dim: int, bits: int = 64, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits))


class EmbedCoder:
    """Actor-pool stage: hyperplanes drawn once per actor (seeded →
    identical across actors); emits (band_id, band_hash, id) ONLY —
    the embedding never rides the band fan-out (the old design shipped
    the full vector once per band = 8x vector bytes through the
    exchange; vectors are fetched later just for surviving candidate
    ids, VERDICT r1)."""

    def __init__(self, dim: int, bits: int = 64, bands: int = 8, seed: int = 42,
                 id_column: str = "vec_id", vec_column: str = "embedding"):
        self.planes = _planes(dim, bits, seed)
        self.bits = bits
        self.bands = bands
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, t: pa.Table) -> pa.Table:
        m = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in t.column(self.vec_column).to_pylist()])
        signs = (m @ self.planes) >= 0  # (n, bits)
        rpb = self.bits // self.bands
        codes = signs.reshape(len(m), self.bands, rpb)
        pw = (np.uint64(1) << np.arange(rpb, dtype=np.uint64))
        bh = (codes.astype(np.uint64) @ pw)  # (n, bands)
        bh = splitmix64(bh ^ (np.arange(self.bands, dtype=np.uint64)[None, :] << np.uint64(56)))
        n = len(m)
        return pa.table({
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64), pa.int64()),
            self.id_column: pa.array(np.repeat(
                t.column(self.id_column).to_numpy(zero_copy_only=False), self.bands)),
        })


def embedding_neardup_lsh(ds, dim: int, threshold: float = 0.9,
                          bits: int = 64, bands: int = 8, seed: int = 42,
                          id_column: str = "vec_id", vec_column: str = "embedding",
                          num_buckets: int = 64):
    """Near-dup pairs with cosine >= threshold via banded hyperplane LSH.

    Shape: one LIGHT shuffle of (band_hash, id) rows → candidate id
    pairs → global pair dedup → vectors fetched by bucketed hash join
    ONLY for surviving candidate ids → exact f64 cosine verify. The
    exchange never carries an embedding that isn't needed for a
    candidate (the band fan-out is 3 int64s per row)."""

    from osm_merge_ray.ops import bucketed_hash_join

    coded = ds.map_batches(
        EmbedCoder,
        fn_constructor_kwargs={"dim": dim, "bits": bits, "bands": bands,
                               "seed": seed, "id_column": id_column,
                               "vec_column": vec_column},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 8),
    )

    def with_bucket(t: pa.Table) -> pa.Table:
        b = (splitmix64(t.column("band_hash").to_numpy().view(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        key = df["band_hash"].to_numpy()
        ids = df[id_column].to_numpy()
        ia, ib = same_key_pairs(key, key)
        keep = ids[ia] < ids[ib]
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        ua, ub, _ = dedup_pairs(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": ua, "id_b": ub})

    cand = (
        coded.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cand_pairs, batch_format="pandas")
    )
    cand = grouped_reduce(cand, ["id_a", "id_b"],
                          lambda df: df.drop_duplicates(["id_a", "id_b"]))

    return fetch_and_score(cand, ds, threshold, id_column=id_column,
                           vec_column=vec_column, num_buckets=num_buckets)


def fetch_and_score(cand, ds, threshold: float, id_column: str = "vec_id",
                    vec_column: str = "embedding", num_buckets: int = 64,
                    broadcast_limit: int = 200_000):
    """Fetch vectors for candidate (id_a, id_b) pairs and keep pairs
    with exact f64 cosine (round 6) >= threshold.

    Small vector tables (<= broadcast_limit rows, bounded driver
    transfer) are broadcast once via ``ray.put`` and probed map-side —
    no shuffle at all; larger tables fetch per-candidate vectors via
    two bucketed hash joins (nothing unbounded on the driver)."""
    from osm_merge_ray.ops import bucketed_hash_join

    if ds.count() <= broadcast_limit:
        import ray

        ids_parts, vec_parts = [], []
        for b in ds.iter_batches(batch_format="pyarrow"):
            ids_parts.append(b.column(id_column).to_numpy())
            vec_parts.append(np.vstack([np.asarray(v, dtype=np.float64)
                                        for v in b.column(vec_column).to_pylist()]))
        ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = (np.vstack(vec_parts)[order] if vec_parts
               else np.empty((0, 1)))
        norms = np.linalg.norm(mat, axis=1)
        ref = ray.put((ids, mat, norms))

        def score_b(df: pd.DataFrame) -> pd.DataFrame:
            bids, bmat, bnorm = ray.get(ref)
            if len(df) == 0:
                return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                     "id_b": pd.Series(dtype=np.int64),
                                     "sim": pd.Series(dtype=np.float64)})
            ia = np.searchsorted(bids, df["id_a"].to_numpy())
            ib = np.searchsorted(bids, df["id_b"].to_numpy())
            va, vb = bmat[ia], bmat[ib]
            sim = np.round((va * vb).sum(axis=1) / (bnorm[ia] * bnorm[ib]), 6)
            ok = sim >= threshold
            return pd.DataFrame({
                "id_a": df["id_a"].to_numpy()[ok].astype(np.int64),
                "id_b": df["id_b"].to_numpy()[ok].astype(np.int64),
                "sim": sim[ok]})

        return cand.map_batches(score_b, batch_format="pandas")

    def side(name):
        def proj(t: pa.Table) -> pa.Table:
            return pa.table({name: t.column(id_column),
                             f"vec_{name[-1]}": t.column(vec_column)})
        return proj

    with_a = bucketed_hash_join(
        cand, ds.map_batches(side("id_a"), batch_format="pyarrow"),
        key="id_a", num_buckets=num_buckets)
    with_ab = bucketed_hash_join(
        with_a, ds.map_batches(side("id_b"), batch_format="pyarrow"),
        key="id_b", num_buckets=num_buckets)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "sim": pd.Series(dtype=np.float64)})
        va = np.vstack([np.asarray(v, dtype=np.float64) for v in df["vec_a"]])
        vb = np.vstack([np.asarray(v, dtype=np.float64) for v in df["vec_b"]])
        dots = (va * vb).sum(axis=1)
        sim = np.round(dots / (np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)), 6)
        ok = sim >= threshold
        return pd.DataFrame({"id_a": df["id_a"].to_numpy()[ok].astype(np.int64),
                             "id_b": df["id_b"].to_numpy()[ok].astype(np.int64),
                             "sim": sim[ok]})

    return with_ab.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# SQL-mirrorable variant: integer-quantized hyperplanes
# ---------------------------------------------------------------------------

QUANT = 1 << 20  # embedding quantization scale (floor(x * 2^20))


def int_planes(dim: int, bits: int = 64, seed: int = 99,
               scale: int = 1 << 19) -> np.ndarray:
    """Deterministic INTEGER hyperplane weights in [-2^19, 2^19): sign
    bits become exact int64 arithmetic (|xq*w| sums < 2^50) that a
    DuckDB BIGINT expression reproduces bit-for-bit — float matmul sign
    boundaries can't flip between numpy and SQL summation order."""
    rng = np.random.default_rng(seed)
    return rng.integers(-scale, scale, size=(dim, bits)).astype(np.int64)


def embedding_neardup_lsh_int(ds, dim: int, threshold: float = 0.35,
                              bits: int = 64, bands: int = 16, seed: int = 99,
                              id_column: str = "vec_id",
                              vec_column: str = "embedding",
                              num_buckets: int = 64):
    """Hyperplane LSH with integer sign arithmetic so a SQL oracle can
    recompute the exact candidate set: xq = floor(f64(x) * 2^20),
    bit_j = (sum_d xq_d * w_dj >= 0), band value = packed bit chunk.
    Verification is the same round-6 f64 cosine as the float path."""
    from osm_merge_ray.ops import grouped_reduce

    planes = int_planes(dim, bits, seed)
    rpb = bits // bands

    def code(t: pa.Table) -> pa.Table:
        m = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in t.column(vec_column).to_pylist()])
        xq = np.floor(m * QUANT).astype(np.int64)
        dots = xq @ planes  # exact int64
        sbits = (dots >= 0).astype(np.int64)  # (n, bits)
        codes = sbits.reshape(len(m), bands, rpb)
        pw = (np.int64(1) << np.arange(rpb, dtype=np.int64))
        bval = codes @ pw  # (n, bands)
        n = len(m)
        return pa.table({
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int64), n), pa.int64()),
            "band_val": pa.array(bval.reshape(-1), pa.int64()),
            id_column: pa.array(np.repeat(
                t.column(id_column).to_numpy(zero_copy_only=False), bands)),
        })

    def with_bucket(t: pa.Table) -> pa.Table:
        key = splitmix64(
            t.column("band_val").to_numpy().view(np.uint64)
            ^ splitmix64(t.column("band_id").to_numpy().view(np.uint64))
        )
        b = (key % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        key = splitmix64(
            df["band_val"].to_numpy().view(np.uint64)
            ^ splitmix64(df["band_id"].to_numpy().view(np.uint64))
        ).view(np.int64)
        ids = df[id_column].to_numpy()
        ia, ib = same_key_pairs(key, key)
        keep = ids[ia] < ids[ib]
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        ua, ub, _ = dedup_pairs(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": ua, "id_b": ub})

    cand = (
        ds.map_batches(code, batch_format="pyarrow")
        .map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cand_pairs, batch_format="pandas")
    )
    cand = grouped_reduce(cand, ["id_a", "id_b"],
                          lambda df: df.drop_duplicates(["id_a", "id_b"]))
    return fetch_and_score(cand, ds, threshold, id_column=id_column,
                           vec_column=vec_column, num_buckets=num_buckets)
