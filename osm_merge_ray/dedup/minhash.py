"""MinHash + LSH near-duplicate detection (Broder 1997; banding per
Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3).

Pipeline shape (all Ray-Data-native, one shuffle on band buckets):

1. ``map_batches``: word-shingle each doc, hash shingles (splitmix64 of
   FNV), ``num_perm`` minhashes via the universal-hash trick
   ``h_i(x) = splitmix64(x ^ seed_i)`` (vectorized: one (n_shingle,
   num_perm) min-reduce per doc), fold into ``bands`` rows
   ``(band_id, band_hash, doc_id)``.
2. ``groupby(band_id, band_hash)``: docs sharing any band bucket are
   candidate pairs (emitted per group, smallest-id-first).
3. verify: exact shingle-set Jaccard >= threshold (recompute shingles
   from the pair's texts — regenerated, not shipped).

At 10^12 scale step 3 joins back to text by doc_id fragment-locally;
here docs are small enough to carry the shingle hashes through.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.util import splitmix64

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of word k-grams."""
    words = text.split(" ")
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = _FNV_OFFSET
        with np.errstate(over="ignore"):
            for b in g.encode("utf-8"):
                h = (h ^ np.uint64(b)) * _FNV_PRIME
        out[i] = h
    return np.unique(out)


class MinHasher:
    """Actor-pool stage: seeds prepared once; emits one row per band."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 id_column: str = "doc_id", text_column: str = "text"):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.id_column = id_column
        self.text_column = text_column
        self.seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    def signatures_batch(self, texts) -> np.ndarray:
        """Vectorized (n_docs, num_perm) signatures for a whole batch:
        word-level batched FNV, window-combined gram hashes across doc
        boundaries, per-doc minima via ``np.minimum.reduceat`` — no
        per-doc Python in the hot path."""
        from osm_merge_ray.util import fnv1a_batch

        n = len(texts)
        words_per_doc: list[list[str]] = [(t or "").split(" ") for t in texts]
        counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=n)
        all_words = [w for ws in words_per_doc for w in ws]
        wh = fnv1a_batch(all_words)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        k = self.k
        # gram hash = mix over a k-window of word hashes, valid when the
        # window stays inside one doc; docs shorter than k use their
        # full (shorter) window
        if len(wh) >= k:
            g = wh[: len(wh) - k + 1].copy()
            with np.errstate(over="ignore"):
                for j in range(1, k):
                    g = splitmix64(g) ^ wh[j: len(wh) - k + 1 + j]
                g = splitmix64(g)
            valid = doc_of[: len(wh) - k + 1] == doc_of[k - 1:]
        else:
            g = np.empty(0, dtype=np.uint64)
            valid = np.empty(0, dtype=bool)
        gram_doc = doc_of[: len(g)][valid]
        g = g[valid]
        # short docs (< k words): single gram over the whole doc
        short = np.flatnonzero(counts < k)
        if len(short):
            texts_short = [" ".join(words_per_doc[i]) for i in short]
            g_extra = splitmix64(fnv1a_batch(texts_short))
            g = np.concatenate([g, g_extra])
            gram_doc = np.concatenate([gram_doc, short])
            order = np.argsort(gram_doc, kind="stable")
            g, gram_doc = g[order], gram_doc[order]
        sigs = np.full((n, self.num_perm), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        if len(g):
            m = splitmix64(g[:, None] ^ self.seeds[None, :])  # (G, num_perm)
            present, starts = np.unique(gram_doc, return_index=True)
            mins = np.minimum.reduceat(m, starts, axis=0)
            sigs[present] = mins
        sigs[counts == 0] = 0
        return sigs

    def signature(self, text: str) -> np.ndarray:  # kept for tests/tools
        return self.signatures_batch([text])[0]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_column).to_numpy(zero_copy_only=False)
        texts = t.column(self.text_column).to_pylist()
        sigs = self.signatures_batch(texts)  # (n, num_perm)
        folded = sigs.reshape(len(texts), self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = folded[:, :, 0].copy()
            for j in range(1, self.rows_per_band):
                bh = splitmix64(bh ^ folded[:, :, j])
        n = len(texts)
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64), pa.int64()),
                self.id_column: pa.array(np.repeat(ids, self.bands)),
            }
        )


def _bucket_pairs(df: pd.DataFrame, id_column: str) -> pd.DataFrame:
    """Vectorized pair emission for one hash bucket of band rows:
    same-(band_id, band_hash) pairs, deduped within the bucket."""
    from osm_merge_ray.ops import dedup_pairs, same_key_pairs

    key = splitmix64(
        df["band_hash"].to_numpy().view(np.uint64)
        ^ splitmix64(df["band_id"].to_numpy().astype(np.uint64))
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


def minhash_lsh_pairs(ds, num_perm: int = 64, bands: int = 16, k: int = 3,
                      id_column: str = "doc_id", text_column: str = "text",
                      num_buckets: int = 64):
    """Candidate pairs from LSH band buckets (distinct, sorted).

    One shuffle keyed by hash(band_id, band_hash) folded into
    ``num_buckets`` groups; pair dedup across buckets is a bucketed
    drop_duplicates combine (ops.grouped_reduce)."""
    from osm_merge_ray.ops import grouped_reduce

    # task mode (callable instance, not an actor pool): signature
    # computation is fully vectorized so there is no per-actor state to
    # amortize, and stateless tasks FUSE with the upstream read —
    # an actor pool here would cost its spin-up and break fusion
    banded = ds.map_batches(
        MinHasher(num_perm=num_perm, bands=bands, k=k,
                  id_column=id_column, text_column=text_column),
        batch_format="pyarrow",
        batch_size=1024,
    )

    def with_bucket(t: pa.Table) -> pa.Table:
        key = splitmix64(
            t.column("band_hash").to_numpy().view(np.uint64)
            ^ splitmix64(t.column("band_id").to_numpy().astype(np.uint64))
        )
        b = (key % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    pairs = (
        banded.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: _bucket_pairs(df, id_column), batch_format="pandas")
    )
    return grouped_reduce(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
    )


def verify_jaccard(pairs_df: pd.DataFrame, texts: dict, k: int = 3,
                   threshold: float = 0.5) -> pd.DataFrame:
    """Exact shingle Jaccard for candidate pairs (driver/test helper)."""
    keep = []
    jac = []
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa = shingle_hashes(texts[a], k)
        sb = shingle_hashes(texts[b], k)
        inter = len(np.intersect1d(sa, sb))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        jac.append(j)
        keep.append(j >= threshold)
    out = pairs_df.copy()
    out["jaccard"] = jac
    out["is_dup"] = keep
    return out


def verify_jaccard_distributed(pairs_ds, docs_ds, k: int = 3,
                               threshold: float = 0.5,
                               id_column: str = "doc_id",
                               text_column: str = "text",
                               num_buckets: int = 64):
    """Exact shingle-Jaccard verify at scale: candidate pairs fetch
    their texts back via bucketed hash joins (texts move only for
    candidate ids, never all-to-all), then the exact word-k-gram
    Jaccard is computed per surviving pair. This replaces the
    driver-side ``verify_jaccard`` texts-dict helper for corpora that
    don't fit one machine (VERDICT r1)."""
    from osm_merge_ray.ops import bucketed_hash_join

    def side(name):
        def proj(t: pa.Table) -> pa.Table:
            return pa.table({name: t.column(id_column),
                             f"text_{name[-1]}": t.column(text_column)})
        return proj

    with_a = bucketed_hash_join(
        pairs_ds, docs_ds.map_batches(side("id_a"), batch_format="pyarrow"),
        key="id_a", num_buckets=num_buckets)
    with_ab = bucketed_hash_join(
        with_a, docs_ds.map_batches(side("id_b"), batch_format="pyarrow"),
        key="id_b", num_buckets=num_buckets)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(df), dtype=np.float64)
        for i, (ta, tb) in enumerate(zip(df["text_a"], df["text_b"])):
            sa = shingle_hashes(ta or "", k)
            sb = shingle_hashes(tb or "", k)
            inter = len(np.intersect1d(sa, sb))
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 1.0
        ok = jac >= threshold
        return pd.DataFrame({
            "id_a": df["id_a"].to_numpy()[ok].astype(np.int64),
            "id_b": df["id_b"].to_numpy()[ok].astype(np.int64),
            "jaccard": jac[ok],
        })

    return with_ab.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# SQL-mirrorable variant (poly41 char-grams + affine permutations)
# ---------------------------------------------------------------------------

def minhash_poly_perms(num_perm: int = 32, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants h_i(x) = (a*x+b) % M
    with a < 2^20 so a*x + b stays < 2^62 — exact in int64 AND in a
    DuckDB BIGINT expression (the constants are inlined into the
    oracle SQL)."""
    from osm_merge_ray.util import POLY41_MOD

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 20, size=num_perm)
    b = rng.integers(0, POLY41_MOD, size=num_perm)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def minhash_pairs_poly(ds, num_perm: int = 32, bands: int = 8, k: int = 8,
                       id_column: str = "doc_id", text_column: str = "text",
                       num_buckets: int = 64, seed: int = 7):
    """MinHash-LSH candidate pairs with every ingredient SQL-mirrorable
    (DuckDB recomputes the identical pair set bit-for-bit): poly41
    char-k-gram hashes, affine perms, band key = comma-joined minima.
    Docs shorter than k chars emit no bands (no grams → no signature).
    The FNV/splitmix ``minhash_lsh_pairs`` stays the scale default."""
    from osm_merge_ray.ops import grouped_reduce
    from osm_merge_ray.util import POLY41_MOD, poly41_grams

    perms = minhash_poly_perms(num_perm, seed)
    a_arr = np.array([p[0] for p in perms], dtype=np.int64)
    b_arr = np.array([p[1] for p in perms], dtype=np.int64)
    rpb = num_perm // bands
    mod = np.int64(POLY41_MOD)

    def band_rows(t: pa.Table) -> pa.Table:
        ids_out, band_out, key_out = [], [], []
        for did, s in zip(t.column(id_column).to_pylist(),
                          t.column(text_column).to_pylist()):
            g = poly41_grams(s or "", k)
            if len(g) == 0:
                continue
            sig = ((g[:, None] * a_arr[None, :] + b_arr[None, :]) % mod).min(axis=0)
            for bd in range(bands):
                ids_out.append(did)
                band_out.append(bd)
                key_out.append(",".join(str(v) for v in sig[bd * rpb:(bd + 1) * rpb]))
        return pa.table({
            id_column: pa.array(ids_out, pa.int64()),
            "band_id": pa.array(band_out, pa.int64()),
            "bkey": pa.array(key_out, pa.string()),
        })

    def with_bucket(t: pa.Table) -> pa.Table:
        from osm_merge_ray.util import hash64_str

        key = splitmix64(
            hash64_str(t.column("bkey").to_pylist())
            ^ splitmix64(t.column("band_id").to_numpy().astype(np.uint64))
        )
        b = (key % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        from osm_merge_ray.util import hash64_str as h64

        keys = splitmix64(
            h64(df["bkey"].tolist())
            ^ splitmix64(df["band_id"].to_numpy().astype(np.uint64))
        ).view(np.int64)
        ids = df[id_column].to_numpy()
        bkeys = df["bkey"].to_numpy()
        from osm_merge_ray.ops import dedup_pairs, same_key_pairs

        ia, ib = same_key_pairs(keys, keys)
        # guard against 64-bit mix collisions with the exact key
        keep = (ids[ia] < ids[ib]) & (bkeys[ia] == bkeys[ib])
        ia, ib = ia[keep], ib[keep]
        ua, ub, _ = dedup_pairs(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": ua, "id_b": ub})

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return grouped_reduce(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
    )
