"""Scale probes for the round-3 operators (recorded in BASELINE.md).

Validates, at 20-1000x the bench scale, that the new ops hold their
design properties: the packing prefix scan stays exact and linear, the
Bloom-prefiltered incremental dedup ships almost nothing for a
dup-scarce batch, and capped winnow pair generation stays bounded on a
low-entropy corpus.

    PYTHONPATH=/root/repo python tools/scale_probe_r3.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

WORDS = np.array([f"w{i:03d}" for i in range(500)])


def synth_docs(n: int, blocks: int = 64, start: int = 0):
    """(doc_id, text) dataset: ~12-word docs from a 500-word vocab —
    low-entropy like web boilerplate, deterministic per id (``start``
    offsets the id range, and with it the text content)."""
    import pyarrow as pa
    import ray.data as rd

    from osm_merge_ray.util import splitmix64

    def make(batch):
        ids = batch["id"].to_numpy().astype(np.int64) + start
        texts = []
        for i in ids:
            rng = splitmix64(np.arange(12, dtype=np.uint64)
                             + np.uint64(i) * np.uint64(2654435761))
            texts.append(" ".join(WORDS[(rng % 500).astype(np.int64)]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return rd.range(n, override_num_blocks=blocks).map_batches(
        make, batch_format="pyarrow")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from osm_merge_ray.dedup.incremental import incremental_dedup
    from osm_merge_ray.dedup.winnow import winnow_pairs
    from osm_merge_ray.text.packing import pack_sequences

    docs = synth_docs(n).materialize()

    # --- packing prefix scan: exact at n docs -------------------------
    t0 = time.time()
    plan = pack_sequences(docs, max_len=2048).materialize()
    t_pack = time.time() - t0
    tot = plan.sum("n_tokens")
    mx = plan.max("start_tok")
    last = [r for r in plan.sort("start_tok", descending=True)
            .limit(1).take_all()][0]
    exact = (last["start_tok"] + last["n_tokens"] == tot)
    print(f"pack_sequences n={n}: {t_pack:.1f}s "
          f"({n / t_pack:,.0f} docs/s), total_tokens={tot}, "
          f"max_start={mx}, prefix_exact={exact}")

    # --- incremental dedup: corpus n, batch n/10 (1% true dups) ------
    corpus = docs
    k = n // 10
    batch = docs.limit(k // 100).union(
        synth_docs(k, blocks=16, start=10 * n)).materialize()
    t0 = time.time()
    flags = incremental_dedup(batch, corpus, corpus_rows=n).materialize()
    t_inc = time.time() - t0
    n_dup = flags.sum("is_dup")
    print(f"incremental_dedup corpus={n} batch={batch.count()}: "
          f"{t_inc:.1f}s, dups_flagged={n_dup} (expected {k // 100})")

    # --- SemDeDup production path: trained centroids at n/4 vectors --
    import pyarrow as pa

    from osm_merge_ray.sim.knn import train_centroids_distributed
    from osm_merge_ray.sim.semdedup import semantic_dedup_pairs
    from osm_merge_ray.util import splitmix64

    nv = min(n // 4, 500_000)

    def make_vecs(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
        # 16 latent archetypes + small deterministic noise; every 100th
        # vector is a planted near-clone of its predecessor
        base_id = np.where(ids % 100 == 99, ids - 1, ids)
        h = splitmix64(base_id.astype(np.uint64)[:, None] * np.uint64(97)
                       + np.arange(32, dtype=np.uint64)[None, :])
        arch = splitmix64((base_id % 16).astype(np.uint64)[:, None]
                          * np.uint64(131) + np.arange(32, dtype=np.uint64))
        v = (arch % 1000).astype(np.float64) + 0.4 * (h % 1000).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(list(v), pa.list_(pa.float64()))})

    vecs = rd.range(nv, override_num_blocks=64).map_batches(
        make_vecs, batch_format="pyarrow").materialize()
    t0 = time.time()
    cents = train_centroids_distributed(vecs, 64)
    t_train = time.time() - t0
    t0 = time.time()
    sd = semantic_dedup_pairs(vecs, cents, threshold=0.999).materialize()
    t_sd = time.time() - t0
    print(f"semdedup n={nv} k=64 trained: train {t_train:.1f}s, "
          f"pairs {t_sd:.1f}s ({nv / t_sd:,.0f} vecs/s), "
          f"pairs={sd.count()} (>= {nv // 100} planted clones)")

    # --- winnow with the MOSS df cap on a low-entropy corpus ---------
    wn = min(n // 10, 200_000)
    sub = docs.limit(wn).materialize()
    t0 = time.time()
    pairs = winnow_pairs(sub, threshold=0.2, max_df=50).materialize()
    t_win = time.time() - t0
    print(f"winnow_pairs n={wn} max_df=50: {t_win:.1f}s "
          f"({wn / t_win:,.0f} docs/s), pairs={pairs.count()}")

    ray.shutdown()


if __name__ == "__main__":
    main()
