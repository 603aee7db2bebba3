"""Scale probes for the round-5 operators (recorded in BASELINE.md).

Validates at 20-1000x the bench scale that (a) distributed BPE
merge-training stays vocabulary-bounded — per-round transfer is
<= num_buckets candidate rows regardless of corpus size, (b)
table_profile's fixed-size per-batch partials hold at 2M rows, and
(c) the grouped-distinct sketch's opt-in exact pass is the
corpus-cardinality cost the r4 verdict flagged (sketch-only vs
include_exact A/B).

    PYTHONPATH=/root/repo python tools/scale_probe_r5.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

WORDS = np.array([f"w{i:03d}" for i in range(500)])


def synth_docs(n: int, blocks: int = 64):
    import pyarrow as pa
    import ray.data as rd

    from osm_merge_ray.util import splitmix64

    def make(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
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
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from osm_merge_ray.profile import profile_table
    from osm_merge_ray.sketch import grouped_distinct_sketch
    from osm_merge_ray.text.bpe import train_bpe_distributed

    docs = synth_docs(n).materialize()

    # --- distributed BPE training: corpus-size-independent rounds ----
    t0 = time.time()
    merges = train_bpe_distributed(docs, n_merges=10, num_buckets=64)
    t_bpe = time.time() - t0
    print(f"bpe_train n={n} k=10 (local rounds): {t_bpe:.1f}s "
          f"({n / t_bpe:,.0f} docs/s), merges={len(merges)}, "
          f"top=({merges.iloc[0]['a']!r},{merges.iloc[0]['b']!r}) "
          f"x{merges.iloc[0]['pair_count']}")
    t0 = time.time()
    m2 = train_bpe_distributed(docs, n_merges=10, num_buckets=64,
                               driver_max_words=0)  # force distributed
    t_bpe2 = time.time() - t0
    assert m2.equals(merges)
    print(f"bpe_train n={n} k=10 (distributed rounds): {t_bpe2:.1f}s "
          f"({n / t_bpe2:,.0f} docs/s), identical table")

    # --- table_profile at 2M rows -------------------------------------
    t0 = time.time()
    prof = profile_table(docs).to_pandas()
    t_prof = time.time() - t0
    print(f"table_profile n={n}: {t_prof:.1f}s ({n / t_prof:,.0f} rows/s), "
          f"cols={len(prof)}")

    # --- grouped distinct: sketch-only vs exact companion A/B --------
    def make_ev(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
        return pa.table({
            "event_type": pa.array((ids % 20).astype(np.int64)),
            # high-cardinality keys: the exact pass must ship ~n rows
            "user_id": pa.array(ids * 7 % (n // 2), pa.int64()),
        })

    ev = rd.range(n, override_num_blocks=64).map_batches(
        make_ev, batch_format="pyarrow").materialize()
    t0 = time.time()
    sk = grouped_distinct_sketch(ev, "event_type", "user_id", k=64)
    t_sk = time.time() - t0
    t0 = time.time()
    ex = grouped_distinct_sketch(ev, "event_type", "user_id", k=64,
                                 include_exact=True)
    t_ex = time.time() - t0
    err = float(np.abs(sk["est_distinct"].to_numpy()
                       / np.maximum(ex["n_distinct"].to_numpy(), 1)
                       - 1.0).max())
    print(f"grouped_distinct n={n} groups=20: sketch-only {t_sk:.1f}s "
          f"({n / t_sk:,.0f} rows/s) vs +exact {t_ex:.1f}s "
          f"({t_ex / t_sk:.1f}x), max est err {err:.3f}")

    ray.shutdown()


if __name__ == "__main__":
    main()
