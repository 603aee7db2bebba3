"""Scale probe for the round-4 curation composition (BASELINE.md).

The r3 probes validated curation's five stages individually; this one
runs the COMPOSED checkpointed pipeline (`run_curation_checkpointed`)
at 2M docs — including the r4 per-bucket survivor materialization —
and then measures the resume economics: after a simulated mid-stage
kill (a third of the survivor buckets deleted), the resume must redo
only the missing buckets and cost a small fraction of the fresh run.

    PYTHONPATH=/root/repo python tools/scale_probe_r4.py [n_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

WORDS = np.array([f"w{i:03d}" for i in range(500)])


def synth_train(n: int, blocks: int = 64):
    """(doc_id, text): ~12-word docs from a 500-word vocab; every
    id % 100 == 1 doc is an exact copy of id-1's text (planted 1%
    near-dup mass for the cluster/representative stages)."""
    import pyarrow as pa
    import ray.data as rd

    from osm_merge_ray.util import splitmix64

    def text_of(i: int) -> str:
        src = i - 1 if i % 100 == 1 else i
        rng = splitmix64(np.arange(12, dtype=np.uint64)
                         + np.uint64(src) * np.uint64(2654435761))
        return " ".join(WORDS[(rng % 500).astype(np.int64)])

    def make(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array([text_of(int(i)) for i in ids],
                                          pa.string())})

    return rd.range(n, override_num_blocks=blocks).map_batches(
        make, batch_format="pyarrow")


def synth_eval(n_train: int, k: int = 2000):
    """Eval set whose texts EQUAL train docs 0..k-1 (ids offset far
    away) — every matching train doc must be decontaminated out."""
    import pyarrow as pa
    import ray.data as rd

    from osm_merge_ray.util import splitmix64

    rows_id = np.arange(k, dtype=np.int64) + 10 * n_train
    texts = []
    for i in range(k):
        rng = splitmix64(np.arange(12, dtype=np.uint64)
                         + np.uint64(i) * np.uint64(2654435761))
        texts.append(" ".join(WORDS[(rng % 500).astype(np.int64)]))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(rows_id, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    rd.DataContext.get_current().enable_operator_progress_bars = False

    from osm_merge_ray.pipelines.curation import run_curation_checkpointed

    train = synth_train(n).materialize()
    evals = synth_eval(n).materialize()
    out = "/tmp/graft_probe_curate"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    m1 = run_curation_checkpointed(train, evals, out)
    t_fresh = time.time() - t0
    print(f"curate fresh n={n}: {t_fresh:.1f}s ({n / t_fresh:,.0f} docs/s), "
          f"survivors={m1['survivors']}, plan_rows={m1['plan_rows']}, "
          f"buckets={m1['buckets_done_now']}, load={os.getloadavg()[0]:.1f}")
    assert m1["plan_rows"] == m1["survivors"] > 0
    # planted structure must show up: ~1% dup mass + ~2k decontaminated
    assert m1["survivors"] < n

    # simulated mid-stage kill: drop a third of the survivor buckets
    import json

    buckets = sorted(d for d in os.listdir(f"{out}/survivors")
                     if d.startswith("bucket="))
    killed = buckets[: len(buckets) // 3]
    for d in killed:
        shutil.rmtree(f"{out}/survivors/{d}")
        os.remove(f"{out}/survivors/_manifest/{d}.json")
    man = json.load(open(f"{out}/_manifest/curation.json"))
    man["survivors_done"] = False
    json.dump(man, open(f"{out}/_manifest/curation.json", "w"))

    t0 = time.time()
    m2 = run_curation_checkpointed(train, evals, out)
    t_resume = time.time() - t0
    assert m2["stages_run"] == ["survivors", "plan"]
    assert m2["buckets_done_now"] == len(killed)
    assert m2["buckets_skipped"] == len(buckets) - len(killed)
    assert m2["survivors"] == m1["survivors"]
    assert m2["plan_rows"] == m1["plan_rows"]
    print(f"curate resume after losing {len(killed)}/{len(buckets)} buckets: "
          f"{t_resume:.1f}s ({100 * t_resume / t_fresh:.0f}% of fresh), "
          f"recomputed only the missing buckets")

    ray.shutdown()


if __name__ == "__main__":
    main()
