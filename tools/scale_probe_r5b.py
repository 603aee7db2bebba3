"""Round-5 follow-up scale probes (recorded in BASELINE.md).

(a) exact-substring decontamination throughput at 2M docs (broadcast
    eval grams, one fused train map),
(b) oversized-polygon self-splitting: 100k-vs-100k footprint overlap
    join with and without 10 three-degree convex rings on the
    secondary side (the pre-r5 RAISE path),
(c) the 5x-scale flagship re-measure (500k rows/side incl. decode +
    tile write) against the r1 BASELINE row.

    PYTHONPATH=/root/repo python tools/scale_probe_r5b.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from scale_probe_r5 import synth_docs

    from osm_merge_ray.text.decontaminate import substring_contamination_report

    # --- (a) substring decontamination ------------------------------
    docs = synth_docs(n).materialize()
    evals = synth_docs(2000, blocks=4).materialize()  # same generator
    t0 = time.time()
    rep = substring_contamination_report(docs, evals,
                                         min_len=24).materialize()
    w = time.time() - t0
    print(f"substring_report n={n} eval=2000: {w:.1f}s = "
          f"{n / w:,.0f} docs/s, flagged={rep.count()}")

    # --- (b) polygon overlap with giants ----------------------------
    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.stages.overlap import polygon_overlap_pairs

    def footprints(m, start_id, off=0.0):
        rng = np.random.default_rng(11)
        lon = -106.0 + rng.uniform(0, 2.0, m)
        lat = 38.5 + rng.uniform(0, 2.0, m)
        wdt = 0.0002
        rows = []
        for i in range(m):
            ring = [[lon[i] + off, lat[i] + off],
                    [lon[i] + wdt + off, lat[i] + off],
                    [lon[i] + wdt + off, lat[i] + wdt + off],
                    [lon[i] + off, lat[i] + wdt + off]]
            rows.append(json.dumps(ring))
        return pa.table({
            "feature_id": pa.array(np.arange(m) + start_id, pa.int64()),
            "coords_json": pa.array(rows, pa.string())})

    m = min(n // 20, 100_000)
    tp = footprints(m, 0)
    ts = footprints(m, 1_000_000, off=0.0001)
    cfg = ConflationConfig(cell_res=12, num_buckets=64)
    t0 = time.time()
    base = polygon_overlap_pairs(rd.from_arrow(tp).repartition(32),
                                 rd.from_arrow(ts).repartition(32),
                                 cfg).materialize()
    t_fast = time.time() - t0
    print(f"polygon_overlap fast path {m} vs {m}: {t_fast:.1f}s, "
          f"pairs={base.count()}")
    ang = np.linspace(0, 2 * np.pi, 7)[:-1]
    giants = [json.dumps(np.c_[1.5 * np.cos(ang) - 105.0 + 0.01 * g,
                               1.2 * np.sin(ang) + 39.5].tolist())
              for g in range(10)]
    tg = pa.table({
        "feature_id": pa.array(np.arange(10) + 2_000_000, pa.int64()),
        "coords_json": pa.array(giants, pa.string())})
    t0 = time.time()
    split = polygon_overlap_pairs(
        rd.from_arrow(tp).repartition(32),
        rd.from_arrow(pa.concat_tables([ts, tg])).repartition(32),
        cfg).materialize()
    t_split = time.time() - t0
    print(f"polygon_overlap +10 giant rings: {t_split:.1f}s, "
          f"pairs={split.count()}")

    # --- (c) 5x flagship ---------------------------------------------
    import pyarrow.parquet as pq

    from osm_merge_ray.pipelines.conflation import conflate_parquet
    from osm_merge_ray.synth import synth_dataset

    n5 = min(n // 4, 500_000)
    data_dir = f"/tmp/graft_bench/n{n5}"
    for side in ("primary", "secondary"):
        d = f"{data_dir}/{side}"
        if not os.path.isdir(d) or not os.listdir(d):
            os.makedirs(d, exist_ok=True)
            synth_dataset(n5, side, with_bytes=True,
                          parallelism=64).write_parquet(d)
    rd.read_parquet(f"{data_dir}/primary").count()
    out = "/tmp/graft_bench/out_r5b"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    conflate_parquet(f"{data_dir}/primary", f"{data_dir}/secondary",
                     cfg=ConflationConfig(num_buckets=128),
                     decode_images=True, out_dir=out)
    w = time.time() - t0
    rows = pq.read_table(out, columns=["decision"]).num_rows
    print(f"flagship {n5}/side: {rows} rows in {w:.1f}s = "
          f"{rows / w:,.0f} rows/s")
    ray.shutdown()


if __name__ == "__main__":
    main()
