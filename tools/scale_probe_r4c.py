"""Scale probe for quota_sample (BASELINE.md).

2M rows x 10k groups, k=16: the per-block partial must prune each
block to <= groups-in-block * k light rows before the shuffle, so the
grouped final sees ~num_blocks * k rows per group worst-case, never
the corpus. Checks exact per-group counts on a planted small group.

    PYTHONPATH=/root/repo python tools/scale_probe_r4c.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_groups, k = 10_000, 16

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
             include_dashboard=False, logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from osm_merge_ray.sampling import quota_sample

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        # group 0 is planted tiny (only ids < 5); the rest are uniform
        g = np.where(ids < 5, 0, 1 + ids % np.int64(n_groups - 1))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array([f"g{v}" for v in g.tolist()]),
        })

    ds = rd.range(n, override_num_blocks=64).map_batches(
        lambda b: make(pa.table({"id": b["id"]})), batch_format="pyarrow")

    t0 = time.time()
    out = quota_sample(ds, "source", k=k, id_column="doc_id")
    counts = out.groupby("source").count().to_pandas()
    wall = time.time() - t0
    assert int(counts.loc[counts["source"] == "g0", "count()"].iloc[0]) == 5
    assert int(counts["count()"].max()) == k
    n_kept = int(counts["count()"].sum())
    print(f"quota_sample n={n} groups={n_groups} k={k}: "
          f"{wall:.1f} s, kept {n_kept} rows "
          f"({n / wall / 1e6:.2f} M rows/s in)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
