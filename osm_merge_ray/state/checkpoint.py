"""Per-partition checkpoint manifest → kill-and-resume without recompute.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics". The reference has no checkpointing at all (a failed
``conflateData`` rerun restarts from zero; its only idempotence is the
file-tree fan-out of contrib/update.sh). Engine design:

* work is partitioned by shuffle **bucket** (hash of (cell, salt) —
  stages/conflate.py); each bucket's decision rows are written to
  ``out_dir/bucket=<b>/part-*.parquet`` ATOMICALLY (tmp dir + rename);
* alongside, ``out_dir/_manifest/bucket=<b>.json`` records lineage
  (bucket id, distinct cells, row count, input row count) + metrics
  (wall seconds) — written only after the data rename succeeds;
* resume = read the manifest dir, broadcast the finished-bucket set,
  and filter those buckets out of the shuffle input before the
  groupby: finished cells are never rescored.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def config_fingerprint(cfg) -> str:
    """Stable hash of the full ConflationConfig: bucket manifests are
    only valid under the partitioning/threshold config that wrote them."""
    import hashlib
    from dataclasses import asdict

    payload = json.dumps(asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def check_run_manifest(out_dir: str, cfg, input_rows: int | None = None) -> None:
    """Write (first run) or validate (resume) the run-level manifest.

    A resume against an out_dir produced under a DIFFERENT config
    (num_buckets, cell_res, thresholds...) or different INPUT would
    silently skip buckets computed under incompatible partitioning and
    emit mixed, corrupt output — refuse instead. ``input_rows`` (total
    light rows, both sides) is the cheap input fingerprint.
    """
    fp = config_fingerprint(cfg)
    path = os.path.join(manifest_dir(out_dir), "run.json")
    if os.path.exists(path):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (json.JSONDecodeError, OSError):
            rec = {}
        prior = rec.get("config_fingerprint")
        if prior is not None and prior != fp:
            raise ValueError(
                f"checkpoint dir {out_dir!r} was written under a different "
                f"ConflationConfig (fingerprint {prior} != {fp}); its bucket "
                "partitioning is incompatible with this run — use a fresh "
                "out_dir or delete the old one"
            )
        prior_rows = rec.get("input_rows")
        if (input_rows is not None and prior_rows is not None
                and prior_rows != input_rows):
            raise ValueError(
                f"checkpoint dir {out_dir!r} was written for a different "
                f"input ({prior_rows} rows != {input_rows}); finished buckets "
                "would not cover this input — use a fresh out_dir"
            )
        return
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"config_fingerprint": fp, "input_rows": input_rows,
                   "ts": time.time()}, fh)
    os.replace(tmp, path)


def finished_buckets(out_dir: str) -> set[int]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.startswith("bucket=") and f.endswith(".json"):
            try:
                with open(os.path.join(d, f)) as fh:
                    out.add(int(json.load(fh)["bucket"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn write → bucket not finished
    return out


def write_bucket_partition(out_dir: str, bucket: int, table: pa.Table,
                           input_rows: int, wall_s: float, cells: list[int],
                           frags: list[int] | None = None) -> None:
    """Atomic partition write + manifest record (idempotent per bucket).
    ``frags`` (optional): distinct input-fragment lineage ids that fed
    this bucket — resolvable to file paths via the run-level
    ``fragments.json`` map, so a selective re-ingest can invalidate
    exactly the buckets a changed input file touched."""
    part_dir = os.path.join(out_dir, f"bucket={bucket}")
    tmp_dir = part_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(table, os.path.join(tmp_dir, "part-0.parquet"))
    if os.path.isdir(part_dir):  # stale partial from a killed run
        import shutil

        shutil.rmtree(part_dir)
    os.rename(tmp_dir, part_dir)
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    rec = {
        "bucket": int(bucket),
        "rows": table.num_rows,
        "input_rows": int(input_rows),
        "n_cells": len(cells),
        "cell_min": min(cells) if cells else None,
        "cell_max": max(cells) if cells else None,
        "wall_s": round(wall_s, 4),
        "ts": time.time(),
    }
    if frags is not None:
        rec["input_fragments"] = sorted(int(f) for f in frags)
    tmp = os.path.join(manifest_dir(out_dir), f".bucket={bucket}.json.tmp")
    dst = os.path.join(manifest_dir(out_dir), f"bucket={bucket}.json")
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, dst)


def read_output(out_dir: str) -> pa.Table:
    """Read back all finished partitions (driver-side, for tests)."""
    parts = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("bucket=") and not d.endswith(".tmp"):
            for f in sorted(os.listdir(os.path.join(out_dir, d))):
                if f.endswith(".parquet"):
                    parts.append(pq.read_table(os.path.join(out_dir, d, f)))
    return pa.concat_tables(parts) if parts else pa.table({})
