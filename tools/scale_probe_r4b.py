"""Scale probe for the r4 text additions (BASELINE.md).

Two shapes worth measuring beyond sf0.1:

* ``redact_pii`` at 2M docs — regex-heavy, shuffle-free map stage; the
  question is raw RE2 throughput when ~25% of docs carry planted PII
  (misses are the cheap path, so an all-clean corpus would flatter it).
* ``bigram_lm_scores`` at 500k docs — the heaviest new shape: one
  bigram explode (~11 rows/doc), two grouped_reduce count tables over
  an open-ish vocabulary, two corpus×corpus bucketed hash joins, one
  grouped per-doc sum.

    PYTHONPATH=/root/repo python tools/scale_probe_r4b.py [n_redact] [n_lm]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

WORDS = np.array([f"w{i:03d}" for i in range(500)])


def synth_docs(n: int, plant_pii: bool, blocks: int = 64):
    import pyarrow as pa
    import ray.data as rd

    from osm_merge_ray.util import splitmix64

    def make(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
        texts = []
        for i in ids.tolist():
            rng = splitmix64(np.arange(12, dtype=np.uint64)
                             + np.uint64(i) * np.uint64(2654435761))
            s = " ".join(WORDS[(rng % 500).astype(np.int64)])
            if plant_pii:
                if i % 4 == 0:
                    s += f" contact u{i}@example.com"
                if i % 8 == 1:
                    s += f" call 303-555-{i % 10000:04d}"
                if i % 8 == 5:
                    s += f" host 10.0.{i % 256}.{i % 254 + 1}"
            texts.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return rd.range(n, override_num_blocks=blocks).map_batches(
        make, batch_format="pyarrow")


def main() -> None:
    n_redact = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_lm = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    rd.DataContext.get_current().enable_operator_progress_bars = False

    from osm_merge_ray.text.lm_score import bigram_lm_scores
    from osm_merge_ray.text.redact import redact_pii

    # consume with an aggregate so nothing materializes driver-side
    t0 = time.time()
    n_pii = redact_pii(synth_docs(n_redact, plant_pii=True)) \
        .sum("n_pii")
    t_red = time.time() - t0
    print(f"redact_pii: {n_redact} docs in {t_red:.1f} s "
          f"({n_redact / t_red:,.0f} docs/s), planted hits {n_pii}")

    t0 = time.time()
    scored = bigram_lm_scores(synth_docs(n_lm, plant_pii=False))
    n_out = scored.count()
    t_lm = time.time() - t0
    print(f"bigram_lm_scores: {n_lm} docs in {t_lm:.1f} s "
          f"({n_lm / t_lm:,.0f} docs/s), {n_out} scored rows")

    ray.shutdown()


if __name__ == "__main__":
    main()
