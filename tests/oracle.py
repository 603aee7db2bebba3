"""Brute-force conflation oracle: a literal O(N*M) reimplementation of
the decision semantics (conflator.py:86-330 restated in
stages/conflate.py's docstring), written independently of the engine's
vectorized/cell-sharded path — scalar loops, scalar fuzz, full pairwise
distances. Tests assert engine output == oracle output row for row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.geo.distance import haversine_m
from osm_merge_ray.stages.conflate import _ref_token
from osm_merge_ray.text.fuzz import indel_ratio


def _popcount(x: int) -> int:
    return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")


def conflate_oracle(primary: pd.DataFrame, secondary: pd.DataFrame,
                    cfg: ConflationConfig) -> pd.DataFrame:
    rows = []
    s_lon = secondary["lon"].to_numpy()
    s_lat = secondary["lat"].to_numpy()
    for _, p in primary.iterrows():
        d = haversine_m(p["lon"], p["lat"], s_lon, s_lat)
        cand = np.where(d <= cfg.distance_m)[0]
        # nearest max_candidates; exact-distance ties break by secondary
        # image_id (input-order independent), matching the engine's cap
        s_ids = secondary["image_id"].to_numpy()
        cand = cand[np.lexsort((s_ids[cand], d[cand]))][: cfg.max_candidates]
        best = None
        for j in cand:
            s = secondary.iloc[j]
            ratio = indel_ratio(p["caption"], s["caption"])
            cap_hit = ratio > cfg.fuzz_threshold and abs(len(p["caption"]) - len(s["caption"])) <= cfg.len_diff_max
            rp = _ref_token(np.array([p["caption"]], dtype=object))[0]
            rs = _ref_token(np.array([s["caption"]], dtype=object))[0]
            ref_hit = (not cap_hit) and rp != "" and rp == rs
            ham = _popcount(int(p["phash"]) ^ int(s["phash"]))
            ph_hit = ham <= cfg.phash_hamming_max
            hits = int(cap_hit) + int(ref_hit) + int(ph_hit)
            dist_mm = int(round(d[j] * 1000.0))
            key = (-hits, dist_mm, s["image_id"])
            if best is None or key < best[0]:
                best = (key, j, hits, dist_mm)
        if best is None:
            rows.append((p["image_id"], None, "new", 0, -1, p["caption"], None))
        else:
            _, j, hits, dist_mm = best
            s = secondary.iloc[j]
            dup = hits >= cfg.min_hits_accept and dist_mm <= cfg.dup_distance_m * 1000.0
            old = s["caption"] if s["caption"] != p["caption"] else None
            rows.append((
                p["image_id"], s["image_id"], "duplicate" if dup else "merged",
                hits, dist_mm, p["caption"], old,
            ))
    return pd.DataFrame(
        rows,
        columns=["image_id", "matched_id", "decision", "hits", "dist_mm", "caption", "old_caption"],
    )
