"""Pins for the round-2 ADVICE fixes: id-range-safe pair dedup, trimmed
bbox-cover routing in local refinement, loud truncated-GeoJSON failure,
k>64 IVF partials, and the index-rebuild path guard."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def test_dedup_pairs_handles_ids_beyond_2_31():
    from osm_merge_ray.ops import dedup_pairs, pack_pair

    big = np.array([1 << 33, (1 << 33) + 5, 1 << 33, 7], dtype=np.int64)
    other = np.array([2, 3, 2, (1 << 40) + 1], dtype=np.int64)
    ua, ub, first = dedup_pairs(big, other)
    got = set(zip(ua.tolist(), ub.tolist()))
    assert got == {(1 << 33, 2), ((1 << 33) + 5, 3), (7, (1 << 40) + 1)}
    assert len(first) == 3
    # lexicographic (a, b) order
    assert list(ua) == sorted(ua)
    # the packed variant now enforces its documented precondition
    with pytest.raises(ValueError):
        pack_pair(big, other)


def test_lsh_pair_dedup_correct_with_large_ids(ray_session):
    """End-to-end: simhash candidate pairs stay correct when doc ids
    exceed 2^31 (previously silently corrupted by 31-bit packing)."""
    from osm_merge_ray.dedup.simhash import simhash_pairs

    base = 1 << 33
    texts = ["alpha beta gamma delta epsilon"] * 3 + ["zz yy xx ww vv"]
    t = pa.table({
        "doc_id": pa.array([base + i for i in range(4)], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = simhash_pairs(rd.from_arrow(t), max_hamming=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert (base, base + 1) in got and (base, base + 2) in got
    assert all(a >= base and b >= base for a, b in got)


def test_local_refined_pairs_oversized_secondary_not_trimmed():
    """A secondary whose banded bbox cover exceeds the 64-cell/axis
    local cap must still pair with primaries near its FAR end (the
    clamp used to silently drop them)."""
    from osm_merge_ray.stages.partition import local_refined_pairs

    band = 50.0
    # ~20 km wide bbox at band resolution (~76 m cells) → cover ≫ 129
    # cells/axis; two primaries inside the band at opposite ends
    kp = np.zeros(2, dtype=np.int64)
    ks = np.zeros(1, dtype=np.int64)
    p_lon = np.array([-105.0, -104.82])
    p_lat = np.array([39.0, 39.0])
    s_x0 = np.array([-105.0])
    s_y0 = np.array([39.0])
    s_x1 = np.array([-104.82])
    s_y1 = np.array([39.0])
    pi, si = local_refined_pairs(kp, ks, p_lon, p_lat,
                                 s_x0, s_y0, s_x1, s_y1, band,
                                 pair_budget=1)
    got = set(zip(pi.tolist(), si.tolist()))
    assert got == {(0, 0), (1, 0)}


def test_parse_geojson_fragment_raises_on_truncation():
    from osm_merge_ray.sources.geojson import parse_geojson_fragment

    ok = (b'{"type": "Feature", "properties": {"a": 1}, '
          b'"geometry": {"type": "Point", "coordinates": [1.0, 2.0]}}')
    t = parse_geojson_fragment(ok + b", ", id0=0)
    assert t.num_rows == 1
    truncated = ok[:60]
    with pytest.raises(ValueError, match="overlap"):
        parse_geojson_fragment(truncated, id0=0)


def test_ivf_fixed_topk_k_above_batch_cap(ray_session):
    """k > 64 must not be silently truncated by the per-batch partial
    cap (previously a hardcoded 64)."""
    from osm_merge_ray.sim.knn import ivf_fixed_topk

    rng = np.random.default_rng(7)
    n, d, k = 120, 8, 70
    vecs = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs]),
    })
    q = vecs[:1]
    cents = vecs[:2]  # 2 lists, probe both → exhaustive
    out = ivf_fixed_topk(rd.from_arrow(t), q, np.array([0]), cents,
                         k=k, nprobe=2).to_pandas()
    assert len(out) == k
    sims = np.round(vecs @ q[0] / (np.linalg.norm(vecs, axis=1)
                                   * np.linalg.norm(q[0])), 6)
    sims[0] = -np.inf  # self excluded
    brute = set(np.argsort(-sims, kind="stable")[:k].tolist())
    assert set(out["neighbor_id"]) == brute


def test_ivf_build_index_refuses_foreign_dir(tmp_path):
    from osm_merge_ray.sim.knn import ivf_build_index

    d = tmp_path / "not_an_index"
    d.mkdir()
    (d / "precious.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing"):
        ivf_build_index(None, str(d))
    assert (d / "precious.txt").exists()
