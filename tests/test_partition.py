"""Shared partition machinery (stages/partition.py): band-cover
replication factor, point equivalence with the flagship border band,
hot-cell refinement correctness, and the scale-path anti-join/Bloom
builds that replaced round-1 driver materializations."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.stages import partition as P
from osm_merge_ray.stages.conflate import border_band_targets


def test_bbox_band_targets_point_equals_border_band():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-120, -100, 500)
    lat = rng.uniform(35, 45, 500)
    res, d = 15, 7.0
    r1, c1 = border_band_targets(lon, lat, res, d)
    r2, c2 = P.bbox_band_targets(lon, lat, lon, lat, res, d)
    k1 = np.sort(r1 * (1 << 60) + c1)
    k2 = np.sort(r2 * (1 << 60) + c2)
    assert np.array_equal(k1, k2)


def test_band_cover_replication_factor_is_near_one():
    """The point of replacing blanket 9x k-ring: typical features small
    vs the cell edge replicate ~1x, not 9x."""
    rng = np.random.default_rng(5)
    n = 2000
    lon = rng.uniform(-106, -105.6, n)
    lat = rng.uniform(39, 39.4, n)
    ext = 0.0002  # ~20 m features at res 12 (~8.8 km edge)
    rows, cells = P.bbox_band_targets(lon, lat, lon + ext, lat + ext, 12, 7.0)
    factor = len(rows) / n
    assert factor < 1.2, factor  # was exactly 9.0 with k_ring


def test_band_cover_straddling_features_replicate():
    """A bbox crossing a cell boundary must land in both cells."""
    res = 12
    edge = 360.0 / (1 << res)
    x_edge = -180.0 + 1000 * edge  # a cell boundary longitude
    lon0 = np.array([x_edge - edge * 0.01])
    lon1 = np.array([x_edge + edge * 0.01])
    lat = np.array([10.0])
    rows, cells = P.bbox_band_targets(lon0, lat, lon1, lat, res, 0.0)
    assert len(np.unique(cells)) == 2


def test_lines_hot_cell_refinement_matches_unsalted(ray_session):
    """Planted dense cluster: every feature in ONE cell with a tiny hot
    threshold → the refined+salted run must produce identical decisions
    to the plain run."""
    import json

    from osm_merge_ray.stages.lines import conflate_lines

    rng = np.random.default_rng(11)
    n = 120
    prim_rows, sec_rows = [], []
    base_lon, base_lat = -105.95, 39.05  # one res-12 cell
    for i in range(n):
        lon = base_lon + rng.uniform(0, 0.003)
        lat = base_lat + rng.uniform(0, 0.003)
        coords = [[lon + k * 1e-4, lat] for k in range(5)]
        prim_rows.append({
            "feature_id": i, "geom_type": "LineString",
            "coords_json": json.dumps(coords),
            "props_json": json.dumps({"name": f"Road {i}", "ref": f"FR {i}"}),
        })
        off = 3.0 / 111194.9
        sec_rows.append({
            "feature_id": 10_000 + i, "geom_type": "LineString",
            "coords_json": json.dumps([[x, y + off] for x, y in coords]),
            "props_json": json.dumps({"name": f"Road {i}", "ref": f"FR {i}"}),
        })
    tp = pa.Table.from_pylist(prim_rows)
    ts = pa.Table.from_pylist(sec_rows)
    cfg = ConflationConfig(cell_res=12, num_buckets=8, hot_cell_rows=20)
    plain = conflate_lines(rd.from_arrow(tp), rd.from_arrow(ts),
                           ConflationConfig(cell_res=12, num_buckets=8),
                           skew_salting=False).to_pandas()
    salted = conflate_lines(rd.from_arrow(tp), rd.from_arrow(ts), cfg,
                            skew_salting=True).to_pandas()
    cols = ["feature_id", "matched_id", "decision", "hits"]
    a = plain[cols].sort_values("feature_id").reset_index(drop=True)
    b = salted[cols].sort_values("feature_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["decision"] == "merged").all()


def test_new_buildings_bucketed_anti_join_matches_broadcast(ray_session):
    from osm_merge_ray.stages.overlap import new_buildings

    prim = pa.table({"feature_id": pa.array(np.arange(50), pa.int64()),
                     "payload": pa.array([f"p{i}" for i in range(50)])})
    pairs = pa.table({"id_a": pa.array([3, 7, 7, 20, 41], pa.int64()),
                      "id_b": pa.array([1, 2, 3, 4, 5], pa.int64())})
    broad = new_buildings(rd.from_arrow(prim), rd.from_arrow(pairs)).to_pandas()
    antij = new_buildings(rd.from_arrow(prim), rd.from_arrow(pairs),
                          broadcast_limit=0).to_pandas()
    want = sorted(set(range(50)) - {3, 7, 20, 41})
    assert sorted(broad["feature_id"]) == want
    assert sorted(antij["feature_id"]) == want


def test_build_bloom_distributed_equals_local(ray_session):
    from osm_merge_ray.ops import BloomFilter, build_bloom_distributed
    from osm_merge_ray.util import hash64_str

    ids = [f"img_{i}" for i in range(5000)]
    t = pa.table({"image_id": pa.array(ids)})
    ds = rd.from_arrow(t).repartition(8)
    dist = build_bloom_distributed(
        ds, lambda b: hash64_str(b.column("image_id").to_pylist()),
        capacity=len(ids), fp_rate=1e-4)
    local = BloomFilter(capacity=len(ids), fp_rate=1e-4)
    local.add_hashes(hash64_str(ids))
    assert np.array_equal(dist.bits, local.bits)
    assert dist.contains_hashes(hash64_str(ids[:100])).all()
    misses = dist.contains_hashes(hash64_str([f"zz_{i}" for i in range(2000)]))
    assert misses.mean() < 0.01


def test_local_refined_pairs_dense_cluster(ray_session):
    """A dense sub-cell cluster must refine on the in-memory fine grid,
    not enumerate P*S pairs — and produce the same decisions as the
    unrefined path (tiny budget forces refinement)."""
    import json

    from osm_merge_ray.stages import partition as P
    from osm_merge_ray.stages.lines import conflate_lines

    rng = np.random.default_rng(3)
    n = 400
    prim_rows, sec_rows = [], []
    for i in range(n):
        lon = -105.0005 + rng.uniform(0, 0.001)   # ~100 m blob, one cell
        lat = 39.0005 + rng.uniform(0, 0.001)
        coords = [[lon + k * 1e-5, lat] for k in range(5)]
        prim_rows.append({"feature_id": i, "geom_type": "LineString",
                          "coords_json": json.dumps(coords),
                          "props_json": json.dumps({"name": f"R {i}", "ref": f"F {i}"})})
        off = 2.0 / 111194.9
        sec_rows.append({"feature_id": 10_000 + i, "geom_type": "LineString",
                         "coords_json": json.dumps([[x, y + off] for x, y in coords]),
                         "props_json": json.dumps({"name": f"R {i}", "ref": f"F {i}"})})
    tp, ts = pa.Table.from_pylist(prim_rows), pa.Table.from_pylist(sec_rows)
    cfg = ConflationConfig(cell_res=12, num_buckets=4, hot_cell_rows=50)
    base = conflate_lines(rd.from_arrow(tp), rd.from_arrow(ts), cfg).to_pandas()
    old_budget = P.local_refined_pairs.__defaults__
    try:
        # force the refinement path with a 1-pair budget
        P.local_refined_pairs.__defaults__ = (1,)
        refined = conflate_lines(rd.from_arrow(tp), rd.from_arrow(ts), cfg).to_pandas()
    finally:
        P.local_refined_pairs.__defaults__ = old_budget
    cols = ["feature_id", "matched_id", "decision", "hits"]
    a = base[cols].sort_values("feature_id").reset_index(drop=True)
    b = refined[cols].sort_values("feature_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["decision"] == "merged").all()


def test_lines_engine_matches_bruteforce_oracle(ray_session):
    """Engine line conflation ≡ a literal O(N*M) oracle over adversarial
    geometry: long lines spanning multiple cells, boundary straddlers,
    a dense cluster, short/degenerate lines — partitioning must be
    semantically invisible."""
    import json

    from osm_merge_ray.geo.distance import (
        batch_slope_angle_offset2, pack_polylines, polyline_min_dist_m)
    from osm_merge_ray.stages.lines import conflate_lines, score_tags

    rng = np.random.default_rng(17)
    cfg = ConflationConfig(cell_res=14, num_buckets=8, hot_cell_rows=40)
    edge = 360.0 / (1 << 14)  # ~2.4 km

    def rand_line(lon, lat, n, length_deg, bearing):
        step = length_deg / max(n - 1, 1)
        return [[lon + k * step * np.cos(bearing),
                 lat + k * step * np.sin(bearing)] for k in range(n)]

    prim_rows, sec_rows = [], []
    fid = 0
    for i in range(120):
        kind = i % 4
        if kind == 0:    # dense cluster (hot cell)
            lon = -105.001 + rng.uniform(0, 0.002)
            lat = 39.001 + rng.uniform(0, 0.002)
            length = 3e-4
        elif kind == 1:  # boundary straddler: start just west of a cell edge
            lon = -105.0 - edge * 0.1 + (i // 4) * edge
            lat = 39.3
            length = edge * 0.3
        elif kind == 2:  # LONG line spanning ~3 cells
            lon = -105.5 + rng.uniform(0, 0.3)
            lat = 39.5 + rng.uniform(0, 0.3)
            length = edge * 3.0
        else:            # scattered short
            lon = -106.5 + rng.uniform(0, 1.0)
            lat = 38.5 + rng.uniform(0, 1.0)
            length = 5e-4
        bearing = rng.uniform(0, np.pi)
        nv = int(rng.integers(2, 9))
        coords = rand_line(lon, lat, nv, length, bearing)
        name = f"Road {i}" if i % 3 else f"Trail {i}"
        prim_rows.append({"feature_id": fid, "geom_type": "LineString",
                          "coords_json": json.dumps(coords),
                          "props_json": json.dumps({"name": name, "ref": f"FR {i}"})})
        fid += 1
        if i % 5 != 4:  # most primaries get a nearby secondary
            off = rng.uniform(1.0, 6.0) / 111194.9
            nm = name if i % 7 else f"Other {i}"
            sec_rows.append({"feature_id": 10_000 + i, "geom_type": "LineString",
                             "coords_json": json.dumps(
                                 [[x, y + off] for x, y in coords]),
                             "props_json": json.dumps({"name": nm, "ref": f"FR {i}"})})
    tp = pa.Table.from_pylist(prim_rows)
    ts = pa.Table.from_pylist(sec_rows)

    # ---- literal O(N*M) oracle using the scalar kernels ----
    p_lines = [np.asarray(json.loads(r["coords_json"])).reshape(-1, 2)
               for r in prim_rows]
    s_lines = [np.asarray(json.loads(r["coords_json"])).reshape(-1, 2)
               for r in sec_rows]
    p_props = [json.loads(r["props_json"]) for r in prim_rows]
    s_props = [json.loads(r["props_json"]) for r in sec_rows]
    s_ids = np.array([r["feature_id"] for r in sec_rows])

    def slope_angle_1(la, lb):
        ax, ay, ln_a = pack_polylines([la])
        bx, by, ln_b = pack_polylines([lb])
        sl, an = batch_slope_angle_offset2(ax, ay, ln_a, bx, by, ln_b)
        return float(sl[0]), float(an[0])

    expected = {}
    for i in range(len(p_lines)):
        cands = []
        for j in range(len(s_lines)):
            d = polyline_min_dist_m(p_lines[i], s_lines[j])
            if d > cfg.distance_m:
                continue
            sl, an = slope_angle_1(p_lines[i], s_lines[j])
            hits, _ = score_tags(p_props[i], s_props[j], cfg)
            identical = d == 0.0 and sl == 0.0 and an == 0.0
            if hits == 0 and not identical and (
                    abs(an) > cfg.angle_max_deg or abs(sl) > cfg.slope_max):
                continue
            cands.append((hits, d, sl, an, j))
        cands.sort(key=lambda c: (c[1], s_ids[c[4]]))
        cands = cands[: cfg.max_candidates]
        if not cands:
            expected[i] = (-1, "new", 0)
            continue
        parallel = any(h == 1 and abs(an) < 15.0 and abs(sl) < 1.0
                       for h, d, sl, an, j in cands)
        best = max(cands, key=lambda c: (c[0], -c[1], -s_ids[c[4]]))
        h, d, sl, an, j = best
        dec = "parallel" if (parallel and h < cfg.min_hits_accept) else "merged"
        expected[i] = (int(s_ids[j]), dec, h)

    out = conflate_lines(rd.from_arrow(tp), rd.from_arrow(ts), cfg).to_pandas()
    out = out.set_index("feature_id")
    assert len(out) == len(p_lines)
    mism = []
    for i, (mid, dec, h) in expected.items():
        got = (int(out.loc[i, "matched_id"]), out.loc[i, "decision"],
               int(out.loc[i, "hits"]))
        if got != (mid, dec, h):
            mism.append((i, (mid, dec, h), got))
    assert not mism, mism[:10]


def test_douglas_peucker_properties(ray_session):
    """DP invariants: endpoints kept, deviation bound honored, straight
    collinear runs collapse, sharp corners survive."""
    import json

    import ray.data as rd

    from osm_merge_ray.geo.simplify import simplify_coords, simplify_lines

    # collinear with sub-tolerance jitter -> collapses to endpoints
    n = 50
    lon = -105.0 + np.arange(n) * 1e-4
    lat = np.full(n, 39.0)
    lat[1:-1] += 1e-7  # ~1 cm jitter
    line = np.column_stack([lon, lat])
    out = simplify_coords(line, tolerance_m=1.0)
    assert len(out) == 2 and (out[0] == line[0]).all() and (out[-1] == line[-1]).all()

    # an L-corner far beyond tolerance must survive
    corner = np.array([[-105.0, 39.0], [-104.99, 39.0], [-104.99, 39.01]])
    out = simplify_coords(corner, tolerance_m=5.0)
    assert len(out) == 3

    # deviation bound: every dropped vertex within tolerance of the
    # simplified line (checked in the same planar metric)
    rng = np.random.default_rng(3)
    wob = np.column_stack([
        -105.0 + np.cumsum(rng.random(60)) * 1e-4,
        39.0 + np.sin(np.arange(60) / 5.0) * 2e-5 + rng.random(60) * 5e-6,
    ])
    tol = 2.0
    simple = simplify_coords(wob, tol)
    from osm_merge_ray.geo.distance import point_segment_dist2
    lat0 = float(wob[:, 1].mean())
    kx = 111320.0 * float(np.cos(np.radians(lat0)))
    px, py = wob[:, 0] * kx, wob[:, 1] * 110540.0
    sx, sy = simple[:, 0] * kx, simple[:, 1] * 110540.0
    best = np.full(len(wob), np.inf)
    for i in range(len(simple) - 1):
        best = np.minimum(best, point_segment_dist2(
            px, py, sx[i], sy[i], sx[i + 1], sy[i + 1]))
    assert np.sqrt(best.max()) <= tol + 1e-9

    # dataset stage: counts ride along
    ds = rd.from_items([{"feature_id": 1,
                         "coords_json": json.dumps(line.tolist())}])
    got = simplify_lines(ds, tolerance_m=1.0).to_pandas()
    assert got.iloc[0]["n_points_in"] == 50 and got.iloc[0]["n_points_out"] == 2
