"""Polygon clipping kernels + the building-overlap join (J6)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.geo.polygons import (convex_clip, ensure_ccw,
                                        intersection_area, shoelace_area)
from osm_merge_ray.sources.geojson import features_to_table
from osm_merge_ray.stages.overlap import new_buildings, polygon_overlap_pairs


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


def test_clip_rectangles_exact():
    a = _rect(0, 0, 2, 2)
    b = _rect(1, 1, 3, 3)
    assert abs(intersection_area(a, b) - 1.0) < 1e-12
    assert intersection_area(a, _rect(5, 5, 6, 6)) == 0.0
    assert abs(intersection_area(a, a) - 4.0) < 1e-12
    # containment
    assert abs(intersection_area(a, _rect(0.5, 0.5, 1.5, 1.5)) - 1.0) < 1e-12


def test_clip_triangle_square():
    tri = np.array([[0, 0], [2, 0], [0, 2]], dtype=float)
    sq = _rect(0, 0, 1, 1)
    # intersection is the unit square minus the top-right half-triangle
    # above x+y=2 — fully inside here, so area = 1.0 - 0 = 1.0? No:
    # x+y<=2 everywhere on the unit square, so intersection = square.
    assert abs(intersection_area(tri, sq) - 1.0) < 1e-12
    # square [0.5,1.5]^2 clipped by x+y<=2 loses the corner triangle
    # with legs 1 → area 1 - 0.5 = 0.5
    sq2 = _rect(0.5, 0.5, 1.5, 1.5)
    assert abs(intersection_area(tri, sq2) - 0.5) < 1e-12
    # fully outside the hypotenuse → degenerate intersection
    assert intersection_area(tri, _rect(1.0, 1.0, 2.0, 2.0)) < 1e-12


def test_shoelace_and_ccw():
    r = _rect(0, 0, 3, 2)
    assert abs(shoelace_area(r) - 6.0) < 1e-12
    cw = r[::-1]
    assert shoelace_area(cw) == -6.0
    assert shoelace_area(ensure_ccw(cw)) == 6.0
    assert len(convex_clip(r, _rect(10, 10, 11, 11))) == 0


@pytest.fixture(scope="module")
def building_sets(ray_session):
    """30 primary footprints; secondaries: first 10 overlap (shifted by
    half a width), next 10 disjoint (far), last 10 missing."""
    rng = np.random.default_rng(5)
    prim, sec = [], []
    for i in range(30):
        lon = -106.0 + rng.uniform(0, 0.5)
        lat = 39.0 + rng.uniform(0, 0.5)
        w = 0.0002
        ring = [[lon, lat], [lon + w, lat], [lon + w, lat + w], [lon, lat + w]]
        prim.append({"geometry": {"type": "Polygon", "coordinates": ring},
                     "properties": {"building": "yes"}})
        if i < 10:
            ring2 = [[p[0] + w / 2, p[1] + w / 2] for p in ring]
            sec.append({"geometry": {"type": "Polygon", "coordinates": ring2},
                        "properties": {"building": "yes"}})
        elif i < 20:
            ring3 = [[p[0] + 0.1, p[1] + 0.1] for p in ring]
            sec.append({"geometry": {"type": "Polygon", "coordinates": ring3},
                        "properties": {"building": "yes"}})
    return features_to_table(prim), features_to_table(sec, start_id=1000)


def test_polygon_overlap_join_and_anti_join(building_sets):
    tp, ts = building_sets
    cfg = ConflationConfig(cell_res=12, num_buckets=8)
    pairs = polygon_overlap_pairs(rd.from_arrow(tp), rd.from_arrow(ts), cfg).to_pandas()
    # exactly the 10 planted overlaps, each with area ~ (w/2)^2
    assert sorted(pairs["id_a"]) == list(range(10))
    assert (pairs["id_b"] - pairs["id_a"] == 1000).all()
    assert np.allclose(pairs["overlap_area"], (0.0002 / 2) ** 2, rtol=1e-9)
    survivors = new_buildings(
        rd.from_arrow(tp), rd.from_arrow(pa.Table.from_pandas(pairs))
    ).to_pandas()
    assert sorted(survivors["feature_id"]) == list(range(10, 30))


def test_oversized_polygon_self_splits_exact_areas(ray_session):
    """r5: a convex polygon spanning ~3 degrees (the pre-r5 replicate
    RAISE path) now self-splits into grid pieces; per-pair overlap
    areas equal the direct whole-ring intersection_area because the
    pieces partition the ring."""
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    giant = np.c_[1.5 * np.cos(ang) - 105.0, 1.2 * np.sin(ang) + 39.0]
    prim = [{"geometry": {"type": "Polygon",
                          "coordinates": giant.tolist()},
             "properties": {"building": "yes"}}]
    # small probes: one near the giant's east edge (partial overlap),
    # one inside, one far outside
    probes, want = [], {}
    for k, (lon, lat) in enumerate([(-103.6, 39.0), (-105.0, 39.0),
                                    (-101.0, 45.0)]):
        w = 0.3
        ring = [[lon, lat], [lon + w, lat], [lon + w, lat + w],
                [lon, lat + w]]
        probes.append({"geometry": {"type": "Polygon",
                                    "coordinates": ring},
                       "properties": {"building": "yes"}})
        want[1000 + k] = intersection_area(
            giant, np.asarray(ring, dtype=np.float64))
    tp = features_to_table(prim)
    ts = features_to_table(probes, start_id=1000)
    cfg = ConflationConfig(cell_res=12, num_buckets=8)
    pairs = polygon_overlap_pairs(rd.from_arrow(tp), rd.from_arrow(ts),
                                  cfg).to_pandas()
    got = dict(zip(pairs["id_b"], pairs["overlap_area"]))
    for sid, area in want.items():
        if area > 1e-12:
            assert got[sid] == pytest.approx(area, rel=1e-9), sid
        else:
            assert sid not in got
    # and the reverse orientation: giant on the SECONDARY side
    pairs2 = polygon_overlap_pairs(rd.from_arrow(ts), rd.from_arrow(tp),
                                   cfg).to_pandas()
    got2 = dict(zip(pairs2["id_a"], pairs2["overlap_area"]))
    for sid, area in want.items():
        if area > 1e-12:
            assert got2[sid] == pytest.approx(area, rel=1e-9), sid


def test_polygon_split_path_equals_fast_path(building_sets):
    """Forcing every footprint through the split path (coarse grid =>
    tiny span limit) must reproduce the unsplit results exactly."""
    tp, ts = building_sets
    base = polygon_overlap_pairs(
        rd.from_arrow(tp), rd.from_arrow(ts),
        ConflationConfig(cell_res=12, num_buckets=8)).to_pandas()
    # cell_res 22: span_limit ~ 4 * 360/2^22 deg ~ 0.0003 deg < footprint
    # width * 2 -> every ring splits into multiple pieces
    forced = polygon_overlap_pairs(
        rd.from_arrow(tp), rd.from_arrow(ts),
        ConflationConfig(cell_res=22, num_buckets=8)).to_pandas()
    k = lambda d: d.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b, f = k(base), k(forced)
    assert b[["id_a", "id_b"]].equals(f[["id_a", "id_b"]])
    assert np.allclose(b["overlap_area"], f["overlap_area"], rtol=1e-9)


def test_split_polygon_span_properties_random():
    """Property sweep: pieces respect the span bound, areas sum to the
    whole, and piece-pair intersections with a random probe sum to the
    whole-pair intersection (the partition invariant overlap.py needs)."""
    from osm_merge_ray.geo.polygons import split_polygon_span

    rng = np.random.default_rng(7)
    for trial in range(30):
        k = int(rng.integers(3, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        if len(np.unique(np.round(ang, 6))) < 3:
            continue
        rx = float(rng.uniform(0.1, 3.0))
        ry = float(rng.uniform(0.1, 3.0))
        ring = np.c_[rx * np.cos(ang), ry * np.sin(ang)]  # convex
        lim = float(rng.uniform(0.2, 1.5))
        parts = split_polygon_span(ring, lim)
        whole = abs(shoelace_area(ring))
        assert sum(abs(shoelace_area(p)) for p in parts) == \
            pytest.approx(whole, rel=1e-9, abs=1e-12)
        for p in parts:
            assert p[:, 0].max() - p[:, 0].min() <= lim + 1e-9
            assert p[:, 1].max() - p[:, 1].min() <= lim + 1e-9
        probe = _rect(float(rng.uniform(-2, 0)), float(rng.uniform(-2, 0)),
                      float(rng.uniform(0, 2)), float(rng.uniform(0, 2)))
        direct = intersection_area(ring, probe)
        summed = sum(intersection_area(p, probe) for p in parts)
        assert summed == pytest.approx(direct, rel=1e-9, abs=1e-12)


def test_split_polygon_guards(ray_session):
    """r5 review: non-convex oversized rings and absurd piece counts
    RAISE (pre-r5 cover contract) instead of silently drifting areas
    or near-hanging; small non-convex rings pass through untouched."""
    from osm_merge_ray.geo.polygons import is_convex, split_polygon_span

    # L-shape, 3-degree bbox: non-convex AND oversized -> raise
    ell = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0],
                    [1.0, 3.0], [0.0, 3.0]])
    assert not is_convex(ell)
    with pytest.raises(ValueError, match="NON-convex"):
        split_polygon_span(ell, 0.35)
    # small non-convex ring: within span, passes through unchanged
    small_ell = ell * 0.01
    assert len(split_polygon_span(small_ell, 0.35)) == 1
    # corrupt world-spanning bbox at a fine span -> piece-count raise
    giant = np.array([[-180.0, -60.0], [180.0, -60.0], [180.0, 60.0],
                      [-180.0, 60.0]])
    with pytest.raises(ValueError, match="pieces"):
        split_polygon_span(giant, 0.01)
    # convex check sanity
    assert is_convex(np.array([[0, 0], [1, 0], [1, 1], [0, 1.0]]))


def test_chunk_plan_empty_block(ray_session):
    """r5 review: zero-row blocks (empty parquet partitions, sparse
    repartition) must not crash the chunk planner."""
    import pyarrow as pa

    from osm_merge_ray.text.chunking import chunk_plan

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c", "d e"], pa.string())})
    ds = rd.from_arrow(t).union(rd.from_arrow(t.slice(0, 0)))
    out = chunk_plan(ds, window=4, overlap=1).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]
