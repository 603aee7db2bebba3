"""Unit tests for the numpy kernels: fuzz, cells, strtree, distance, image."""

import numpy as np
import pytest

from osm_merge_ray.geo import cells as C
from osm_merge_ray.geo.distance import haversine_m, polyline_min_dist_m, slope_angle
from osm_merge_ray.geo.strtree import STRtree, point_in_polygon
from osm_merge_ray.image.codec import decode, encode, psnr, resize_box, synth_pixels
from osm_merge_ray.image.phash import hamming64, phash64
from osm_merge_ray.text import fuzz as F


def _lcs_ref(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1] else max(dp[i - 1][j], dp[i][j - 1])
    return dp[-1][-1]


def test_fuzz_against_independent_dp():
    import random

    random.seed(7)
    words = "forest road creek trail loop ridge fs fr 123 505.1A x".split()
    pairs = [
        (" ".join(random.choices(words, k=random.randint(0, 6))),
         " ".join(random.choices(words, k=random.randint(0, 6))))
        for _ in range(200)
    ] + [("", ""), ("a", ""), ("", "a"), ("same", "same")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    bl = F.batch_levenshtein(a, b)
    bi = F.batch_indel_ratio(a, b)
    br = F.batch_lev_ratio(a, b)
    for (x, y), dl, ri, rl in zip(pairs, bl, bi, br):
        assert F.levenshtein(x, y) == dl
        ind = len(x) + len(y) - 2 * _lcs_ref(x, y)
        assert F.indel_distance(x, y) == ind
        exp = 100.0 if not (x or y) else 100 * (1 - ind / (len(x) + len(y)))
        assert abs(ri - exp) < 1e-9
        assert abs(F.lev_ratio(x, y) - rl) < 1e-9


def test_fuzz_reference_thresholds():
    # the conflator.py:596-598 rule: typo'd caption matches, unrelated doesn't
    assert F.indel_ratio("Badger Maple Loop Road", "Badgxr Maple Loop Road") > 85
    assert F.indel_ratio("Badger Maple Loop Road", "Crystal Elk Trail") < 85
    assert F.token_set_ratio("Loop Road Badger Maple", "Badger Maple Loop Road") == 100.0


def test_cells_roundtrip_and_kring():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-179.9, 179.9, 2000)
    lat = rng.uniform(-89.0, 89.0, 2000)
    res = 12
    c = C.lonlat_to_cell(lon, lat, res)
    clon, clat = C.cell_center(c)
    s = C.cell_edge_deg(res)
    assert np.all(np.abs(clon - lon) <= s)
    assert np.all(np.abs(clat - lat) <= s)
    # k-ring completeness: a point d meters away (d < cell edge) is always
    # in the k-ring(1) of the home cell
    res = C.res_for_distance(7.0)
    lon0, lat0 = -106.5, 39.5
    home = C.lonlat_to_cell(np.array([lon0]), np.array([lat0]), res)
    ring = set(C.k_ring(home)[0].tolist())
    for ang in np.linspace(0, 2 * np.pi, 33):
        d = 6.9
        lat1 = lat0 + d * np.cos(ang) / 111194.92664455873
        lon1 = lon0 + d * np.sin(ang) / (111320.0 * np.cos(np.radians(lat0)))
        c1 = int(C.lonlat_to_cell(np.array([lon1]), np.array([lat1]), res)[0])
        assert c1 in ring


def test_cells_parent_and_bucket():
    c = C.lonlat_to_cell(np.array([-106.0]), np.array([39.0]), 15)
    p = C.parent(c, 10)
    _, _, res = C.cell_to_xy(p)
    assert int(res[0]) == 10
    b = C.bucket_of(c, 64)
    assert 0 <= int(b[0]) < 64


def test_strtree_matches_brute_force():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 100, (5000, 2))
    t = STRtree(np.c_[pts, pts])
    for _ in range(20):
        x0, y0 = rng.uniform(0, 90, 2)
        q = t.query(x0, y0, x0 + 7, y0 + 7)
        brute = np.where(
            (pts[:, 0] >= x0) & (pts[:, 0] <= x0 + 7) & (pts[:, 1] >= y0) & (pts[:, 1] <= y0 + 7)
        )[0]
        assert set(q.tolist()) == set(brute.tolist())
    kn = t.knn(50, 50, 25)
    d = ((pts - 50) ** 2).sum(1)
    assert np.allclose(np.sort(d[kn]), np.sort(d)[:25])


def test_point_in_polygon():
    poly = np.array([[0, 0], [4, 0], [4, 4], [2, 6], [0, 4]], dtype=float)
    px = np.array([2.0, 2.0, 5.0, -0.1, 2.0])
    py = np.array([2.0, 5.0, 2.0, 2.0, 6.5])
    assert point_in_polygon(px, py, poly).tolist() == [True, True, False, False, False]


def test_haversine_known_value():
    # one degree of latitude ~ 111.19 km on the sphere
    d = float(haversine_m(-105.0, 40.0, -105.0, 41.0))
    assert abs(d - 111194.9) < 20


def test_polyline_distance_and_slope():
    la = np.array([[-105.0, 40.0], [-105.0, 40.01]])
    lb = np.array([[-105.0001, 40.0], [-105.0001, 40.01]])
    d = polyline_min_dist_m(la, lb)
    assert abs(d - 8.52) < 0.1
    # identical geometry → slope 0 / angle 0 (conflator.py:403-405)
    s, a = slope_angle(np.array([[0.0, 0]]), np.array([[1.0, 1]]),
                       np.array([[0.0, 0]]), np.array([[1.0, 1]]))
    assert s[0] == 0 and a[0] == 0
    s, a = slope_angle(np.array([[0.0, 0]]), np.array([[1.0, 0]]),
                       np.array([[0.0, 0]]), np.array([[1.0, 1]]))
    assert abs(a[0] - 45.0) < 1e-9


def test_codec_roundtrip_psnr_gate():
    px = synth_pixels(42, 64, 48)
    assert np.array_equal(decode(encode(px, "png")), px)  # lossless
    out = decode(encode(px, "jpeg"))
    assert psnr(px, out) >= 40.0  # the BASELINE.json lossy gate
    # idempotent lossy re-encode
    assert np.array_equal(decode(encode(out, "jpeg")), out)
    with pytest.raises(NotImplementedError):
        encode(px, "webp")


def test_phash_properties():
    a = synth_pixels(1, 64, 64)
    b = synth_pixels(2, 64, 64)
    ha, hb = phash64(a), phash64(b)
    assert int(hamming64(ha, ha)) == 0
    assert int(hamming64(ha, hb)) > 10  # distinct content → distant hashes
    hj = phash64(decode(encode(a, "jpeg")))
    assert int(hamming64(ha, hj)) <= 6  # lossy re-encode → near hash


def test_resize_box_means():
    px = np.full((8, 8, 3), 100, dtype=np.uint8)
    px[:4] = 200
    out = resize_box(px, 1, 1)
    assert out.shape == (1, 1, 3)
    assert abs(int(out[0, 0, 0]) - 150) <= 1


def test_fuzz_batch_exact_beyond_width_cap():
    """ADVICE r1: batched DPs must not silently truncate long strings —
    over-cap pairs fall back to the exact scalar DP."""
    long_a = "forest road " * 60          # 720 chars, > DP_WIDTH_CAP
    long_b = "forest roud " * 60
    short_a, short_b = "trail 12", "trail 13"
    a = [long_a, short_a, long_a]
    b = [long_b, short_b, short_b]
    bl = F.batch_levenshtein(a, b)
    bi = F.batch_indel_ratio(a, b)
    br = F.batch_lev_ratio(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert bl[i] == F.levenshtein(x, y)
        assert abs(bi[i] - F.indel_ratio(x, y)) < 1e-9
        assert abs(br[i] - F.lev_ratio(x, y)) < 1e-9
    # explicit small cap: still exact via fallback, never truncated
    bl2 = F.batch_levenshtein(a, b, maxlen=16)
    assert list(bl2) == list(bl)
