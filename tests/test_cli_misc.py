"""CLI argument surface + XML escaping + polygon-clip properties."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_merge_ray.cli import main as cli_main
from osm_merge_ray.geo.polygons import ensure_ccw, intersection_area, shoelace_area
from osm_merge_ray.sources.osm_xml import parse_osm_bytes, render_osm_xml


def test_cli_subcommands_parse():
    for sub in ("convert", "conflate-lines", "conflate-images", "tm-split",
                "pipeline", "dedup", "poly"):
        with pytest.raises(SystemExit) as exc:
            cli_main([sub, "--help"])
        assert exc.value.code == 0, sub


def test_osm_xml_escaping_roundtrip():
    import json

    import pyarrow as pa

    nasty = 'He said "hi" & <waved> to \'em'
    t = pa.table({
        "osm_id": pa.array([5], pa.int64()),
        "version": pa.array([1], pa.int32()),
        "geom_type": pa.array(["Point"], pa.string()),
        "coords_json": pa.array(["[1.5, 2.5]"], pa.string()),
        "props_json": pa.array([json.dumps({"name": nasty})], pa.string()),
        "refs_json": pa.array(["[]"], pa.string()),
    })
    xml, _ = render_osm_xml(t, bump_version=False)
    back = parse_osm_bytes(xml.encode())
    props = json.loads(back.column("props_json")[0].as_py())
    assert props["name"] == nasty


coords = st.floats(min_value=-100, max_value=100, allow_nan=False)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=4, max_size=4, unique=True),
       st.tuples(coords, coords), st.tuples(coords, coords))
def test_clip_area_bounds(quad, c1, c2):
    """Intersection area is bounded by both inputs (convexified quad vs
    an axis-aligned rect)."""
    a = ensure_ccw(np.array(quad, dtype=float))
    x0, x1 = sorted((c1[0], c2[0]))
    y0, y1 = sorted((c1[1], c2[1]))
    if x1 - x0 < 1e-9 or y1 - y0 < 1e-9:
        return
    b = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)
    area = intersection_area(a, b)
    assert area >= -1e-9
    assert area <= abs(shoelace_area(b)) + 1e-6
