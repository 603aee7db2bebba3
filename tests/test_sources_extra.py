"""ODK reader (S3) and .poly writer (S9)."""

import json

import pyarrow as pa

from osm_merge_ray.sources.odk import normalize_odk
from osm_merge_ray.sources.poly import geojson_to_poly


def test_normalize_odk():
    t = pa.table({
        "gps": ["39.5 -106.2 2400.0 4.5", None],
        "name": ["Spring", "Bench"],
        "amenity": ["drinking_water", "bench"],
        "meta:instanceName": ["x", "y"],
        "title": ["t", "t"],
    })
    out = normalize_odk(t, "gps")
    assert out.num_rows == 2
    coords = json.loads(out.column("coords_json")[0].as_py())
    assert coords == [-106.2, 39.5]  # geopoint is "lat lon ..." → lon,lat
    assert out.column("coords_json")[1].as_py() == "[]"
    props = json.loads(out.column("props_json")[0].as_py())
    assert props == {"name": "Spring", "amenity": "drinking_water"}  # meta/title dropped


def test_geojson_to_poly():
    feats = [{
        "type": "Feature",
        "geometry": {"type": "Polygon",
                     "coordinates": [[[-106, 39], [-104, 39], [-104, 41], [-106, 39]]]},
        "properties": {},
    }]
    txt = geojson_to_poly(feats, name="aoi")
    lines = txt.strip().splitlines()
    assert lines[0] == "aoi" and lines[1] == "1"
    assert lines[-1] == "END" and lines[-2] == "END"
    assert "-1.060000E+02" in lines[2]
