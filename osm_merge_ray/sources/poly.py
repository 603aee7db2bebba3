"""Osmosis ``.poly`` clip-file writer (SURVEY §2.1 S9).

Mirrors ``geojson2poly`` (geojson2poly.py:82-113): each polygon ring
becomes a named section of ``lon  lat`` vertex lines, ``END`` after
each ring and a final ``END``. Driver-side util — clip polygons are
small by construction.
"""

from __future__ import annotations

import json


def geojson_to_poly(features: list[dict], name: str = "poly") -> str:
    lines = [name]
    n = 0
    for f in features:
        geom = f.get("geometry") or {}
        gt = geom.get("type")
        rings = []
        if gt == "Polygon":
            rings = geom["coordinates"][:1]
        elif gt == "MultiPolygon":
            rings = [p[0] for p in geom["coordinates"]]
        for ring in rings:
            n += 1
            lines.append(str(n))
            for lon, lat in ring:
                lines.append(f"   {lon:E}   {lat:E}")
            lines.append("END")
    lines.append("END")
    return "\n".join(lines) + "\n"


def write_poly(geojson_path: str, out_path: str) -> int:
    with open(geojson_path) as fh:
        obj = json.load(fh)
    feats = obj["features"] if obj.get("type") == "FeatureCollection" else [obj]
    txt = geojson_to_poly(feats)
    with open(out_path, "w") as fh:
        fh.write(txt)
    return txt.count("END") - 1
