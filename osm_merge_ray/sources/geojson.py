"""GeoJSON source/sink (SURVEY §2.1 S1/S4/S8).

The reference eagerly loads whole FeatureCollections
(``conflator.parseFile`` conflator.py:811-846) and hand-rolls a chunked
reader for files too big for memory (readjson.py:69-167). Ray Data
subsumes both: each GeoJSON file is parsed in one task (files are the
reference's own sharding unit — the tm-splitter task grid), yielding
the engine's feature-table rows; many files parallelize naturally via
``read_binary_files``.
"""

from __future__ import annotations

import json

import pyarrow as pa


def features_to_table(features: list[dict], start_id: int = 0) -> pa.Table:
    """GeoJSON features → engine feature table
    (feature_id, geom_type, coords_json, props_json)."""
    ids, gts, coords, props = [], [], [], []
    for i, f in enumerate(features):
        geom = f.get("geometry") or {}
        ids.append(start_id + i)
        gts.append(geom.get("type", ""))
        coords.append(json.dumps(geom.get("coordinates", [])))
        props.append(json.dumps(f.get("properties") or {}, sort_keys=True))
    return pa.table({
        "feature_id": pa.array(ids, pa.int64()),
        "geom_type": pa.array(gts, pa.string()),
        "coords_json": pa.array(coords, pa.string()),
        "props_json": pa.array(props, pa.string()),
    })


def parse_geojson_bytes(data: bytes) -> pa.Table:
    obj = json.loads(data)
    feats = obj["features"] if obj.get("type") == "FeatureCollection" else [obj]
    return features_to_table(feats)


def read_geojson(paths):
    """Dataset of feature rows from one or more GeoJSON files (one
    parse task per file — the reference's file == shard model)."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        parts = [parse_geojson_bytes(b) for b in t.column("bytes").to_pylist()]
        return pa.concat_tables(parts) if parts else features_to_table([])

    return files.map_batches(parse, batch_format="pyarrow")


def table_to_features(t: pa.Table) -> list[dict]:
    out = []
    for gt, cj, pj in zip(t.column("geom_type").to_pylist(),
                          t.column("coords_json").to_pylist(),
                          t.column("props_json").to_pylist()):
        out.append({
            "type": "Feature",
            "geometry": {"type": gt, "coordinates": json.loads(cj)} if gt else None,
            "properties": json.loads(pj),
        })
    return out


def write_geojson(ds_or_table, path: str) -> int:
    """FeatureCollection writer (conflator.py:993-1006 semantics).
    Driver-side single file — for partitioned output use
    ``ds.write_json`` on the feature table instead."""
    if isinstance(ds_or_table, pa.Table):
        t = ds_or_table
    else:  # a Dataset — stream batches to the driver
        t = pa.concat_tables(
            ds_or_table.iter_batches(batch_format="pyarrow", batch_size=8192)
        )
    feats = table_to_features(t)
    with open(path, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh, indent=4)
    return len(feats)
