"""ODK CSV/JSON submission reader (SURVEY §2.1 S3).

Reference: ``ODKParsers().CSVparser/JSONparser`` wired at
conflator.py:836-845 — ODK Collect submissions become POI features
(GPS point + flat answer columns → tag dict). Engine: ``read_csv`` /
``read_json`` plus a vectorized row normalizer producing the feature
table: coordinates from the ``warmup``/geopoint column (ODK geopoints
are "lat lon alt acc" strings), every other column a tag; the ODK
bookkeeping columns (``meta:*``, ``__*``) are dropped the same way the
reference's tag filter drops ``title``/``label``
(conflator.py:556-559).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

_DROP_PREFIXES = ("meta:", "__", "SubmissionDate")
_DROP_KEYS = {"title", "label", "deviceid", "instanceID"}


def normalize_odk(t: pa.Table, geopoint_column: str = "gps") -> pa.Table:
    """ODK rows → feature table (Point features, props_json tags)."""
    cols = t.column_names
    n = len(t)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    if geopoint_column in cols:
        for i, v in enumerate(t.column(geopoint_column).to_pylist()):
            if not v:
                continue
            parts = str(v).replace(",", " ").split()
            if len(parts) >= 2:
                # ODK geopoint order is "lat lon [alt acc]"
                lat[i] = float(parts[0])
                lon[i] = float(parts[1])
    keep = [c for c in cols
            if c != geopoint_column
            and c not in _DROP_KEYS
            and not any(c.startswith(p) for p in _DROP_PREFIXES)]
    data = {c: t.column(c).to_pylist() for c in keep}
    props = []
    for i in range(n):
        d = {c: str(data[c][i]) for c in keep if data[c][i] not in (None, "")}
        props.append(json.dumps(d, sort_keys=True))
    return pa.table({
        "feature_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "geom_type": pa.array(["Point"] * n, pa.string()),
        "coords_json": pa.array(
            [json.dumps([lon[i], lat[i]]) if np.isfinite(lon[i]) else "[]"
             for i in range(n)], pa.string()),
        "props_json": pa.array(props, pa.string()),
    })


def read_odk_csv(paths, geopoint_column: str = "gps"):
    import ray.data as rd

    return rd.read_csv(paths).map_batches(
        lambda t: normalize_odk(t, geopoint_column), batch_format="pyarrow"
    )


def _flatten_odk(entry: dict, prefix: str = "") -> dict:
    """Flatten nested ODK-Central JSON groups with ':' separators
    (ODK group paths); GeoJSON-style geopoint dicts collapse to the
    "lat lon" string the CSV path produces, so one normalizer serves
    both parsers (conflator.py:836-845 wires CSVparser and JSONparser
    to the same createEntry)."""
    out: dict = {}
    for k, v in entry.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            if v.get("type") == "Point" and "coordinates" in v:
                c = v["coordinates"]
                out[key] = f"{c[1]} {c[0]}" + (f" {c[2]}" if len(c) > 2 else "")
            else:
                out.update(_flatten_odk(v, prefix=f"{key}:"))
        elif isinstance(v, list):
            out[key] = json.dumps(v)
        elif v is not None:
            out[key] = v
    return out


def read_odk_json(paths, geopoint_column: str = "gps"):
    """ODK JSON submissions → feature table (S3 JSON branch).

    Accepts both an ODK Central export (``{"value": [...]}``) and a
    plain JSON array of submissions; one parse task per file (the
    file-is-the-shard pattern — Central exports are per-form and
    modest), flattened then run through the same ``normalize_odk`` as
    the CSV branch."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for b in t.column("bytes").to_pylist():
            doc = json.loads(b)
            vals = doc.get("value", []) if isinstance(doc, dict) else doc
            for entry in vals:
                rows.append(_flatten_odk(entry))
        keys = sorted({k for r in rows for k in r})
        if not rows:
            return normalize_odk(
                pa.table({geopoint_column: pa.array([], pa.string())}),
                geopoint_column)
        cols = {k: pa.array([None if r.get(k) is None else str(r.get(k))
                             for r in rows], pa.string()) for k in keys}
        return normalize_odk(pa.table(cols), geopoint_column)

    return ds.map_batches(parse, batch_format="pyarrow")
