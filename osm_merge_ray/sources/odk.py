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
