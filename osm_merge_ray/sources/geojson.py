"""GeoJSON source/sink (SURVEY §2.1 S1/S4/S8).

The reference eagerly loads whole FeatureCollections
(``conflator.parseFile`` conflator.py:811-846) and hand-rolls a chunked
reader for files too big for memory (readjson.py:69-167). Ray Data
subsumes both: each GeoJSON file is parsed in one task (files are the
reference's own sharding unit — the tm-splitter task grid), yielding
the engine's feature-table rows; many files parallelize naturally via
``read_binary_files``. For ONE huge FeatureCollection,
``read_geojson_chunked`` splits the file into byte-range tasks aligned
on feature-object boundaries (the readjson.py chunker, Ray-native).
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


class GeoJsonStreamWriter:
    """Incremental FeatureCollection writer: one feature at a time, no
    whole-dataset driver materialization (VERDICT r2 #6)."""

    def __init__(self, path: str):
        self._fh = open(path, "w")
        self._fh.write('{"type": "FeatureCollection", "features": [')
        self.written = 0

    def write_batch(self, t: pa.Table) -> int:
        for f in table_to_features(t):
            prefix = ",\n" if self.written else "\n"
            self._fh.write(prefix + json.dumps(f, indent=4))
            self.written += 1
        return t.num_rows

    def close(self) -> int:
        self._fh.write("\n]}" if self.written else "]}")
        self._fh.close()
        return self.written


def write_geojson(ds_or_table, path: str) -> int:
    """FeatureCollection writer (conflator.py:993-1006 semantics).
    Single file; Datasets stream batch-by-batch — for partitioned
    output use ``ds.write_json`` on the feature table instead."""
    if isinstance(ds_or_table, pa.Table):
        batches = [ds_or_table]
    else:  # a Dataset — stream batches through the incremental writer
        batches = ds_or_table.iter_batches(batch_format="pyarrow",
                                           batch_size=8192)
    w = GeoJsonStreamWriter(path)
    for b in batches:
        w.write_batch(b)
    return w.close()


# ---------------------------------------------------------------------------
# chunked single-file path (S4, readjson.py:69-167 analog)
# ---------------------------------------------------------------------------

_FEAT_TOKENS = (b'"type": "Feature"', b'"type":"Feature"')


def _next_feature_start(data: bytes, pos: int) -> int:
    """Offset of the opening brace of the first feature object whose
    brace is at/after ``pos``. Matches the '"type": "Feature"' key and
    backtracks to the preceding '{' (works for compact AND
    pretty-printed encodings; assumes "type" leads the object, like
    the reference's own line-oriented chunker)."""
    best = len(data)
    for t in _FEAT_TOKENS:
        c = data.find(t, pos)
        while c != -1:
            b = data.rfind(b"{", max(c - 64, 0), c + 1)
            if b >= pos:
                best = min(best, b)
                break
            c = data.find(t, c + len(t))
    return best


def parse_geojson_fragment(data: bytes, id0: int) -> pa.Table:
    """Parse a fragment beginning AT a feature-object token: features
    are delimited by successive tokens; each slice is the complete
    object plus trailing separators/closers, stripped before loads."""
    feats = []
    pos = 0
    while pos < len(data):
        nxt = _next_feature_start(data, pos + 1)
        frag = data[pos:nxt].rstrip()
        # strip trailing collection closers / separators (",", "]", "}")
        parsed = False
        while frag:
            probe = frag.rstrip(b", \n\r\t")
            if not probe:
                break
            try:
                feats.append(json.loads(probe))
                parsed = True
                break
            except json.JSONDecodeError:
                if probe[-1:] in (b",", b"]", b"}"):
                    frag = probe[:-1]
                else:
                    break
        if not parsed:
            # a feature larger than the reader's overlap arrives
            # truncated mid-object; failing loudly beats silent data
            # loss (ADVICE r2 #3) — raise so the caller can raise the
            # overlap (read_osm_xml_chunked fails the same way).
            raise ValueError(
                f"unparseable GeoJSON feature fragment at offset {pos} "
                f"({min(nxt, len(data)) - pos} bytes) — feature larger "
                "than the chunk overlap? Increase `overlap`."
            )
        pos = nxt
        if nxt >= len(data):
            break
    return features_to_table(feats, start_id=id0)


def read_geojson_chunked(path: str, chunk_bytes: int = 64 << 20,
                         overlap: int = 4 << 20):
    """ONE huge FeatureCollection parsed as MANY byte-range tasks — the
    engine's realization of the reference's hand-rolled chunked reader
    (readjson.py:69-167, its own admission that eager whole-file loads
    die on big files). Ranges align deterministically on feature-object
    tokens so every feature parses exactly once.

    feature_id is the fragment's byte offset plus the feature's ordinal
    within it — unique and deterministic for a given chunk size (byte
    spacing of features far exceeds their count; the single-task
    reader's ids are plain ordinals instead). Assumption shared with
    the reference's chunker: the '"type": "Feature"' key leads each
    feature object and does not occur inside a property string value."""
    import os

    import ray.data as rd

    size = os.path.getsize(path)
    starts = list(range(0, max(size, 1), chunk_bytes))
    ranges = rd.from_items([{"start": s} for s in starts])

    def parse_range(t: pa.Table) -> pa.Table:
        parts = []
        with open(path, "rb") as fh:
            for s in t.column("start").to_pylist():
                end = min(s + chunk_bytes, size)
                fh.seek(s)
                data = fh.read((end - s) + overlap)
                a = _next_feature_start(data, 0)
                b = _next_feature_start(data, end - s) if end < size else len(data)
                if a >= b:
                    continue
                parts.append(parse_geojson_fragment(data[a:b], id0=s + a))
        return (pa.concat_tables(parts) if parts
                else features_to_table([]))

    return ranges.map_batches(parse_range, batch_format="pyarrow")
