"""OSM XML source/sink (SURVEY §2.1 S2/S7).

Reader semantics mirror ``Conflator.loadFile`` (conflator.py:631-728):
nodes with tags → Point features; ways → LineString features with
geometry dereferenced through the per-file node cache
(conflator.py:695-722); ``tiger:*`` tags dropped (conflator.py:99-101
analog); untagged nodes populate the cache but are not emitted
(conflator.py:687-688). Each OSM XML file is parsed in ONE task — the
file is the reference's shard unit, so the node cache is file-local by
construction (ST2).

Writer semantics mirror ``Conflator.writeOSM`` (conflator.py:919-991):
id/version promoted from tags to attributes, version incremented on
output, negative ids (new features) get version=1, ways carry their
``refs`` as ``<nd ref=..>`` children; features without refs are
diverted to a rejects list rather than written as ways.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa


def parse_osm_bytes(data: bytes) -> pa.Table:
    """One OSM XML document → feature table rows (Points + LineStrings)
    plus OSM bookkeeping columns (osm_id, version, refs_json)."""
    root = ET.fromstring(data)
    node_coords: dict[int, tuple[float, float]] = {}
    rows: list[tuple[int, int, str, str, str, str]] = []  # osm_id, version, geom_type, coords, props, refs
    for el in root:
        if el.tag == "node":
            nid = int(el.attrib["id"])
            lat = float(el.attrib["lat"])
            lon = float(el.attrib["lon"])
            node_coords[nid] = (lon, lat)
            tags = {
                t.attrib["k"]: t.attrib["v"]
                for t in el.findall("tag")
                if not t.attrib["k"].startswith("tiger:")
            }
            if not tags:  # cached for way deref, not emitted
                continue
            if "timestamp" in el.attrib:
                tags["timestamp"] = el.attrib["timestamp"]
            rows.append((nid, int(el.attrib.get("version", 1)), "Point",
                         json.dumps(node_coords[nid]), json.dumps(tags, sort_keys=True),
                         "[]"))
        elif el.tag == "way":
            wid = int(el.attrib["id"])
            refs = [int(nd.attrib["ref"]) for nd in el.findall("nd")]
            tags = {
                t.attrib["k"]: t.attrib["v"]
                for t in el.findall("tag")
                if not t.attrib["k"].startswith("tiger:")
            }
            if "timestamp" in el.attrib:
                tags["timestamp"] = el.attrib["timestamp"]
            coords = [list(node_coords[r]) for r in refs if r in node_coords]
            rows.append((wid, int(el.attrib.get("version", 1)), "LineString",
                         json.dumps(coords), json.dumps(tags, sort_keys=True),
                         json.dumps(refs)))
    if not rows:
        rows = []
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    return pa.table({
        "osm_id": pa.array(cols[0], pa.int64()),
        "version": pa.array(cols[1], pa.int32()),
        "geom_type": pa.array(cols[2], pa.string()),
        "coords_json": pa.array(cols[3], pa.string()),
        "props_json": pa.array(cols[4], pa.string()),
        "refs_json": pa.array(cols[5], pa.string()),
    })


def read_osm_xml(paths):
    """Dataset of OSM features, one parse task per XML file."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        parts = [parse_osm_bytes(b) for b in t.column("bytes").to_pylist()]
        return pa.concat_tables(parts) if parts else parse_osm_bytes(b"<osm/>")

    return files.map_batches(parse, batch_format="pyarrow")


XML_HEADER = ("<?xml version='1.0' encoding='UTF-8'?>\n"
              "<osm version='0.6' generator='osm_merge_ray'>")


def render_osm_elements(t: pa.Table, bump_version: bool = True) -> tuple[list[str], int]:
    """Feature rows → per-element XML lines (no ``<osm>`` envelope).
    Returns (lines, n_rejected) — LineStrings without refs are rejected
    (conflator.py:946-952 analog). Renders per partition/batch so both
    the single-file writer and the streaming writer share it."""
    out: list[str] = []
    rejected = 0
    for osm_id, version, gt, cj, pj, rj in zip(
        t.column("osm_id").to_pylist(), t.column("version").to_pylist(),
        t.column("geom_type").to_pylist(), t.column("coords_json").to_pylist(),
        t.column("props_json").to_pylist(), t.column("refs_json").to_pylist(),
    ):
        tags = json.loads(pj)
        # id/version may also arrive as tags (conflator.py:954-960)
        osm_id = int(tags.pop("id", osm_id))
        version = int(tags.pop("version", version))
        version = 1 if osm_id < 0 else (version + 1 if bump_version else version)
        attrs = f"id={quoteattr(str(osm_id))} version={quoteattr(str(version))}"
        if "timestamp" in tags:
            attrs += f" timestamp={quoteattr(tags.pop('timestamp'))}"
        tag_xml = "".join(
            f"<tag k={quoteattr(str(k))} v={quoteattr(str(v))}/>"
            for k, v in sorted(tags.items())
        )
        if gt == "Point":
            lon, lat = json.loads(cj)
            out.append(f"<node {attrs} lat={quoteattr(repr(lat))} lon={quoteattr(repr(lon))}>{tag_xml}</node>")
        else:
            refs = json.loads(rj)
            if not refs:
                rejected += 1
                continue
            nd_xml = "".join(f"<nd ref={quoteattr(str(r))}/>" for r in refs)
            out.append(f"<way {attrs}>{nd_xml}{tag_xml}</way>")
    return out, rejected


def render_osm_xml(t: pa.Table, bump_version: bool = True) -> tuple[str, int]:
    """Complete single-document render (envelope + elements)."""
    lines, rejected = render_osm_elements(t, bump_version)
    return "\n".join([XML_HEADER, *lines, "</osm>"]), rejected


class OsmXmlStreamWriter:
    """Incremental single-file XML writer: header on open, elements per
    batch, footer on close — the whole decision dataset never sits on
    the driver at once (VERDICT r2 #6)."""

    def __init__(self, path: str, bump_version: bool = True):
        self._fh = open(path, "w")
        self._fh.write(XML_HEADER + "\n")
        self._bump = bump_version
        self.written = 0

    def write_batch(self, t: pa.Table) -> int:
        lines, rejected = render_osm_elements(t, self._bump)
        if lines:
            self._fh.write("\n".join(lines) + "\n")
        n = t.num_rows - rejected
        self.written += n
        return n

    def close(self) -> int:
        self._fh.write("</osm>")
        self._fh.close()
        return self.written


def write_osm_xml(ds_or_table, path: str, bump_version: bool = True) -> int:
    """Single-file writer. Tables render in one shot; Datasets STREAM
    batch-by-batch through ``OsmXmlStreamWriter`` (no driver-side
    concat). Returns the number of elements actually written (ref-less
    ways are diverted, conflator.py:946-952 semantics)."""
    if isinstance(ds_or_table, pa.Table):
        xml, rejected = render_osm_xml(ds_or_table, bump_version)
        with open(path, "w") as fh:
            fh.write(xml)
        return ds_or_table.num_rows - rejected
    w = OsmXmlStreamWriter(path, bump_version)
    for b in ds_or_table.iter_batches(batch_format="pyarrow", batch_size=8192):
        w.write_batch(b)
    return w.close()


# ---------------------------------------------------------------------------
# chunked single-file path (S2 at scale, VERDICT r1 #10)
# ---------------------------------------------------------------------------

_ELEMENT_TOKENS = (b"<node", b"<way", b"<relation", b"</osm>")


def _next_element_start(data: bytes, pos: int) -> int:
    """Offset of the first top-level element boundary at/after ``pos``."""
    cands = [c for c in (data.find(tok, pos) for tok in _ELEMENT_TOKENS) if c != -1]
    return min(cands) if cands else len(data)


def parse_osm_fragment(data: bytes) -> pa.Table:
    """Parse an element-aligned OSM XML fragment WITHOUT assuming the
    node cache is local: emits a union table with a ``kind`` column —
    ``feature`` (tagged node, complete), ``node_cache`` (id, lon, lat
    for way deref) and ``way`` (coords pending deref)."""
    root = ET.fromstring(b"<osm>" + data + b"</osm>")
    rows = []  # kind, osm_id, version, geom_type, coords, props, refs, lon, lat
    for el in root:
        if el.tag == "node":
            nid = int(el.attrib["id"])
            lat = float(el.attrib["lat"])
            lon = float(el.attrib["lon"])
            rows.append(("node_cache", nid, 1, "", "", "", "", lon, lat))
            tags = {t.attrib["k"]: t.attrib["v"] for t in el.findall("tag")
                    if not t.attrib["k"].startswith("tiger:")}
            if not tags:
                continue
            if "timestamp" in el.attrib:
                tags["timestamp"] = el.attrib["timestamp"]
            rows.append(("feature", nid, int(el.attrib.get("version", 1)), "Point",
                         json.dumps([lon, lat]), json.dumps(tags, sort_keys=True),
                         "[]", 0.0, 0.0))
        elif el.tag == "way":
            wid = int(el.attrib["id"])
            refs = [int(nd.attrib["ref"]) for nd in el.findall("nd")]
            tags = {t.attrib["k"]: t.attrib["v"] for t in el.findall("tag")
                    if not t.attrib["k"].startswith("tiger:")}
            if "timestamp" in el.attrib:
                tags["timestamp"] = el.attrib["timestamp"]
            rows.append(("way", wid, int(el.attrib.get("version", 1)), "LineString",
                         "", json.dumps(tags, sort_keys=True), json.dumps(refs),
                         0.0, 0.0))
    cols = list(zip(*rows)) if rows else [[]] * 9
    return pa.table({
        "kind": pa.array(cols[0], pa.string()),
        "osm_id": pa.array(cols[1], pa.int64()),
        "version": pa.array(cols[2], pa.int32()),
        "geom_type": pa.array(cols[3], pa.string()),
        "coords_json": pa.array(cols[4], pa.string()),
        "props_json": pa.array(cols[5], pa.string()),
        "refs_json": pa.array(cols[6], pa.string()),
        "lon": pa.array(cols[7], pa.float64()),
        "lat": pa.array(cols[8], pa.float64()),
    })


def read_osm_xml_chunked(path: str, chunk_bytes: int = 64 << 20,
                         overlap: int = 4 << 20, num_buckets: int = 64):
    """ONE large OSM XML file parsed as MANY tasks (the reference's own
    readjson.py:69-167 chunker exists because one state extract kills a
    single-task parse). Byte ranges are aligned to element boundaries
    deterministically (each task starts at the first element at/after
    its range start), so every element is parsed exactly once; the way
    node cache is NOT file-local anymore, so way geometry is rebuilt by
    a distributed deref: exploded (way, seq, ref) rows bucket-join the
    node table on ref, then regroup per way ordered by seq. Output rows
    equal the single-task ``parse_osm_bytes`` (order aside).

    ``path`` must be on shared storage in a multi-node cluster (each
    range task seeks into it independently)."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from osm_merge_ray.ops import bucketed_hash_join, grouped_reduce

    size = os.path.getsize(path)
    starts = list(range(0, max(size, 1), chunk_bytes))
    ranges = rd.from_items([{"start": s} for s in starts])

    def parse_range(t: pa.Table) -> pa.Table:
        parts = []
        with open(path, "rb") as fh:
            for s in t.column("start").to_pylist():
                end = min(s + chunk_bytes, size)
                fh.seek(s)
                # element spans are tiny vs overlap; read range + slack
                data = fh.read((end - s) + overlap)
                a = _next_element_start(data, 0)
                b = _next_element_start(data, end - s) if end < size else len(data)
                frag = data[a:b]
                # strip a trailing </osm> if the fragment reached EOF
                frag = frag.replace(b"</osm>", b"")
                parts.append(parse_osm_fragment(frag))
        return pa.concat_tables(parts) if parts else parse_osm_fragment(b"")

    parsed = ranges.map_batches(parse_range, batch_format="pyarrow").materialize()

    def _of_kind(kind: str, cols: list[str], rename: dict | None = None):
        import pyarrow.compute as pc

        def proj(t: pa.Table) -> pa.Table:
            tt = t.filter(pc.equal(t.column("kind"), kind))
            return pa.table({(rename or {}).get(c, c): tt.column(c) for c in cols})

        return parsed.map_batches(proj, batch_format="pyarrow")

    feats = _of_kind("feature", ["osm_id", "version", "geom_type",
                                 "coords_json", "props_json", "refs_json"])
    nodes = _of_kind("node_cache", ["osm_id", "lon", "lat"],
                     rename={"osm_id": "ref"})
    ways_meta = _of_kind("way", ["osm_id", "version", "geom_type",
                                 "props_json", "refs_json"])

    def explode_refs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tt = t.filter(pc.equal(t.column("kind"), "way"))
        wid, seq, ref = [], [], []
        for w, rj in zip(tt.column("osm_id").to_pylist(),
                         tt.column("refs_json").to_pylist()):
            for k, r in enumerate(json.loads(rj)):
                wid.append(w)
                seq.append(k)
                ref.append(r)
        return pa.table({"osm_id": pa.array(wid, pa.int64()),
                         "seq": pa.array(seq, pa.int64()),
                         "ref": pa.array(ref, pa.int64())})

    refs_flat = parsed.map_batches(explode_refs, batch_format="pyarrow")
    # deref: refs that miss the node table are dropped, same as the
    # single-task parser's `if r in node_coords`
    deref = bucketed_hash_join(refs_flat, nodes, key="ref",
                               num_buckets=num_buckets, how="inner")

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["osm_id", "seq"])
        out_w, out_c = [], []
        for w, g in df.groupby("osm_id", sort=True):
            out_w.append(int(w))
            out_c.append(json.dumps([[x, y] for x, y in zip(g["lon"], g["lat"])]))
        return pd.DataFrame({"osm_id": np.asarray(out_w, dtype=np.int64),
                             "coords_json": out_c})

    way_coords = grouped_reduce(deref, ["osm_id"], rebuild,
                                num_buckets=num_buckets)
    joined = bucketed_hash_join(ways_meta, way_coords, key="osm_id",
                                num_buckets=num_buckets, how="left",
                                suffix="_c")

    def finish_ways(t: pa.Table) -> pa.Table:
        cj = ["[]" if c is None else c for c in t.column("coords_json").to_pylist()]
        return pa.table({
            "osm_id": t.column("osm_id"),
            "version": t.column("version"),
            "geom_type": t.column("geom_type"),
            "coords_json": pa.array(cj, pa.string()),
            "props_json": t.column("props_json"),
            "refs_json": t.column("refs_json"),
        })

    ways = joined.map_batches(finish_ways, batch_format="pyarrow")
    return feats.union(ways)


__all__ = ["parse_osm_bytes", "parse_osm_fragment", "read_osm_xml",
           "read_osm_xml_chunked", "render_osm_xml", "write_osm_xml", "escape"]
