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


def render_osm_xml(t: pa.Table, bump_version: bool = True) -> tuple[str, int]:
    """Feature rows → OSM XML body. Returns (xml, n_rejected) —
    LineStrings without refs are rejected (conflator.py:946-952 analog).
    Vectorizable per partition: each partition renders independently;
    concatenate bodies under one ``<osm>`` root (or write one file per
    partition like the reference's per-task outputs, S10)."""
    out = ["<?xml version='1.0' encoding='UTF-8'?>",
           "<osm version='0.6' generator='osm_merge_ray'>"]
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
    out.append("</osm>")
    return "\n".join(out), rejected


def write_osm_xml(ds_or_table, path: str, bump_version: bool = True) -> int:
    """Driver-side single-file writer (small outputs / tests). Returns
    the number of elements actually written (ref-less ways are diverted,
    conflator.py:946-952 semantics)."""
    if isinstance(ds_or_table, pa.Table):
        t = ds_or_table
    else:
        t = pa.concat_tables(
            ds_or_table.iter_batches(batch_format="pyarrow", batch_size=8192)
        )
    xml, rejected = render_osm_xml(t, bump_version)
    with open(path, "w") as fh:
        fh.write(xml)
    return t.num_rows - rejected


__all__ = ["parse_osm_bytes", "read_osm_xml", "render_osm_xml", "write_osm_xml", "escape"]
