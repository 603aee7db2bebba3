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


def test_jsonl_roundtrip(ray_session, tmp_path):
    """r4: JSONL corpus source — field renames, content-derived ids for
    id-less rows, passthrough columns, write/read roundtrip."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from osm_merge_ray.sources.jsonl import read_jsonl, write_jsonl

    p = tmp_path / "corpus.jsonl"
    rows = [{"content": "alpha beta", "src": "web"},
            {"content": "gamma", "src": "wiki"},
            {"content": "alpha beta", "src": "web2"}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    ds = read_jsonl(str(p), text_column="content")
    # datasets are unordered collections (block completion order is
    # nondeterministic) — compare sorted
    df = ds.to_pandas().sort_values("src").reset_index(drop=True)
    assert set(df.columns) >= {"doc_id", "text", "src"}
    assert df["text"].tolist() == ["alpha beta", "alpha beta", "gamma"]
    assert df["doc_id"].dtype == "int64" and (df["doc_id"] >= 0).all()
    # content-derived ids: equal text -> equal id, stable across reads
    assert df["doc_id"][0] == df["doc_id"][1] != df["doc_id"][2]
    assert sorted(read_jsonl(str(p), text_column="content").to_pandas()[
        "doc_id"].tolist()) == sorted(df["doc_id"].tolist())

    # explicit id field is respected and renamed
    p2 = tmp_path / "with_ids.jsonl"
    p2.write_text("\n".join(json.dumps({"id": i, "text": t})
                            for i, t in enumerate(["x", "y"])) + "\n")
    df2 = read_jsonl(str(p2), id_column="id").to_pandas()
    assert sorted(df2["doc_id"].tolist()) == [0, 1]

    out = tmp_path / "out"
    write_jsonl(rd.from_arrow(pa.table({"doc_id": pa.array([7], pa.int64()),
                                        "text": ["roundtrip"]})), str(out))
    back = read_jsonl(f"{out}/").to_pandas()
    assert back["text"].tolist() == ["roundtrip"]
    assert back["doc_id"].tolist() == [7]


def test_jsonl_review_fixes(ray_session, tmp_path):
    """r4 review: content-derived ids must be NON-NEGATIVE for every
    text (unsigned shift before the signed cast), and a stray
    pre-existing 'text'/'doc_id' field must not collide with the
    rename (CC/HF exports carry raw + cleaned bodies side by side)."""
    import json

    from osm_merge_ray.sources.jsonl import _derive_ids, read_jsonl

    # 200 texts: with a sign-preserving shift ~half would be negative
    ids = _derive_ids([f"doc number {i}" for i in range(200)])
    assert (ids >= 0).all() and ids.dtype == "int64"
    assert len(set(ids.tolist())) == 200

    p = tmp_path / "collide.jsonl"
    rows = [{"content": "clean body one", "text": "<html>raw</html>",
             "id": 11, "doc_id": 99},
            {"content": "clean body two", "text": "<b>raw2</b>",
             "id": 12, "doc_id": 98}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    df = (read_jsonl(str(p), text_column="content", id_column="id")
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert df["text"].tolist() == ["clean body one", "clean body two"]
    assert df["doc_id"].tolist() == [11, 12]  # named id wins, stray dropped


def test_jsonl_ragged_ids_filled_per_row(ray_session, tmp_path):
    """r5 (advice): a RAGGED corpus (some lines missing the id field)
    must not emit nullable doc_ids — read_json unifies the schema with
    nulls, and a nullable int64 key violates the repo's non-null int64
    invariant (float64 upcast in pandas combines corrupts > 2^53).
    Null rows get the same content-derived id the column-absent path
    uses; present ids are untouched."""
    import json

    from osm_merge_ray.sources.jsonl import _derive_ids, read_jsonl

    p = tmp_path / "ragged.jsonl"
    rows = [{"doc_id": 5, "text": "has an id"},
            {"text": "missing id one"},
            {"doc_id": 6, "text": "another with id"},
            {"text": "missing id two"},
            {"text": "missing id one"}]  # equal text -> equal derived id
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    df = read_jsonl(str(p)).to_pandas().sort_values(
        ["text"]).reset_index(drop=True)
    assert df["doc_id"].dtype == "int64"      # NOT nullable Int64
    assert df["doc_id"].notna().all()
    by_text = df.set_index("text")["doc_id"]
    assert by_text["has an id"] == 5
    assert by_text["another with id"] == 6
    want = _derive_ids(["missing id one", "missing id two"])
    got_one = df[df["text"] == "missing id one"]["doc_id"]
    assert (got_one == want[0]).all()          # per-row fill, both rows
    assert by_text["missing id two"] == want[1]
    assert (df["doc_id"] >= 0).all()
