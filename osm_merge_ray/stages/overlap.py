"""Building-overlap dedup join (SURVEY §2.5 J6), Ray-Data-first.

Reference: ``ConflateBuildings`` (conflateBuildings.py:73-143) — a
PostGIS ``ST_INTERSECTS`` self-join between external footprints and OSM
buildings, then an anti-join deleting intersecting footprints, leaving
"new buildings". The reference itself warns "This is not fast for large
areas!" (conflateBuildings.py:83).

Engine realization: the SAME one-shuffle cell pattern as the conflation
join — polygons are replicated to the k-ring of their centroid cell
(valid while footprint diameter < cell edge; documented assumption),
per-bucket STRtree bbox gating, exact convex intersection areas
(geo/polygons.py) — no database, no quadratic scan.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.geo import cells as C
from osm_merge_ray.geo.polygons import bbox_of, intersection_area, shoelace_area
from osm_merge_ray.geo.strtree import STRtree
from osm_merge_ray.util import splitmix64


def _prep_polygons(t: pa.Table, cfg: ConflationConfig, side: int) -> pa.Table:
    """feature table (coords_json rings) → light polygon rows with
    centroid cell; polygons stay as JSON (small rings)."""
    ids = t.column("feature_id").to_numpy()
    coords = t.column("coords_json").to_pylist()
    cx = np.empty(len(ids))
    cy = np.empty(len(ids))
    for i, cj in enumerate(coords):
        ring = np.asarray(json.loads(cj), dtype=np.float64).reshape(-1, 2)
        cx[i] = ring[:, 0].mean()
        cy[i] = ring[:, 1].mean()
    cell = C.lonlat_to_cell(cx, cy, cfg.cell_res)
    return pa.table({
        "feature_id": pa.array(ids, pa.int64()),
        "coords_json": t.column("coords_json"),
        "cell": pa.array(cell, pa.int64()),
        "side": pa.array(np.full(len(ids), side, dtype=np.int8), pa.int8()),
    })


def polygon_overlap_pairs(primary_ds, secondary_ds, cfg: ConflationConfig | None = None,
                          min_area_ratio: float = 0.0):
    """All (primary, secondary) polygon pairs that intersect, with the
    intersection area — the ST_INTERSECTS + ST_Area join. A pair counts
    when ``area / min(|a|, |b|) > min_area_ratio`` (0 = any overlap,
    the reference's rule)."""
    cfg = cfg or ConflationConfig(cell_res=12)

    p = primary_ds.map_batches(lambda t: _prep_polygons(t, cfg, 0), batch_format="pyarrow")
    s = secondary_ds.map_batches(lambda t: _prep_polygons(t, cfg, 1), batch_format="pyarrow")

    def replicate(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy()
        ring = C.k_ring(cell, include_self=True)
        n, r = ring.shape
        idx = np.repeat(np.arange(n), r)
        out = t.take(idx)
        out = out.set_column(out.schema.get_field_index("cell"), "cell",
                             pa.array(ring.reshape(-1), pa.int64()))
        return out

    s_rep = s.map_batches(replicate, batch_format="pyarrow")
    both = p.union(s_rep)

    def with_bucket(t: pa.Table) -> pa.Table:
        b = (splitmix64(t.column("cell").to_numpy().view(np.uint64))
             % np.uint64(cfg.num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    both = both.map_batches(with_bucket, batch_format="pyarrow")

    def match(df: pd.DataFrame) -> pd.DataFrame:
        prim = df[df["side"] == 0]
        sec = df[df["side"] == 1]
        cols = {"id_a": [], "id_b": [], "overlap_area": []}
        if len(prim) and len(sec):
            p_rings = [np.asarray(json.loads(c), dtype=np.float64).reshape(-1, 2)
                       for c in prim["coords_json"]]
            s_rings = [np.asarray(json.loads(c), dtype=np.float64).reshape(-1, 2)
                       for c in sec["coords_json"]]
            p_ids = prim["feature_id"].to_numpy()
            s_ids = sec["feature_id"].to_numpy()
            p_cell = prim["cell"].to_numpy()
            s_cell = sec["cell"].to_numpy()
            tree = STRtree(np.array([bbox_of(r) for r in s_rings]))
            seen = set()
            for i, ring in enumerate(p_rings):
                x0, y0, x1, y1 = bbox_of(ring)
                for j in tree.query(x0, y0, x1, y1):
                    # the k-ring replication can surface the same true
                    # pair in several cells of one bucket — dedup, and
                    # only score a pair in the group of its OWN cell
                    key = (int(p_ids[i]), int(s_ids[j]))
                    if key in seen or p_cell[i] != s_cell[j]:
                        continue
                    seen.add(key)
                    area = intersection_area(ring, s_rings[j])
                    if area <= 0:
                        continue
                    amin = min(abs(shoelace_area(ring)), abs(shoelace_area(s_rings[j])))
                    if amin > 0 and area / amin > min_area_ratio:
                        cols["id_a"].append(key[0])
                        cols["id_b"].append(key[1])
                        cols["overlap_area"].append(area)
        return pd.DataFrame({
            "id_a": pd.array(cols["id_a"], dtype=np.int64),
            "id_b": pd.array(cols["id_b"], dtype=np.int64),
            "overlap_area": pd.array(cols["overlap_area"], dtype=np.float64),
        })

    pairs = both.groupby("bucket").map_groups(match, batch_format="pandas")
    # a pair may still appear in up to 9 buckets (one per ring cell of
    # the secondary) — global dedup keeps the max-area record
    from osm_merge_ray.ops import grouped_reduce

    return grouped_reduce(
        pairs, ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False).agg(
            overlap_area=("overlap_area", "max")),
    )


def new_buildings(primary_ds, pairs_ds, id_column: str = "feature_id"):
    """The anti-join (conflateBuildings.cleanDuplicates/getNew
    :114-143): primaries NOT in the overlap pairs = new buildings.
    Small pair set → broadcast semi-filter, no shuffle."""
    import ray

    dup_ids = set(pairs_ds.to_pandas()["id_a"].tolist())
    ref = ray.put(np.array(sorted(dup_ids), dtype=np.int64))

    def keep_new(t: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        ids = t.column(id_column).to_numpy()
        return t.filter(pa.array(~np.isin(ids, dup)))

    return primary_ds.map_batches(keep_new, batch_format="pyarrow")
