"""End-to-end conflation tests: engine (cell-sharded, vectorized) vs the
brute-force O(N*M) oracle, plus tiling, decode-verify and checkpoint
resume."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.geo.mercator import TileGrid
from osm_merge_ray.image.stages import DecodeVerify
from osm_merge_ray.pipelines.conflation import flagship, run_checkpointed
from osm_merge_ray.stages.conflate import conflate_datasets
from osm_merge_ray.state import checkpoint as CK
from osm_merge_ray.synth import synth_table

from tests.oracle import conflate_oracle

N = 600
CFG = ConflationConfig(cell_res=15, num_buckets=16, hot_cell_rows=200)

CMP_COLS = ["image_id", "matched_id", "decision", "hits", "dist_mm", "caption", "old_caption"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df[CMP_COLS].copy()
    for c in ("image_id", "matched_id", "decision", "caption", "old_caption"):
        out[c] = out[c].astype(object).where(pd.notna(out[c]), None)
    return out.sort_values("image_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def sides():
    tp = synth_table(N, "primary", with_bytes=False)
    ts = synth_table(N, "secondary", with_bytes=False)
    return tp, ts


@pytest.fixture(scope="module")
def oracle_out(sides):
    tp, ts = sides
    return _norm(conflate_oracle(tp.to_pandas(), ts.to_pandas(), CFG))


def test_engine_matches_bruteforce_oracle(ray_session, sides, oracle_out):
    tp, ts = sides
    got = conflate_datasets(rd.from_arrow(tp), rd.from_arrow(ts), CFG,
                            skew_salting=False).to_pandas()
    assert len(got) == N
    pd.testing.assert_frame_equal(_norm(got), oracle_out)


def test_hot_cell_salting_is_semantically_invisible(ray_session, sides, oracle_out):
    """Skew splitting must not change any decision (hot_cell_rows=5
    forces heavy salting on the planted dense clusters)."""
    tp, ts = sides
    cfg = ConflationConfig(cell_res=15, num_buckets=16, hot_cell_rows=5)
    got = conflate_datasets(rd.from_arrow(tp), rd.from_arrow(ts), cfg,
                            skew_salting=True).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), oracle_out)


def test_planted_categories_come_out_right(ray_session, sides):
    tp, ts = sides
    got = conflate_datasets(rd.from_arrow(tp), rd.from_arrow(ts), CFG,
                            skew_salting=False).to_pandas()
    got["i"] = got["image_id"].str[1:].astype(int)
    cat = got.set_index("i")
    # exact duplicates (cat 0,1): matched to same index, duplicate
    sub = cat[cat.index % 10 <= 1]
    assert (sub["decision"] == "duplicate").mean() > 0.95
    # near-dups (2-5): merged with hits >= 2 to the planted partner
    sub = cat[(cat.index % 10 >= 2) & (cat.index % 10 <= 5)]
    matched = sub["matched_id"].dropna().str[1:].astype(int)
    assert (matched == matched.index).mean() > 0.95
    assert (sub["hits"] >= 2).mean() > 0.9
    # uniques (7-9): new
    sub = cat[cat.index % 10 >= 7]
    assert (sub["decision"] == "new").mean() > 0.95


def test_tile_assignment_matches_direct_projection(ray_session, sides):
    tp, ts = sides
    from osm_merge_ray.pipelines.conflation import default_grid
    from osm_merge_ray.stages.tiling import assign_tiles

    cfg = CFG
    grid = default_grid(cfg)
    out = assign_tiles(
        conflate_datasets(rd.from_arrow(tp), rd.from_arrow(ts), cfg, skew_salting=False),
        grid,
    ).to_pandas()
    exp = grid.tile_of_lonlat(out["lon"].to_numpy(), out["lat"].to_numpy())
    assert np.array_equal(out["tile_id"].to_numpy(), exp)
    assert out["tile_id"].nunique() > 10  # spread across the grid


def test_decode_verify_stage_direct():
    t = synth_table(64, "primary", with_bytes=True)
    out = DecodeVerify()(t)
    assert out.column("decode_ok").to_pylist() == [True] * 64
    assert out.column("dims_ok").to_pylist() == [True] * 64
    assert max(out.column("phash_dist").to_pylist()) == 0
    assert min(out.column("psnr_db").to_pylist()) >= 40.0
    assert "bytes" not in out.column_names


def test_flagship_smoke(ray_session):
    out = flagship(n_per_side=200, cfg=ConflationConfig(num_buckets=8)).to_pandas()
    assert len(out) == 200
    assert set(out["decision"].unique()) <= {"new", "merged", "duplicate"}
    assert "tile_id" in out.columns


def test_checkpoint_resume_equals_fresh_run(ray_session, sides, tmp_path):
    tp, ts = sides
    cfg = ConflationConfig(cell_res=15, num_buckets=16, hot_cell_rows=200)
    fresh_dir = str(tmp_path / "fresh")
    m1 = run_checkpointed(rd.from_arrow(tp), rd.from_arrow(ts), fresh_dir, cfg)
    assert m1["rows_emitted"] == N
    fresh = CK.read_output(fresh_dir).to_pandas()

    # simulate a killed job: drop a third of the finished partitions
    resume_dir = str(tmp_path / "resumed")
    shutil.copytree(fresh_dir, resume_dir)
    buckets = sorted(CK.finished_buckets(resume_dir))
    for b in buckets[:: 3]:
        shutil.rmtree(os.path.join(resume_dir, f"bucket={b}"))
        os.remove(os.path.join(CK.manifest_dir(resume_dir), f"bucket={b}.json"))
    kept = len(CK.finished_buckets(resume_dir))
    assert kept < len(buckets)

    m2 = run_checkpointed(rd.from_arrow(tp), rd.from_arrow(ts), resume_dir, cfg)
    assert m2["buckets_skipped"] == kept
    resumed = CK.read_output(resume_dir).to_pandas()
    pd.testing.assert_frame_equal(_norm(fresh), _norm(resumed))


def test_checkpoint_refuses_changed_config(ray_session, sides, tmp_path):
    """ADVICE r1: resuming against an out_dir written under a different
    ConflationConfig must refuse, not silently mix partitionings."""
    import pytest

    tp, ts = sides
    d = str(tmp_path / "ckpt")
    run_checkpointed(rd.from_arrow(tp), rd.from_arrow(ts), d,
                     ConflationConfig(cell_res=15, num_buckets=16, hot_cell_rows=200))
    with pytest.raises(ValueError, match="different"):
        run_checkpointed(rd.from_arrow(tp), rd.from_arrow(ts), d,
                         ConflationConfig(cell_res=15, num_buckets=8, hot_cell_rows=200))


def test_empty_secondary_all_new(ray_session, sides):
    """Verify-skill probe: an empty secondary side → every primary is
    'new' (the no-candidate fallback, conflator.py:318-325)."""
    tp, _ = sides
    empty = synth_table(0, "secondary", with_bytes=False)
    out = conflate_datasets(rd.from_arrow(tp), rd.from_arrow(empty), CFG,
                            skew_salting=False).to_pandas()
    assert len(out) == N
    assert (out["decision"] == "new").all()
    assert (out["matched_id"].isna()).all()


def test_derived_centroid_path(ray_session):
    """Verify-skill probe: inputs WITHOUT lon/lat columns take the
    derived-centroid path (hash of image_id) and still conflate —
    identical ids on both sides land at identical positions."""
    import pyarrow as pa

    tp = synth_table(100, "primary", with_bytes=False)
    tp = tp.drop_columns(["lon", "lat"])
    ts = synth_table(100, "primary", with_bytes=False).drop_columns(["lon", "lat"])
    out = conflate_datasets(rd.from_arrow(tp), rd.from_arrow(ts), CFG,
                            skew_salting=False).to_pandas()
    assert len(out) == 100
    # same ids → same derived centroid + caption + phash → duplicates
    assert (out["decision"] == "duplicate").all()
    assert (out["dist_mm"] == 0).all()


def test_actor_pool_decode_path_equals_task_path(ray_session, tmp_path):
    """conflate_parquet's explicit actor-pool decode (the heavy-init
    decoder mode) must produce identical decisions to the fused task
    mode."""
    import pyarrow.parquet as pq

    from osm_merge_ray.pipelines.conflation import conflate_parquet

    for side in ("primary", "secondary"):
        d = tmp_path / side
        d.mkdir()
        pq.write_table(synth_table(300, side, with_bytes=True),
                       str(d / "part.parquet"))
    cfg = ConflationConfig(num_buckets=8)
    task = conflate_parquet(str(tmp_path / "primary"), str(tmp_path / "secondary"),
                            cfg=cfg).to_pandas()
    pool = conflate_parquet(str(tmp_path / "primary"), str(tmp_path / "secondary"),
                            cfg=cfg, decode_concurrency=(1, 2)).to_pandas()
    cols = ["image_id", "matched_id", "decision", "hits", "dist_mm"]
    a = task[cols].sort_values("image_id").reset_index(drop=True)
    b = pool[cols].sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(_norm_ids(a), _norm_ids(b))


def _norm_ids(df):
    out = df.copy()
    for c in ("image_id", "matched_id", "decision"):
        out[c] = out[c].astype(object).where(pd.notna(out[c]), None)
    return out.reset_index(drop=True)


def test_checkpoint_records_fragment_lineage(ray_session, tmp_path):
    """r4: feeding run_checkpointed through read_parquet_with_lineage
    records per-bucket input_fragments in the manifests plus a
    run-level frag->path map — the north-rule's per-partition lineage
    (cell range, input fragment ids, rows, metrics)."""
    import json
    import os

    from osm_merge_ray.pipelines.conflation import (
        read_parquet_with_lineage, run_checkpointed)
    from osm_merge_ray.synth import synth_dataset

    dirs = {}
    for side in ("primary", "secondary"):
        d = tmp_path / side
        synth_dataset(400, side, with_bytes=False,
                      parallelism=4).write_parquet(str(d))
        dirs[side] = str(d)

    p, pmap = read_parquet_with_lineage(dirs["primary"])
    s, smap = read_parquet_with_lineage(dirs["secondary"])
    fmap = {**pmap, **smap}
    out = str(tmp_path / "ck")
    m = run_checkpointed(p, s, out, ConflationConfig(num_buckets=16),
                         fragment_map=fmap)
    assert m["rows_emitted"] > 0

    man_dir = f"{out}/_manifest"
    stored = json.load(open(f"{man_dir}/fragments.json"))
    assert set(stored) == {str(k) for k in fmap}
    recs = [json.load(open(f"{man_dir}/{f}"))
            for f in os.listdir(man_dir) if f.startswith("bucket=")]
    assert recs and all("input_fragments" in r for r in recs)
    seen = {f for r in recs for f in r["input_fragments"]}
    assert seen <= set(fmap)      # every recorded frag resolves to a path
    assert len(seen) == len(fmap)  # all 8 input files fed some bucket


def test_lineage_path_normalization_symlink(ray_session, tmp_path):
    """r5 (advice): frag ids from Ray's include_paths strings and the
    run-level map from pyarrow.dataset files must agree even when the
    input is addressed through a symlink — both sides normalize with
    realpath, and add_frag RAISES on any id missing from the map
    instead of writing dangling lineage."""
    import os

    from osm_merge_ray.pipelines.conflation import read_parquet_with_lineage
    from osm_merge_ray.synth import synth_dataset

    real = tmp_path / "real_input"
    synth_dataset(100, "primary", with_bytes=False,
                  parallelism=3).write_parquet(str(real))
    link = tmp_path / "linked_input"
    os.symlink(str(real), str(link))

    ds, fmap = read_parquet_with_lineage(str(link))
    # the map stores canonical (realpath) spellings
    assert all(p.startswith(str(real)) for p in fmap.values())
    frags = set(ds.to_pandas()["frag"])
    assert frags and frags <= set(fmap)  # every row id resolves
