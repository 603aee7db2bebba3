"""The flagship pipeline: decode-verify → conflate → tile → write.

Engine analog of ``conflator.main`` (conflator.py:1041-1128): load
primary + secondary, conflate, classify merged/duplicate/new, write
partitioned output — restructured as one streaming Ray Data plan with
a single all-to-all exchange, plus an optional checkpointed execution
mode (``run_checkpointed``) that the reference has no equivalent of.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.geo.mercator import TileGrid
from osm_merge_ray.image.stages import DecodeVerify
from osm_merge_ray.stages import conflate as CF
from osm_merge_ray.stages.tiling import assign_tiles
from osm_merge_ray.state import checkpoint as CK
from osm_merge_ray.synth import AOI, synth_dataset


def default_grid(cfg: ConflationConfig) -> TileGrid:
    # 0.1 deg margin: secondary offsets can nudge rows past the AOI edge
    return TileGrid.from_bbox_lonlat(
        AOI[0] - 0.1, AOI[1] - 0.1, AOI[2] + 0.1, AOI[3] + 0.1, cfg.tile_meters
    )


def flagship(n_per_side: int = 1000, cfg: ConflationConfig | None = None,
             decode_images: bool = True, skew_salting: bool = True,
             seed: int = 42):
    """Synthesize both sides distributed, optionally decode+verify the
    image payloads (actor pool), run the conflation join, assign tiles.
    Returns the lazy decision Dataset."""
    import os

    cfg = cfg or ConflationConfig()
    p = synth_dataset(n_per_side, "primary", seed=seed, with_bytes=decode_images)
    s = synth_dataset(n_per_side, "secondary", seed=seed, with_bytes=decode_images)
    union = CF.tag_side(p, 0).union(CF.tag_side(s, 1))
    if decode_images:
        union = union.map_batches(DecodeVerify, batch_format="pyarrow",
                                  batch_size=256,
                                  concurrency=(1, max(4, os.cpu_count() or 8)))
    decisions = CF.conflate_union(union, cfg, skew_salting=skew_salting)
    return assign_tiles(decisions, default_grid(cfg))


def conflate_parquet(primary_path: str, secondary_path: str,
                     cfg: ConflationConfig | None = None,
                     decode_images: bool = True, out_dir: str | None = None,
                     skew_salting: bool = True,
                     decode_concurrency: tuple[int, int] | None = None):
    """The production-shaped flagship: parquet (Lance-shaped) tables in,
    ONE side-tagged union → one actor-pool decode+verify sized to the
    node → conflate → tile → partitioned parquet out."""
    import os

    import ray.data as rd

    cfg = cfg or ConflationConfig()

    def read_side(path):
        # Match the read block count to the file count so Ray does not
        # insert a SplitBlocks op — SplitBlocks breaks operator fusion,
        # and fusion is what keeps the multi-KB image payloads OUT of
        # the object store: a fused ReadParquet->MapBatches(decode)
        # task decodes in worker heap and emits only the ~100 B light
        # rows. The store is a fixed-throughput shared resource
        # (~GB/s); every avoided bytes-crossing is wall time at every
        # cluster size and is THE scaling limiter on one node.
        import pyarrow.dataset as pads

        pds = pads.dataset(path)
        nfiles = len(pds.files)
        # prune at the read: without the decode stage the bytes column
        # never leaves storage
        cols = None
        if not decode_images:
            cols = [c for c in pds.schema.names
                    if c in ("image_id", "caption", "phash", "lon", "lat")]
        ds = rd.read_parquet(path, override_num_blocks=max(nfiles, 1),
                             columns=cols)
        if decode_images:
            if decode_concurrency is not None:
                # explicit actor pool (real heavy-init decoders)
                return ds.map_batches(DecodeVerify, batch_format="pyarrow",
                                      batch_size=512,
                                      concurrency=decode_concurrency)
            # stateless task mode, NO batch_size: an explicit batch_size
            # prevents Ray from fusing the map with ReadParquet, and an
            # unfused decode ships the image BYTES through the object
            # store (measured: read+decode 2x slower). Fused, the batch
            # is the file block - decode memory is bounded by file size.
            return ds.map_batches(DecodeVerify(), batch_format="pyarrow")
        return ds

    union = CF.tag_side(read_side(primary_path), 0).union(
        CF.tag_side(read_side(secondary_path), 1)
    )
    out = assign_tiles(
        CF.conflate_union(union, cfg, skew_salting=skew_salting),
        default_grid(cfg),
    )
    if out_dir is not None:
        out.write_parquet(out_dir)
    return out


def read_parquet_with_lineage(path: str):
    """Read a parquet directory with a per-row ``frag`` column — a
    stable int64 id of the source FILE (splitmix64 of the path's FNV
    hash) — plus the {frag: path} map. Feed both sides of
    ``run_checkpointed`` through this and every bucket manifest records
    which input fragments it consumed (the north-rule's "input fragment
    ids" lineage): when one input file is replaced, exactly the buckets
    naming its frag id need invalidation, not the whole run."""
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from osm_merge_ray.util import hash64_str, splitmix64

    ds = rd.read_parquet(path, include_paths=True)

    def _norm(p: str) -> str:
        # one canonical spelling on BOTH sides (r4 advice: Ray's
        # include_paths strings and pyarrow.dataset().files can differ
        # in scheme prefix / normalization / symlink resolution, and a
        # mismatch silently records frag ids that resolve to nothing):
        # realpath local paths, strip a file:// scheme, leave remote
        # URIs (s3:// etc.) untouched
        if p.startswith("file://"):
            p = p[len("file://"):]
        return os.path.realpath(p) if "://" not in p else p

    def frag_map_of(paths: list[str]) -> dict[int, str]:
        ids = splitmix64(hash64_str(paths)).view(np.int64)
        return {int(i): p for i, p in zip(ids, paths)}

    fmap = frag_map_of(sorted({_norm(f) for f in pads.dataset(path).files}))
    known = frozenset(fmap)  # file-count sized, cheap closure broadcast

    def add_frag(t: pa.Table) -> pa.Table:
        paths = [_norm(p) for p in t.column("path").to_pylist()]
        ids = splitmix64(hash64_str(paths)).view(np.int64)
        missing = {int(i) for i in ids} - known
        if missing:  # fail LOUDLY instead of writing dangling lineage
            bad = sorted({p for p, i in zip(paths, ids)
                          if int(i) in missing})[:3]
            raise ValueError(
                "read_parquet_with_lineage: per-row fragment path(s) "
                f"{bad} not present in the run-level fragment map — "
                "path normalization mismatch between Ray include_paths "
                "and pyarrow.dataset files")
        t = t.drop_columns(["path"])
        return t.append_column("frag", pa.array(ids, pa.int64()))

    return ds.map_batches(add_frag, batch_format="pyarrow"), fmap


def run_checkpointed(primary_ds, secondary_ds, out_dir: str,
                     cfg: ConflationConfig | None = None,
                     resume: bool = True, skew_salting: bool = True,
                     fragment_map: dict[int, str] | None = None) -> dict:
    """Conflate with per-bucket checkpointing: each shuffle bucket's
    decision rows are written atomically with a manifest record
    (state/checkpoint.py); on resume, finished buckets are filtered out
    of the shuffle input *before* the exchange, so their rows are never
    shipped or rescored.

    Returns summary metrics. ``out_dir`` must be shared storage on a
    multi-node cluster.
    """
    cfg = cfg or ConflationConfig()
    grid = default_grid(cfg)
    done = CK.finished_buckets(out_dir) if resume else set()
    if fragment_map is not None:
        # run-level frag-id → input-file map (resolves the per-bucket
        # input_fragments lineage recorded below)
        import json as _json
        import os as _os

        _os.makedirs(CK.manifest_dir(out_dir), exist_ok=True)
        fp = _os.path.join(CK.manifest_dir(out_dir), "fragments.json")
        tmp = fp + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump({str(k): v for k, v in fragment_map.items()}, fh)
        _os.replace(tmp, fp)

    prep = lambda t: CF.prepare(t, cfg)  # noqa: E731
    union = CF.tag_side(primary_ds, 0).union(CF.tag_side(secondary_ds, 1))
    light = union.map_batches(prep, batch_format="pyarrow", batch_size=cfg.batch_size)
    if skew_salting:
        light = light.materialize()  # one upstream pass feeds count + shuffle
    # refuse resume under a changed config or (when cheaply known) input
    CK.check_run_manifest(out_dir, cfg,
                          input_rows=light.count() if skew_salting else None)
    salts = CF.plan_salts(light, cfg) if skew_salting else {}
    p_tag = light.map_batches(CF.make_tag_primary(cfg, salts), batch_format="pyarrow",
                              batch_size=cfg.batch_size)
    s_rep = light.map_batches(CF.make_replicate_secondary(cfg, salts),
                              batch_format="pyarrow", batch_size=cfg.batch_size)
    both = p_tag.union(s_rep)

    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(t: pa.Table) -> pa.Table:
            b = t.column("bucket").to_numpy()
            keep = ~np.isin(b, done_arr)
            return t.filter(pa.array(keep))

        both = both.map_batches(drop_done, batch_format="pyarrow")

    from osm_merge_ray.stages.tiling import make_assign_tiles

    assign = make_assign_tiles(grid)

    def match_and_write(df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        bucket = int(df["bucket"].iloc[0])
        frags = (np.unique(df["frag"].to_numpy()).tolist()
                 if "frag" in df.columns else None)
        out = CF.match_bucket(df, cfg)
        table = assign(pa.Table.from_pandas(out, preserve_index=False))
        CK.write_bucket_partition(
            out_dir, bucket, table, input_rows=len(df), wall_s=time.time() - t0,
            cells=df["cell"].unique().tolist(), frags=frags,
        )
        return pd.DataFrame({"bucket": [bucket], "rows": [table.num_rows]})

    metrics = both.groupby("bucket").map_groups(match_and_write, batch_format="pandas")
    rows = metrics.to_pandas()
    return {
        "buckets_done_now": len(rows),
        "buckets_skipped": len(done),
        "rows_emitted": int(rows["rows"].sum()) if len(rows) else 0,
    }
