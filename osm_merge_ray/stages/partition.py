"""Shared scale partitioning for extended-geometry conflation joins.

Generalizes the flagship's point border-band + adaptive hot-cell
machinery (stages/conflate.py:164-273) to features with EXTENT (lines,
polygons): instead of replicating every secondary row to its full 9x
k-ring, a row is shipped only to the cells its bbox — expanded by the
match band — actually overlaps (~1x for features small vs the cell
edge), and hot cells are re-keyed at a finer resolution with a salt
fan-out backstop, exactly like the flagship path.

Completeness argument (why one decision row per primary still works):
a primary is keyed by its CENTROID cell only. If dist(P, S) <= d, then
dist(centroid_P, S) <= d + reach_P where reach_P is the centroid→bbox-
corner distance, so replicating S to every cell its bbox expanded by
``band = d + max_reach(primaries)`` overlaps guarantees the pair
co-locates in the primary's one (cell, salt) group — each pair is
scored at most once globally, no cross-bucket combine needed.

Light-row contract: input Datasets carry at least
``feature_id:int64, lon, lat (centroid), x0, y0, x1, y1 (bbox, deg),
cell:int64 (centroid cell at cfg.cell_res), side:int8``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm_merge_ray.config import ConflationConfig
from osm_merge_ray.geo import cells as C
from osm_merge_ray.util import splitmix64

#: max covered cells per axis per row — a feature spanning more cells
#: than this at the chosen res is trimmed (pick a coarser cell_res for
#: such a corpus; the cap bounds worst-case replication at 17x17).
AXIS_CAP = 8


def split_span_limit(cfg: ConflationConfig) -> float:
    """Max bbox span (degrees) for a prepared geometry PART — AXIS_CAP/2
    base cells per axis, so part span + 2 x band (which includes the max
    primary PART reach ~ span/sqrt(2)) stays inside the replicate
    stage's 2*AXIS_CAP+1 raise bound. Load-bearing invariant shared by
    the line splitter (stages/lines.py) and the polygon splitter
    (stages/overlap.py) — retune it HERE, not per geometry type."""
    return 0.5 * AXIS_CAP * C.cell_edge_deg(cfg.cell_res)


def has_split_parts(light) -> bool:
    """True iff any prepared light row is a split part (``part_json``
    non-empty). Run it over ``shuffle_match``'s already-materialized
    union (its ``light_probe`` hook) — zero extra passes over lazy
    inputs."""
    def count_parts(t: pa.Table) -> pa.Table:
        k = int(pc.sum(pc.cast(pc.not_equal(t.column("part_json"), ""),
                               pa.int64())).as_py() or 0)
        return pa.table({"k": pa.array([k], pa.int64())})

    return int(light.map_batches(count_parts, batch_format="pyarrow")
               .to_pandas()["k"].sum()) > 0


def fine_res_of(cfg: ConflationConfig) -> int:
    """Hot-cell refinement resolution: at most 3 levels below base (8x
    finer per axis) so one base-cell-spanning feature covers <= ~8 fine
    cells per axis, and never finer than the match distance allows."""
    return min(C.res_for_distance(cfg.distance_m), cfg.cell_res + 3)


def bbox_band_targets(x0, y0, x1, y1, res: int, band_m: float,
                      cap: int = AXIS_CAP, return_trimmed: bool = False):
    """(row_idx, target_cell) for every grid cell at ``res`` overlapped
    by each bbox expanded by ``band_m`` meters (lat-aware on lon).
    Point rows (x0==x1, y0==y1) reduce to the flagship's border-band.
    With ``return_trimmed`` also returns a per-INPUT-row bool mask of
    rows whose cover exceeded ``cap`` cells per axis and was clamped —
    callers that promise completeness must route those rows through an
    exhaustive path instead (ADVICE r2 #2)."""
    x0, y0, x1, y1 = (np.asarray(a, dtype=np.float64) for a in (x0, y0, x1, y1))
    n = len(x0)
    if n == 0:
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return (*empty, np.empty(0, dtype=bool)) if return_trimmed else empty
    s = C.cell_edge_deg(res)
    latm = (y0 + y1) * 0.5
    with np.errstate(invalid="ignore"):
        bx = band_m / (C.M_PER_DEG_LAT * np.maximum(np.abs(np.cos(np.radians(latm))), 1e-3))
    by = band_m / C.M_PER_DEG_LAT
    ix0 = np.floor((x0 - bx + 180.0) / s).astype(np.int64)
    ix1 = np.floor((x1 + bx + 180.0) / s).astype(np.int64)
    iy0 = np.floor((y0 - by + 90.0) / s).astype(np.int64)
    iy1 = np.floor((y1 + by + 90.0) / s).astype(np.int64)
    span = 2 * cap  # max cells per axis = span+1
    trimmed = (ix1 - ix0 > span) | (iy1 - iy0 > span)
    ix1 = np.minimum(ix1, ix0 + span)
    iy1 = np.minimum(iy1, iy0 + span)
    nx_cnt = ix1 - ix0 + 1
    ny_cnt = iy1 - iy0 + 1
    cnt = nx_cnt * ny_cnt
    total = int(cnt.sum())
    rows = np.repeat(np.arange(n, dtype=np.int64), cnt)
    offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    w = np.arange(total, dtype=np.int64) - np.repeat(offs, cnt)
    jx = np.repeat(ix0, cnt) + w // np.repeat(ny_cnt, cnt)
    jy = np.repeat(iy0, cnt) + w % np.repeat(ny_cnt, cnt)
    nx = np.int64(1 << res)
    ny = np.int64(1 << max(res - 1, 0))
    jx = np.mod(jx, nx)
    jy = np.clip(jy, 0, ny - 1)
    cells = C.xy_to_cell(jx, jy, res)
    if return_trimmed:
        return rows, cells, trimmed
    return rows, cells


def reach_m(lon, lat, x0, y0, x1, y1) -> np.ndarray:
    """Per-row centroid→farthest-bbox-corner distance in meters (upper
    bound on centroid→geometry distance)."""
    lon, lat = np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    dx_deg = np.maximum(np.asarray(x1) - lon, lon - np.asarray(x0))
    dy_deg = np.maximum(np.asarray(y1) - lat, lat - np.asarray(y0))
    kx = C.M_PER_DEG_LAT * np.abs(np.cos(np.radians(lat)))
    dx = np.maximum(dx_deg, 0.0) * kx
    dy = np.maximum(dy_deg, 0.0) * C.M_PER_DEG_LAT
    return np.sqrt(dx * dx + dy * dy)


def max_primary_reach_m(light_ds) -> float:
    """Distributed max of the primary-side reach (one tiny aggregate;
    the only driver-side value this machinery needs besides hot cells)."""
    def partial(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t.column("side"), 0))
        if m.num_rows == 0:
            return pa.table({"m": pa.array([0.0], pa.float64())})
        r = reach_m(m.column("lon").to_numpy(), m.column("lat").to_numpy(),
                    m.column("x0").to_numpy(), m.column("y0").to_numpy(),
                    m.column("x1").to_numpy(), m.column("y1").to_numpy())
        return pa.table({"m": pa.array([float(r.max())], pa.float64())})

    out = light_ds.map_batches(partial, batch_format="pyarrow").max("m")
    return float(out or 0.0)


def _with_bucket(t: pa.Table, cfg: ConflationConfig) -> pa.Table:
    cell = t.column("cell").to_numpy()
    salt = t.column("salt").to_numpy()
    b = C.bucket_of(cell, cfg.num_buckets,
                    salt=salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    return t.append_column("bucket", pa.array(b, pa.int64()))


def make_tag_primary(cfg: ConflationConfig, salts: dict[int, int]):
    """Primaries keep ONE row: hot-base-cell rows re-keyed at the fine
    resolution of their centroid, salted by feature_id hash."""
    hot = np.array(sorted(salts), dtype=np.int64)
    fine = fine_res_of(cfg)

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("side"), 0))
        cell = t.column("cell").to_numpy().copy()
        salt = np.zeros(len(cell), dtype=np.int64)
        if len(hot) and len(cell):
            m = np.isin(cell, hot)
            if m.any():
                lon = t.column("lon").to_numpy()
                lat = t.column("lat").to_numpy()
                base = cell[m]
                cell[m] = C.lonlat_to_cell(lon[m], lat[m], fine)
                ids = t.column("feature_id").to_numpy()[m]
                h = splitmix64(ids.view(np.uint64))
                nsalt = np.ones(int(m.sum()), dtype=np.uint64)
                for c, k in salts.items():
                    nsalt[base == c] = k
                salt[m] = (h % nsalt).astype(np.int64)
        out = t.set_column(t.schema.get_field_index("cell"), "cell",
                           pa.array(cell, pa.int64()))
        out = out.append_column("salt", pa.array(salt, pa.int64()))
        return _with_bucket(out, cfg)

    return tag


def make_replicate_secondary(cfg: ConflationConfig, salts: dict[int, int],
                             band_m: float):
    """Secondaries ship to every base cell their banded bbox overlaps;
    targets landing in a HOT base cell are re-emitted as the fine-res
    banded cover (restricted to hot parents) x every salt of that
    parent. Replication factor ~1 + O(band/edge) instead of 9x."""
    hot = np.array(sorted(salts), dtype=np.int64)
    fine = fine_res_of(cfg)

    def rep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("side"), 1))
        x0 = t.column("x0").to_numpy()
        y0 = t.column("y0").to_numpy()
        x1 = t.column("x1").to_numpy()
        y1 = t.column("y1").to_numpy()
        idx, tgt, trimmed = bbox_band_targets(x0, y0, x1, y1, cfg.cell_res,
                                              band_m, return_trimmed=True)
        if trimmed.any():
            # a trimmed cover silently loses far-end in-band pairs — fail
            # loudly instead (raise-not-truncate is the engine's contract)
            k = int(trimmed.sum())
            raise ValueError(
                f"{k} secondary feature(s) span more than {2 * AXIS_CAP + 1} "
                f"cells per axis at cell_res={cfg.cell_res} with a "
                f"{band_m:.1f} m band; their cell cover would be trimmed and "
                "in-band candidate pairs silently lost. Split oversized "
                "geometries upstream (conflate_lines splits antimeridian-"
                "crossing lines automatically) or use a coarser cell_res.")

        is_hot_t = np.isin(tgt, hot) if len(hot) else np.zeros(len(tgt), dtype=bool)
        base_idx = idx[~is_hot_t]
        base_tgt = tgt[~is_hot_t]
        base_salt = np.zeros(len(base_idx), dtype=np.int64)

        fine_idx = np.empty(0, dtype=np.int64)
        fine_tgt = np.empty(0, dtype=np.int64)
        fine_salt = np.empty(0, dtype=np.int64)
        if is_hot_t.any():
            rows_hot = np.unique(idx[is_hot_t])
            # cap scaled by the refinement factor: the fine cover must
            # reach as far (in base cells) as the base cover does, or a
            # secondary spanning several base cells loses its hot-cell
            # candidates beyond the trim (code-review r2 finding)
            f_rel, f_tgt = bbox_band_targets(
                x0[rows_hot], y0[rows_hot], x1[rows_hot], y1[rows_hot],
                fine, band_m, cap=AXIS_CAP << (fine - cfg.cell_res),
            )
            parents = C.parent(f_tgt, cfg.cell_res)
            keep_f = np.isin(parents, hot)  # non-hot parents are covered
            f_idx = rows_hot[f_rel[keep_f]]
            f_tgt = f_tgt[keep_f]
            parents = parents[keep_f]
            nsalt = np.ones(len(f_tgt), dtype=np.int64)
            for c, k in salts.items():
                nsalt[parents == c] = k
            fine_idx = np.repeat(f_idx, nsalt)
            fine_tgt = np.repeat(f_tgt, nsalt)
            offs = np.concatenate(([0], np.cumsum(nsalt)[:-1]))
            fine_salt = (np.arange(int(nsalt.sum()), dtype=np.int64)
                         - np.repeat(offs, nsalt))

        all_idx = np.concatenate([base_idx, fine_idx])
        all_tgt = np.concatenate([base_tgt, fine_tgt])
        all_salt = np.concatenate([base_salt, fine_salt])
        out = t.take(all_idx)
        out = out.set_column(out.schema.get_field_index("cell"), "cell",
                             pa.array(all_tgt, pa.int64()))
        out = out.append_column("salt", pa.array(all_salt, pa.int64()))
        return _with_bucket(out, cfg)

    return rep


def group_key(cell: np.ndarray, salt: np.ndarray) -> np.ndarray:
    """64-bit mixed (cell, salt) join key for in-bucket pair generation
    (same construction as the flagship matcher)."""
    return splitmix64(
        cell.astype(np.int64).view(np.uint64) + splitmix64(salt.astype(np.uint64))
    ).view(np.int64)


def local_refined_pairs(kp: np.ndarray, ks: np.ndarray,
                        p_lon: np.ndarray, p_lat: np.ndarray,
                        s_x0: np.ndarray, s_y0: np.ndarray,
                        s_x1: np.ndarray, s_y1: np.ndarray,
                        band_m: float,
                        pair_budget: int = 2_000_000) -> tuple[np.ndarray, np.ndarray]:
    """``same_key_pairs`` with IN-MEMORY fine-grid refinement for
    oversized groups.

    The shuffle-level hot-cell refinement is capped at cell_res+3 (an
    extended feature must not cover hundreds of fine cells in the
    exchange), so a dense cluster SMALLER than that fine cell still
    lands in one group — where enumerating P*S pairs explodes (a
    60k x 60k urban blob is 3.6e9 pairs). Groups whose P*S product
    exceeds ``pair_budget`` are re-keyed here, locally and without any
    shuffle, on a grid sized to the match band
    (``res_for_distance(band_m)``, uncapped): primaries by centroid
    cell, secondaries by banded bbox cover. Pairs within the band are
    never lost (same cover-completeness argument as the exchange), and
    each surviving pair appears exactly once.
    """
    from osm_merge_ray.ops import same_key_pairs

    if len(kp) == 0 or len(ks) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # per-group side counts to find oversized groups
    up, cp = np.unique(kp, return_counts=True)
    us, cs = np.unique(ks, return_counts=True)
    common, ip, is_ = np.intersect1d(up, us, return_indices=True)
    prod = cp[ip].astype(np.float64) * cs[is_].astype(np.float64)
    big = common[prod > pair_budget]
    if len(big) == 0:
        return same_key_pairs(kp, ks)

    p_big = np.isin(kp, big)
    s_big = np.isin(ks, big)
    pi0, si0 = same_key_pairs(kp[~p_big], ks[~s_big])
    p_small_idx = np.flatnonzero(~p_big)
    s_small_idx = np.flatnonzero(~s_big)
    out_p = [p_small_idx[pi0]]
    out_s = [s_small_idx[si0]]

    fine = C.res_for_distance(max(band_m, 1e-3))
    p_idx = np.flatnonzero(p_big)
    s_idx = np.flatnonzero(s_big)
    kp2 = splitmix64(
        kp[p_idx].view(np.uint64)
        ^ C.lonlat_to_cell(p_lon[p_idx], p_lat[p_idx], fine).view(np.uint64)
    ).view(np.int64)
    rows, cells, trimmed = bbox_band_targets(
        s_x0[s_idx], s_y0[s_idx], s_x1[s_idx], s_y1[s_idx], fine, band_m,
        cap=64,  # local arrays only — a wide cover costs memory, not shuffle
        return_trimmed=True,
    )
    if trimmed.any():
        # a secondary spanning more cells than the cap would lose far-end
        # in-band pairs to the clamp (ADVICE r2 #2) — route such rows
        # through exhaustive same-group pairing instead (bounded: they
        # pair against every primary of their original oversized group,
        # the pre-refinement behavior) and drop their clamped replicas.
        t_idx = s_idx[trimmed]
        pi_t, si_t = same_key_pairs(kp[p_idx], ks[t_idx])
        out_p.append(p_idx[pi_t])
        out_s.append(t_idx[si_t])
        keep_rep = ~trimmed[rows]
        rows, cells = rows[keep_rep], cells[keep_rep]
    s_rep = s_idx[rows]
    ks2 = splitmix64(ks[s_rep].view(np.uint64) ^ cells.view(np.uint64)).view(np.int64)
    pi1, si1 = same_key_pairs(kp2, ks2)
    out_p.append(p_idx[pi1])
    out_s.append(s_rep[si1])
    pi = np.concatenate(out_p)
    si = np.concatenate(out_s)
    return pi, si


def shuffle_match(p_light, s_light, cfg: ConflationConfig, band_extra_m: float,
                  match_fn, skew_salting: bool = True, light_probe=None):
    """Assemble the one-shuffle pattern: union light sides → (max-reach
    + hot-cell plan over the materialized LIGHT projection, ~100 B/row)
    → tag/replicate → bucket groupby → ``match_fn`` per bucket.

    ``match_fn(df)`` sees light rows of one bucket with ``cell`` and
    ``salt`` columns and must join sides on (cell, salt) — use
    ``group_key``. ``band_extra_m`` is the match distance (0 for
    pure-overlap joins); the primary max reach is added automatically.

    ``light_probe(light_ds)``, when given, runs over the ALREADY
    materialized union (zero extra passes over lazy inputs, no pipeline
    barrier beyond the one this function always has) and the call
    returns ``(decisions_ds, probe_result)`` — callers that need a
    global predicate of the prepared rows (e.g. "any antimeridian split
    part present?") hook it here instead of materializing their input a
    second time.
    """
    from osm_merge_ray.stages.conflate import plan_salts

    light = p_light.union(s_light).materialize()
    probe = light_probe(light) if light_probe is not None else None
    band = band_extra_m + max_primary_reach_m(light)
    salts = plan_salts(light, cfg) if skew_salting else {}
    p = light.map_batches(make_tag_primary(cfg, salts), batch_format="pyarrow")
    s = light.map_batches(make_replicate_secondary(cfg, salts, band),
                          batch_format="pyarrow")
    out = (
        p.union(s)
        .groupby("bucket")
        .map_groups(match_fn, batch_format="pandas")
    )
    return (out, probe) if light_probe is not None else out
