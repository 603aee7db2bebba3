"""Driver-verifiable query suite: every operator family exposed as a
``(sf_dir) -> Dataset/DataFrame`` callable plus (where expressible) an
exactly-equivalent DuckDB SQL oracle.

Float-parity discipline (the driver hashes VALUES): every query that
must match SQL bit-for-bit restricts itself to IEEE-exactly-specified
ops (+, -, *, /, sqrt, floor) applied in the same textual order as the
SQL, integer arithmetic, or quantized outputs. No trig / no library
sums on the comparison path. Similarities are rounded to 6 dp before
ranking with an id tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# shared exact-parity constants (mirrored literally in the SQL strings)
# ---------------------------------------------------------------------------
HASH_A = 2654435761          # Knuth multiplicative constant
HASH_B = 1315423911
MOD = 4294967296.0           # 2^32
CELL_DEG = 0.25              # exact binary fraction → exact division
KX = 85263.0                 # m per deg lon at the AOI latitude (fixed)
KY = 111195.0                # m per deg lat
DIST_M = 20000.0
D2_MAX = DIST_M * DIST_M     # 4e8 m^2
CAP_LEN = 30                 # caption = first 30 chars of text
CAP_SIM_MIN = 60.0
SESSION_GAP_US = 1_800_000_000  # 30 min


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    # cap the block count: all-to-all ops (sort/groupby) pay a fixed
    # per-block cost, and the sf tables are small enough that the
    # default splitter produces dozens of tiny blocks
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           override_num_blocks=8)


def _derive_lonlat(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact-arithmetic synthetic centroid (bit-identical to the SQL)."""
    i = doc_id.astype(np.int64)
    h1 = (i * HASH_A) % np.int64(MOD)
    h2 = ((i + HASH_B) * HASH_A) % np.int64(MOD)
    lon = -113.0 + h1.astype(np.float64) / MOD * 9.0
    lat = 37.0 + h2.astype(np.float64) / MOD * 7.0
    return lon, lat


_DERIVE_SQL = (
    "-113.0 + (({id} * 2654435761) % 4294967296) / 4294967296.0 * 9.0",
    "37.0 + ((({id} + 1315423911) * 2654435761) % 4294967296) / 4294967296.0 * 7.0",
)


# ---------------------------------------------------------------------------
# spatial family (engine: cell shuffle + per-cell numpy; oracle: SQL join)
# ---------------------------------------------------------------------------

def _with_cells(t: pa.Table) -> pa.Table:
    doc_id = t.column("doc_id").to_numpy()
    lon, lat = _derive_lonlat(doc_id)
    cx = np.floor((lon + 180.0) / CELL_DEG).astype(np.int64)
    cy = np.floor((lat + 90.0) / CELL_DEG).astype(np.int64)
    out = t.append_column("lon", pa.array(lon, pa.float64()))
    out = out.append_column("lat", pa.array(lat, pa.float64()))
    out = out.append_column("cx", pa.array(cx, pa.int64()))
    out = out.append_column("cy", pa.array(cy, pa.int64()))
    return out


def spatial_cell_index(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return ds.map_batches(_with_cells, batch_format="pyarrow")


SQL_CELL_INDEX = f"""
SELECT doc_id,
       {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
       {_DERIVE_SQL[1].format(id='doc_id')} AS lat,
       CAST(floor(({_DERIVE_SQL[0].format(id='doc_id')} + 180.0) / 0.25) AS BIGINT) AS cx,
       CAST(floor(({_DERIVE_SQL[1].format(id='doc_id')} + 90.0) / 0.25) AS BIGINT) AS cy
FROM documents
"""


def _pack(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return cx * np.int64(4096) + cy  # cx<=1440, cy<=720 → exact, collision-free


def _pair_groups(a: pd.DataFrame, b: pd.DataFrame, emit):
    """Group A rows with replicated B rows by exact packed cell, run
    ``emit(a_slice_indices, b_slice_indices)`` per cell."""
    ka = _pack(a["cx"].to_numpy(), a["cy"].to_numpy())
    kb = _pack(b["cx"].to_numpy(), b["cy"].to_numpy())
    oa = np.argsort(ka, kind="stable")
    ob = np.argsort(kb, kind="stable")
    kas, kbs = ka[oa], kb[ob]
    cells = np.unique(kas)
    alo = np.searchsorted(kas, cells)
    ahi = np.searchsorted(kas, cells, side="right")
    blo = np.searchsorted(kbs, cells)
    bhi = np.searchsorted(kbs, cells, side="right")
    for g in range(len(cells)):
        ai = oa[alo[g]:ahi[g]]
        bi = ob[blo[g]:bhi[g]]
        if len(bi):
            emit(ai, bi)


def _spatial_join_pipeline(sf_dir: str, extra_cols: list[str], group_fn):
    """Shared plumbing: derive/cells → replicate odd side to 3x3 ring →
    one bucket groupby → ``group_fn`` per bucket."""
    import ray.data as rd

    from osm_merge_ray.util import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id"] + extra_cols)
    ds = ds.map_batches(_with_cells, batch_format="pyarrow")

    def split_tag(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_numpy()
        even = doc_id % 2 == 0
        a = t.filter(pa.array(even)).append_column(
            "side", pa.array(np.zeros(int(even.sum()), dtype=np.int8))
        )
        b = t.filter(pa.array(~even))
        # replicate odd side to its 3x3 neighborhood
        reps = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                bb = b
                cx = bb.column("cx").to_numpy() + dx
                cy = bb.column("cy").to_numpy() + dy
                bb = bb.set_column(bb.schema.get_field_index("cx"), "cx", pa.array(cx, pa.int64()))
                bb = bb.set_column(bb.schema.get_field_index("cy"), "cy", pa.array(cy, pa.int64()))
                reps.append(bb.append_column(
                    "side", pa.array(np.ones(len(bb), dtype=np.int8))
                ))
        out = pa.concat_tables([a] + reps)
        key = _pack(out.column("cx").to_numpy(), out.column("cy").to_numpy())
        bucket = (splitmix64(key.view(np.uint64)) % np.uint64(64)).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    tagged = ds.map_batches(split_tag, batch_format="pyarrow")
    return tagged.groupby("bucket").map_groups(group_fn, batch_format="pandas")


def spatial_distance_join(sf_dir: str):
    """All (even doc, odd doc) pairs within 20 km planar distance."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        ia, ib, d2s = [], [], []
        a_lon, a_lat = a["lon"].to_numpy(), a["lat"].to_numpy()
        b_lon, b_lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        a_id, b_id = a["doc_id"].to_numpy(), b["doc_id"].to_numpy()

        def emit(ai, bi):
            dx = (a_lon[ai][:, None] - b_lon[bi][None, :]) * KX
            dy = (a_lat[ai][:, None] - b_lat[bi][None, :]) * KY
            d2 = dx * dx + dy * dy
            rr, cc = np.nonzero(d2 <= D2_MAX)
            ia.extend(a_id[ai][rr].tolist())
            ib.extend(b_id[bi][cc].tolist())
            d2s.extend(d2[rr, cc].tolist())

        _pair_groups(a, b, emit)
        return pd.DataFrame({
            "id_a": pd.array(ia, dtype=np.int64),
            "id_b": pd.array(ib, dtype=np.int64),
            "d2": pd.array(d2s, dtype=np.float64),
        })

    return _spatial_join_pipeline(sf_dir, [], per_bucket)


SQL_DISTANCE_JOIN = f"""
WITH pts AS (
  SELECT doc_id,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
), c AS (
  SELECT doc_id, lon, lat,
         CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS cx,
         CAST(floor((lat + 90.0) / 0.25) AS BIGINT) AS cy
  FROM pts
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
     + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) AS d2
FROM c a JOIN c b
  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  AND ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
    + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) <= 400000000.0
"""


def spatial_sample_join(sf_dir: str, rate_pct: int = 10):
    """Deterministic sampling over the spatial join (the EDBT/ICDE
    sample-over-join setting): keep a pair iff
    ``(id_a * 31 + id_b) % 100 < rate_pct`` — exact integer arithmetic,
    so the sample is reproducible and SQL-mirrorable (a production
    engine would swap the modular rule for a seeded hash)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        a_lon, a_lat = a["lon"].to_numpy(), a["lat"].to_numpy()
        b_lon, b_lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        a_id, b_id = a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        ia, ib, d2s = [], [], []

        def emit(ai, bi):
            dx = (a_lon[ai][:, None] - b_lon[bi][None, :]) * KX
            dy = (a_lat[ai][:, None] - b_lat[bi][None, :]) * KY
            d2 = dx * dx + dy * dy
            rr, cc = np.nonzero(d2 <= D2_MAX)
            ia.extend(a_id[ai][rr].tolist())
            ib.extend(b_id[bi][cc].tolist())
            d2s.extend(d2[rr, cc].tolist())

        _pair_groups(a, b, emit)
        id_a = np.asarray(ia, dtype=np.int64)
        id_b = np.asarray(ib, dtype=np.int64)
        d2 = np.asarray(d2s, dtype=np.float64)
        keep = (id_a * 31 + id_b) % 100 < rate_pct
        return pd.DataFrame({
            "id_a": pd.array(id_a[keep], dtype=np.int64),
            "id_b": pd.array(id_b[keep], dtype=np.int64),
            "d2": pd.array(d2[keep], dtype=np.float64),
        })

    return _spatial_join_pipeline(sf_dir, [], per_bucket)


SQL_SAMPLE_JOIN = SQL_DISTANCE_JOIN.rstrip() + """
  AND (a.doc_id * 31 + b.doc_id) % 100 < 10
"""


def spatial_knn_join(sf_dir: str, k: int = 3):
    """Bounded kNN join: the k nearest odd docs within 20 km of each
    even doc (rank by quantized distance, id tie-break). The per-cell
    candidate generation is the same one-shuffle pattern; ranking is a
    lexsort inside the bucket."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from osm_merge_ray.ops import rank_within_groups

        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        a_lon, a_lat = a["lon"].to_numpy(), a["lat"].to_numpy()
        b_lon, b_lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        a_id, b_id = a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        pi, si, d2s = [], [], []

        def emit(ai, bi):
            dx = (a_lon[ai][:, None] - b_lon[bi][None, :]) * KX
            dy = (a_lat[ai][:, None] - b_lat[bi][None, :]) * KY
            d2 = dx * dx + dy * dy
            rr, cc = np.nonzero(d2 <= D2_MAX)
            pi.extend(ai[rr].tolist())
            si.extend(bi[cc].tolist())
            d2s.extend(d2[rr, cc].tolist())

        _pair_groups(a, b, emit)
        pi_a = np.asarray(pi, dtype=np.int64)
        si_a = np.asarray(si, dtype=np.int64)
        d2_a = np.asarray(d2s, dtype=np.float64)
        if len(pi_a) == 0:
            return pd.DataFrame({
                "id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64),
                "d2": pd.Series(dtype=np.float64), "rank": pd.Series(dtype=np.int64),
            })
        d2_e3 = np.floor(d2_a * 1000.0).astype(np.int64)  # exact-op quantize
        order = np.lexsort((b_id[si_a], d2_e3, pi_a))
        pos = rank_within_groups(pi_a[order])
        keep = order[pos < k]
        rank = (pos[pos < k] + 1).astype(np.int64)
        return pd.DataFrame({
            "id_a": a_id[pi_a[keep]],
            "id_b": b_id[si_a[keep]],
            "d2": d2_a[keep],
            "rank": rank,
        })

    return _spatial_join_pipeline(sf_dir, [], per_bucket)


SQL_KNN_JOIN = f"""
WITH pts AS (
  SELECT doc_id,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
), c AS (
  SELECT doc_id, lon, lat,
         CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS cx,
         CAST(floor((lat + 90.0) / 0.25) AS BIGINT) AS cy
  FROM pts
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
       + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) AS d2
  FROM c a JOIN c b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    AND ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
      + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) <= 400000000.0
)
SELECT id_a, id_b, d2, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY id_a
    ORDER BY CAST(floor(d2 * 1000.0) AS BIGINT) ASC, id_b ASC) AS rank
  FROM cand
) WHERE rank <= 3
"""


def spatial_conflate(sf_dir: str):
    """SQL-checkable restatement of the conflation decision table over
    derived points: caption = first 30 chars (Levenshtein-ratio scorer,
    the DuckDB-expressible variant of fuzz matching), second key = lang
    equality, best-by-(hits, distance, id), new/merged/duplicate."""
    from osm_merge_ray.text.fuzz import batch_levenshtein

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        a_lon, a_lat = a["lon"].to_numpy(), a["lat"].to_numpy()
        b_lon, b_lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        a_id, b_id = a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        a_txt = a["text"].str.slice(0, CAP_LEN).to_numpy()
        b_txt = b["text"].str.slice(0, CAP_LEN).to_numpy()
        a_lang, b_lang = a["lang"].to_numpy(), b["lang"].to_numpy()

        pi, si, d2s = [], [], []

        def emit(ai, bi):
            dx = (a_lon[ai][:, None] - b_lon[bi][None, :]) * KX
            dy = (a_lat[ai][:, None] - b_lat[bi][None, :]) * KY
            d2 = dx * dx + dy * dy
            rr, cc = np.nonzero(d2 <= D2_MAX)
            pi.extend(ai[rr].tolist())
            si.extend(bi[cc].tolist())
            d2s.extend(d2[rr, cc].tolist())

        _pair_groups(a, b, emit)
        pi_a = np.asarray(pi, dtype=np.int64)
        si_a = np.asarray(si, dtype=np.int64)
        d2_a = np.asarray(d2s, dtype=np.float64)

        n_p = len(a_id)
        matched = np.full(n_p, -1, dtype=np.int64)
        hits_out = np.zeros(n_p, dtype=np.int64)
        d2_out = np.full(n_p, -1.0, dtype=np.float64)
        if len(pi_a):
            lev = batch_levenshtein(a_txt[pi_a], b_txt[si_a], maxlen=CAP_LEN)
            la = np.fromiter((len(s) for s in a_txt[pi_a]), np.int64, len(pi_a))
            lb = np.fromiter((len(s) for s in b_txt[si_a]), np.int64, len(pi_a))
            sim = 100.0 * (1.0 - lev / np.maximum(np.maximum(la, lb), 1).astype(np.float64))
            cap_hit = (sim > CAP_SIM_MIN) & (np.abs(la - lb) <= 3)
            lang_hit = a_lang[pi_a] == b_lang[si_a]
            hits = cap_hit.astype(np.int64) + lang_hit.astype(np.int64)
            order = np.lexsort((b_id[si_a], d2_a, -hits, pi_a))
            po = pi_a[order]
            first = np.ones(len(po), dtype=bool)
            first[1:] = po[1:] != po[:-1]
            best = order[first]
            matched[pi_a[best]] = b_id[si_a[best]]
            hits_out[pi_a[best]] = hits[best]
            d2_out[pi_a[best]] = d2_a[best]
        decision = np.where(
            matched < 0, "new", np.where(hits_out >= 2, "duplicate", "merged")
        )
        return pd.DataFrame({
            "doc_id": a_id,
            "matched_id": matched,
            "decision": pd.array(decision, dtype="string"),
            "hits": hits_out,
            "d2": d2_out,
        })

    return _spatial_join_pipeline(sf_dir, ["text", "lang"], per_bucket)


def spatial_conflate_cascade(sf_dir: str):
    """SQL-checkable restatement of the POI cascade join (J5,
    conflatePOI.py:294-450): candidates within radius ranked by
    (hits desc, CLASS asc, distance asc, id) — the node-before-way
    priority — and a primary with MULTIPLE scoring candidates is a
    'duplicate' (the fixme rule). Class derived as (doc_id // 2) % 2
    (node-analog = 0)."""
    from osm_merge_ray.text.fuzz import batch_levenshtein

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        a_lon, a_lat = a["lon"].to_numpy(), a["lat"].to_numpy()
        b_lon, b_lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        a_id, b_id = a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        a_txt = a["text"].str.slice(0, CAP_LEN).to_numpy()
        b_txt = b["text"].str.slice(0, CAP_LEN).to_numpy()
        a_lang, b_lang = a["lang"].to_numpy(), b["lang"].to_numpy()

        pi, si, d2s = [], [], []

        def emit(ai, bi):
            dx = (a_lon[ai][:, None] - b_lon[bi][None, :]) * KX
            dy = (a_lat[ai][:, None] - b_lat[bi][None, :]) * KY
            d2 = dx * dx + dy * dy
            rr, cc = np.nonzero(d2 <= D2_MAX)
            pi.extend(ai[rr].tolist())
            si.extend(bi[cc].tolist())
            d2s.extend(d2[rr, cc].tolist())

        _pair_groups(a, b, emit)
        pi_a = np.asarray(pi, dtype=np.int64)
        si_a = np.asarray(si, dtype=np.int64)
        d2_a = np.asarray(d2s, dtype=np.float64)

        n_p = len(a_id)
        matched = np.full(n_p, -1, dtype=np.int64)
        hits_out = np.zeros(n_p, dtype=np.int64)
        klass_out = np.full(n_p, -1, dtype=np.int64)
        n_cands = np.zeros(n_p, dtype=np.int64)
        if len(pi_a):
            np.add.at(n_cands, pi_a, 1)
            lev = batch_levenshtein(a_txt[pi_a], b_txt[si_a], maxlen=CAP_LEN)
            la = np.fromiter((len(s) for s in a_txt[pi_a]), np.int64, len(pi_a))
            lb = np.fromiter((len(s) for s in b_txt[si_a]), np.int64, len(pi_a))
            sim = 100.0 * (1.0 - lev / np.maximum(np.maximum(la, lb), 1).astype(np.float64))
            cap_hit = (sim > CAP_SIM_MIN) & (np.abs(la - lb) <= 3)
            lang_hit = a_lang[pi_a] == b_lang[si_a]
            hits = cap_hit.astype(np.int64) + lang_hit.astype(np.int64)
            klass = (b_id[si_a] // 2) % 2  # 0 = node analog, 1 = way analog
            order = np.lexsort((b_id[si_a], d2_a, klass, -hits, pi_a))
            po = pi_a[order]
            first = np.ones(len(po), dtype=bool)
            first[1:] = po[1:] != po[:-1]
            best = order[first]
            matched[pi_a[best]] = b_id[si_a[best]]
            hits_out[pi_a[best]] = hits[best]
            klass_out[pi_a[best]] = klass[best]
        decision = np.where(
            matched < 0, "new",
            np.where((n_cands > 1) & (hits_out > 0), "duplicate", "merged"),
        )
        return pd.DataFrame({
            "doc_id": a_id,
            "matched_id": matched,
            "decision": pd.array(decision, dtype="string"),
            "hits": hits_out,
            "matched_class": klass_out,
        })

    return _spatial_join_pipeline(sf_dir, ["text", "lang"], per_bucket)


SQL_CONFLATE_CASCADE = f"""
WITH pts AS (
  SELECT doc_id, lang, substr(text, 1, 30) AS cap,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
), c AS (
  SELECT *, CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS cx,
            CAST(floor((lat + 90.0) / 0.25) AS BIGINT) AS cy
  FROM pts
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
       + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) AS d2,
         (CASE WHEN 100.0 * (1.0 - levenshtein(a.cap, b.cap)
                 / CAST(greatest(length(a.cap), length(b.cap), 1) AS DOUBLE)) > 60.0
                AND abs(length(a.cap) - length(b.cap)) <= 3
               THEN 1 ELSE 0 END)
       + (CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END) AS hits,
         (b.doc_id // 2) % 2 AS klass
  FROM c a JOIN c b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    AND ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
      + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) <= {D2_MAX}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id_a
              ORDER BY hits DESC, klass ASC, d2 ASC, id_b ASC) AS rn,
         count(*) OVER (PARTITION BY id_a) AS n_cands
  FROM cand
)
SELECT d.doc_id,
       coalesce(r.id_b, -1) AS matched_id,
       CASE WHEN r.id_b IS NULL THEN 'new'
            WHEN r.n_cands > 1 AND r.hits > 0 THEN 'duplicate'
            ELSE 'merged' END AS decision,
       CAST(coalesce(r.hits, 0) AS BIGINT) AS hits,
       CAST(coalesce(r.klass, -1) AS BIGINT) AS matched_class
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON d.doc_id = r.id_a
"""


# poly41 token hash as a DuckDB expression: identical left-fold, modulo
# applied at every step. Empty-token guard: unicode('') is -1 in DuckDB
# while the engine folds zero characters -> 0.
_POLY41_TOKEN = """CASE WHEN w = '' THEN 0 ELSE list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(w, ''), c -> CAST(unicode(c) AS BIGINT))),
      (a, b) -> (a * 1000003 + b) % 2199023255551) END"""


def spatial_conflate_flagship(sf_dir: str):
    """The FLAGSHIP decision table under the bit-exact gate: three hit
    dimensions (caption similarity, lang equality, perceptual-hash
    hamming — the 40-bit poly41 simhash standing in for the image
    phash) and the dup-distance rule (hits >= 2 AND dist <= dup
    threshold → 'duplicate', mirroring stages/conflate.py's
    min_hits_accept + dup_distance_m gate)."""
    from osm_merge_ray.dedup.simhash import simhash
    from osm_merge_ray.text.fuzz import batch_levenshtein
    from osm_merge_ray.util import poly41_str

    DUP_D2 = 3000.0 * 3000.0  # dup distance analog (m^2, planar)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        a_lon, a_lat = a["lon"].to_numpy(), a["lat"].to_numpy()
        b_lon, b_lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        a_id, b_id = a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        a_txt = a["text"].str.slice(0, CAP_LEN).to_numpy()
        b_txt = b["text"].str.slice(0, CAP_LEN).to_numpy()
        a_lang, b_lang = a["lang"].to_numpy(), b["lang"].to_numpy()
        a_ph = simhash(a["text"].tolist(), n_bits=40, hasher=poly41_str)
        b_ph = simhash(b["text"].tolist(), n_bits=40, hasher=poly41_str)

        pi, si, d2s = [], [], []

        def emit(ai, bi):
            dx = (a_lon[ai][:, None] - b_lon[bi][None, :]) * KX
            dy = (a_lat[ai][:, None] - b_lat[bi][None, :]) * KY
            d2 = dx * dx + dy * dy
            rr, cc = np.nonzero(d2 <= D2_MAX)
            pi.extend(ai[rr].tolist())
            si.extend(bi[cc].tolist())
            d2s.extend(d2[rr, cc].tolist())

        _pair_groups(a, b, emit)
        pi_a = np.asarray(pi, dtype=np.int64)
        si_a = np.asarray(si, dtype=np.int64)
        d2_a = np.asarray(d2s, dtype=np.float64)

        n_p = len(a_id)
        matched = np.full(n_p, -1, dtype=np.int64)
        hits_out = np.zeros(n_p, dtype=np.int64)
        d2_out = np.full(n_p, -1.0, dtype=np.float64)
        if len(pi_a):
            lev = batch_levenshtein(a_txt[pi_a], b_txt[si_a], maxlen=CAP_LEN)
            la = np.fromiter((len(s) for s in a_txt[pi_a]), np.int64, len(pi_a))
            lb = np.fromiter((len(s) for s in b_txt[si_a]), np.int64, len(pi_a))
            sim = 100.0 * (1.0 - lev / np.maximum(np.maximum(la, lb), 1).astype(np.float64))
            cap_hit = (sim > CAP_SIM_MIN) & (np.abs(la - lb) <= 3)
            lang_hit = a_lang[pi_a] == b_lang[si_a]
            from osm_merge_ray.image.phash import hamming64

            ph_hit = hamming64(a_ph[pi_a], b_ph[si_a]) <= 10
            hits = (cap_hit.astype(np.int64) + lang_hit.astype(np.int64)
                    + ph_hit.astype(np.int64))
            order = np.lexsort((b_id[si_a], d2_a, -hits, pi_a))
            po = pi_a[order]
            first = np.ones(len(po), dtype=bool)
            first[1:] = po[1:] != po[:-1]
            best = order[first]
            matched[pi_a[best]] = b_id[si_a[best]]
            hits_out[pi_a[best]] = hits[best]
            d2_out[pi_a[best]] = d2_a[best]
        decision = np.where(
            matched < 0, "new",
            np.where((hits_out >= 2) & (d2_out <= DUP_D2), "duplicate", "merged"),
        )
        return pd.DataFrame({
            "doc_id": a_id,
            "matched_id": matched,
            "decision": pd.array(decision, dtype="string"),
            "hits": hits_out,
            "d2": d2_out,
        })

    return _spatial_join_pipeline(sf_dir, ["text", "lang"], per_bucket)


_SIMHASH40 = f"""
  SELECT doc_id,
         CAST(sum(CASE WHEN wgt > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS s
  FROM (
    SELECT doc_id, j,
           sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS wgt
    FROM (
      SELECT doc_id, {{poly}} AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    ) CROSS JOIN (SELECT unnest(generate_series(0, 39)) AS j) js
    GROUP BY doc_id, j
  ) GROUP BY doc_id
"""

SQL_CONFLATE_FLAGSHIP = f"""
WITH sh AS ({_SIMHASH40.format(poly=_POLY41_TOKEN)}
), pts AS (
  SELECT d.doc_id, d.lang, substr(d.text, 1, 30) AS cap, sh.s,
         {_DERIVE_SQL[0].format(id='d.doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='d.doc_id')} AS lat
  FROM documents d JOIN sh ON d.doc_id = sh.doc_id
), c AS (
  SELECT *, CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS cx,
            CAST(floor((lat + 90.0) / 0.25) AS BIGINT) AS cy
  FROM pts
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
       + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) AS d2,
         (CASE WHEN 100.0 * (1.0 - levenshtein(a.cap, b.cap)
                 / CAST(greatest(length(a.cap), length(b.cap), 1) AS DOUBLE)) > 60.0
                AND abs(length(a.cap) - length(b.cap)) <= 3
               THEN 1 ELSE 0 END)
       + (CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END)
       + (CASE WHEN bit_count(xor(a.s, b.s)) <= 10 THEN 1 ELSE 0 END) AS hits
  FROM c a JOIN c b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    AND ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
      + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) <= {D2_MAX}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id_a
              ORDER BY hits DESC, d2 ASC, id_b ASC) AS rn
  FROM cand
)
SELECT d.doc_id,
       coalesce(r.id_b, -1) AS matched_id,
       CASE WHEN r.id_b IS NULL THEN 'new'
            WHEN r.hits >= 2 AND r.d2 <= 9000000.0 THEN 'duplicate'
            ELSE 'merged' END AS decision,
       CAST(coalesce(r.hits, 0) AS BIGINT) AS hits,
       coalesce(r.d2, -1.0) AS d2
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON d.doc_id = r.id_a
"""


SQL_CONFLATE = f"""
WITH pts AS (
  SELECT doc_id, lang, substr(text, 1, 30) AS cap,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
), c AS (
  SELECT *, CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS cx,
            CAST(floor((lat + 90.0) / 0.25) AS BIGINT) AS cy
  FROM pts
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
       + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) AS d2,
         (CASE WHEN 100.0 * (1.0 - levenshtein(a.cap, b.cap)
                 / CAST(greatest(length(a.cap), length(b.cap), 1) AS DOUBLE)) > 60.0
                AND abs(length(a.cap) - length(b.cap)) <= 3
               THEN 1 ELSE 0 END)
       + (CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END) AS hits
  FROM c a JOIN c b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    AND ((a.lon - b.lon) * 85263.0) * ((a.lon - b.lon) * 85263.0)
      + ((a.lat - b.lat) * 111195.0) * ((a.lat - b.lat) * 111195.0) <= 400000000.0
), best AS (
  SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY hits DESC, d2 ASC, id_b ASC) AS rn
  FROM cand
)
SELECT p.doc_id,
       COALESCE(b.id_b, -1) AS matched_id,
       CASE WHEN b.id_b IS NULL THEN 'new'
            WHEN b.hits >= 2 THEN 'duplicate'
            ELSE 'merged' END AS decision,
       COALESCE(b.hits, 0) AS hits,
       COALESCE(b.d2, -1.0) AS d2
FROM documents p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON p.doc_id = b.id_a
WHERE p.doc_id % 2 = 0
"""


# quarter-degree exact tile grid (driver-checkable analog of the
# EPSG:3857 tiling, which is pytest-verified instead — trig is not
# bit-stable across engines)
def spatial_tile_assign(sf_dir: str):
    def tiles(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_numpy()
        lon, lat = _derive_lonlat(doc_id)
        col = np.floor((lon + 113.0) / 0.25).astype(np.int64)
        row = np.floor((lat - 37.0) / 0.25).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(doc_id),
            "tile_col": pa.array(col, pa.int64()),
            "tile_row": pa.array(row, pa.int64()),
            "tile_id": pa.array(row * 64 + col, pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        tiles, batch_format="pyarrow"
    )


SQL_TILE_ASSIGN = f"""
WITH pts AS (
  SELECT doc_id,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
)
SELECT doc_id,
       CAST(floor((lon + 113.0) / 0.25) AS BIGINT) AS tile_col,
       CAST(floor((lat - 37.0) / 0.25) AS BIGINT) AS tile_row,
       CAST(floor((lat - 37.0) / 0.25) AS BIGINT) * 64
         + CAST(floor((lon + 113.0) / 0.25) AS BIGINT) AS tile_id
FROM pts
"""


def spatial_tile_pyramid_q(sf_dir: str):
    """Tile-pyramid structure (z → z-1): per parent tile (the 2x2
    aggregation of the 0.25-degree grid), how many distinct child tiles
    are non-empty and how many points roll up. The byte-compositing
    engine op is stages/tiling.pyramid_level (pytest-pinned mosaic);
    this query pins the integer pyramid structure under the driver
    gate. Per-batch (parent, child) pre-aggregation → grouped reduce."""
    from osm_merge_ray.ops import grouped_reduce

    def partials(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_numpy()
        lon, lat = _derive_lonlat(doc_id)
        col = np.floor((lon + 113.0) / 0.25).astype(np.int64)
        row = np.floor((lat - 37.0) / 0.25).astype(np.int64)
        parent = (row >> 1) * 32 + (col >> 1)
        child = row * 64 + col
        key = parent * np.int64(1 << 20) + child  # child < 64*64 << 2^20
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "parent_id": pa.array(uk // (1 << 20), pa.int64()),
            "child_id": pa.array(uk % (1 << 20), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("parent_id", as_index=False).agg(
            n_children=("child_id", "nunique"), n_points=("n", "sum"))
        g["n_children"] = g["n_children"].astype(np.int64)
        return g

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        partials, batch_format="pyarrow")
    return grouped_reduce(ds, ["parent_id"], rollup)


SQL_TILE_PYRAMID = f"""
WITH pts AS (
  SELECT doc_id,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
), t AS (
  SELECT CAST(floor((lon + 113.0) / 0.25) AS BIGINT) AS col,
         CAST(floor((lat - 37.0) / 0.25) AS BIGINT) AS row
  FROM pts
)
SELECT (row // 2) * 32 + (col // 2) AS parent_id,
       CAST(count(DISTINCT row * 64 + col) AS BIGINT) AS n_children,
       count(*) AS n_points
FROM t GROUP BY 1
"""


def spatial_polygon_overlap(sf_dir: str):
    """Rectangle-footprint overlap join (the SQL-checkable form of the
    building-dedup join J6; the general convex-polygon operator is
    ``stages/overlap.polygon_overlap_pairs``, pytest-verified). Exact
    min/max arithmetic → bit-identical areas vs the oracle."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]

        def rects(sub):
            i = sub["doc_id"].to_numpy().astype(np.int64)
            h3 = ((i + 77) * HASH_A) % np.int64(MOD)
            h4 = ((i + 777) * HASH_A) % np.int64(MOD)
            wx = 0.02 + h3.astype(np.float64) / MOD * 0.1
            wy = 0.02 + h4.astype(np.float64) / MOD * 0.1
            lon = sub["lon"].to_numpy()
            lat = sub["lat"].to_numpy()
            return lon - wx, lat - wy, lon + wx, lat + wy

        ax0, ay0, ax1, ay1 = rects(a)
        bx0, by0, bx1, by1 = rects(b)
        a_id = a["doc_id"].to_numpy()
        b_id = b["doc_id"].to_numpy()
        ia, ib, areas = [], [], []

        def emit(ai, bi):
            ox = np.minimum(ax1[ai][:, None], bx1[bi][None, :]) - np.maximum(ax0[ai][:, None], bx0[bi][None, :])
            oy = np.minimum(ay1[ai][:, None], by1[bi][None, :]) - np.maximum(ay0[ai][:, None], by0[bi][None, :])
            hit = (ox > 0.0) & (oy > 0.0)
            rr, cc = np.nonzero(hit)
            ia.extend(a_id[ai][rr].tolist())
            ib.extend(b_id[bi][cc].tolist())
            areas.extend((ox[rr, cc] * oy[rr, cc]).tolist())

        _pair_groups(a, b, emit)
        return pd.DataFrame({
            "id_a": pd.array(ia, dtype=np.int64),
            "id_b": pd.array(ib, dtype=np.int64),
            "overlap_area": pd.array(areas, dtype=np.float64),
        })

    return _spatial_join_pipeline(sf_dir, [], per_bucket)


SQL_POLYGON_OVERLAP = f"""
WITH pts AS (
  SELECT doc_id,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat,
         0.02 + (((doc_id + 77) * 2654435761) % 4294967296) / 4294967296.0 * 0.1 AS wx,
         0.02 + (((doc_id + 777) * 2654435761) % 4294967296) / 4294967296.0 * 0.1 AS wy
  FROM documents
), c AS (
  SELECT doc_id, lon - wx AS x0, lat - wy AS y0, lon + wx AS x1, lat + wy AS y1,
         CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS cx,
         CAST(floor((lat + 90.0) / 0.25) AS BIGINT) AS cy
  FROM pts
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       (least(a.x1, b.x1) - greatest(a.x0, b.x0))
     * (least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS overlap_area
FROM c a JOIN c b
  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  AND least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0.0
  AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0.0
"""


# three convex quads; point-in-polygon by cross-product signs (exact ops)
_QUADS = [
    (1, (-112.0, 38.0), (-109.0, 38.0), (-109.0, 41.0), (-112.0, 41.0)),
    (2, (-108.5, 37.5), (-105.0, 38.5), (-105.5, 42.0), (-108.0, 41.0)),
    (3, (-113.0, 41.5), (-110.0, 42.0), (-110.5, 44.0), (-112.5, 43.5)),
]


def spatial_point_in_polygon(sf_dir: str):
    def pip(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_numpy()
        lon, lat = _derive_lonlat(doc_id)
        region = np.zeros(len(doc_id), dtype=np.int64)
        for rid, p1, p2, p3, p4 in reversed(_QUADS):  # priority: lowest id wins
            inside = np.ones(len(doc_id), dtype=bool)
            verts = [p1, p2, p3, p4]
            for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
                cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
                inside &= cross >= 0.0
            region = np.where(inside, rid, region)
        return pa.table({
            "doc_id": pa.array(doc_id),
            "region_id": pa.array(region, pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        pip, batch_format="pyarrow"
    )


def _pip_sql_cond(quad) -> str:
    _, p1, p2, p3, p4 = quad
    verts = [p1, p2, p3, p4]
    conds = []
    for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
        conds.append(
            f"(({x2} - {x1}) * (lat - {y1}) - ({y2} - {y1}) * (lon - {x1})) >= 0.0"
        )
    return " AND ".join(conds)


SQL_POINT_IN_POLYGON = f"""
WITH pts AS (
  SELECT doc_id,
         {_DERIVE_SQL[0].format(id='doc_id')} AS lon,
         {_DERIVE_SQL[1].format(id='doc_id')} AS lat
  FROM documents
)
SELECT doc_id,
       CASE WHEN {_pip_sql_cond(_QUADS[0])} THEN 1
            WHEN {_pip_sql_cond(_QUADS[1])} THEN 2
            WHEN {_pip_sql_cond(_QUADS[2])} THEN 3
            ELSE 0 END AS region_id
FROM pts
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def dedup_exact_q(sf_dir: str):
    from osm_merge_ray.dedup.exact import dedup_exact

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_exact(ds, column="text", id_column="doc_id")
    return out.select_columns(["keep_id", "n_copies"])


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def dedup_incremental_q(sf_dir: str):
    """Delta dedup of an ingest batch against the stored corpus
    (dedup/incremental.py): corpus = even doc_ids; the batch re-ingests
    the doc_id % 4 == 0 slice (must flag as dup) alongside the odd ids
    (genuinely new). Bloom prefilter is exactness-preserving — the
    verify join string-compares — so the SQL twin is a plain semi-join."""
    import pyarrow.compute as pc

    from osm_merge_ray.dedup.incremental import incremental_dedup

    def keep(pred):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pred(pc.bit_wise_and(t.column("doc_id"), 3)))
        return f

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    corpus = docs.map_batches(
        keep(lambda m: pc.equal(pc.bit_wise_and(m, 1), 0)),
        batch_format="pyarrow")
    batch = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        keep(lambda m: pc.or_(pc.equal(m, 0), pc.equal(pc.bit_wise_and(m, 1), 1))),
        batch_format="pyarrow")
    return incremental_dedup(batch, corpus)


SQL_DEDUP_INCREMENTAL = """
WITH corpus AS (
  SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0
), b AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0 OR doc_id % 2 = 1
)
SELECT b.doc_id, (c.text IS NOT NULL) AS is_dup
FROM b LEFT JOIN corpus c ON b.text = c.text
"""


def text_decontaminate_q(sf_dir: str):
    """Train-set decontamination report vs a held-out eval slice
    (doc_id % 20 == 0) by shared word 3-grams (text/decontaminate.py):
    every train doc sharing >= 1 distinct gram with the eval corpus,
    with its own gram count so consumers can threshold on overlap
    fraction. Only 64-bit gram hashes are shuffled."""
    from osm_merge_ray.text.decontaminate import contamination_report

    def split(t: pa.Table, keep_eval: bool) -> pa.Table:
        # numpy modulo: this pyarrow build has no pc.modulo kernel
        m = (t.column("doc_id").to_numpy() % 20 == 0)
        return t.filter(pa.array(m if keep_eval else ~m))

    train = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: split(t, False), batch_format="pyarrow")
    evals = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: split(t, True), batch_format="pyarrow")
    out = contamination_report(train, evals, k=3)
    return out.select_columns(["doc_id", "n_grams", "n_shared"])


def text_chunk_plan_q(sf_dir: str, window: int = 32, overlap: int = 8):
    """Sliding-window chunk plan (r5, text/chunking.py): one integer
    row per (doc, chunk) — chunk_idx, start_tok, n_toks over the
    space-split token stream; window 32 / overlap 8 so sf-scale docs
    (~50-90 tokens) produce multi-chunk plans. Shuffle-free fused map;
    twin is a generate_series explode with the identical ceil-div."""
    from osm_merge_ray.text.chunking import chunk_plan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_plan(ds, window=window, overlap=overlap).select_columns(
        ["doc_id", "chunk_idx", "start_tok", "n_toks"])


SQL_CHUNK_PLAN = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         CAST(1 + (greatest(n - 32, 0) + 23) // 24 AS BIGINT) AS n_chunks
  FROM d
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * 24 AS BIGINT) AS start_tok,
       CAST(least(i * 24 + 32, n) - i * 24 AS BIGINT) AS n_toks
FROM c, unnest(generate_series(0, n_chunks - 1)) AS t(i)
"""


def text_substring_decontaminate_q(sf_dir: str, min_len: int = 24):
    """EXACT-substring decontamination (r5): flag every train doc
    (doc_id % 20 != 0) sharing a character substring of length >=
    min_len with the eval slice (doc_id % 20 == 0) — the Lee et al.
    2022 suffix-array criterion as a stride-1 poly41 L-gram probe,
    catching verbatim leaks word-k-gram Jaccard misses. Eval grams
    broadcast once via ray.put; the report is one fused train map.
    Twin: the same 24-step unrolled poly41 fold + gaps-and-islands
    run lengths in SQL."""
    from osm_merge_ray.text.decontaminate import substring_contamination_report

    def split(t: pa.Table, keep_eval: bool) -> pa.Table:
        m = (t.column("doc_id").to_numpy() % 20 == 0)
        return t.filter(pa.array(m if keep_eval else ~m))

    train = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: split(t, False), batch_format="pyarrow")
    evals = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: split(t, True), batch_format="pyarrow")
    out = substring_contamination_report(train, evals, min_len=min_len)
    return out.select_columns(
        ["doc_id", "n_lgrams", "n_shared", "max_run_chars"])


# stride-1 char 24-gram poly41 fold, unrolled exactly as the engine's
# poly41_grams left-fold (modulo at every step)
_SUB_L = 24
_SUB_GRAM = "CAST(0 AS BIGINT)"
for _j in range(_SUB_L):
    _SUB_GRAM = (f"(({_SUB_GRAM}) * 1000003 "
                 f"+ unicode(substr(text, i + {_j}, 1))) % 2199023255551")

SQL_SUBSTR_DECONTAMINATE = f"""
WITH ev AS (
  SELECT DISTINCT {_SUB_GRAM} AS h
  FROM documents,
       unnest(generate_series(1, greatest(length(text) - {_SUB_L - 1}, 0))) AS t(i)
  WHERE doc_id % 20 = 0
), tr AS (
  SELECT doc_id, i, {_SUB_GRAM} AS h,
         CAST(greatest(length(text) - {_SUB_L - 1}, 0) AS BIGINT) AS n_lgrams
  FROM documents,
       unnest(generate_series(1, greatest(length(text) - {_SUB_L - 1}, 0))) AS t(i)
  WHERE doc_id % 20 <> 0
), hit AS (
  SELECT tr.doc_id, tr.i, tr.n_lgrams FROM tr JOIN ev ON tr.h = ev.h
), isl AS (
  SELECT doc_id, n_lgrams, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grpk
  FROM hit
), runs AS (
  SELECT doc_id, n_lgrams, count(*) AS runlen
  FROM isl GROUP BY doc_id, n_lgrams, grpk
)
SELECT doc_id, n_lgrams,
       CAST(sum(runlen) AS BIGINT) AS n_shared,
       CAST(max(runlen) + {_SUB_L - 1} AS BIGINT) AS max_run_chars
FROM runs GROUP BY doc_id, n_lgrams
"""


SQL_DECONTAMINATE = """
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
), g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
    FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, text AS gram FROM w WHERE len(ws) < 3 AND text != ''
  )
), ev AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0
), tr AS (
  SELECT doc_id, gram FROM g WHERE doc_id % 20 != 0
), n AS (
  SELECT doc_id, count(*) AS ng FROM tr GROUP BY doc_id
)
SELECT tr.doc_id, n.ng AS n_grams, count(*) AS n_shared
FROM tr JOIN ev USING (gram) JOIN n ON n.doc_id = tr.doc_id
GROUP BY tr.doc_id, n.ng
HAVING count(*) >= 1
"""


def curate_corpus_q(sf_dir: str):
    """End-to-end corpus curation (pipelines/curation.py): quality
    filter -> near-dup cluster -> best-member keep -> decontamination
    vs the eval slice (doc_id % 20 == 0) -> sequence-packing plan.
    Every stage is individually bit-exact, so the composition is too —
    one driver row per surviving document."""
    from osm_merge_ray.pipelines.curation import curate_corpus

    def split(t: pa.Table, keep_eval: bool) -> pa.Table:
        m = (t.column("doc_id").to_numpy() % 20 == 0)
        return t.filter(pa.array(m if keep_eval else ~m))

    train = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: split(t, False), batch_format="pyarrow")
    evals = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: split(t, True), batch_format="pyarrow")
    return curate_corpus(train, evals, max_len=2048)


SQL_CURATE = """
WITH RECURSIVE kept AS (
  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE doc_id % 20 != 0
    AND len(string_split(text, ' ')) >= 5
    AND len(string_split(text, ' ')) <= 100000
), w AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM kept
), gk AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
    FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, text AS gram FROM w WHERE len(ws) < 3 AND text != ''
  )
), ng AS (
  SELECT doc_id, count(*) AS n FROM gk GROUP BY doc_id
), jp AS (
  SELECT g1.doc_id AS id_a, g2.doc_id AS id_b, count(*) AS inter
  FROM gk g1 JOIN gk g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM jp
  JOIN ng na ON jp.id_a = na.doc_id JOIN ng nb ON jp.id_b = nb.doc_id
  WHERE CAST(jp.inter AS DOUBLE) / (na.n + nb.n - jp.inter) >= 0.2
), und AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b AS s, id_a AS d FROM pairs
), reach(v, l) AS (
  SELECT doc_id, doc_id FROM kept
  UNION
  SELECT u.d, reach.l FROM reach JOIN und u ON u.s = reach.v
), cl AS (
  SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v
), reps AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY k.n_tokens DESC, c.doc_id) AS rn
    FROM cl c JOIN kept k ON k.doc_id = c.doc_id
  ) WHERE rn = 1
), surv AS (
  SELECT k.doc_id, k.n_tokens FROM kept k JOIN reps r ON r.doc_id = k.doc_id
), we AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
  WHERE doc_id % 20 = 0
), ge AS (
  SELECT DISTINCT gram FROM (
    SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
    FROM we, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT text AS gram FROM we WHERE len(ws) < 3 AND text != ''
  )
), bad AS (
  SELECT DISTINCT gs.doc_id
  FROM (SELECT s.doc_id, g.gram FROM surv s
        JOIN gk g ON g.doc_id = s.doc_id) gs
  JOIN ge ON ge.gram = gs.gram
), cur AS (
  SELECT s.doc_id, s.n_tokens FROM surv s
  LEFT JOIN bad b ON b.doc_id = s.doc_id WHERE b.doc_id IS NULL
), sc AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM cur
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // 2048 AS BIGINT) AS win_first,
       CAST((start_tok + n_tokens - 1) // 2048 AS BIGINT) AS win_last
FROM sc
"""


def text_repetition_q(sf_dir: str):
    """Gopher-style repetition stats per document (text/analysis.py
    repetition_stats): word/unique-word counts, max single-word and
    2-gram occurrence counts, duplicate-word fraction."""
    from osm_merge_ray.text.analysis import repetition_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats, batch_format="pyarrow")


SQL_REPETITION = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), wx AS (
  SELECT doc_id, ws[i] AS word FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)
), wc AS (
  SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_uniq_words
  FROM wx GROUP BY doc_id
), mw AS (
  SELECT doc_id, max(c) AS max_word_count FROM (
    SELECT doc_id, word, count(*) AS c FROM wx GROUP BY doc_id, word
  ) GROUP BY doc_id
), g2 AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
  FROM w, UNNEST(range(1, greatest(len(ws), 1))) AS t(i)
  WHERE len(ws) >= 2
), mg AS (
  SELECT doc_id, max(c) AS max_2gram_count FROM (
    SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT wc.doc_id, wc.n_words, wc.n_uniq_words, mw.max_word_count,
       coalesce(mg.max_2gram_count, 0) AS max_2gram_count,
       CAST(wc.n_words - wc.n_uniq_words AS DOUBLE) / wc.n_words
         AS dup_word_frac
FROM wc JOIN mw ON mw.doc_id = wc.doc_id
LEFT JOIN mg ON mg.doc_id = wc.doc_id
"""


def dedup_jaccard_q(sf_dir: str, threshold: float = 0.2):
    from osm_merge_ray.dedup.jaccard import jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = jaccard_pairs(ds, k=3, threshold=threshold)
    return out.select_columns(["id_a", "id_b", "inter", "na", "nb", "jaccard"])


SQL_DEDUP_JACCARD = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
), n AS (
  SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
), j AS (
  SELECT g1.doc_id AS id_a, g2.doc_id AS id_b, count(*) AS inter
  FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
  GROUP BY 1, 2
)
SELECT j.id_a, j.id_b, j.inter, na.ng AS na, nb.ng AS nb,
       CAST(j.inter AS DOUBLE) / (na.ng + nb.ng - j.inter) AS jaccard
FROM j JOIN n na ON j.id_a = na.doc_id JOIN n nb ON j.id_b = nb.doc_id
WHERE CAST(j.inter AS DOUBLE) / (na.ng + nb.ng - j.inter) >= 0.2
"""


def dedup_rate_report_q(sf_dir: str):
    """One-row dedup summary (the corpus-health report a pipeline logs
    per run): docs, near-dup pairs, connected clusters, docs removed by
    keep-one-representative."""
    import ray

    from osm_merge_ray.dedup.cluster import connected_components
    from osm_merge_ray.dedup.jaccard import jaccard_pairs

    docs_txt = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = jaccard_pairs(docs_txt, k=3, threshold=0.2).materialize()
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    clusters = connected_components(pairs, docs)

    n_pairs = pairs.count()

    def summarize(t: pa.Table) -> pa.Table:
        c = t.column("cluster_id").to_numpy()
        d = t.column("doc_id").to_numpy()
        return pa.table({
            "n_docs": pa.array([len(d)], pa.int64()),
            "n_clusters": pa.array([len(np.unique(c))], pa.int64()),
            "n_removed": pa.array([int((d != c).sum())], pa.int64()),
        })

    # clusters is small (one row per doc id + label); one summary task
    import ray.data as rd  # noqa: F401

    summary = clusters.repartition(1).map_batches(summarize, batch_format="pyarrow")

    def attach(t: pa.Table) -> pa.Table:
        return t.append_column("n_pairs", pa.array([n_pairs] * t.num_rows, pa.int64()))

    return summary.map_batches(attach, batch_format="pyarrow")


SQL_DEDUP_RATE = f"""
WITH RECURSIVE edges AS (
  SELECT id_a, id_b FROM ({{jac}})
), und AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL SELECT id_b AS src, id_a AS dst FROM edges
), reach(v, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.dst, reach.l FROM reach JOIN und u ON u.src = reach.v
), comp AS (
  SELECT v, min(l) AS c FROM reach GROUP BY v
)
SELECT count(*) AS n_docs,
       count(DISTINCT c) AS n_clusters,
       CAST(sum(CASE WHEN v != c THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       (SELECT count(*) FROM edges) AS n_pairs
FROM comp
"""


def train_val_split_q(sf_dir: str, val_pct: int = 10):
    """Deterministic, reproducible train/val assignment — the affine
    integer hash h = (a*id + b) mod M (all < 2^41, exact in int64 AND
    BIGINT) buckets ids uniformly; 'val' iff h*100 < M*val_pct. The
    split is a pure projection (no shuffle, no state) and any worker,
    any round, any engine re-derives the identical assignment."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    A, B, M = 748_151, 997_613_381, (1 << 41) - 1

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        h = (A * ids + B) % M
        val = h * 100 < M * val_pct
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "split": pa.array(np.where(val, "val", "train"), pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_TRAIN_VAL = """
SELECT doc_id,
       CASE WHEN ((748151 * doc_id + 997613381) % 2199023255551) * 100
                 < 2199023255551 * 10
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def source_quota_q(sf_dir: str, k: int = 15):
    """Per-source quota sampling (cap over-represented sources): keep
    the first k docs per source by id — rows of one source co-locate
    via the bucketed combine, ranked deterministically."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "doc_id"])
        df["rank"] = (df.groupby("source").cumcount() + 1).astype("int64")
        return df[df["rank"] <= k]

    return grouped_reduce(ds, ["source"], cap)


SQL_SOURCE_QUOTA = """
SELECT doc_id, source, rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank
  FROM documents
) WHERE rank <= 15
"""


def dedup_clusters_q(sf_dir: str):
    """Dedup CLUSTERS: transitive closure over the (bit-exact) n-gram
    Jaccard pair set — one cluster id (min reachable doc id) per
    document, singletons included. Engine: iterative min-label
    propagation, one bucketed join + one grouped min per round
    (dedup/cluster.py); oracle: recursive CTE closure."""
    from osm_merge_ray.dedup.cluster import connected_components
    from osm_merge_ray.dedup.jaccard import jaccard_pairs

    docs_txt = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = jaccard_pairs(docs_txt, k=3, threshold=0.2)
    # separate pruned read: only the doc_id column leaves storage (a
    # select on docs_txt would re-read BOTH columns under lineage)
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return connected_components(pairs, docs)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE edges AS (
  SELECT id_a, id_b FROM ({SQL_DEDUP_JACCARD})
), und AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL SELECT id_b AS src, id_a AS dst FROM edges
), reach(v, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.dst, reach.l FROM reach JOIN und u ON u.src = reach.v
)
SELECT v AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id FROM reach GROUP BY v
"""


def dedup_representatives_q(sf_dir: str):
    """Quality-based keep-one: per near-dup cluster, the member with
    the most whitespace tokens (ties → lowest doc id) and the cluster
    size — the dedup output a trainer actually keeps. Integer quality
    key → deterministic arg-max, window-function SQL twin."""
    import pyarrow.compute as pc

    from osm_merge_ray.dedup.cluster import (cluster_representatives,
                                             connected_components)
    from osm_merge_ray.dedup.jaccard import jaccard_pairs

    docs_txt = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = jaccard_pairs(docs_txt, k=3, threshold=0.2)
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    # star contraction, same as the default: measured 4x faster than
    # min-propagation even on this shallow graph (5.6 s vs 24 s at
    # sf0.1 — minprop's per-round join + fixpoint checks outweigh its
    # lower round count)
    clusters = connected_components(pairs, docs)

    def ntok(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t.column("text"), " "))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": n.cast(pa.int64())})

    quality = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(ntok, batch_format="pyarrow")
    return cluster_representatives(clusters, quality)


SQL_DEDUP_REPRESENTATIVES = f"""
WITH clusters AS ({SQL_DEDUP_CLUSTERS}),
q AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), j AS (
  SELECT c.cluster_id, c.doc_id, q.n_tokens,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.n_tokens DESC, c.doc_id) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM clusters c JOIN q ON q.doc_id = c.doc_id
)
SELECT cluster_id, doc_id AS rep_id, n_tokens AS rep_n_tokens,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM j WHERE rn = 1
"""


def text_pack_sequences_q(sf_dir: str, max_len: int = 2048):
    """Sequence-packing planner: per doc, the global token offset in
    the doc_id-ordered concatenated stream and the max_len windows it
    spans — distributed two-level prefix scan (text/packing.py),
    integer arithmetic, window-cumsum SQL twin."""
    from osm_merge_ray.text.packing import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = pack_sequences(ds, max_len=max_len)
    return out.select_columns(
        ["doc_id", "n_tokens", "start_tok", "win_first", "win_last"])


SQL_PACK_SEQUENCES = """
WITH q AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM q
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // 2048 AS BIGINT) AS win_first,
       CAST((start_tok + n_tokens - 1) // 2048 AS BIGINT) AS win_last
FROM c
"""


def graph_pagerank_q(sf_dir: str):
    """Integer-quantized PageRank (Q20 fixed point, exact iterations)
    over the undirected near-dup graph — similarity-graph centrality
    for data curation (graph/pagerank.py). Every step is int64 floor
    arithmetic, so the SQL twin unrolls the iterations bit-exactly."""
    from osm_merge_ray.dedup.jaccard import jaccard_pairs
    from osm_merge_ray.graph.pagerank import pagerank_integer

    docs_txt = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = jaccard_pairs(docs_txt, k=3, threshold=0.2)
    nodes = _read(sf_dir, "documents", columns=["doc_id"])
    # 3 unrolled iterations: each costs a join+reduce+join round trip;
    # 3 pins the exact iterative semantics at a third of the stage count
    return pagerank_integer(pairs, nodes, iters=3)


def _pagerank_sql(iters: int = 5, scale: int = 1 << 20,
                  num: int = 85, den: int = 100) -> str:
    base = scale * (den - num) // den
    ctes = [f"""e AS (
  SELECT id_a AS src, id_b AS dst FROM ({SQL_DEDUP_JACCARD})
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM ({SQL_DEDUP_JACCARD})
), d AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT doc_id AS v, CAST({scale} AS BIGINT) AS r FROM documents
)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""i{k} AS (
  SELECT e.dst AS v, sum(r{k - 1}.r // d.deg) AS inflow
  FROM e JOIN d ON d.src = e.src JOIN r{k - 1} ON r{k - 1}.v = e.src
  GROUP BY e.dst
), r{k} AS (
  SELECT n.doc_id AS v,
         CAST({base} + {num} * coalesce(i{k}.inflow, 0) // {den} AS BIGINT) AS r
  FROM documents n LEFT JOIN i{k} ON i{k}.v = n.doc_id
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT v AS doc_id, r AS pagerank_q20 FROM r{iters}")


SQL_PAGERANK = _pagerank_sql(iters=3)


def graph_triangles_q(sf_dir: str, threshold: float = 0.25):
    """Per-node triangle counts over the semantic similarity graph
    (graph/triangles.py wedge join) — local clustering evidence that a
    near-dup group is a genuine clique, not a chain of borderline
    pairs. Edge set = SemDeDup pairs at a looser threshold."""
    import pyarrow.parquet as pq

    from osm_merge_ray.graph.triangles import triangle_counts
    from osm_merge_ray.sim.semdedup import semantic_dedup_pairs

    cents = (pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
             .to_pandas().sort_values("vec_id").head(8))
    cm = np.vstack([np.asarray(v, dtype=np.float64) for v in cents["embedding"]])
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    edges = semantic_dedup_pairs(ds, cm, threshold=threshold)
    return triangle_counts(edges)


def _triangles_sql() -> str:
    pairs = SQL_SEMDEDUP.replace(">= 0.35", ">= 0.25")
    return f"""
WITH pairs AS ({pairs}), tri AS (
  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
  FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b
  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
), n AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM n GROUP BY node
"""


def dedup_minhash_q(sf_dir: str):
    """MinHash-LSH candidate pairs with the SQL-mirrorable variant:
    poly41 char-8-gram hashes, affine permutations (a*x+b) % (2^41-1)
    with constants inlined into the oracle SQL, band key = ordered
    minima. The FNV/splitmix ``minhash_lsh_pairs`` stays the scale
    default (pytest recall-verified)."""
    from osm_merge_ray.dedup.minhash import minhash_pairs_poly

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_pairs_poly(ds).select_columns(["id_a", "id_b"])


def _sql_minhash() -> str:
    from osm_merge_ray.dedup.minhash import minhash_poly_perms

    perms = minhash_poly_perms(32)
    vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(perms))
    gram = "CAST(0 AS BIGINT)"
    for j in range(8):
        gram = (f"(({gram}) * 1000003 "
                f"+ unicode(substr(text, i + {j}, 1))) % 2199023255551")
    return f"""
WITH g AS (
  SELECT doc_id, {gram} AS h
  FROM documents, unnest(generate_series(1, greatest(length(text) - 7, 0))) AS t(i)
), sig AS (
  SELECT doc_id, p.pid, min((p.a * g.h + p.b) % 2199023255551) AS m
  FROM g CROSS JOIN (VALUES {vals}) AS p(pid, a, b)
  GROUP BY doc_id, p.pid
), band AS (
  SELECT doc_id, pid // 4 AS band_id,
         string_agg(CAST(m AS VARCHAR), ',' ORDER BY pid) AS bkey
  FROM sig GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM band a JOIN band b
  ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
"""


SQL_MINHASH = _sql_minhash()


def dedup_simhash_q(sf_dir: str):
    """SimHash near-dup pairs with the SQL-mirrorable 40-bit variant:
    token hash = poly41 (fold over codepoints mod 2^41-1, exact in both
    int64 and DuckDB BIGINT), 4 bands x 10 bits, hamming <= 10 (same
    25%-of-bits radius the 64-bit default uses at 16). The 64-bit FNV
    path stays the scale default (simhash_pairs defaults)."""
    from osm_merge_ray.dedup.simhash import simhash_pairs
    from osm_merge_ray.util import poly41_str

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=10, n_bits=40, hasher=poly41_str
                         ).select_columns(["id_a", "id_b", "hamming"])


SQL_SIMHASH = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), th AS (
  SELECT doc_id, {_POLY41_TOKEN} AS h FROM tok
), bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS wgt
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 39)) AS j) js
  GROUP BY doc_id, j
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN wgt > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS s
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
 AND ((a.s & 1023) = (b.s & 1023)
   OR ((a.s >> 10) & 1023) = ((b.s >> 10) & 1023)
   OR ((a.s >> 20) & 1023) = ((b.s >> 20) & 1023)
   OR ((a.s >> 30) & 1023) = ((b.s >> 30) & 1023))
WHERE bit_count(xor(a.s, b.s)) <= 10
"""


# --- image pHash Hamming near-dup -----------------------------------------
# The image-modality dedup a multimodal training pipeline needs: rows
# whose stored 64-bit perceptual hashes (input_hint column phash:int64)
# sit within a small Hamming radius are near-duplicate images. Banded
# exactly like simhash (shared machinery: dedup/simhash.py
# fingerprint_band_pairs) with num_bands = radius + 1 (pigeonhole).
# The driver-compared twin runs over a parametric 60-bit fixture whose
# phashes an integer formula reproduces in DuckDB BIGINT (content-
# dependent DCT phashes from real pixels are pytest-pinned instead:
# tests/test_operators.py::test_phash_hamming_neardup_real_images).
_PHD_N = 400
_PHD_RADIUS = 6
_PHD_BITS = 60
# planted partner classes by i % 4: hamming 3 (dup), 6 (boundary dup),
# 14 (band-colliding candidate the verify step must reject), no partner
_PHD_MASKS = {0: 0x7, 1: 0x3F << 20, 2: 0x7F7F}


def _phash_fixture() -> pa.Table:
    i = np.arange(_PHD_N, dtype=np.int64)
    base = (i * 2654435761) % (1 << 32)
    h = base * (1 << 28) ^ (i * 40503) % (1 << 28)
    ids = [i]
    fps = [h]
    for c, mask in _PHD_MASKS.items():
        sel = i[i % 4 == c]
        ids.append(sel + 10000)
        fps.append(h[i % 4 == c] ^ np.int64(mask))
    return pa.table({
        "image_id": pa.array(np.concatenate(ids), pa.int64()),
        "phash": pa.array(np.concatenate(fps), pa.int64()),
    })


def dedup_phash_hamming_q(sf_dir: str):
    """Image near-dup pairs by banded pHash Hamming distance — the real
    operator (fingerprint_band_pairs) over the parametric fixture."""
    import ray.data as rd

    from osm_merge_ray.dedup.simhash import fingerprint_band_pairs

    ds = rd.from_arrow(_phash_fixture())
    return fingerprint_band_pairs(ds, id_column="image_id",
                                  fp_column="phash",
                                  max_hamming=_PHD_RADIUS, n_bits=_PHD_BITS)


def _sql_phash_hamming() -> str:
    from osm_merge_ray.dedup.simhash import band_plan

    bands = " OR ".join(
        f"((a.h >> {shift}) & {(1 << width) - 1}) = "
        f"((b.h >> {shift}) & {(1 << width) - 1})"
        for shift, width in band_plan(_PHD_BITS, _PHD_RADIUS + 1))
    partners = " ".join(
        f"UNION ALL SELECT 10000 + i, xor(h, {mask}) FROM base WHERE i % 4 = {c}"
        for c, mask in _PHD_MASKS.items())
    return f"""
WITH base AS (
  SELECT i, ((i * 2654435761) % 4294967296) * 268435456
           + (i * 40503) % 268435456 AS h
  FROM range({_PHD_N}) t(i)
), imgs AS (
  SELECT i AS image_id, h FROM base
  {partners}
)
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM imgs a JOIN imgs b ON a.image_id < b.image_id AND ({bands})
WHERE bit_count(xor(a.h, b.h)) <= {_PHD_RADIUS}
"""


SQL_PHASH_HAMMING = _sql_phash_hamming()


def image_dedup_clusters_q(sf_dir: str):
    """End-to-end IMAGE dedup: banded pHash Hamming pairs → connected
    components → keep the highest-resolution member per cluster — the
    image-modality mirror of dedup_representatives (text jaccard).
    Quality is a parametric megapixel proxy derived from the image id
    by exact integer arithmetic so the SQL twin replays it literally."""
    import ray.data as rd

    from osm_merge_ray.dedup.cluster import (cluster_representatives,
                                             connected_components)
    from osm_merge_ray.dedup.simhash import fingerprint_band_pairs

    fix = _phash_fixture()
    pairs = fingerprint_band_pairs(rd.from_arrow(fix), id_column="image_id",
                                   fp_column="phash",
                                   max_hamming=_PHD_RADIUS, n_bits=_PHD_BITS)
    clusters = connected_components(pairs, rd.from_arrow(fix.select(["image_id"])),
                                    node_column="image_id")
    ids = fix.column("image_id").to_numpy()
    quality = rd.from_arrow(pa.table({
        "image_id": fix.column("image_id"),
        "n_pixels": pa.array(64 + (ids * 40503) % 4096, pa.int64()),
    }))
    return cluster_representatives(clusters, quality, node_column="image_id",
                                   quality_column="n_pixels")


def _sql_image_clusters() -> str:
    partners = " ".join(
        f"UNION ALL SELECT 10000 + i FROM range({_PHD_N}) t(i) WHERE i % 4 = {c}"
        for c in _PHD_MASKS)
    return f"""
WITH RECURSIVE imgs AS (
  SELECT i AS image_id FROM range({_PHD_N}) t(i)
  {partners}
), prs AS (
  SELECT id_a, id_b FROM ({SQL_PHASH_HAMMING})
), und AS (
  SELECT id_a AS src, id_b AS dst FROM prs
  UNION ALL SELECT id_b AS src, id_a AS dst FROM prs
), reach(v, l) AS (
  SELECT image_id, image_id FROM imgs
  UNION
  SELECT u.dst, reach.l FROM reach JOIN und u ON u.src = reach.v
), clusters AS (
  SELECT v AS image_id, CAST(min(l) AS BIGINT) AS cluster_id
  FROM reach GROUP BY v
), q AS (
  SELECT image_id, CAST(64 + (image_id * 40503) % 4096 AS BIGINT) AS n_pixels
  FROM imgs
), j AS (
  SELECT c.cluster_id, c.image_id, q.n_pixels,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.n_pixels DESC, c.image_id) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM clusters c JOIN q ON q.image_id = c.image_id
)
SELECT cluster_id, image_id AS rep_id, n_pixels AS rep_n_pixels,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM j WHERE rn = 1
"""


EMBED_EXACT_MAX_ROWS = 200_000


def dedup_embedding_q(sf_dir: str, threshold: float = 0.35):
    """Embedding-cosine near-dup pairs (double-precision, quantized).

    This is the O(N^2) all-pairs ORACLE TWIN: it broadcasts the full
    matrix and is gated by row count so it can never be pointed at a
    real corpus by accident — above the gate it refuses and routes the
    caller to the scale path (sim/embed_lsh.embedding_neardup_lsh +
    exact re-verify on surviving candidates)."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    if n > EMBED_EXACT_MAX_ROWS:
        raise ValueError(
            f"dedup_embedding_q is the exact all-pairs oracle twin and is "
            f"capped at {EMBED_EXACT_MAX_ROWS} rows (got {n}); use "
            "sim.embed_lsh.embedding_neardup_lsh for the scale path"
        )
    all_rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
    ref = ray.put((ids, mat))

    def pairs(t: pa.Table) -> pa.Table:
        b_ids, b_mat = ray.get(ref)
        ids_a = t.column("vec_id").to_numpy()
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in t.column("embedding").to_pylist()])
        dots = m @ b_mat.T
        na = np.sqrt((m * m).sum(axis=1))
        nb = np.sqrt((b_mat * b_mat).sum(axis=1))
        sim = np.round(dots / (na[:, None] * nb[None, :]), 6)
        rr, cc = np.nonzero((sim >= threshold) & (ids_a[:, None] < b_ids[None, :]))
        return pa.table({
            "id_a": pa.array(ids_a[rr], pa.int64()),
            "id_b": pa.array(b_ids[cc], pa.int64()),
            "sim": pa.array(sim[rr, cc], pa.float64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


SQL_DEDUP_EMBEDDING = """
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
), z AS (
  -- unnest in the SELECT list zips the two lists positionally
  SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM p
), u AS (
  SELECT id_a, id_b,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sy
  FROM z GROUP BY 1, 2
)
SELECT id_a, id_b, round(dot / (sqrt(sx) * sqrt(sy)), 6) AS sim
FROM u WHERE round(dot / (sqrt(sx) * sqrt(sy)), 6) >= 0.35
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def dedup_embedding_lsh_q(sf_dir: str):
    """Hyperplane-LSH near-dup with the SQL-mirrorable INTEGER-plane
    variant: quantized sign arithmetic is exact int64 both in numpy and
    in the DuckDB twin, so the candidate set (and the round-6 cosine
    verify) match bit-for-bit. The float-plane ``embedding_neardup_lsh``
    stays the general path (pytest recall-verified)."""
    import pyarrow.parquet as pq

    from osm_merge_ray.sim.embed_lsh import embedding_neardup_lsh_int

    dim = len(pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
              .column("embedding")[0].as_py())
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # 8 bands x 8 bits: random (cos~0) pairs collide at ~0.5^8 per band,
    # keeping candidates ~30x below the degenerate 16x4-bit banding;
    # the price is lower recall at this loose threshold (LSH tradeoff)
    return embedding_neardup_lsh_int(ds, dim=dim, threshold=0.35, bands=8)


def _sql_embed_lsh(dim: int = 64, bits: int = 64, bands: int = 8) -> str:
    from osm_merge_ray.sim.embed_lsh import int_planes

    w = int_planes(dim, bits)
    vals = ", ".join(f"({d + 1}, {b}, {int(w[d, b])})"
                     for d in range(dim) for b in range(bits))
    rpb = bits // bands
    return f"""
WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
), ei AS (
  SELECT vec_id, d,
         CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) AS xq
  FROM e
), dots AS (
  SELECT ei.vec_id, p.bit, CAST(sum(ei.xq * p.w) AS BIGINT) AS dot
  FROM ei JOIN (VALUES {vals}) AS p(d, bit, w) ON ei.d = p.d
  GROUP BY ei.vec_id, p.bit
), bands AS (
  SELECT vec_id, bit // {rpb} AS band_id,
         CAST(sum(CASE WHEN dot >= 0
                       THEN (CAST(1 AS BIGINT) << (bit % {rpb}))
                       ELSE 0 END) AS BIGINT) AS bval
  FROM dots GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bval = b.bval AND a.vec_id < b.vec_id
), pz AS (
  SELECT c.id_a, c.id_b, ea.embedding AS ea, eb.embedding AS eb
  FROM cand c JOIN embeddings ea ON c.id_a = ea.vec_id
              JOIN embeddings eb ON c.id_b = eb.vec_id
), z AS (
  SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pz
), u AS (
  SELECT id_a, id_b,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sy
  FROM z GROUP BY 1, 2
)
SELECT id_a, id_b, round(dot / (sqrt(sx) * sqrt(sy)), 6) AS sim
FROM u WHERE round(dot / (sqrt(sx) * sqrt(sy)), 6) >= 0.35
"""


SQL_EMBED_LSH = _sql_embed_lsh()


def convert_nps_q(sf_dir: str):
    """Converter under the oracle gate: documents columns dressed as an
    NPS-ish agency schema → `convert_nps` (M4) → emitted tags. Uses
    only case-lowering transforms so the SQL mirror is exact."""
    import json as _json

    from osm_merge_ray.sources.geojson import features_to_table
    from osm_merge_ray.stages.convert import make_converter

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def to_features(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        feats = [
            {"geometry": {"type": "Point", "coordinates": [0.0, 0.0]},
             "properties": {"MAPSOURCE": s, "TRLSURFACE": la, "SEASONAL": s}}
            for s, la in zip(t.column("source").to_pylist(),
                             t.column("lang").to_pylist())
        ]
        ft = features_to_table(feats)
        return ft.set_column(0, "feature_id", pa.array(ids, pa.int64()))

    conv = ds.map_batches(to_features, batch_format="pyarrow").map_batches(
        make_converter("nps"), batch_format="pyarrow"
    )

    def project(t: pa.Table) -> pa.Table:
        props = [_json.loads(p) for p in t.column("props_json").to_pylist()]
        return pa.table({
            "doc_id": t.column("feature_id"),
            "source": pa.array([p.get("source") for p in props], pa.string()),
            "surface": pa.array([p.get("surface") for p in props], pa.string()),
            "seasonal": pa.array([p.get("seasonal") for p in props], pa.string()),
        })

    return conv.map_batches(project, batch_format="pyarrow")


SQL_CONVERT_NPS = """
SELECT doc_id, source, lower(lang) AS surface, lower(source) AS seasonal
FROM documents
"""


def text_token_count_q(sf_dir: str):
    from osm_merge_ray.text.analysis import token_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_stats, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_chars_calc", "avg_token_len"]
    )


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) AS avg_token_len
FROM documents
"""


def text_quality_q(sf_dir: str):
    from osm_merge_ray.text.analysis import quality_score

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "stopword_count", "stopword_ratio", "quality_keep"]
    )


SQL_QUALITY = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the','a','and','of','to','in','is','on','for','with'))) AS BIGINT)
         AS stopword_count,
       CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the','a','and','of','to','in','is','on','for','with'))) AS DOUBLE)
         / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) AS stopword_ratio,
       len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 100000
         AS quality_keep
FROM documents
"""


def text_tfidf_q(sf_dir: str, k: int = 3):
    from osm_merge_ray.text.analysis import tfidf_top_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # max_vocab=None PINNED (r4 advice): SQL_TFIDF has no vocabulary
    # cap, so the parity query must opt into the exact full-vocabulary
    # path explicitly — the bounded default (65536) would silently
    # diverge once the corpus vocabulary exceeds the cap. The CLI /
    # library scale path keeps the bounded default.
    return tfidf_top_terms(ds, k=k, max_vocab=None)


SQL_TFIDF = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2
), dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY 1
), n AS (
  SELECT count(*) AS nd FROM documents
), s AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.nd AS DOUBLE) / dfq.df), 6) AS tfidf
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n
)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


def text_normalize_q(sf_dir: str):
    """Text normalization (the cleaning step every corpus pipeline runs
    first): lowercase, strip a punctuation set, collapse whitespace
    runs — pure Arrow kernels, restated with the identical replace
    chain in the oracle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    import pyarrow.compute as pc

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t.column("text"))
        for ch in ".,!?;:":
            x = pc.replace_substring(x, ch, "")
        x = pc.replace_substring_regex(x, "  +", " ")
        x = pc.utf8_trim_whitespace(x)
        return pa.table({"doc_id": t.column("doc_id"), "text_norm": x})

    return ds.map_batches(norm, batch_format="pyarrow")


SQL_TEXT_NORMALIZE = """
SELECT doc_id,
       trim(regexp_replace(
         replace(replace(replace(replace(replace(replace(
           lower(text), '.', ''), ',', ''), '!', ''), '?', ''), ';', ''), ':', ''),
         '  +', ' ', 'g')) AS text_norm
FROM documents
"""


def text_inverted_index_q(sf_dir: str):
    """(term, df, postings) inverted index — the classic MapReduce text
    output as one grouped combine over map-side distinct (term, doc)
    pairs (text/analysis.inverted_index; max_df stop-list guard for
    open-vocabulary corpora, unset here for exact parity)."""
    from osm_merge_ray.text.analysis import inverted_index

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_index(ds)


SQL_INVERTED_INDEX = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), d AS (
  SELECT DISTINCT w AS term, doc_id FROM tok WHERE w != ''
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM d GROUP BY term
"""


def multimodal_integrity_q(sf_dir: str):
    """Referential-integrity / orphan check between the text and
    embedding sides of a multimodal corpus (ops.presence_join — the
    FULL-OUTER-JOIN-as-presence-flags op every multimodal pipeline
    needs before training: docs with no embedding can't be packed,
    embeddings with no doc are stale). The sf tables are perfectly
    aligned, so each side is deterministically thinned (doc_id % 7,
    vec_id % 5) to plant orphans on both sides."""
    from osm_merge_ray.ops import presence_join

    def thin(col, mod):
        def f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy().astype(np.int64)
            return t.filter(pa.array(v % mod != 0))

        return f

    docs = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        thin("doc_id", 7), batch_format="pyarrow")
    embs = _read(sf_dir, "embeddings", columns=["vec_id"]).map_batches(
        thin("vec_id", 5), batch_format="pyarrow")
    return presence_join(docs, embs, key_a="doc_id", key_b="vec_id",
                         flag_a="in_docs", flag_b="in_embeds")


SQL_MULTIMODAL_INTEGRITY = """
WITH d AS (SELECT doc_id AS id FROM documents WHERE doc_id % 7 != 0),
e AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 5 != 0)
SELECT coalesce(d.id, e.id) AS id,
       d.id IS NOT NULL AS in_docs,
       e.id IS NOT NULL AS in_embeds
FROM d FULL OUTER JOIN e ON d.id = e.id
"""


def _pool():
    """Actor-pool autoscale bounds sized from the cluster, not a
    hardcoded cap (VERDICT r2 #10): up to one actor per CPU."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001 — sizing only, never fail the query
        cpus = 4
    return (1, max(2, cpus))


def text_langid_q(sf_dir: str):
    from osm_merge_ray.text.analysis import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    # plain-function stage (an INSTANCE, not the class): the marker
    # sets are a few hundred bytes, so per-task closure shipping costs
    # nothing and the stage fuses with the read — an actor pool here
    # broke read fusion for no state worth holding (r3 VERDICT #7)
    out = ds.map_batches(LangId(), batch_format="pandas")
    return out.select_columns(["doc_id", "lang", "lang_pred"])


SQL_LANGID = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), sc AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w IN ('der','die','und','das','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         CAST(sum(CASE WHEN w IN ('the','and','of','to','is') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         CAST(sum(CASE WHEN w IN ('el','la','de','que','y') THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
         CAST(sum(CASE WHEN w IN ('le','la','et','les','des') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM documents d JOIN sc ON d.doc_id = sc.doc_id
"""


def text_fingerprint_q(sf_dir: str):
    from osm_merge_ray.text.analysis import Fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # instance = plain-function stage that fuses with the read; the
    # only "state" is two ints (r3 VERDICT #7)
    out = ds.map_batches(Fingerprint(), batch_format="pandas")
    return out.select_columns(["doc_id", "fingerprint", "fingerprint_size"])


# winnowing k-gram hash (k=8) as a nested SQL fold, generated so each of
# the 8 steps applies the same (acc*B + codepoint) % M the engine does
_FP_GRAM = "CAST(0 AS BIGINT)"
for _j in range(8):
    _FP_GRAM = (f"(({_FP_GRAM}) * 1000003 "
                f"+ unicode(substr(text, i + {_j}, 1))) % 2199023255551")

SQL_FINGERPRINT = f"""
WITH g AS (
  SELECT doc_id, i, {_FP_GRAM} AS h
  FROM documents, unnest(generate_series(1, greatest(length(text) - 7, 0))) AS t(i)
), m AS (
  SELECT doc_id, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS ng,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM g
), sel AS (
  SELECT DISTINCT doc_id, wmin AS v FROM m WHERE ng > 16 AND rn >= 16
  UNION
  SELECT doc_id, min(h) AS v FROM m WHERE ng <= 16 GROUP BY doc_id
), f AS (
  SELECT doc_id, bit_xor(v) AS fingerprint, count(*) AS n
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(f.fingerprint, 0) AS BIGINT) AS fingerprint,
       CAST(coalesce(f.n, 0) AS BIGINT) AS fingerprint_size
FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
"""


def text_length_deciles_q(sf_dir: str, n_tiles: int = 10):
    """Equi-depth length bucketing (global rank -> decile) — the
    length-stratification step before stratified sampling/packing.
    Global rank over (n_chars, doc_id) via the same two-level scan as
    text/packing.py: per-value-range bucket counts (only num_buckets
    ints reach the driver), broadcast offsets, in-bucket lexsort rank.
    decile = rank0 * 10 // total — explicit integer formula in both
    engine and SQL (NTILE's ragged-group rule differs)."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    num_buckets = 64
    max_chars = int(ds.max("n_chars"))
    total = ds.count()

    def with_bucket(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy().astype(np.int64)
        b = nc * np.int64(num_buckets) // np.int64(max_chars + 1)
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "n_chars": pa.array(nc, pa.int64()),
                         "rbucket": pa.array(b, pa.int64())})

    bucketed = ds.map_batches(with_bucket, batch_format="pyarrow")
    counts = {int(r["rbucket"]): int(r["count()"])
              for r in bucketed.groupby("rbucket").count().take_all()}
    offsets = np.zeros(num_buckets, dtype=np.int64)
    acc = 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off = offsets.tolist()

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rbucket", "n_chars", "doc_id"], kind="stable")
        rb = df["rbucket"].to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.r_[True, rb[1:] != rb[:-1]])
        sizes = np.diff(np.r_[seg, len(rb)])
        local = np.arange(len(rb)) - np.repeat(seg, sizes)
        r0 = np.asarray(off, dtype=np.int64)[rb] + local
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy().astype(np.int64),
            "n_chars": df["n_chars"].to_numpy().astype(np.int64),
            "rank0": r0,
            "decile": (r0 * n_tiles // total).astype(np.int64),
        })

    return grouped_reduce(bucketed, ["rbucket"], rank)


SQL_LENGTH_DECILES = """
WITH r AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT)
           AS rank0
  FROM documents
)
SELECT doc_id, n_chars, rank0,
       CAST(rank0 * 10 // (SELECT count(*) FROM documents) AS BIGINT)
         AS decile
FROM r
"""


def dedup_winnow_q(sf_dir: str, threshold: float = 0.2, max_df: int = 50):
    """``max_df=50`` drops fingerprints present in >50 docs before pair
    counting — MOSS's standard boilerplate suppression, mirrored
    EXACTLY in the SQL twin (a HAVING df<=50 filter), so the gate stays
    bit-exact. Without it a low-entropy corpus degenerates: at sf0.1
    nearly every doc pair shares >=1 ubiquitous minimum and the partial
    set is ~N^2 (measured 23.5M partial rows for 5k docs)."""
    from osm_merge_ray.dedup.winnow import winnow_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = winnow_pairs(ds, k=8, window=16, threshold=threshold, max_df=max_df)
    return out.select_columns(["id_a", "id_b", "inter", "na", "nb", "overlap"])


# Same winnow selection CTEs as SQL_FINGERPRINT, but instead of
# XOR-combining each doc's selected set, self-join on the selected hash
# to count pairwise intersections (MOSS-style fingerprint overlap).
# Set sizes (na/nb) are the FULL selected sets; only intersection
# counting excludes df>50 hashes — mirroring the engine's max_df.
SQL_WINNOW_PAIRS = f"""
WITH g AS (
  SELECT doc_id, i, {_FP_GRAM} AS h
  FROM documents, unnest(generate_series(1, greatest(length(text) - 7, 0))) AS t(i)
), m AS (
  SELECT doc_id, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS ng,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM g
), sel AS (
  SELECT DISTINCT doc_id, wmin AS v FROM m WHERE ng > 16 AND rn >= 16
  UNION
  SELECT doc_id, min(h) AS v FROM m WHERE ng <= 16 GROUP BY doc_id
), n AS (
  SELECT doc_id, count(*) AS ns FROM sel GROUP BY doc_id
), self AS (
  SELECT s.doc_id, s.v FROM sel s
  JOIN (SELECT v FROM sel GROUP BY v HAVING count(*) <= 50) ok ON ok.v = s.v
), j AS (
  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, count(*) AS inter
  FROM self s1 JOIN self s2 ON s1.v = s2.v AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
)
SELECT j.id_a, j.id_b, j.inter, na.ns AS na, nb.ns AS nb,
       CAST(j.inter AS DOUBLE) / (na.ns + nb.ns - j.inter) AS overlap
FROM j JOIN n na ON j.id_a = na.doc_id JOIN n nb ON j.id_b = nb.doc_id
WHERE CAST(j.inter AS DOUBLE) / (na.ns + nb.ns - j.inter) >= 0.2
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _load_queries(sf_dir: str, n: int = 10):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n)
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    return qm, df["vec_id"].to_numpy()


def knn_topk_q(sf_dir: str, k: int = 5):
    from osm_merge_ray.sim.knn import brute_force_topk

    qm, qids = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, qm, qids, k=k)
    return out.select_columns(["query_id", "neighbor_id", "sim", "rank"])


SQL_KNN_TOPK = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 10
), p AS (
  SELECT q.qid, e.vec_id AS nid, e.embedding AS ee, q.qe
  FROM q JOIN embeddings e ON e.vec_id != q.qid
), z AS (
  SELECT qid, nid, unnest(ee) AS x, unnest(qe) AS y FROM p
), u AS (
  SELECT qid, nid,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sy
  FROM z GROUP BY 1, 2
), s AS (
  SELECT qid, nid, round(dot / (sqrt(sx) * sqrt(sy)), 6) AS sim FROM u
)
SELECT qid AS query_id, nid AS neighbor_id, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
  FROM s
) WHERE rank <= 5
"""


def knn_ivf_q(sf_dir: str, k: int = 5):
    """IVF top-k under the bit-exact gate: FIXED quantizer (the first 8
    vectors by id, integer-quantized) so list assignment and probing
    are exact int64 arithmetic a DuckDB twin reproduces; ranking is the
    round-6 cosine. The trained `ivf_topk` (distributed Lloyd) stays
    the production path, recall-verified in pytest."""
    import pyarrow.parquet as pq

    from osm_merge_ray.sim.knn import ivf_fixed_topk

    qm, qids = _load_queries(sf_dir)
    cents = (pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
             .to_pandas().sort_values("vec_id").head(8))
    cm = np.vstack([np.asarray(v, dtype=np.float64) for v in cents["embedding"]])
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_fixed_topk(ds, qm, qids, cm, k=k, nprobe=3)
    return out.select_columns(["query_id", "neighbor_id", "sim", "rank"])


SQL_KNN_IVF = """
WITH ei AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0) AS BIGINT) AS xq
  FROM embeddings
), cq AS (
  SELECT vec_id AS cid, d, xq FROM ei
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), adots AS (
  SELECT ei.vec_id, cq.cid, CAST(sum(ei.xq * cq.xq) AS BIGINT) AS dot
  FROM ei JOIN cq ON ei.d = cq.d
  GROUP BY 1, 2
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
    FROM adots) WHERE rn = 1
), q AS (
  SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT 10
), probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, a.cid,
           row_number() OVER (PARTITION BY q.qid ORDER BY a.dot DESC, a.cid ASC) AS rn
    FROM q JOIN adots a ON a.vec_id = q.qid) WHERE rn <= 3
), cand AS (
  SELECT p.qid, s.vec_id AS nid
  FROM probe p JOIN assign s ON s.cid = p.cid
  WHERE s.vec_id != p.qid
), z AS (
  SELECT c.qid, c.nid, unnest(eq.embedding) AS x, unnest(en.embedding) AS y
  FROM cand c JOIN embeddings eq ON eq.vec_id = c.qid
              JOIN embeddings en ON en.vec_id = c.nid
), u AS (
  SELECT qid, nid,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sy
  FROM z GROUP BY 1, 2
), r AS (
  SELECT qid AS query_id, nid AS neighbor_id,
         round(dot / (sqrt(sx) * sqrt(sy)), 6) AS sim,
         row_number() OVER (PARTITION BY qid
             ORDER BY round(dot / (sqrt(sx) * sqrt(sy)), 6) DESC, nid ASC) AS rnk
  FROM u
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= 5
"""


def dedup_semantic_q(sf_dir: str, threshold: float = 0.35):
    """SemDeDup (Abbas et al. 2023): k-means-bucketed within-cluster
    cosine near-dup pairs. Fixed quantizer (first 8 vectors by id) so
    assignment is exact int64 arithmetic; round-6 cosine ranking —
    both under the bit-exact gate. Production centroids come from
    sim/knn.train_centroids_distributed instead."""
    import pyarrow.parquet as pq

    from osm_merge_ray.sim.semdedup import semantic_dedup_pairs

    cents = (pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
             .to_pandas().sort_values("vec_id").head(8))
    cm = np.vstack([np.asarray(v, dtype=np.float64) for v in cents["embedding"]])
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = semantic_dedup_pairs(ds, cm, threshold=threshold)
    return out.select_columns(["cid", "id_a", "id_b", "sim"])


SQL_SEMDEDUP = """
WITH ei AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0) AS BIGINT) AS xq
  FROM embeddings
), cq AS (
  SELECT vec_id AS cid, d, xq FROM ei
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), adots AS (
  SELECT ei.vec_id, cq.cid, CAST(sum(ei.xq * cq.xq) AS BIGINT) AS dot
  FROM ei JOIN cq ON ei.d = cq.d
  GROUP BY 1, 2
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
    FROM adots) WHERE rn = 1
), cand AS (
  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
), z AS (
  SELECT c.cid, c.id_a, c.id_b,
         unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
  FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a
              JOIN embeddings eb ON eb.vec_id = c.id_b
), u AS (
  SELECT cid, id_a, id_b,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sy
  FROM z GROUP BY 1, 2, 3
)
SELECT cid, id_a, id_b, round(dot / (sqrt(sx) * sqrt(sy)), 6) AS sim
FROM u WHERE round(dot / (sqrt(sx) * sqrt(sy)), 6) >= 0.35
"""


# ---------------------------------------------------------------------------
# relational / streaming-shaped
# ---------------------------------------------------------------------------

def orders_upsert_q(sf_dir: str):
    """CDC merge / upsert (ops.merge_upsert): a delta restating every
    10th order at +$1 wins over the base row by version — per key keep
    the highest-version row. Exact integer cents both sides."""
    from osm_merge_ray.ops import merge_upsert

    def side(src: int):
        def f(t: pa.Table) -> pa.Table:
            key = t.column("o_orderkey").to_numpy().astype(np.int64)
            cents = np.floor(t.column("o_totalprice").to_numpy() * 100.0
                             + 0.5).astype(np.int64)
            if src == 1:
                keep = key % 10 == 0
                key, cents = key[keep], cents[keep] + 100
            return pa.table({
                "o_orderkey": pa.array(key, pa.int64()),
                "price_e2": pa.array(cents, pa.int64()),
                "src": pa.array(np.full(len(key), src, dtype=np.int64)),
            })
        return f

    base = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(side(0), batch_format="pyarrow")
    delta = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(side(1), batch_format="pyarrow")
    return merge_upsert(base, delta, "o_orderkey", "src")


SQL_ORDERS_UPSERT = """
WITH base AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2,
         CAST(0 AS BIGINT) AS src
  FROM orders
), delta AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 100 AS price_e2,
         CAST(1 AS BIGINT) AS src
  FROM orders WHERE o_orderkey % 10 = 0
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
)
SELECT o_orderkey, price_e2, src FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY src DESC) AS rn
  FROM u
) WHERE rn = 1
"""


def events_funnel_q(sf_dir: str,
                    stages: tuple = ("view", "click", "purchase")):
    """Funnel analysis — sequential pattern matching per user (greedy
    first-match): t1 = first 'view', t2 = first 'click' AFTER t1,
    t3 = first 'purchase' AFTER t2. Emits each user's furthest stage
    and the exact stage timestamps (epoch us; -1 when not reached).
    All rows of a user meet in one bucket; exact integer time."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def light(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        return pa.table({"user_id": t.column("user_id").cast(pa.int64()),
                         "t": pa.array(ts, pa.int64()),
                         "event_type": t.column("event_type")})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized across ALL users in the bucket: one np.minimum.at
        # per stage (no per-user Python loop — a bucket holds many
        # thousands of users at scale)
        uids, ui = np.unique(df["user_id"].to_numpy(), return_inverse=True)
        et = df["event_type"].to_numpy()
        tt = df["t"].to_numpy().astype(np.int64)
        nu = len(uids)
        big = np.iinfo(np.int64).max
        cut = np.full(nu, -1, dtype=np.int64)
        reached = np.zeros(nu, dtype=np.int64)
        times = np.full((len(stages), nu), -1, dtype=np.int64)
        for si, s in enumerate(stages):
            ok = (et == s) & (tt > cut[ui]) & (reached[ui] == si)
            best = np.full(nu, big, dtype=np.int64)
            np.minimum.at(best, ui[ok], tt[ok])
            hit = best != big
            cut = np.where(hit, best, cut)
            times[si][hit] = best[hit]
            reached += hit
        return pd.DataFrame({
            "user_id": uids.astype(np.int64), "stage_reached": reached,
            "t1_us": times[0], "t2_us": times[1], "t3_us": times[2],
        })

    return grouped_reduce(ds.map_batches(light, batch_format="pyarrow"),
                          ["user_id"], per_user)


SQL_EVENTS_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t FROM events
), s1 AS (
  SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view'
  GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND t > t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND t > t2 GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                 WHEN s2.t2 IS NOT NULL THEN 2
                 WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS stage_reached,
       CAST(coalesce(s1.t1, -1) AS BIGINT) AS t1_us,
       CAST(coalesce(s2.t2, -1) AS BIGINT) AS t2_us,
       CAST(coalesce(s3.t3, -1) AS BIGINT) AS t3_us
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 ON s1.user_id = u.user_id
LEFT JOIN s2 ON s2.user_id = u.user_id
LEFT JOIN s3 ON s3.user_id = u.user_id
"""


def events_cooccurrence_q(sf_dir: str):
    """Association mining (market-basket co-occurrence): for every
    unordered event_type pair, how many users did both, plus each
    type's user count — the exact integer ingredients of
    support/confidence/lift. Per-user distinct types meet in one
    bucket; pairs per user are tiny (k choose 2 over ~5 types)."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def user_types(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                           "event_type": t.column("event_type").to_pylist()})
        u = df.drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    def per_user_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        df = df.sort_values(["user_id", "event_type"], kind="stable")
        rows = {"type_a": [], "type_b": []}
        for _, g in df.groupby("user_id", sort=False):
            ts = g["event_type"].tolist()
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    rows["type_a"].append(ts[i])
                    rows["type_b"].append(ts[j])
        out = pd.DataFrame(rows)
        if out.empty:
            return pd.DataFrame({"type_a": pd.Series(dtype=str),
                                 "type_b": pd.Series(dtype=str),
                                 "n_both": pd.Series(dtype=np.int64)})
        g = out.groupby(["type_a", "type_b"], as_index=False).size() \
            .rename(columns={"size": "n_both"})
        g["n_both"] = g["n_both"].astype(np.int64)
        return g

    uniq = ds.map_batches(user_types, batch_format="pyarrow")
    pairs = grouped_reduce(uniq, ["user_id"], per_user_pairs)
    pair_counts = grouped_reduce(
        pairs, ["type_a", "type_b"],
        lambda df: df.groupby(["type_a", "type_b"], as_index=False)
        .agg(n_both=("n_both", "sum")))

    # per-type user counts: small (5 types) — broadcast by value
    type_counts = grouped_reduce(
        uniq, ["event_type"],
        lambda df: df.groupby("event_type", as_index=False)
        .agg(n_users=("user_id", "nunique"))).to_pandas()
    tc = {r.event_type: int(r.n_users) for r in type_counts.itertuples()}

    def attach(t: pa.Table) -> pa.Table:
        na = [tc[x] for x in t.column("type_a").to_pylist()]
        nb = [tc[x] for x in t.column("type_b").to_pylist()]
        t = t.append_column("n_users_a", pa.array(na, pa.int64()))
        return t.append_column("n_users_b", pa.array(nb, pa.int64()))

    return pair_counts.map_batches(attach, batch_format="pyarrow")


SQL_EVENTS_COOCCURRENCE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), tc AS (
  SELECT event_type, count(*) AS n_users FROM ut GROUP BY event_type
), p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       ta.n_users AS n_users_a, tb.n_users AS n_users_b
FROM p JOIN tc ta ON ta.event_type = p.type_a
       JOIN tc tb ON tb.event_type = p.type_b
"""


def events_ewma_q(sf_dir: str, num: int = 30, den: int = 100):
    """Per-user integer EWMA over the event stream — TRUE sequential
    state (the floor at every step breaks the telescoping that would
    let a window function express it): ewma_1 = v_1;
    ewma_k = (30*v_k + 70*ewma_{k-1}) // 100. Vectorized across users
    per time-rank (rows sorted (user, ts): step k updates every user's
    k-th event in one numpy op). Recursive-CTE SQL twin."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def light(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        v = np.floor(t.column("value").to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table({"event_id": t.column("event_id").cast(pa.int64()),
                         "user_id": t.column("user_id").cast(pa.int64()),
                         "t": pa.array(ts, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy()
        uid = df["user_id"].to_numpy()
        tt = df["t"].to_numpy()
        v = df["v"].to_numpy()
        if len(v) and v.min() < 0:
            # numpy // floors, DuckDB // truncates toward zero: the two
            # recursions diverge on negative values — refuse loudly
            raise ValueError("events_ewma requires non-negative values "
                             "(floor-div vs trunc-div divergence)")
        order = np.lexsort((eid, tt, uid))
        eid, uid, tt, v = eid[order], uid[order], tt[order], v[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        sizes = np.diff(np.r_[starts, len(uid)])
        rank = np.arange(len(uid)) - np.repeat(starts, sizes)  # 0-based
        ewma = v.copy()
        a, b = np.int64(num), np.int64(den - num)
        for k in range(1, int(sizes.max()) if len(sizes) else 0):
            idx = np.flatnonzero(rank == k)
            ewma[idx] = (a * v[idx] + b * ewma[idx - 1]) // np.int64(den)
        return pd.DataFrame({
            "event_id": eid.astype(np.int64),
            "user_id": uid.astype(np.int64),
            "rn": (rank + 1).astype(np.int64),
            "ewma_e6": ewma.astype(np.int64),
        })

    return grouped_reduce(ds.map_batches(light, batch_format="pyarrow"),
                          ["user_id"], per_user)


SQL_EVENTS_EWMA = """
WITH RECURSIVE e AS (
  SELECT event_id, user_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
), r(event_id, user_id, rn, ewma) AS (
  SELECT event_id, user_id, rn, v FROM e WHERE rn = 1
  UNION ALL
  SELECT e.event_id, e.user_id, e.rn, (30 * e.v + 70 * r.ewma) // 100
  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT event_id, user_id, CAST(rn AS BIGINT) AS rn,
       CAST(ewma AS BIGINT) AS ewma_e6
FROM r
"""


def events_retention_q(sf_dir: str):
    """Cohort retention matrix — the classic product-analytics rollup
    with SELF-RELATIVE time bucketing: each user's cohort is their
    first active week; output counts users from each cohort active k
    weeks later. All rows of a user meet in one bucket (cohort needs
    the user's min week), then a tiny (cohort, offset) sum. Integer
    week arithmetic → bit-exact SQL twin."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    week_us = 7 * 86_400_000_000

    def user_weeks(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        uid = t.column("user_id").to_numpy().astype(np.int64)
        key = np.stack([uid, ts // week_us])
        uniq = np.unique(key, axis=1)
        return pa.table({"user_id": pa.array(uniq[0], pa.int64()),
                         "week": pa.array(uniq[1], pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "week"])
        cohort = df.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame({"cohort_week": cohort.astype(np.int64),
                            "week_offset": (df["week"] - cohort).astype(np.int64)})
        g = out.groupby(["cohort_week", "week_offset"], as_index=False) \
            .size().rename(columns={"size": "n_users"})
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    partials = grouped_reduce(
        ds.map_batches(user_weeks, batch_format="pyarrow"),
        ["user_id"], per_user)
    return grouped_reduce(
        partials, ["cohort_week", "week_offset"],
        lambda df: df.groupby(["cohort_week", "week_offset"],
                              as_index=False).agg(n_users=("n_users", "sum")))


SQL_EVENTS_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
  FROM events
), c AS (
  SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id
)
SELECT c.cohort AS cohort_week,
       CAST(uw.week - c.cohort AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id) GROUP BY 1, 2
"""


def events_distinct_sketch_q(sf_dir: str):
    """KMV distinct-count sketch (sketch.py) over events.user_id (few
    distinct: sketch == exact) and event_id (cardinality > k: the
    (k-1)*M // h_k estimator path) — a mergeable cardinality sketch
    whose every step is int64 arithmetic, unlike HyperLogLog whose
    float estimator no SQL twin reproduces. Exact distinct counts ride
    along so the estimator's error is visible."""
    from osm_merge_ray.sketch import distinct_sketch

    ds = _read(sf_dir, "events", columns=["user_id", "event_id"])
    return distinct_sketch(ds, ["user_id", "event_id"], k=256,
                           include_exact=True)


# the engine's kmv_mix (sketch.py), spelled in BIGINT: two affine-mod
# rounds interleaved with invertible xorshifts
_KMV_MIX = (
    "xor((920461 * xor((69069 * {x} + 12345) % 2199023255551, "
    "((69069 * {x} + 12345) % 2199023255551) >> 21) + 7) % 2199023255551, "
    "((920461 * xor((69069 * {x} + 12345) % 2199023255551, "
    "((69069 * {x} + 12345) % 2199023255551) >> 21) + 7) % 2199023255551) >> 13)"
)

SQL_DISTINCT_SKETCH = f"""
WITH hu AS (
  SELECT DISTINCT {_KMV_MIX.format(x='user_id')} AS h FROM events
), bu AS (SELECT h FROM hu ORDER BY h LIMIT 256),
su AS (SELECT max(h) AS kth, count(*) AS n FROM bu),
he AS (
  SELECT DISTINCT {_KMV_MIX.format(x='event_id')} AS h FROM events
), be AS (SELECT h FROM he ORDER BY h LIMIT 256),
se AS (SELECT max(h) AS kth, count(*) AS n FROM be)
SELECT 'user_id' AS key, CAST(kth AS BIGINT) AS kth_min,
       CAST(n AS BIGINT) AS n_sketch,
       CAST(CASE WHEN n < 256 THEN n
            ELSE 255 * 2199023255551 // kth END AS BIGINT) AS est_distinct,
       (SELECT count(DISTINCT user_id) FROM events) AS n_distinct
FROM su
UNION ALL
SELECT 'event_id', CAST(kth AS BIGINT), CAST(n AS BIGINT),
       CAST(CASE WHEN n < 256 THEN n
            ELSE 255 * 2199023255551 // kth END AS BIGINT),
       (SELECT count(DISTINCT event_id) FROM events)
FROM se
"""


def events_group_distinct_q(sf_dir: str, k: int = 64):
    """Per-group KMV distinct sketch (sketch.grouped_distinct_sketch):
    approx distinct users per event_type at bounded transfer — the
    grouped counterpart of events_distinct_sketch; exact per-group
    distinct counts ride along so the error is visible. The twin
    replicates the bottom-k via ROW_NUMBER over the distinct mixed
    hashes per group."""
    from osm_merge_ray.sketch import grouped_distinct_sketch

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_distinct_sketch(ds, "event_type", "user_id", k=k,
                                   include_exact=True)


SQL_GROUP_DISTINCT = f"""
WITH d AS (
  SELECT DISTINCT event_type, {_KMV_MIX.format(x='user_id')} AS h FROM events
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
), b AS (
  SELECT event_type, max(h) AS kth, count(*) AS n
  FROM r WHERE rn <= 64 GROUP BY event_type
), x AS (
  SELECT event_type, count(DISTINCT user_id) AS nd
  FROM events GROUP BY event_type
)
SELECT b.event_type, CAST(kth AS BIGINT) AS kth_min,
       CAST(n AS BIGINT) AS n_sketch,
       CAST(CASE WHEN n < 64 THEN n
            ELSE 63 * 2199023255551 // kth END AS BIGINT) AS est_distinct,
       CAST(nd AS BIGINT) AS n_distinct
FROM b JOIN x ON b.event_type = x.event_type
"""


def events_cms_q(sf_dir: str, k: int = 20, w: int = 1024):
    """Count-Min Sketch point queries (sketch.py cms_build/estimate):
    the 4x1024 counter grid is built from fixed-size per-block partials
    (one dense grid each — row-count-independent driver transfer), then
    the top-k users by TRUE count get their CMS estimate side by side
    (est >= true always; the gap is the sketch's collision overcount).
    The true-count side is a distributed grouped top-k (r3 VERDICT #6):
    blocks hold disjoint users after the grouped combine, so each block
    keeps only its own top-k and the driver sees num_blocks * k light
    rows, never the full user cardinality."""
    from osm_merge_ray.ops import grouped_reduce
    from osm_merge_ray.sketch import cms_build, cms_estimate

    ds = _read(sf_dir, "events", columns=["user_id"])
    counts_ds = grouped_reduce(
        ds, ["user_id"],
        lambda df: df.groupby("user_id", as_index=False)
        .agg(true_count=("user_id", "size")))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["true_count", "user_id"],
                              ascending=[False, True],
                              kind="stable").head(k)

    counts = counts_ds.map_batches(
        block_topk, batch_format="pandas").to_pandas()
    counts["true_count"] = counts["true_count"].astype(np.int64)
    top = counts.sort_values(["true_count", "user_id"],
                             ascending=[False, True], kind="stable").head(k)

    grid = cms_build(ds, "user_id", w=w)
    keys = top["user_id"].to_numpy().astype(np.int64)
    est = cms_estimate(grid, keys, w=w)
    return pd.DataFrame({"user_id": keys,
                         "true_count": top["true_count"].to_numpy(),
                         "cms_est": est})


def _cms_sql(k: int = 20, w: int = 1024) -> str:
    from osm_merge_ray.sketch import CMS_SALTS

    cnt = []
    joins = []
    for j, s in enumerate(CMS_SALTS):
        expr = _KMV_MIX.format(x=f"xor(user_id, {s})")
        texpr = _KMV_MIX.format(x=f"xor(t.user_id, {s})")
        cnt.append(f"cnt{j} AS (SELECT ({expr}) % {w} AS cell, "
                   f"count(*) AS n FROM events GROUP BY 1)")
        joins.append(f"JOIN cnt{j} c{j} ON c{j}.cell = ({texpr}) % {w}")
    return f"""
WITH {', '.join(cnt)},
top AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_count FROM events
  GROUP BY user_id ORDER BY true_count DESC, user_id LIMIT {k}
)
SELECT t.user_id, t.true_count,
       CAST(least(c0.n, c1.n, c2.n, c3.n) AS BIGINT) AS cms_est
FROM top t
{' '.join(joins)}
"""


def source_weighted_sample_q(sf_dir: str):
    """Deterministic weighted mixture downsampling (the application
    step of DoReMi-style per-source reweighting): source srcK keeps a
    (K+1)/20 fraction of its documents via a hash-threshold Bernoulli —
    keep iff mix(doc_id) mod 2^20 < floor(w * 2^20). Same integer
    mixer as the KMV sketch, so the SQL twin is exact; reproducible
    (no RNG state) and stable under re-partitioning."""
    from osm_merge_ray.sketch import kmv_mix

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src = t.column("source").to_pylist()
        idx = np.array([int(s[3:]) for s in src], dtype=np.int64)
        thresh = (idx + 1) * np.int64(1 << 20) // np.int64(20)
        keep = (kmv_mix(ids) % np.int64(1 << 20)) < thresh
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "source": pa.array([s for s, k in zip(src, keep) if k]),
            "thresh_q20": pa.array(thresh[keep], pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "source"]) \
        .map_batches(sample, batch_format="pyarrow")


SQL_SOURCE_WEIGHTED = f"""
SELECT doc_id, source,
       (CAST(substr(source, 4) AS BIGINT) + 1) * 1048576 // 20 AS thresh_q20
FROM documents
WHERE ({_KMV_MIX.format(x='doc_id')}) % 1048576
      < (CAST(substr(source, 4) AS BIGINT) + 1) * 1048576 // 20
"""


def source_quota_sample_q(sf_dir: str, k: int = 10):
    """Exact-k-per-group quota sample (sampling.py): at most k docs
    per source, chosen by kmv_mix hash rank with id tie-break — the
    balancing step of an eval-slice / mixture build, where Bernoulli
    sampling (source_weighted_sample) can't guarantee counts. Two-level
    top-k: per-block partials then grouped final, so the shuffle is
    blocks x sources x k light rows. Twin: ROW_NUMBER() window."""
    from osm_merge_ray.sampling import quota_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return quota_sample(ds, "source", k=k, id_column="doc_id")


SQL_SOURCE_HASH_QUOTA = f"""
SELECT source, doc_id, h_mix, r FROM (
  SELECT source, doc_id, {_KMV_MIX.format(x='doc_id')} AS h_mix,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {_KMV_MIX.format(x='doc_id')}, doc_id) AS BIGINT) AS r
  FROM documents)
WHERE r <= 10
"""


def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped aggregate with exact integer partial aggregation
    inside map_batches before the (tiny) groupby — the canonical
    pre-aggregate pattern."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        qty = np.floor(t.column("l_quantity").to_numpy() * 100.0 + 0.5).astype(np.int64)
        price = np.floor(t.column("l_extendedprice").to_numpy() * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(t.column("l_discount").to_numpy() * 100.0 + 0.5).astype(np.int64)
        disc_price = price * (100 - disc)
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pylist(),
            "l_linestatus": t.column("l_linestatus").to_pylist(),
            "qty": qty, "price": price, "disc_price": disc_price,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_e2=("qty", "sum"), sum_price_e2=("price", "sum"),
            sum_disc_price_e4=("disc_price", "sum"), n_rows=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_e2", alias_name="sum_qty_e2"),
            Sum("sum_price_e2", alias_name="sum_price_e2"),
            Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_e2,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top_orders_by_revenue(sf_dir: str, k: int = 10):
    """Revenue per order (exact integer cents), broadcast-joined to the
    orders dim, global top-k with deterministic tie-break."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderpriority"])
    lookup = dict(zip(orders.column("o_orderkey").to_pylist(),
                      orders.column("o_orderpriority").to_pylist()))
    ref = ray.put(lookup)

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        price = np.floor(t.column("l_extendedprice").to_numpy() * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(t.column("l_discount").to_numpy() * 100.0 + 0.5).astype(np.int64)
        rev = price * (100 - disc)
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(), "rev": rev})
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g.rename(columns={"rev": "revenue_e4"}), preserve_index=False)

    from osm_merge_ray.ops import grouped_reduce

    per_order = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"],
        lambda df: df.groupby("l_orderkey", as_index=False)["revenue_e4"].sum(),
    )
    top = per_order.sort(["revenue_e4", "l_orderkey"], descending=[True, False]).limit(k)

    def attach(t: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        keys = t.column("l_orderkey").to_pylist()
        pri = [lk.get(kk) for kk in keys]
        return t.append_column("o_orderpriority", pa.array(pri, pa.string()))

    return top.map_batches(attach, batch_format="pyarrow").select_columns(
        ["l_orderkey", "revenue_e4", "o_orderpriority"]
    )


SQL_TOP_ORDERS = """
SELECT l_orderkey,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_e4,
       any_value(o.o_orderpriority) AS o_orderpriority
FROM lineitem JOIN orders o ON l_orderkey = o.o_orderkey
GROUP BY l_orderkey
ORDER BY revenue_e4 DESC, l_orderkey ASC
LIMIT 10
"""


def nation_revenue(sf_dir: str):
    """orders ⋈ customer ⋈ nation via two broadcast lookups (small
    sides shipped once with ray.put, no shuffle join)."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    c2n = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()))
    n2name = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    ref = ray.put((c2n, n2name))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        c2n_, n2name_ = ray.get(ref)
        cust_keys = t.column("o_custkey").to_pylist()
        names = [n2name_.get(c2n_.get(ck)) for ck in cust_keys]
        price_e2 = np.floor(t.column("o_totalprice").to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "n_name": pa.array(names, pa.string()),
            "price_e2": pa.array(price_e2, pa.int64()),
        })

    return (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("price_e2", alias_name="revenue_e2"), Count(alias_name="n_orders"))
    )


SQL_NATION_REVENUE = """
SELECT n.n_name,
       CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e2,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def events_window(sf_dir: str):
    """Tumbling 1-hour windows per event_type (exact integer epoch)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        win = ts // 3_600_000_000
        val = np.floor(t.column("value").to_numpy() * 1e6 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pylist(),
            "window_id": win, "value_e6": val,
        })
        g = df.groupby(["event_type", "window_id"], as_index=False).agg(
            sum_value_e6=("value_e6", "sum"), n_events=("value_e6", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from osm_merge_ray.ops import grouped_reduce

    return grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_id"],
        lambda df: df.groupby(["event_type", "window_id"], as_index=False).agg(
            sum_value_e6=("sum_value_e6", "sum"), n_events=("n_events", "sum")
        ),
    )


SQL_EVENTS_WINDOW = """
SELECT event_type,
       CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS window_id,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e6,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""


def events_sliding_window(sf_dir: str):
    """Sliding windows: size 1 h, slide 30 min — each event lands in 2
    overlapping windows (flat_map inside map_batches, then the bucketed
    combine). Window id = index of the window's START slot."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    slide = 1_800_000_000  # 30 min in µs

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        slot = ts // slide
        val = np.floor(t.column("value").to_numpy() * 1e6 + 0.5).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        # windows starting at slot and slot-1 both contain this event
        win = np.concatenate([slot, slot - 1])
        return pa.table({
            "event_type": pa.array(np.concatenate([et, et]), pa.string()),
            "window_id": pa.array(win, pa.int64()),
            "value_e6": pa.array(np.concatenate([val, val]), pa.int64()),
        })

    return grouped_reduce(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["event_type", "window_id"],
        lambda df: df.groupby(["event_type", "window_id"], as_index=False).agg(
            sum_value_e6=("value_e6", "sum"), n_events=("value_e6", "size")
        ),
    )


SQL_EVENTS_SLIDING = """
SELECT event_type,
       CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) - o.off AS window_id,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e6,
       count(*) AS n_events
FROM events, (SELECT unnest([0, 1]) AS off) o
GROUP BY 1, 2
"""


def events_running_index(sf_dir: str):
    """Per-user running event index (the cumulative-state stream shape):
    all rows of a user land in one bucket, ranked by (ts, event_id)."""
    from osm_merge_ray.ops import first_in_groups, grouped_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        uid = df["user_id"].to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        starts = first_in_groups(uid_s)
        grp_start = np.flatnonzero(starts)
        sizes = np.diff(np.r_[grp_start, len(uid_s)])
        idx = np.arange(len(uid_s)) - np.repeat(grp_start, sizes) + 1
        return pd.DataFrame({
            "event_id": eid[order], "user_id": uid_s,
            "running_idx": idx.astype(np.int64),
        })

    return grouped_reduce(ds, ["user_id"], ranks)


SQL_EVENTS_RUNNING_INDEX = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS running_idx
FROM events
"""


def events_late_data_q(sf_dir: str, gap_min: int = 60):
    """Watermark / late-data accounting (the batch restatement of the
    streaming watermark rule): per user, watermark = max(ts) - gap;
    events older than the watermark are LATE. Emits per-user late
    count and max lateness (exact integer microseconds)."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap_us = gap_min * 60_000_000

    def late(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        uid = df["user_id"].to_numpy()
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        from osm_merge_ray.ops import first_in_groups

        starts = np.flatnonzero(first_in_groups(uid_s))
        bounds = np.r_[starts, len(uid_s)]
        rows = []
        for g in range(len(starts)):
            lo, hi = bounds[g], bounds[g + 1]
            t_g = ts_s[lo:hi]
            wm = t_g.max() - gap_us
            late_mask = t_g < wm
            rows.append((int(uid_s[lo]), hi - lo, int(late_mask.sum()),
                         int((wm - t_g[late_mask]).max()) if late_mask.any() else 0))
        return pd.DataFrame(rows, columns=["user_id", "n_events", "n_late",
                                           "max_lateness_us"])

    return grouped_reduce(ds, ["user_id"], late)


SQL_EVENTS_LATE = """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS t,
         max(epoch_us(ts)) OVER (PARTITION BY user_id) - 3600000000 AS wm
  FROM events
)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN t < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN t < wm THEN wm - t END), 0) AS BIGINT)
         AS max_lateness_us
FROM x GROUP BY user_id
"""


def events_quantiles_q(sf_dir: str):
    """Exact per-group quantiles (p25/p50/p95 of the integer-quantized
    value) — corpus statistics without a sketch: all rows of one
    event_type co-locate via the bucketed combine, the discrete
    quantile is the sorted element at ceil(q*n)-1, DuckDB's
    quantile_disc semantics exactly."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "value_e6": pa.array(v, pa.int64())})

    def quants(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            v = np.sort(g["value_e6"].to_numpy())
            n = len(v)

            def q(p):
                return int(v[max(int(np.ceil(p * n)) - 1, 0)])

            rows.append((et, n, q(0.25), q(0.5), q(0.95)))
        return pd.DataFrame(rows, columns=["event_type", "n", "p25_e6",
                                           "p50_e6", "p95_e6"])

    return grouped_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                          ["event_type"], quants)


SQL_EVENTS_QUANTILES = """
SELECT event_type, count(*) AS n,
       CAST(quantile_disc(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT), 0.25) AS BIGINT) AS p25_e6,
       CAST(quantile_disc(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT), 0.5) AS BIGINT) AS p50_e6,
       CAST(quantile_disc(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT), 0.95) AS BIGINT) AS p95_e6
FROM events GROUP BY event_type
"""


TOP_NGRAMS_K = 20


def text_top_ngrams_q(sf_dir: str, k: int = TOP_NGRAMS_K):
    """Corpus-wide top word-bigrams (occurrence counts): per-batch
    partial counts (one row per distinct gram per batch) → bucketed
    combine → tiny global top-k sort."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            ws = (s or "").split(" ")
            for i in range(len(ws) - 1):
                g = ws[i] + " " + ws[i + 1]
                agg[g] = agg.get(g, 0) + 1
        return pa.table({"gram": pa.array(list(agg.keys()), pa.string()),
                         "n": pa.array(list(agg.values()), pa.int64())})

    counts = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), ["gram"],
        lambda df: df.groupby("gram", as_index=False)["n"].sum())
    return counts.sort(["n", "gram"], descending=[True, False]).limit(k)


SQL_TOP_NGRAMS = f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
), g AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
)
SELECT gram, count(*) AS n FROM g GROUP BY gram
ORDER BY n DESC, gram ASC LIMIT {TOP_NGRAMS_K}
"""


def events_asof_join(sf_dir: str):
    """AS-OF join (the classic stream/temporal join Ray Data lacks as a
    native op): each ODD event matches the LATEST EVEN event of the
    same user at-or-before its timestamp. One shuffle co-locates a
    user's rows (ops.grouped_reduce); inside the group both sides sort
    once and a vectorized searchsorted resolves every probe — no
    per-row scanning. Ties on timestamp break by max event_id,
    mirrored exactly by the oracle's LATERAL ORDER BY ts DESC, id
    DESC LIMIT 1."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy()
        uid = df["user_id"].to_numpy()
        out_e, out_m, out_lag = [], [], []  # numpy slices, concatenated once
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, eid_s = uid[order], ts[order], eid[order]
        from osm_merge_ray.ops import first_in_groups

        starts = np.flatnonzero(first_in_groups(uid_s))
        bounds = np.r_[starts, len(uid_s)]
        for g in range(len(starts)):
            lo, hi = bounds[g], bounds[g + 1]
            t_g, e_g = ts_s[lo:hi], eid_s[lo:hi]
            right = e_g % 2 == 0
            left = ~right
            if not left.any():
                continue
            rt, re_ = t_g[right], e_g[right]  # sorted by (ts, eid) already
            lt, le = t_g[left], e_g[left]
            if len(rt):
                pos = np.searchsorted(rt, lt, side="right") - 1
                ok = pos >= 0
                m = np.where(ok, re_[np.maximum(pos, 0)], -1)
                lag = np.where(ok, lt - rt[np.maximum(pos, 0)], -1)
            else:
                m = np.full(len(lt), -1, dtype=np.int64)
                lag = np.full(len(lt), -1, dtype=np.int64)
            out_e.append(le)
            out_m.append(m)
            out_lag.append(lag)
        cat = (lambda xs: np.concatenate(xs).astype(np.int64)
               if xs else np.empty(0, dtype=np.int64))
        return pd.DataFrame({
            "event_id": cat(out_e),
            "matched_event_id": cat(out_m),
            "lag_us": cat(out_lag),
        })

    return grouped_reduce(ds, ["user_id"], asof)


SQL_EVENTS_ASOF = """
SELECT l.event_id,
       coalesce(r.event_id, -1) AS matched_event_id,
       coalesce(CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT), -1) AS lag_us
FROM (SELECT * FROM events WHERE event_id % 2 = 1) l
LEFT JOIN LATERAL (
  SELECT event_id, ts FROM events r
  WHERE r.user_id = l.user_id AND r.event_id % 2 = 0 AND r.ts <= l.ts
  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
) r ON true
"""


def events_heavy_hitters(sf_dir: str, k: int = 10):
    """Top-k users by event count: per-batch partial counts → bucketed
    combine → global deterministic top-k (count desc, user_id asc)."""
    from osm_merge_ray.ops import grouped_reduce

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("user_id").to_numpy(), return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "n_events": pa.array(c, pa.int64())})

    counts = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False)["n_events"].sum(),
    )
    return counts.sort(["n_events", "user_id"], descending=[True, False]).limit(k)


SQL_EVENTS_HEAVY_HITTERS = """
SELECT user_id, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 10
"""


def events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the
    stream-shaped op: sort-within-partition + stateful scan in
    map_groups."""
    from osm_merge_ray.ops import first_in_groups, grouped_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a user are in this bucket; vectorized over users
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        uid = df["user_id"].to_numpy()
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        starts = first_in_groups(uid_s)
        new_session = starts.copy()
        new_session[1:] |= (ts_s[1:] - ts_s[:-1]) > SESSION_GAP_US
        g = pd.DataFrame({"user_id": uid_s, "s": new_session.astype(np.int64)})
        out = g.groupby("user_id", as_index=False).agg(
            n_sessions=("s", "sum"), n_events=("s", "size")
        )
        return out

    return grouped_reduce(ds, ["user_id"], sessions)


SQL_EVENTS_SESSIONIZE = """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
), d AS (
  SELECT user_id,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM x
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM d GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# engine-path conflation queries, driver-verified (VERDICT r2 #1).
#
# These drive the REAL engine stages (stages/conflate.py, stages/lines.py,
# stages/poi.py) end-to-end over deterministic SQL-mirrorable fixtures.
# Parity discipline: output columns are DISCRETE (ids, decision strings,
# hit counts, mm-rounded distances), every float gate in the fixture sits
# far from its threshold (>=40% margin), and every fuzzy string pair is
# either length-gated out (len diff > 3 on both sides) or an
# insertion-only edit — for which DuckDB's levenshtein equals the
# engine's indel distance, so 100*(1 - d/(la+lb)) is the identical
# ratio on both sides. Geometry is honest on the engine side (full cell
# shuffle + projection kernels); the SQL twin recomputes candidates,
# hits, gates, ranking and decisions from the same parametric fixture.
# ---------------------------------------------------------------------------

_IMG_N = 400


def _image_fixture(side: str) -> pa.Table:
    """Deterministic image+caption fixture (input_hint shape, light
    columns) with four conflation classes per i (c = i % 4):
    c0 exact duplicate (same pos/caption/phash), c1 near-dup at ~3 m
    (caption insert-typo + phash hamming 4), c2 ref-token match only
    (phash hamming 20, caption length-gated out), c3 no candidate
    (secondary ~333 m away)."""
    i = np.arange(_IMG_N, dtype=np.int64)
    c = i % 4
    lon = -109.0 + (i % 20) * 0.01
    lat = 40.0 + (i // 20) * 0.01
    phash = (i * 2654435761) % 4294967296
    if side == "primary":
        ids = [f"p{k}" for k in i]
        caps = [
            (f"dup caption {k} zz", f"cap {k} alpha bravo",
             f"FR {500 + k}.2 Trail Access Road", f"solo caption {k}")[k % 4]
            for k in i
        ]
    else:
        ids = [f"s{k}" for k in i]
        caps = [
            (f"dup caption {k} zz", f"cap {k} alpha bravvo",
             f"FS {500 + k}.2", f"faraway caption {k}")[k % 4]
            for k in i
        ]
        lat = lat + np.where(c == 0, 0.0, np.where(c == 3, 0.003, 0.000027))
        phash = phash ^ np.where(c == 0, 0, np.where(c == 1, 15,
                                 np.where(c == 2, 1048575, 255)))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phash, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
    })


def conflate_images_q(sf_dir: str):
    """The REAL image conflation path (stages/conflate.py: light
    projection -> cell shuffle -> bucketed matcher) over the parametric
    fixture; decisions + mm-rounded haversine are driver-verified."""
    import ray.data as rd

    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.stages.conflate import conflate_datasets

    cfg = ConflationConfig(num_buckets=16)
    out = conflate_datasets(rd.from_arrow(_image_fixture("primary")),
                            rd.from_arrow(_image_fixture("secondary")),
                            cfg, skew_salting=False)
    return out.select_columns(["image_id", "matched_id", "decision", "hits", "dist_mm"])


# mm-rounded haversine on the same spherical model as geo/distance.py
_SQL_HAVERSINE_MM = """CAST(round(2000.0 * 6371008.8 * asin(least(1.0, sqrt(
    pow(sin(radians(s.lat - p.lat) / 2.0), 2)
  + cos(radians(p.lat)) * cos(radians(s.lat))
    * pow(sin(radians(s.lon - p.lon) / 2.0), 2)
  )))) AS BIGINT)"""

# engine caption-hit restated: indel ratio > 85 AND |len diff| <= 3.
# levenshtein == indel here because every in-gate fixture pair is an
# insertion-only edit (see module comment).
_SQL_CAPTION_HIT = """(CASE WHEN abs(length(p.caption) - length(s.caption)) <= 3
        AND 100.0 * (1.0 - levenshtein(p.caption, s.caption)
            / CAST(length(p.caption) + length(s.caption) AS DOUBLE)) > 85.0
       THEN 1 ELSE 0 END)"""

_SQL_REF_TOKEN = "upper(regexp_extract({cap}, '^\\s*(?:FR|FS|F[SR]R?)\\s+(\\S+)', 1))"

SQL_CONFLATE_IMAGES = f"""
WITH p AS (
  SELECT i, 'p' || i AS image_id,
         -109.0 + (i % 20) * 0.01 AS lon,
         40.0 + (i // 20) * 0.01 AS lat,
         (i * 2654435761) % 4294967296 AS phash,
         CASE i % 4 WHEN 0 THEN 'dup caption ' || i || ' zz'
                    WHEN 1 THEN 'cap ' || i || ' alpha bravo'
                    WHEN 2 THEN 'FR ' || (500 + i) || '.2 Trail Access Road'
                    ELSE 'solo caption ' || i END AS caption
  FROM range({_IMG_N}) t(i)
), s AS (
  SELECT i, 's' || i AS image_id,
         -109.0 + (i % 20) * 0.01 AS lon,
         40.0 + (i // 20) * 0.01
           + CASE i % 4 WHEN 0 THEN 0.0 WHEN 3 THEN 0.003 ELSE 0.000027 END AS lat,
         xor((i * 2654435761) % 4294967296,
             CASE i % 4 WHEN 0 THEN 0 WHEN 1 THEN 15
                        WHEN 2 THEN 1048575 ELSE 255 END) AS phash,
         CASE i % 4 WHEN 0 THEN 'dup caption ' || i || ' zz'
                    WHEN 1 THEN 'cap ' || i || ' alpha bravvo'
                    WHEN 2 THEN 'FS ' || (500 + i) || '.2'
                    ELSE 'faraway caption ' || i END AS caption
  FROM range({_IMG_N}) t(i)
), cand AS (
  SELECT p.i AS pi, p.image_id AS pid, s.image_id AS sid,
         {_SQL_HAVERSINE_MM} AS dist_mm,
         {_SQL_CAPTION_HIT}
       + (CASE WHEN {_SQL_REF_TOKEN.format(cap='p.caption')} != ''
                AND {_SQL_REF_TOKEN.format(cap='p.caption')}
                  = {_SQL_REF_TOKEN.format(cap='s.caption')}
                AND NOT ({_SQL_CAPTION_HIT} = 1)
               THEN 1 ELSE 0 END)
       + (CASE WHEN bit_count(xor(p.phash, s.phash)) <= 6 THEN 1 ELSE 0 END) AS hits
  FROM p JOIN s ON abs(p.lon - s.lon) < 0.001 AND abs(p.lat - s.lat) < 0.001
  WHERE 2.0 * 6371008.8 * asin(least(1.0, sqrt(
          pow(sin(radians(s.lat - p.lat) / 2.0), 2)
        + cos(radians(p.lat)) * cos(radians(s.lat))
          * pow(sin(radians(s.lon - p.lon) / 2.0), 2)))) <= 7.0
), best AS (
  SELECT *, row_number() OVER (PARTITION BY pi
             ORDER BY hits DESC, dist_mm ASC, sid ASC) AS rn
  FROM cand
)
SELECT p.image_id,
       b.sid AS matched_id,
       CASE WHEN b.sid IS NULL THEN 'new'
            WHEN b.hits >= 2 AND b.dist_mm <= 2000.0 THEN 'duplicate'
            ELSE 'merged' END AS decision,
       CAST(coalesce(b.hits, 0) AS BIGINT) AS hits,
       CAST(coalesce(b.dist_mm, -1) AS BIGINT) AS dist_mm
FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON p.i = b.pi
"""


_LINE_N = 120
_LINE_STEP = 0.00003          # ~2.6 m per vertex step, 6-vertex lines
_LINE_OFF = {1: 0.000027, 4: 0.000036, 5: 0.000027}  # parallel lat shifts (deg)
_LINE_OFF2 = 0.000045         # c1's second (losing) candidate, ~5 m


def _line_feature_rows(side: str):
    """Parametric LineString fixture, one decision class per i % 6:
    c0 identical geometry / unrelated tags (merged, hits 0);
    c1 two parallel candidates at ~3 m and ~5 m, name insert-typo +
       exact ref:usfs (merged, hits 2, nearest wins);
    c2 secondary ~550 m away (new);
    c3 shares vertex 0 but heads off at ~52 deg, no tag hits
       (angle-reject -> new);
    c4 parallel at ~4 m, name typo only, no ref (parallel, hits 1);
    c5 unrelated name, ref:usfs insert-edit + matching second token
       (merged, hits 2 via the ref double-hit rule).
    All geometry offsets sit >=40% from every gate; primary lines are
    exactly horizontal so the offset-2 slope is exactly 0."""
    import json as _json

    rows = []
    for i in range(_LINE_N):
        c = i % 6
        lon0 = -106.0 + (i % 12) * 0.01
        lat0 = 39.0 + (i // 12) * 0.01
        base = [[lon0 + k * _LINE_STEP, lat0] for k in range(6)]
        if side == "primary":
            rows.append((i, base,
                         {"name": f"Forest Road {i} Creek",
                          "ref:usfs": f"FR {200 + i}.1",
                          "highway": "unclassified"}))
            continue
        if c == 0:
            rows.append((7000 + i, base,
                         {"name": f"Xylophone {i}", "highway": "track"}))
        elif c == 1:
            for sid, off in ((7000 + i, _LINE_OFF[1]), (8000 + i, _LINE_OFF2)):
                rows.append((sid, [[x, y + off] for x, y in base],
                             {"name": f"Forest Road {i} Creeek",
                              "ref:usfs": f"FR {200 + i}.1", "highway": "track"}))
        elif c == 2:
            rows.append((7000 + i, [[x, y + 0.005] for x, y in base],
                         {"name": f"Forest Road {i} Creek",
                          "ref:usfs": f"FR {200 + i}.1", "highway": "track"}))
        elif c == 3:
            rot = [[lon0 + k * _LINE_STEP, lat0 + k * _LINE_STEP] for k in range(6)]
            rows.append((7000 + i, rot, {"name": f"Zulu {i}", "highway": "track"}))
        elif c == 4:
            rows.append((7000 + i, [[x, y + _LINE_OFF[4]] for x, y in base],
                         {"name": f"Forest Road {i} Creeek", "highway": "track"}))
        else:
            rows.append((7000 + i, [[x, y + _LINE_OFF[5]] for x, y in base],
                         {"name": f"Quebec Route {i}",
                          "ref:usfs": f"FR {200 + i}.1 B", "highway": "track"}))
    return pa.table({
        "feature_id": pa.array([r[0] for r in rows], pa.int64()),
        "geom_type": pa.array(["LineString"] * len(rows), pa.string()),
        "coords_json": pa.array([_json.dumps(r[1]) for r in rows], pa.string()),
        "props_json": pa.array([_json.dumps(r[2], sort_keys=True) for r in rows],
                               pa.string()),
    })


def conflate_lines_q(sf_dir: str):
    """The REAL LineString conflation path (stages/lines.py: extent
    partitioning, batched polyline distance + offset-2 slope/angle,
    checkTags scoring, full decision table) — driver-verified."""
    import ray.data as rd

    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.stages.lines import conflate_lines

    out = conflate_lines(rd.from_arrow(_line_feature_rows("primary")),
                         rd.from_arrow(_line_feature_rows("secondary")),
                         ConflationConfig(cell_res=12, num_buckets=8))
    return out.select_columns(["feature_id", "matched_id", "decision", "hits"])


# checkTags fuzzy hit restated (indel ratio > 85 AND |len diff| <= 3 on
# lowercased values); levenshtein == indel for the fixture's in-gate
# pairs (insertion-only edits; all other pairs are length-gated out).
def _sql_tag_hit(a: str, b: str) -> str:
    return f"""(CASE WHEN {b} IS NOT NULL
        AND abs(length({a}) - length({b})) <= 3
        AND 100.0 * (1.0 - levenshtein(lower({a}), lower({b}))
            / CAST(length({a}) + length({b}) AS DOUBLE)) > 85.0
       THEN 1 ELSE 0 END)"""


SQL_CONFLATE_LINES = f"""
WITH p AS (
  SELECT i, i % 6 AS c,
         -106.0 + (i % 12) * 0.01 AS lon0,
         39.0 + (i // 12) * 0.01 AS lat0,
         'Forest Road ' || i || ' Creek' AS pname,
         'FR ' || (200 + i) || '.1' AS pref
  FROM range({_LINE_N}) t(i)
), s AS (
  -- (i, sid, off_m: parallel lat offset in the engine's planar metric,
  --  rot: heads off diagonally from shared vertex 0)
  SELECT i, 7000 + i AS sid, 0.0 AS off_m, FALSE AS rot,
         'Xylophone ' || i AS sname, NULL AS sref
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 0
  UNION ALL
  SELECT i, 7000 + i, {_LINE_OFF[1]} * 110540.0, FALSE,
         'Forest Road ' || i || ' Creeek', 'FR ' || (200 + i) || '.1'
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 1
  UNION ALL
  SELECT i, 8000 + i, {_LINE_OFF2} * 110540.0, FALSE,
         'Forest Road ' || i || ' Creeek', 'FR ' || (200 + i) || '.1'
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 1
  UNION ALL
  SELECT i, 7000 + i, 0.005 * 110540.0, FALSE,
         'Forest Road ' || i || ' Creek', 'FR ' || (200 + i) || '.1'
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 2
  UNION ALL
  SELECT i, 7000 + i, 0.0, TRUE, 'Zulu ' || i, NULL
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 3
  UNION ALL
  SELECT i, 7000 + i, {_LINE_OFF[4]} * 110540.0, FALSE,
         'Forest Road ' || i || ' Creeek', NULL
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 4
  UNION ALL
  SELECT i, 7000 + i, {_LINE_OFF[5]} * 110540.0, FALSE,
         'Quebec Route ' || i, 'FR ' || (200 + i) || '.1 B'
  FROM range({_LINE_N}) t(i) WHERE i % 6 = 5
), cand AS (
  SELECT p.i, s.sid, s.off_m AS d_m,
         -- offset-2 direction angle: primary slope is exactly 0, the
         -- rotated candidate's is ky/kx at the primary's mean latitude
         CASE WHEN s.rot THEN degrees(atan(110540.0
              / (111320.0 * cos(radians(p.lat0))))) ELSE 0.0 END AS angle,
         CASE WHEN s.rot THEN abs(110540.0
              / (111320.0 * cos(radians(p.lat0)))) ELSE 0.0 END AS slope,
         {_sql_tag_hit('p.pname', 's.sname')}
       + {_sql_tag_hit('p.pref', 's.sref')}
       + (CASE WHEN s.sref IS NOT NULL
                AND {_sql_tag_hit('p.pref', 's.sref')} = 1
                AND p.pref != s.sref
                AND split_part(p.pref, ' ', 2) != ''
                AND split_part(s.sref, ' ', 2) != ''
                AND upper(split_part(p.pref, ' ', 2))
                  = upper(split_part(s.sref, ' ', 2))
               THEN 1 ELSE 0 END) AS hits
  FROM p JOIN s ON p.i = s.i
  WHERE s.off_m <= 7.0
), kept AS (
  -- early reject: hits 0, not identical geometry, angle/slope gate
  SELECT * FROM cand
  WHERE NOT (hits = 0 AND NOT (d_m = 0.0 AND angle = 0.0 AND slope = 0.0)
             AND (abs(angle) > 20.0 OR abs(slope) > 4.0))
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY i
             ORDER BY hits DESC, d_m ASC, sid ASC) AS rn,
         bool_or(hits = 1 AND abs(angle) < 15.0 AND abs(slope) < 1.0)
           OVER (PARTITION BY i) AS any_parallel
  FROM kept
)
SELECT p.i AS feature_id,
       CAST(coalesce(r.sid, -1) AS BIGINT) AS matched_id,
       CASE WHEN r.sid IS NULL THEN 'new'
            WHEN r.any_parallel AND r.hits < 2 THEN 'parallel'
            ELSE 'merged' END AS decision,
       CAST(coalesce(r.hits, 0) AS BIGINT) AS hits
FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON p.i = r.i
"""


_POI_N = 120


def _poi_fixture():
    """Parametric POI-vs-OSM fixture, one cascade class per i % 6:
    c0 single matching node at ~3 m (merged, hits 2);
    c1 node hits-2 at ~4 m vs way hits-1 at ~2 m -> hits rank wins,
       multi-candidate => duplicate;
    c2 node and way BOTH hits 2, way nearer -> node-before-way cascade
       klass wins, duplicate;
    c3 node ~444 m away (new);
    c4 POI carries a positive id prop -> direct id-join path to an OSM
       node placed 0.5 deg away (merged, hits 2, no spatial search);
    c5 node at ~3 m sharing NO analyze keys (merged, hits 0)."""
    import json as _json

    pois, osm_rows = [], []
    for i in range(_POI_N):
        c = i % 6
        lon = -105.0 + (i % 12) * 0.01
        lat = 38.0 + (i // 12) * 0.01
        pprops = {"amenity": "bench", "name": f"Bench Point {i}"}
        if c == 4:
            pprops["id"] = 9000 + i
        pois.append((i, "Point", [lon, lat], pprops))

        def node(sid, dlat, dlon, props):
            osm_rows.append((sid, "Point", [lon + dlon, lat + dlat], props))

        def way(sid, dlat, props):
            osm_rows.append((sid, "LineString",
                             [[lon - 0.000001, lat + dlat],
                              [lon + 0.000001, lat + dlat]], props))

        if c == 0:
            node(9000 + i, 0.000027, 0.0,
                 {"amenity": "bench", "name": f"Bench Point {i}"})
        elif c == 1:
            node(9000 + i, 0.000036, 0.0,
                 {"amenity": "bench", "name": f"Bench Point {i}"})
            way(9500 + i, 0.000018, {"amenity": "bench", "name": f"xq {i}"})
        elif c == 2:
            node(9000 + i, 0.000036, 0.0,
                 {"amenity": "bench", "name": f"Bench Point {i}"})
            way(9500 + i, 0.000018,
                {"amenity": "bench", "name": f"Bench Point {i}"})
        elif c == 3:
            node(9000 + i, 0.004, 0.0,
                 {"amenity": "bench", "name": f"Bench Point {i}"})
        elif c == 4:
            node(9000 + i, 0.0, 0.5,
                 {"amenity": "bench", "name": f"Bench Point {i}"})
        else:
            node(9000 + i, 0.000027, 0.0, {"tourism": "viewpoint"})

    def table(rows):
        return pa.table({
            "feature_id": pa.array([r[0] for r in rows], pa.int64()),
            "geom_type": pa.array([r[1] for r in rows], pa.string()),
            "coords_json": pa.array([_json.dumps(r[2]) for r in rows], pa.string()),
            "props_json": pa.array([_json.dumps(r[3], sort_keys=True) for r in rows],
                                   pa.string()),
        })

    return table(pois), table(osm_rows)


def conflate_pois_q(sf_dir: str):
    """The REAL POI cascade path (stages/poi.py: cell shuffle, node-
    before-way priority, duplicate fixme rule, positive-id direct
    join) — driver-verified."""
    import ray.data as rd

    from osm_merge_ray.config import ConflationConfig
    from osm_merge_ray.stages.poi import conflate_pois

    p, s = _poi_fixture()
    out = conflate_pois(
        rd.from_arrow(p), rd.from_arrow(s),
        ConflationConfig(cell_res=15, num_buckets=8), tolerance_m=10.0,
    )
    return out.select_columns(["feature_id", "matched_id", "decision", "hits"])


# POI tag hit (conflatePOI.py:222 analog): indel ratio > 80, NO length
# gate. Fixture pairs are either equal (ratio 100) or share almost
# nothing (both indel- and levenshtein-based ratios far below 80), so
# the levenshtein restatement decides every gate identically.
def _sql_poi_hit(a: str, b: str) -> str:
    return f"""(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL
        AND 100.0 * (1.0 - levenshtein(lower({a}), lower({b}))
            / CAST(length({a}) + length({b}) AS DOUBLE)) > 80.0
       THEN 1 ELSE 0 END)"""


SQL_CONFLATE_POIS = f"""
WITH p AS (
  SELECT i, i % 6 AS c, 'bench' AS amen, 'Bench Point ' || i AS pname
  FROM range({_POI_N}) t(i)
), s AS (
  -- (i, sid, d_m: centroid distance, klass: node-with-tag 0 / way 2,
  --  samen, sname) — spatial candidates only (c4 goes via the id join)
  SELECT i, 9000 + i AS sid, 0.000027 * 111194.92664455873 AS d_m, 0 AS klass,
         'bench' AS samen, 'Bench Point ' || i AS sname
  FROM range({_POI_N}) t(i) WHERE i % 6 = 0
  UNION ALL
  SELECT i, 9000 + i, 0.000036 * 111194.92664455873, 0,
         'bench', 'Bench Point ' || i
  FROM range({_POI_N}) t(i) WHERE i % 6 IN (1, 2)
  UNION ALL
  SELECT i, 9500 + i, 0.000018 * 111194.92664455873, 2, 'bench',
         CASE WHEN i % 6 = 1 THEN 'xq ' || i ELSE 'Bench Point ' || i END
  FROM range({_POI_N}) t(i) WHERE i % 6 IN (1, 2)
  UNION ALL
  SELECT i, 9000 + i, 0.004 * 111194.92664455873, 0,
         'bench', 'Bench Point ' || i
  FROM range({_POI_N}) t(i) WHERE i % 6 = 3
  UNION ALL
  SELECT i, 9000 + i, 0.000027 * 111194.92664455873, 0, NULL, NULL
  FROM range({_POI_N}) t(i) WHERE i % 6 = 5
), cand AS (
  SELECT p.i, s.sid, s.d_m, s.klass,
         {_sql_poi_hit('p.amen', 's.samen')}
       + {_sql_poi_hit('p.pname', 's.sname')} AS hits
  FROM p JOIN s ON p.i = s.i
  WHERE s.d_m <= 10.0
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY i
             ORDER BY hits DESC, klass ASC, d_m ASC, sid ASC) AS rn,
         count(*) OVER (PARTITION BY i) AS n_cands
  FROM cand
)
SELECT p.i AS feature_id,
       CAST(coalesce(r.sid, -1) AS BIGINT) AS matched_id,
       CASE WHEN r.sid IS NULL THEN 'new'
            WHEN r.n_cands > 1 AND r.hits > 0 THEN 'duplicate'
            ELSE 'merged' END AS decision,
       CAST(coalesce(r.hits, 0) AS BIGINT) AS hits
FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON p.i = r.i
WHERE p.c != 4
UNION ALL
SELECT i AS feature_id, CAST(9000 + i AS BIGINT) AS matched_id,
       'merged' AS decision,
       CAST({_sql_poi_hit("'bench'", "'bench'")}
          + {_sql_poi_hit("'Bench Point ' || i", "'Bench Point ' || i")}
         AS BIGINT) AS hits
FROM range({_POI_N}) t(i) WHERE i % 6 = 4
"""


def image_pixel_embed_q(sf_dir: str):
    """Thumbnail + pixel-embedding actor stages, driver-verified via a
    parametric twin: every synthetic image must yield a thumbnail that
    DECODES back to 16x16 and a 48-dim unit-norm embedding.
    ``emb_norm_e6`` is computed from the real embedding — float32
    normalization error is < 0.5e-6, so the rounded value is exactly
    1_000_000 iff the stage actually normalized; a broken embed stage
    diverges and fails the hash."""
    import ray.data as rd

    from osm_merge_ray.image.stages import PixelEmbed, Thumbnail
    from osm_merge_ray.synth import synth_table

    t = synth_table(128, "primary", with_bytes=True)
    ds = rd.from_arrow(t)
    ds = ds.map_batches(Thumbnail, batch_format="pyarrow", batch_size=64,
                        concurrency=(1, 2))
    ds = ds.map_batches(PixelEmbed, batch_format="pyarrow", batch_size=64,
                        concurrency=(1, 2))

    def project(t2: pa.Table) -> pa.Table:
        import numpy as np

        from osm_merge_ray.image.codec import decode

        thumbs = t2.column("thumb").to_pylist()
        embs = t2.column("pixel_embedding").to_pylist()
        tw, th_ = [], []
        for b in thumbs:
            if b:
                px = decode(b)
                tw.append(int(px.shape[1]))
                th_.append(int(px.shape[0]))
            else:
                tw.append(0)
                th_.append(0)
        return pa.table({
            "image_id": t2.column("image_id"),
            "thumb_w": pa.array(tw, pa.int64()),
            "thumb_h": pa.array(th_, pa.int64()),
            "emb_dim": pa.array([len(e) if e else 0 for e in embs], pa.int64()),
            "emb_norm_e6": pa.array(
                [int(round(float(np.linalg.norm(np.asarray(e))) * 1e6)) if e else 0
                 for e in embs], pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


SQL_PIXEL_EMBED = """
SELECT printf('P%09d', i) AS image_id,
       CAST(16 AS BIGINT) AS thumb_w, CAST(16 AS BIGINT) AS thumb_h,
       CAST(48 AS BIGINT) AS emb_dim,
       CAST(1000000 AS BIGINT) AS emb_norm_e6
FROM range(128) t(i)
"""


def audio_decode_stats_q(sf_dir: str):
    """Audio decode + spectral features (multimodal actor-pool stage),
    driver-verified via a parametric twin: the stand-in container's
    header roundtrip (n_samples = 8000 + 100*(i%7), rate 16 kHz) plus a
    content check — the synthetic PCM always carries signal, so a
    correct decode yields rms_e6 > 0 (``rms_positive``). The raw rms_e6
    and band-energy embedding stay pytest-pinned (determinism +
    roundtrip tests); they are content-dependent floats a SQL oracle
    cannot re-derive."""
    import ray.data as rd

    from osm_merge_ray.audio.codec import encode, synth_pcm
    from osm_merge_ray.image.stages import AudioDecode

    n = 64
    rows = {
        "audio_id": [f"aud{i:05d}" for i in range(n)],
        "bytes": [encode(synth_pcm(i, 8000 + 100 * (i % 7))) for i in range(n)],
    }
    ds = rd.from_arrow(pa.table(rows))
    out = ds.map_batches(AudioDecode, batch_format="pyarrow", batch_size=16,
                         concurrency=(1, 4))

    def project(t2: pa.Table) -> pa.Table:
        rms = t2.column("rms_e6").to_numpy()
        return pa.table({
            "audio_id": t2.column("audio_id"),
            "decode_ok": t2.column("decode_ok"),
            "n_samples": t2.column("n_samples"),
            "sample_rate": t2.column("sample_rate"),
            "rms_positive": pa.array((rms > 0).astype(np.int64), pa.int64()),
        })

    return out.map_batches(project, batch_format="pyarrow")


SQL_AUDIO_DECODE = """
SELECT printf('aud%05d', i) AS audio_id, TRUE AS decode_ok,
       CAST(8000 + 100 * (i % 7) AS BIGINT) AS n_samples,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS rms_positive
FROM range(64) t(i)
"""


def video_frame_sample_q(sf_dir: str):
    """Video frame sampling (multimodal fan-out stage), driver-verified
    via a parametric twin: uniform integer sampling emits frame indices
    (j*(n_frames-1))//(k-1) for j<k — exact int64 arithmetic a SQL
    oracle re-derives. The per-frame perceptual hash is real but
    content-dependent (stand-in decoder), so it stays pytest-pinned
    (determinism test) and out of the compared projection."""
    import ray.data as rd

    from osm_merge_ray.image.stages import FrameSample
    from osm_merge_ray.util import splitmix64

    n = 64
    rows = {
        "video_id": [f"vid{i:05d}" for i in range(n)],
        "bytes": [splitmix64(i).to_bytes(8, "little") * 4 for i in range(n)],
        "n_frames": pa.array([30 + (i % 90) for i in range(n)], pa.int32()),
        "fps": pa.array([30.0] * n, pa.float64()),
        "w": pa.array([64] * n, pa.int32()),
        "h": pa.array([64] * n, pa.int32()),
    }
    ds = rd.from_arrow(pa.table(rows))
    out = ds.map_batches(FrameSample, fn_constructor_kwargs={"k": 4},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=(1, 4))
    return out.select_columns(["video_id", "frame_idx"])


SQL_FRAME_SAMPLE = """
SELECT DISTINCT printf('vid%05d', i) AS video_id,
       CAST((j * (30 + (i % 90) - 1)) // 3 AS BIGINT) AS frame_idx
FROM range(64) t(i), UNNEST(range(0, 4)) u(j)
"""


def text_bpe_train_q(sf_dir: str, k: int = 8):
    """Distributed BPE merge-TRAINING (r5): learn the top-k merge table
    from the documents corpus — one corpus scan builds the bucketed
    word-count table, then k rounds of (vectorized pair-count partials
    → bucketed grouped sum → per-bucket top-1, <= num_buckets rows to
    the driver per round → map-side delimited-string merge). Twin: k
    UNROLLED training stages in SQL (bpe.bpe_train_sql), each stage
    aggregating pair counts in BIGINT and picking the winner with the
    identical (count DESC, a, b) order."""
    from osm_merge_ray.text.bpe import train_bpe_distributed

    ds = _read(sf_dir, "documents", columns=["text"])
    return train_bpe_distributed(ds, n_merges=k, num_buckets=32)


def image_aspect_bucket_q(sf_dir: str, n: int = 400):
    """Aspect-ratio bucketing (r5, image/aspect.py): assign each image
    to the resolution bucket with the closest aspect ratio under the
    integer-exact Q20 metric. Parametric fixture (dims derived from
    the row index, the fmt_cycle pattern) so the twin re-derives the
    inputs; the assignment itself — the operator under test — is the
    same argmin both sides."""
    import ray.data as rd

    from osm_merge_ray.image.aspect import aspect_bucket_assign

    sz = np.array([320, 512, 640, 960], dtype=np.int64)
    i = np.arange(n, dtype=np.int64)
    t = pa.table({
        "image_id": pa.array(i, pa.int64()),
        "w": pa.array(sz[i % 4], pa.int64()),
        "h": pa.array(sz[(i // 4) % 4], pa.int64()),
    })
    return aspect_bucket_assign(rd.from_arrow(t))


def _aspect_sql(n: int = 400) -> str:
    from osm_merge_ray.image.aspect import buckets_sql_values

    return f"""
WITH bt(bucket_id, bw, bh) AS (VALUES {buckets_sql_values()}),
img AS (
  SELECT i AS image_id,
         CAST(CASE i % 4 WHEN 0 THEN 320 WHEN 1 THEN 512
                         WHEN 2 THEN 640 ELSE 960 END AS BIGINT) AS w,
         CAST(CASE (i // 4) % 4 WHEN 0 THEN 320 WHEN 1 THEN 512
                                WHEN 2 THEN 640 ELSE 960 END AS BIGINT) AS h
  FROM range({n}) t(i)
), m AS (
  SELECT image_id, w, h, bucket_id, bw, bh,
         (abs(w * CAST(bh AS BIGINT) - h * CAST(bw AS BIGINT))
          * CAST(1048576 AS BIGINT)) // (h * CAST(bh AS BIGINT)) AS m
  FROM img, bt
)
SELECT CAST(image_id AS BIGINT) AS image_id, CAST(w AS BIGINT) AS w,
       CAST(h AS BIGINT) AS h, CAST(bucket_id AS BIGINT) AS bucket_id,
       CAST(bw AS BIGINT) AS bucket_w, CAST(bh AS BIGINT) AS bucket_h
FROM m
QUALIFY row_number() OVER (PARTITION BY image_id ORDER BY m, bucket_id) = 1
"""


def image_batch_plan_q(sf_dir: str, n: int = 400, batch_size: int = 16):
    """Per-aspect-bucket training-batch plan (r5, image/aspect.py
    bucket_batch_plan): hash-order rank within each bucket (layout-
    independent), batch_idx = rank // batch_size. Twin: the aspect
    assignment SQL extended with ROW_NUMBER over the same kmv_mix
    ordering."""
    import ray.data as rd

    from osm_merge_ray.image.aspect import bucket_batch_plan

    sz = np.array([320, 512, 640, 960], dtype=np.int64)
    i = np.arange(n, dtype=np.int64)
    t = pa.table({
        "image_id": pa.array(i, pa.int64()),
        "w": pa.array(sz[i % 4], pa.int64()),
        "h": pa.array(sz[(i // 4) % 4], pa.int64()),
    })
    out = bucket_batch_plan(rd.from_arrow(t), batch_size=batch_size)
    return out.select_columns(["image_id", "bucket_id", "rank",
                               "batch_idx"])


def _batch_plan_sql(n: int = 400, batch_size: int = 16) -> str:
    aspect = _aspect_sql(n).strip().rstrip()
    return f"""
WITH a AS ({aspect}
), r AS (
  SELECT image_id, bucket_id,
         row_number() OVER (
           PARTITION BY bucket_id
           ORDER BY {_KMV_MIX.format(x='image_id')}, image_id) - 1
           AS rank
  FROM a
)
SELECT image_id, bucket_id, CAST(rank AS BIGINT) AS rank,
       CAST(rank // {batch_size} AS BIGINT) AS batch_idx
FROM r
"""


def text_token_count_bpe_q(sf_dir: str):
    """REAL BPE token counts: regex pretokenize + the full merge loop
    over the fixed embedded vocabulary (text/bpe.py), ranks table built
    once per actor with a per-actor word cache. Driver-verified against
    a recursive-CTE DuckDB twin that replays the identical merge loop."""
    from osm_merge_ray.text.bpe import BpeTokenCounter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(BpeTokenCounter, batch_format="pyarrow",
                          concurrency=_pool()).select_columns(
        ["doc_id", "n_bpe_tokens"]
    )


def image_decode_stats_q(sf_dir: str):
    """Actor-pool decode/verify over synthetic image payloads →
    per-format verification counters, driver-verified via a parametric
    twin: with fmt assigned by index parity (fmt_cycle — the hash-based
    split needs 64-bit wrap arithmetic SQL can't express), a correct
    codec decodes every row, matches dims and phash, and pins PSNR at
    99.0 (the lossy stand-in re-quantizes to itself). Any decode/hash
    regression shifts a counter and fails the driver hash."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    from osm_merge_ray.image.stages import DecodeVerify
    from osm_merge_ray.synth import synth_table

    t = synth_table(300, "primary", with_bytes=True, fmt_cycle=True)
    ds = rd.from_arrow(t).map_batches(DecodeVerify, batch_format="pyarrow",
                                      batch_size=64, concurrency=(1, 4))

    def flags(t2: pa.Table) -> pa.Table:
        return pa.table({
            "fmt": t2.column("fmt"),
            "ok": t2.column("decode_ok").cast(pa.int64()),
            "dims": t2.column("dims_ok").cast(pa.int64()),
            "phash_exact": pa.array(
                (t2.column("phash_dist").to_numpy() == 0).astype(np.int64)),
            "psnr_db": t2.column("psnr_db"),
        })

    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Count(alias_name="n"), Sum("ok", alias_name="n_ok"),
                   Sum("dims", alias_name="n_dims_ok"),
                   Sum("phash_exact", alias_name="n_phash_exact"),
                   Min("psnr_db", alias_name="min_psnr_db"))
    )


SQL_DECODE_STATS = """
SELECT CASE WHEN i % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       count(*) AS n, count(*) AS n_ok, count(*) AS n_dims_ok,
       count(*) AS n_phash_exact, 99.0 AS min_psnr_db
FROM range(300) t(i) GROUP BY 1
"""


def text_lm_score_q(sf_dir: str):
    """Count-based bigram LM quality score (CCNet/KenLM-style signal
    in exact integer arithmetic — text/lm_score.py): corpus-trained
    conditional bigram frequencies, Q20-quantized, summed per doc.
    Low avg_q20 = atypical/gibberish text, no float log anywhere."""
    from osm_merge_ray.text.lm_score import bigram_lm_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_lm_scores(ds).sort("doc_id")


SQL_LM_SCORE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i + 1] AS b
  FROM tok, unnest(generate_series(1, len(ws) - 1)) t(i)
), db AS (
  SELECT doc_id, w1, b, CAST(count(*) AS BIGINT) AS k
  FROM bg GROUP BY 1, 2, 3
), c2 AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n2 FROM bg GROUP BY b
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS n1 FROM bg GROUP BY w1
), s AS (
  SELECT db.doc_id,
         CAST(sum(db.k * ((1048576 * c2.n2) // c1.n1)) AS BIGINT) AS lm_score,
         CAST(sum(db.k) AS BIGINT) AS n_bigrams
  FROM db JOIN c2 ON db.b = c2.b JOIN c1 ON db.w1 = c1.w1
  GROUP BY db.doc_id
)
SELECT doc_id, n_bigrams, lm_score,
       CAST(lm_score // n_bigrams AS BIGINT) AS avg_q20
FROM s ORDER BY doc_id
"""


def table_profile_q(sf_dir: str):
    """Distributed per-column profiling (profile.py) over orders —
    the engine's "describe": counts + type-aware exact min/max from
    fixed-size per-batch partials."""
    from osm_merge_ray.profile import profile_table

    return profile_table(_read(sf_dir, "orders"))


def _profile_sql() -> str:
    cols = [("o_custkey", "int64"), ("o_orderdate", "timestamp"),
            ("o_orderkey", "int64"), ("o_orderpriority", "string"),
            ("o_orderstatus", "string"), ("o_totalprice", "double")]
    parts = []
    # -1 sentinel for not-applicable measures (see profile.py: nullable
    # ints do not survive a dtype-strict hash)
    for c, kind in cols:
        mi = ma = "CAST(-1 AS BIGINT)"
        mf = xf = "CAST(-1.0 AS DOUBLE)"
        ml = xl = "CAST(-1 AS BIGINT)"
        if kind == "int64":
            mi = f"CAST(coalesce(min({c}), -1) AS BIGINT)"
            ma = f"CAST(coalesce(max({c}), -1) AS BIGINT)"
        elif kind == "timestamp":
            mi = f"CAST(coalesce(epoch_us(min({c})), -1) AS BIGINT)"
            ma = f"CAST(coalesce(epoch_us(max({c})), -1) AS BIGINT)"
        elif kind == "double":
            mf = f"coalesce(min({c}), -1.0)"
            xf = f"coalesce(max({c}), -1.0)"
        elif kind == "string":
            ml = f"CAST(coalesce(min(length({c})), -1) AS BIGINT)"
            xl = f"CAST(coalesce(max(length({c})), -1) AS BIGINT)"
        parts.append(
            f"SELECT '{c}' AS \"column\", '{kind}' AS dtype,"
            f" CAST(count(*) AS BIGINT) AS n,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_null,"
            f" {mi} AS min_i, {ma} AS max_i, {mf} AS min_f, {xf} AS max_f,"
            f" {ml} AS min_len, {xl} AS max_len FROM orders")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def source_mixture_plan_q(sf_dir: str, budget: int = 1_000_000):
    """Mixture planning (text/mixture.py): per-source token budgets +
    Q20 epoch factors under parametric weights (1 + suffix % 4, so the
    SQL twin derives the same weight from the source name)."""
    from osm_merge_ray.text.mixture import mixture_plan

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    srcs = [f"src{i}" for i in range(10_000)]
    weights = {s: 1 + int(s[3:]) % 4 for s in srcs}
    return mixture_plan(ds, token_budget=budget, weights=weights)


SQL_MIXTURE_PLAN = """
WITH r AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(1 + CAST(substr(source, 4) AS BIGINT) % 4 AS BIGINT) AS weight
  FROM documents GROUP BY source
), t AS (
  SELECT *, CAST((1000000 * weight)
                 // (sum(weight) OVER ()) AS BIGINT) AS target_tokens
  FROM r
)
SELECT source, n_docs, n_tokens, weight, target_tokens,
       CAST((1048576 * target_tokens) // n_tokens AS BIGINT) AS epochs_q20
FROM t ORDER BY source
"""


def text_pii_redact_q(sf_dir: str):
    """PII redaction report: plant deterministic PII (email / phone /
    IP / card / SSN snippets keyed on doc_id residues — replayed
    literally by the SQL twin) into the documents text, run the
    redaction stage, and report per-category counts + redacted length
    for every document that contained any. Parity is real RE2-vs-RE2:
    pyarrow and DuckDB bind the same regex engine, so the identical
    pattern strings produce identical rewrites."""
    import pyarrow.compute as pc

    from osm_merge_ray.text.redact import redact_pii

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        aug = []
        for i, txt in zip(ids.tolist(), texts):
            s = txt
            if i % 7 == 0:
                s += f" contact u{i}@example.com"
            if i % 11 == 0:
                s += f" call 303-555-{i % 10000:04d}"
            if i % 13 == 0:
                s += f" host 10.0.{i % 256}.{i % 254 + 1}"
            if i % 17 == 0:
                s += " card 4111 1111 1111 1111"
            if i % 19 == 0:
                s += " ssn 123-45-6789"
            aug.append(s)
        return t.set_column(t.column_names.index("text"), "text",
                            pa.array(aug, pa.string()))

    out = redact_pii(ds.map_batches(plant, batch_format="pyarrow"))

    def project(t: pa.Table) -> pa.Table:
        keep = ["doc_id", "n_email", "n_ssn", "n_card", "n_ip",
                "n_phone", "n_pii"]
        t2 = t.select(keep + ["text"])
        t2 = t2.append_column("red_len",
                              pc.cast(pc.utf8_length(t2.column("text")),
                                      pa.int64()))
        t2 = t2.drop_columns(["text"])
        t2 = t2.filter(pc.greater(t2.column("n_pii"), 0))
        return t2.replace_schema_metadata(None)

    return out.map_batches(project, batch_format="pyarrow").sort("doc_id")


def _pii_sql() -> str:
    from osm_merge_ray.text.redact import PII_PATTERNS

    aug = ("text"
           " || CASE WHEN doc_id % 7 = 0 THEN ' contact u' || doc_id"
           " || '@example.com' ELSE '' END"
           " || CASE WHEN doc_id % 11 = 0 THEN ' call 303-555-'"
           " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
           " || CASE WHEN doc_id % 13 = 0 THEN ' host 10.0.'"
           " || (doc_id % 256) || '.' || (doc_id % 254 + 1) ELSE '' END"
           " || CASE WHEN doc_id % 17 = 0 THEN ' card 4111 1111 1111 1111'"
           " ELSE '' END"
           " || CASE WHEN doc_id % 19 = 0 THEN ' ssn 123-45-6789'"
           " ELSE '' END")
    ctes = [f"aug AS (SELECT doc_id, {aug} AS t FROM documents)"]
    prev = "aug"
    for idx, (name, pat, tok) in enumerate(PII_PATTERNS):
        p = pat.replace("'", "''")
        ctes.append(
            f"r{idx} AS (SELECT * EXCLUDE (t),"
            f" CAST(len(regexp_extract_all(t, '{p}')) AS BIGINT)"
            f" AS n_{name}, regexp_replace(t, '{p}', '{tok}', 'g') AS t"
            f" FROM {prev})"
        )
        prev = f"r{idx}"
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT doc_id, n_email, n_ssn, n_card, n_ip, n_phone,\n"
        f"       {total} AS n_pii, CAST(length(t) AS BIGINT) AS red_len\n"
        f"FROM {prev} WHERE {total} > 0 ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Registration order is deliberate: the driver's correctness gate
# hashes only the FIRST 50 entries per round, so every entry whose
# implementation changed since its last green driver row must sit
# inside the cap. r5 rotation (r4 VERDICT task #1): (a) r5-new
# operators first, (b) queries the r5 fixes touched (distinct-sketch
# include_exact, tfidf max_vocab pin, langid vectorization), (c) the
# r4-refactored pipelines that aged past the r4 cap (tfidf vocab
# bounding, langid/fingerprint fusion, CMS top-k rework, broadcast
# decontaminate in curate_corpus, knn/graph reworks), (d) entries with
# no driver row since r3, (e) the regression-sensitive r4-green core
# (conflate family, multimodal, image dedup) kept inside the cap.
# Everything past the cap is r4-driver-green AND unchanged this round
# (events_retention, events_late_data, q1_pricing_summary and
# nation_revenue yielded their slots to the five r5-new operators and
# the two r5-touched implementations), still covered by the
# dtype-strict local replica (tools/check_oracle.py, verified 84/84 at
# sf0.01 AND sf0.001 this round) and pytest.
QUERIES = {
    # --- r5 additions (new this round, never driver-hashed) ---
    "text_bpe_train": text_bpe_train_q,
    "text_substring_decontaminate": text_substring_decontaminate_q,
    "text_chunk_plan": text_chunk_plan_q,
    "image_aspect_bucket": image_aspect_bucket_q,
    "image_batch_plan": image_batch_plan_q,
    # --- r5-touched implementations (overlap piece partials; BPE
    # counter class gained merge_table/text_column params) ---
    "spatial_polygon_overlap": spatial_polygon_overlap,
    "text_token_count_bpe": text_token_count_bpe_q,
    # --- touched by r5 fixes ---
    "events_distinct_sketch": events_distinct_sketch_q,
    "events_group_distinct": events_group_distinct_q,
    "text_tfidf": text_tfidf_q,
    "text_langid": text_langid_q,
    # --- r4-refactored, no driver row since r3 (verdict #1) ---
    "text_fingerprint": text_fingerprint_q,
    "events_cms_heavy_hitters": events_cms_q,
    "curate_corpus": curate_corpus_q,
    "dedup_semantic": dedup_semantic_q,
    "dedup_incremental": dedup_incremental_q,
    "graph_pagerank": graph_pagerank_q,
    "graph_triangles": graph_triangles_q,
    "knn_ivf": knn_ivf_q,
    "knn_cosine_topk": knn_topk_q,
    # --- no driver row since r3 (stale, regain current-code rows) ---
    "dedup_minhash_lsh": dedup_minhash_q,
    "dedup_simhash": dedup_simhash_q,
    "dedup_embedding_cosine": dedup_embedding_q,
    "dedup_embedding_lsh": dedup_embedding_lsh_q,
    "convert_nps": convert_nps_q,
    "text_token_count": text_token_count_q,
    "text_quality_score": text_quality_q,
    "text_normalize": text_normalize_q,
    "top_orders_by_revenue": top_orders_by_revenue,
    "events_window": events_window,
    "events_sliding_window": events_sliding_window,
    "events_heavy_hitters": events_heavy_hitters,
    "events_asof_join": events_asof_join,
    "events_quantiles": events_quantiles_q,
    # --- r4-green, kept inside the cap (regression-sensitive core) ---
    "spatial_conflate_flagship": spatial_conflate_flagship,
    "spatial_conflate": spatial_conflate,
    "spatial_conflate_cascade": spatial_conflate_cascade,
    "conflate_lines": conflate_lines_q,
    "conflate_pois": conflate_pois_q,
    "conflate_images": conflate_images_q,
    "multimodal_integrity": multimodal_integrity_q,
    "dedup_phash_hamming": dedup_phash_hamming_q,
    "image_dedup_clusters": image_dedup_clusters_q,
    "text_pii_redact": text_pii_redact_q,
    "text_lm_score": text_lm_score_q,
    "table_profile": table_profile_q,
    "source_hash_quota_sample": source_quota_sample_q,
    "source_mixture_plan": source_mixture_plan_q,
    "text_pack_sequences": text_pack_sequences_q,
    "text_decontaminate": text_decontaminate_q,
    # ---------------- past the 50-query cap from here ----------------
    # (all r4-driver-green AND unchanged in r5; events_retention and
    # events_late_data yielded their cap slots to the new
    # image_aspect_bucket / image_batch_plan)
    "events_retention": events_retention_q,
    "events_late_data": events_late_data_q,
    "q1_pricing_summary": q1_pricing_summary,
    "nation_revenue": nation_revenue,
    "text_inverted_index": text_inverted_index_q,
    "image_decode_stats": image_decode_stats_q,
    "image_pixel_embed": image_pixel_embed_q,
    "video_frame_sample": video_frame_sample_q,
    "audio_decode_stats": audio_decode_stats_q,
    "events_funnel": events_funnel_q,
    "orders_upsert": orders_upsert_q,
    "source_weighted_sample": source_weighted_sample_q,
    "events_ewma": events_ewma_q,
    "events_cooccurrence": events_cooccurrence_q,
    "text_length_deciles": text_length_deciles_q,
    "text_top_ngrams": text_top_ngrams_q,
    "events_running_index": events_running_index,
    "events_sessionize": events_sessionize,
    "spatial_cell_index": spatial_cell_index,
    "spatial_distance_join": spatial_distance_join,
    "spatial_knn_join": spatial_knn_join,
    "spatial_sample_join": spatial_sample_join,
    "spatial_tile_assign": spatial_tile_assign,
    "spatial_tile_pyramid": spatial_tile_pyramid_q,
    "spatial_point_in_polygon": spatial_point_in_polygon,
    "dedup_exact": dedup_exact_q,
    "dedup_ngram_jaccard": dedup_jaccard_q,
    "dedup_winnow": dedup_winnow_q,
    "text_repetition_stats": text_repetition_q,
    "dedup_clusters": dedup_clusters_q,
    "dedup_representatives": dedup_representatives_q,
    "train_val_split": train_val_split_q,
    "dedup_rate_report": dedup_rate_report_q,
    "source_quota_sample": source_quota_q,
}

ORACLE_SQL = {
    "spatial_cell_index": SQL_CELL_INDEX,
    "spatial_distance_join": SQL_DISTANCE_JOIN,
    "spatial_knn_join": SQL_KNN_JOIN,
    "spatial_sample_join": SQL_SAMPLE_JOIN,
    "spatial_conflate": SQL_CONFLATE,
    "spatial_conflate_cascade": SQL_CONFLATE_CASCADE,
    "spatial_conflate_flagship": SQL_CONFLATE_FLAGSHIP,
    "spatial_tile_assign": SQL_TILE_ASSIGN,
    "spatial_tile_pyramid": SQL_TILE_PYRAMID,
    "spatial_point_in_polygon": SQL_POINT_IN_POLYGON,
    "spatial_polygon_overlap": SQL_POLYGON_OVERLAP,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_DEDUP_JACCARD,
    "dedup_winnow": SQL_WINNOW_PAIRS,
    "text_decontaminate": SQL_DECONTAMINATE,
    "text_repetition_stats": SQL_REPETITION,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_representatives": SQL_DEDUP_REPRESENTATIVES,
    "train_val_split": SQL_TRAIN_VAL,
    "dedup_rate_report": SQL_DEDUP_RATE.format(jac=SQL_DEDUP_JACCARD),
    "source_quota_sample": SQL_SOURCE_QUOTA,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING,
    "convert_nps": SQL_CONVERT_NPS,
    "text_token_count": SQL_TOKEN_COUNT,
    "text_quality_score": SQL_QUALITY,
    "text_tfidf": SQL_TFIDF,
    "knn_cosine_topk": SQL_KNN_TOPK,
    "q1_pricing_summary": SQL_Q1,
    "top_orders_by_revenue": SQL_TOP_ORDERS,
    "nation_revenue": SQL_NATION_REVENUE,
    "events_window": SQL_EVENTS_WINDOW,
    "events_sliding_window": SQL_EVENTS_SLIDING,
    "events_heavy_hitters": SQL_EVENTS_HEAVY_HITTERS,
    "events_asof_join": SQL_EVENTS_ASOF,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "events_late_data": SQL_EVENTS_LATE,
    "events_distinct_sketch": SQL_DISTINCT_SKETCH,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "orders_upsert": SQL_ORDERS_UPSERT,
    "source_weighted_sample": SQL_SOURCE_WEIGHTED,
    "source_hash_quota_sample": SQL_SOURCE_HASH_QUOTA,
    "events_group_distinct": SQL_GROUP_DISTINCT,
    "events_ewma": SQL_EVENTS_EWMA,
    "events_cooccurrence": SQL_EVENTS_COOCCURRENCE,
    "text_length_deciles": SQL_LENGTH_DECILES,
    "events_cms_heavy_hitters": _cms_sql(),
    "text_top_ngrams": SQL_TOP_NGRAMS,
    "events_running_index": SQL_EVENTS_RUNNING_INDEX,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "dedup_simhash": SQL_SIMHASH,
    "dedup_phash_hamming": SQL_PHASH_HAMMING,
    "text_inverted_index": SQL_INVERTED_INDEX,
    "multimodal_integrity": SQL_MULTIMODAL_INTEGRITY,
    "text_langid": SQL_LANGID,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "text_fingerprint": SQL_FINGERPRINT,
    "dedup_minhash_lsh": SQL_MINHASH,
    "dedup_embedding_lsh": SQL_EMBED_LSH,
    "dedup_semantic": SQL_SEMDEDUP,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "graph_pagerank": SQL_PAGERANK,
    "graph_triangles": _triangles_sql(),
    "curate_corpus": SQL_CURATE,
    "knn_ivf": SQL_KNN_IVF,
    "image_decode_stats": SQL_DECODE_STATS,
    "image_pixel_embed": SQL_PIXEL_EMBED,
    "video_frame_sample": SQL_FRAME_SAMPLE,
    "audio_decode_stats": SQL_AUDIO_DECODE,
    "conflate_images": SQL_CONFLATE_IMAGES,
    "conflate_lines": SQL_CONFLATE_LINES,
    "conflate_pois": SQL_CONFLATE_POIS,
    "text_pack_sequences": SQL_PACK_SEQUENCES,
}


def _bpe_sql() -> str:
    from osm_merge_ray.text.bpe import bpe_oracle_sql

    return bpe_oracle_sql()


ORACLE_SQL["text_token_count_bpe"] = _bpe_sql()


def _bpe_train_sql() -> str:
    from osm_merge_ray.text.bpe import bpe_train_sql

    return bpe_train_sql(8)


ORACLE_SQL["text_bpe_train"] = _bpe_train_sql()
ORACLE_SQL["text_substring_decontaminate"] = SQL_SUBSTR_DECONTAMINATE
ORACLE_SQL["text_chunk_plan"] = SQL_CHUNK_PLAN
ORACLE_SQL["image_aspect_bucket"] = _aspect_sql()
ORACLE_SQL["image_batch_plan"] = _batch_plan_sql()
ORACLE_SQL["text_pii_redact"] = _pii_sql()
ORACLE_SQL["image_dedup_clusters"] = _sql_image_clusters()
ORACLE_SQL["text_lm_score"] = SQL_LM_SCORE
ORACLE_SQL["source_mixture_plan"] = SQL_MIXTURE_PLAN
ORACLE_SQL["table_profile"] = _profile_sql()
