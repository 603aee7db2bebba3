"""Deterministic synthetic image+caption tables (the graft input).

Generates the primary/secondary Lance-shaped tables mandated by
BASELINE.json ``input_hint`` — columns ``(image_id:string,
bytes:binary, w:int32, h:int32, fmt:string, caption:string,
phash:int64)`` plus the derived centroid ``(lon, lat)`` pair — with
planted overlaps mirroring the reference's conflation scenarios
(FIXTURES.md F1):

per index ``i`` (category = i % 10):
  0,1   exact duplicate     secondary = same pixels, same caption, <0.5 m away
  2,3,4 near duplicate      jpeg re-encode, caption typo (ratio>85, len diff<=3),
                            offset <5 m   (the conflator.py:596-598 rule)
  5     ref-style pair      caption "FR 123.4A" vs "FS 123.4A" prefix variant
                            (the conflator.py:605-622 second-token rule)
  6     nearby distinct     <6 m away, unrelated caption → distance-only match
                            (conflator.py:292-298 fallback)
  7-9   unique              secondary displaced 150-500 m → both sides "new"

Positions are uniform over a test AOI with ~8% of rows concentrated
into 3 planted dense clusters (exercises hot-cell splitting). All
randomness is splitmix64 on the row index — regenerating any row is
O(1) and identical on every worker, so the dataset itself never has to
be shipped: ``synth_dataset`` builds it *distributed* with
``ray.data.range(n).map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm_merge_ray.image.codec import encode, synth_pixels
from osm_merge_ray.image.phash import phash64
from osm_merge_ray.util import splitmix64, uniform01

AOI = (-113.0, 37.0, -104.0, 44.0)  # lon_min, lat_min, lon_max, lat_max

_WORDS = (
    "Antelope Aspen Badger Bear Beaver Bison Cedar Cherry Cougar Coyote "
    "Crystal Eagle Elk Falcon Fox Granite Hawk Juniper Lake Maple Meadow "
    "Mesa Moose Otter Pine Raven Ridge River Spruce Summit Trail Willow"
).split()
_SUFFIX = ["Road", "Creek Road", "Ridge Road", "Loop Road", "Trail"]

M_PER_DEG_LAT = 111194.92664455873


def _positions(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon_min, lat_min, lon_max, lat_max = AOI
    u = uniform01(idx, salt=101)
    v = uniform01(idx, salt=202)
    lon = lon_min + u * (lon_max - lon_min)
    lat = lat_min + v * (lat_max - lat_min)
    # ~8% of rows into 3 dense ~300 m clusters → hot cells
    hot = uniform01(idx, salt=303) < 0.08
    which = (uniform01(idx, salt=404) * 3).astype(np.int64)
    centers = np.array([(-106.3, 39.7), (-111.9, 40.8), (-105.0, 39.9)])
    spread = 0.003
    lon = np.where(hot, centers[which, 0] + (u - 0.5) * spread, lon)
    lat = np.where(hot, centers[which, 1] + (v - 0.5) * spread, lat)
    return lon, lat


def _caption(i: int) -> str:
    h = splitmix64(i ^ 0xCAFE)
    if h % 5 == 0:  # ref-style caption: "FR 123.4A"
        n = (h >> 8) % 9000 + 100
        sub = (h >> 24) % 10
        letter = chr(ord("A") + int((h >> 32) % 4))
        return f"FR {n}.{sub}{letter}"
    w1 = _WORDS[(h >> 8) % len(_WORDS)]
    w2 = _WORDS[(h >> 16) % len(_WORDS)]
    sfx = _SUFFIX[(h >> 24) % len(_SUFFIX)]
    return f"{w1} {w2} {sfx}"


def _typo(s: str, salt: int) -> str:
    """One-char substitution — keeps len diff 0 and ratio well above 85
    for strings of the lengths the corpus produces."""
    h = splitmix64(salt)
    if len(s) < 8:
        return s + "s"
    pos = 1 + h % (len(s) - 2)
    c = s[pos]
    repl = "x" if c != "x" else "y"
    return s[:pos] + repl + s[pos + 1:]


def _offset(lon, lat, meters_e, meters_n):
    dlat = meters_n / M_PER_DEG_LAT
    dlon = meters_e / (111320.0 * np.cos(np.radians(lat)))
    return lon + dlon, lat + dlat


_SIZES = np.array([32, 64, 128])


def make_batch(indices: np.ndarray, side: str, seed: int = 42, with_bytes: bool = True,
               fmt_cycle: bool = False) -> pa.Table:
    """Build one Arrow batch of synthetic rows for ``side`` in
    {"primary", "secondary"}. Pure function of (index, side, seed).

    ``fmt_cycle=True`` assigns fmt deterministically by index parity
    (even → png, odd → jpeg) instead of by hash — used by fixtures whose
    DuckDB oracle must re-derive the fmt split without 64-bit wrap
    arithmetic (splitmix64 is not SQL-expressible)."""
    idx = np.asarray(indices, dtype=np.uint64) + np.uint64(seed) * np.uint64(1_000_003)
    n = len(idx)
    cat = (np.asarray(indices, dtype=np.int64) % 10)
    lon, lat = _positions(idx)
    is_sec = side == "secondary"

    captions = np.empty(n, dtype=object)
    img_seed = np.empty(n, dtype=np.uint64)
    fmt = (np.where(np.asarray(indices, dtype=np.int64) % 2 == 0, "png", "jpeg")
           if fmt_cycle
           else np.where(uniform01(idx, salt=7) < 0.5, "png", "jpeg")).astype(object)
    w = _SIZES[(uniform01(idx, salt=8) * 3).astype(np.int64)]
    h = _SIZES[(uniform01(idx, salt=9) * 3).astype(np.int64)]

    for k in range(n):
        i = int(idx[k])
        c = int(cat[k])
        base = _caption(i)
        if not is_sec:
            captions[k] = base
            img_seed[k] = i
            continue
        # secondary-side planting
        if c in (0, 1):            # exact duplicate
            captions[k] = base
            img_seed[k] = i
        elif c in (2, 3, 4):       # near duplicate: typo + re-encode
            captions[k] = _typo(base, i)
            img_seed[k] = i
            fmt[k] = "jpeg"
        elif c == 5:               # FS/FR ref prefix variant
            captions[k] = ("FS " + base[3:]) if base.startswith("FR ") else _typo(base, i)
            img_seed[k] = i
        elif c == 6:               # nearby but unrelated
            captions[k] = _caption(i ^ 0xDEAD)
            img_seed[k] = i ^ 0xDEAD
        else:                      # 7-9: far away, unrelated
            captions[k] = _caption(i ^ 0xBEEF)
            img_seed[k] = i ^ 0xBEEF

    if is_sec:
        east = np.zeros(n)
        north = np.zeros(n)
        u1 = uniform01(idx, salt=11) * 2 - 1
        u2 = uniform01(idx, salt=12) * 2 - 1
        east = np.where(cat <= 1, u1 * 0.3, east)
        north = np.where(cat <= 1, u2 * 0.3, north)
        near = (cat >= 2) & (cat <= 6)
        east = np.where(near, u1 * 4.0, east)
        north = np.where(near, u2 * 4.0, north)
        far = cat >= 7
        east = np.where(far, np.sign(u1) * (150.0 + np.abs(u1) * 350.0), east)
        north = np.where(far, np.sign(u2) * (150.0 + np.abs(u2) * 350.0), north)
        lon, lat = _offset(lon, lat, east, north)

    prefix = "S" if is_sec else "P"
    image_id = np.array([f"{prefix}{int(i):09d}" for i in indices], dtype=object)

    from osm_merge_ray.image.codec import quantize
    from osm_merge_ray.image.phash import phash64_batch

    blobs: list[bytes | None] = []
    stored_px: list[np.ndarray] = []
    for k in range(n):
        px = synth_pixels(int(img_seed[k]), int(w[k]), int(h[k]))
        # phash is of the *stored* image (post-lossy-encode), as a real
        # ingest pipeline would compute it; the lossy stand-in's decode
        # equals its quantizer
        stored = quantize(px) if str(fmt[k]) == "jpeg" else px
        stored_px.append(stored)
        blobs.append(encode(px, str(fmt[k])) if with_bytes else None)
    hashes = phash64_batch(stored_px)

    return pa.table(
        {
            "image_id": pa.array(image_id, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "w": pa.array(w.astype(np.int32), pa.int32()),
            "h": pa.array(h.astype(np.int32), pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def synth_table(n: int, side: str, seed: int = 42, with_bytes: bool = True,
                fmt_cycle: bool = False) -> pa.Table:
    """Driver-side generation for tests (small n)."""
    return make_batch(np.arange(n, dtype=np.int64), side, seed, with_bytes,
                      fmt_cycle=fmt_cycle)


def synth_dataset(n: int, side: str, seed: int = 42, with_bytes: bool = True,
                  parallelism: int = -1):
    """Distributed generation: ``ray.data.range`` → ``map_batches``.

    No driver-side materialization; each worker regenerates its block
    from row indices (seeded → identical everywhere).
    """
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        return make_batch(batch.column("id").to_numpy(), side, seed, with_bytes)

    ds = ray.data.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=2048)
