"""64-bit DCT perceptual hash (the public pHash algorithm), pure numpy.

Algorithm (Zauner 2010, "Implementation and Benchmarking of Perceptual
Image Hash Functions"; same scheme as the ``imagehash`` library):
grayscale → box-resize to 32x32 → 2D DCT-II → keep the top-left 8x8
low-frequency block → threshold against the median (excluding the DC
term) → 64 bits.

Role in the engine: the graft analog of the reference's
"geometry identical → match regardless of tags" early exit
(``conflator.py:229-234``): two rows whose decoded pixels hash within
``phash_hamming_max`` count a hit in the decision table.
"""

from __future__ import annotations

import numpy as np

from osm_merge_ray.image.codec import resize_box

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi / n * (i + 0.5) * k)
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT32 = m * np.sqrt(2.0 / n)
    return _DCT32


def _gray32(pixels: np.ndarray) -> np.ndarray:
    gray = (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    )
    h, w = gray.shape
    if h % 32 == 0 and w % 32 == 0:
        # box means over equal blocks == resize_box for divisible sizes,
        # via reshape-mean (no integral image) — the common fast path
        g8 = gray.astype(np.uint8)
        blocks = g8.reshape(32, h // 32, 32, w // 32).astype(np.float64)
        return np.clip(np.rint(blocks.mean(axis=(1, 3))), 0, 255)
    return resize_box(gray[..., None].astype(np.uint8), 32, 32)[..., 0].astype(np.float64)


_POW2 = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def phash64_batch(images: list[np.ndarray]) -> np.ndarray:
    """Batched pHash: per-image gray/resize, then ONE einsum DCT over the
    whole (n, 32, 32) stack — the per-row Python cost is just the
    decode+resize, not the transform."""
    n = len(images)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    stack = np.empty((n, 32, 32))
    for i, px in enumerate(images):
        stack[i] = _gray32(px)
    m = _dct_matrix(32)
    d = np.einsum("ij,njk,lk->nil", m, stack, m, optimize=True)
    flat = d[:, :8, :8].reshape(n, 64)
    med = np.median(flat[:, 1:], axis=1)
    bits = flat > med[:, None]
    return (bits.astype(np.uint64) @ _POW2).view(np.int64)


def phash64(pixels: np.ndarray) -> int:
    return int(np.uint64(phash64_batch([pixels]).view(np.uint64)[0]))


def hamming64(a, b) -> np.ndarray:
    """Vectorized popcount of XOR over int64/uint64 arrays (SWAR)."""
    x = np.asarray(a).astype(np.int64).view(np.uint64) ^ np.asarray(b).astype(np.int64).view(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & m1)
        x = (x & m2) + ((x >> np.uint64(2)) & m2)
        x = (x + (x >> np.uint64(4))) & m4
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
