"""Deterministic hashing / RNG helpers (vectorized, dependency-free).

All randomness in the engine and its synthetic fixtures flows through
splitmix64 so results are reproducible across processes and machines
(Python's ``hash`` is salted per process and must never be used).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """The public splitmix64 finalizer (Steele et al., JPDC 2014).

    Vectorized over uint64 arrays; scalar ints also accepted.
    """
    scalar = np.isscalar(x)
    if isinstance(x, int):  # large Python ints overflow the C-long path
        x = _U64(x & 0xFFFFFFFFFFFFFFFF)
    z = np.asarray(x, dtype=_U64)
    with np.errstate(over="ignore"):
        z = (z + _U64(0x9E3779B97F4A7C15)) & _MASK64
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK64
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK64
        z = z ^ (z >> _U64(31))
    return int(z) if scalar else z


def hash64_str(values) -> np.ndarray:
    """Deterministic 64-bit FNV-1a hash of an array-like of strings."""
    out = np.empty(len(values), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325
    fnv_prime = 0x100000001B3
    mask = 0xFFFFFFFFFFFFFFFF
    for i, v in enumerate(values):
        h = fnv_offset
        for b in str(v).encode("utf-8"):
            h = ((h ^ b) * fnv_prime) & mask
        out[i] = h
    return out


def fnv1a_batch(strs) -> np.ndarray:
    """Vectorized FNV-1a over many short strings: one numpy pass per
    byte column instead of a Python loop per character. ~20x faster
    than ``hash64_str`` for token-sized strings."""
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(bufs):
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            alive = lens > j
            h[alive] = (h[alive] ^ mat[alive, j].astype(np.uint64)) * prime
    return h


def uniform01(x: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic uniform [0,1) doubles from uint64 keys."""
    h = splitmix64(np.asarray(x, dtype=_U64) ^ _U64(salt & 0xFFFFFFFFFFFFFFFF))
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


# --- SQL-mirrorable polynomial hash -----------------------------------------
# Left-fold over Unicode codepoints, modulo applied at EVERY step so a
# DuckDB oracle can express the identical computation exactly:
#   list_reduce(list_prepend(0, codepoints), (a,c) -> (a*B + c) % M)
# M = 2^41-1 keeps every intermediate (acc*B + c < 2^61) inside both
# int64 and DuckDB BIGINT — no wraparound semantics to replicate.
POLY41_BASE = 1_000_003
POLY41_MOD = (1 << 41) - 1


def poly41(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * POLY41_BASE + ord(c)) % POLY41_MOD
    return acc


def poly41_str(values) -> np.ndarray:
    """poly41 over an array-like of strings → int64 array (all < 2^41).
    Vectorized across strings column-by-character (same shape as
    ``fnv1a_batch``); exact match with the scalar fold since the modulus
    is applied at every step in both."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bufs = [str(v).encode("utf-32-le") for v in values]
    lens = np.fromiter((len(b) // 4 for b in bufs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, max(maxlen, 1)), dtype=np.uint32)
    for i, b in enumerate(bufs):
        if b:
            mat[i, : len(b) // 4] = np.frombuffer(b, dtype=np.uint32)
    acc = np.zeros(n, dtype=np.int64)
    base = np.int64(POLY41_BASE)
    mod = np.int64(POLY41_MOD)
    for j in range(maxlen):
        alive = lens > j
        acc[alive] = (acc[alive] * base + mat[alive, j].astype(np.int64)) % mod
    return acc


def poly41_grams(s: str, k: int) -> np.ndarray:
    """poly41 hash of every character k-gram of ``s`` (int64 array of
    len(s)-k+1 values, empty when shorter than k). Same left-fold the
    SQL twins unroll as k nested (acc*B + codepoint) % M steps."""
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if len(cp) < k:
        return np.zeros(0, dtype=np.int64)
    n = len(cp) - k + 1
    acc = np.zeros(n, dtype=np.int64)
    base = np.int64(POLY41_BASE)
    mod = np.int64(POLY41_MOD)
    for j in range(k):
        acc = (acc * base + cp[j : j + n]) % mod
    return acc
