"""Fuzzy string matching, from scratch (no rapidfuzz / Levenshtein libs).

The reference scores tag similarity with ``thefuzz``'s ``fuzz.ratio``
(``conflator.py:596``, ``conflatePOI.py:222``), which is the indel
(LCS-based) similarity ``100 * (1 - indel_dist / (len_a + len_b))``.
We provide:

* ``indel_ratio`` — drop-in semantic equivalent of ``fuzz.ratio``;
* ``levenshtein`` / ``lev_ratio`` — classic edit distance and the
  similarity ``100 * (1 - lev / max(len_a, len_b))``; used by the
  SQL-checkable conflation queries because DuckDB ships
  ``levenshtein`` but not indel distance;
* ``token_set_ratio`` — the public token-set algorithm (sort tokens,
  compare intersection/remainder strings), the scale-path scorer for
  word-order-insensitive caption matching;
* batched variants vectorized across pairs with an anti-diagonal DP so
  a cell's whole candidate list is scored in O(maxlen) numpy passes
  instead of a Python loop per pair.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Scalar edit distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def indel_distance(a: str, b: str) -> int:
    """Insert/delete-only distance: ``len_a + len_b - 2 * LCS``."""
    if a == b:
        return 0
    if not a or not b:
        return len(a) + len(b)
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return len(a) + len(b) - 2 * prev[-1]


def indel_ratio(a: str, b: str) -> float:
    """Semantic equivalent of ``thefuzz``/rapidfuzz ``fuzz.ratio``."""
    t = len(a) + len(b)
    if t == 0:
        return 100.0
    return 100.0 * (1.0 - indel_distance(a, b) / t)


def lev_ratio(a: str, b: str) -> float:
    m = max(len(a), len(b), 1)
    return 100.0 * (1.0 - levenshtein(a, b) / m)


def token_set_ratio(a: str, b: str) -> float:
    """Public token_set_ratio algorithm (SeatGeek fuzzywuzzy writeup):
    max ratio among (sorted-intersection vs intersection+rest_a,
    intersection+rest_b, and the two combined strings)."""
    ta, tb = set(a.lower().split()), set(b.lower().split())
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(indel_ratio(inter, sa), indel_ratio(inter, sb), indel_ratio(sa, sb))


# ---------------------------------------------------------------------------
# batched anti-diagonal DP: vectorized across N pairs
# ---------------------------------------------------------------------------

def _encode(strs, maxlen: int) -> tuple[np.ndarray, np.ndarray]:
    """uint32 codepoint matrix (n, maxlen), zero-padded, plus lengths."""
    n = len(strs)
    lens = np.fromiter((min(len(s), maxlen) for s in strs), dtype=np.int64, count=n)
    mat = np.zeros((n, maxlen), dtype=np.uint32)
    for i, s in enumerate(strs):
        s = s[:maxlen]
        if s:
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


# Batched-DP width cap: the rolled DP costs O(la_max * lb_max) numpy ops
# over the whole pair batch, so one pathological multi-KB string must not
# inflate the table for everyone. Pairs where EITHER side exceeds the cap
# are scored with the exact scalar DP instead — never truncated.
DP_WIDTH_CAP = 512


def _with_scalar_fallback(a_list, b_list, cap, batch_core, scalar_fn, dtype):
    """Run ``batch_core`` on in-cap pairs and the exact ``scalar_fn`` on
    over-length pairs, preserving order. Keeps every result exact while
    bounding the batched DP table to (n, cap)."""
    n = len(a_list)
    over = np.fromiter(
        (len(a) > cap or len(b) > cap for a, b in zip(a_list, b_list)),
        dtype=bool, count=n,
    )
    if not over.any():
        return batch_core(a_list, b_list)
    res = np.empty(n, dtype=dtype)
    for i in np.flatnonzero(over):
        res[i] = scalar_fn(a_list[i], b_list[i])
    keep = np.flatnonzero(~over)
    if len(keep):
        res[keep] = batch_core([a_list[i] for i in keep], [b_list[i] for i in keep])
    return res


def batch_levenshtein(a_list, b_list, maxlen: int | None = None) -> np.ndarray:
    """Edit distance for N string pairs via one shared anti-diagonal DP.

    Exact for all inputs: the DP table is sized from the actual batch
    (capped at ``maxlen`` or DP_WIDTH_CAP); pairs longer than the cap
    fall back to the exact scalar DP rather than being truncated.

    Cost: O(la_max * lb_max) numpy element-ops vectorized over pairs —
    scoring ~10^4 candidate pairs of ~30-char captions is a handful of
    milliseconds, vs a Python DP per pair in the reference's inner loop
    (conflator.py:596 calls fuzz.ratio per candidate per key).
    """
    a_list = list(a_list)
    b_list = list(b_list)
    cap = maxlen if maxlen is not None else DP_WIDTH_CAP
    return _with_scalar_fallback(
        a_list, b_list, cap, _lev_core, levenshtein, np.int64
    )


def _lev_core(a_list, b_list) -> np.ndarray:
    n = len(a_list)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la_max = max((len(s) for s in a_list), default=0)
    lb_max = max((len(s) for s in b_list), default=0)
    A, la = _encode(a_list, max(la_max, 1))
    B, lb = _encode(b_list, max(lb_max, 1))
    # D has shape (n, la_max+1, lb_max+1); rolled row by row (rows = chars of a)
    prev = np.broadcast_to(np.arange(lb_max + 1, dtype=np.int32), (n, lb_max + 1)).copy()
    result = np.where(la == 0, lb, 0).astype(np.int64)
    pending = la > 0
    for i in range(1, la_max + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = (A[:, i - 1][:, None] != B[:, :lb_max]).astype(np.int32)
        # within-row dependency on cur[:, j-1] → loop j, vectorized over pairs
        for j in range(1, lb_max + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1],
            )
        done = pending & (la == i)
        if done.any():
            result[done] = cur[done, lb[done]]
            pending &= ~done
        prev = cur
    return result


def batch_lev_ratio(a_list, b_list, maxlen: int | None = None) -> np.ndarray:
    """Levenshtein similarity over N pairs; distances are exact (scalar
    fallback above the cap) so lengths and distance always agree."""
    a_list, b_list = list(a_list), list(b_list)
    d = batch_levenshtein(a_list, b_list, maxlen)
    la = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=len(a_list))
    lb = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=len(b_list))
    m = np.maximum(np.maximum(la, lb), 1)
    return 100.0 * (1.0 - d / m)


def batch_indel_ratio(a_list, b_list, maxlen: int | None = None) -> np.ndarray:
    """fuzz.ratio over N pairs: LCS by the same row-rolled DP. Exact for
    all inputs (scalar-DP fallback above the width cap, no truncation)."""
    a_list, b_list = list(a_list), list(b_list)
    cap = maxlen if maxlen is not None else DP_WIDTH_CAP
    return _with_scalar_fallback(
        a_list, b_list, cap, _indel_core, indel_ratio, np.float64
    )


def _indel_core(a_list, b_list) -> np.ndarray:
    n = len(a_list)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    la_max = max((len(s) for s in a_list), default=0)
    lb_max = max((len(s) for s in b_list), default=0)
    A, la = _encode(a_list, max(la_max, 1))
    B, lb = _encode(b_list, max(lb_max, 1))
    prev = np.zeros((n, lb_max + 1), dtype=np.int32)
    lcs = np.zeros(n, dtype=np.int64)
    pending = la > 0
    for i in range(1, la_max + 1):
        cur = np.zeros_like(prev)
        eq = A[:, i - 1][:, None] == B[:, :lb_max]
        for j in range(1, lb_max + 1):
            cur[:, j] = np.where(
                eq[:, j - 1], prev[:, j - 1] + 1, np.maximum(prev[:, j], cur[:, j - 1])
            )
        done = pending & (la == i)
        if done.any():
            lcs[done] = cur[done, lb[done]]
            pending &= ~done
        prev = cur
    t = la + lb
    dist = t - 2 * lcs
    return np.where(t == 0, 100.0, 100.0 * (1.0 - dist / np.maximum(t, 1)))
