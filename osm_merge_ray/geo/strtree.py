"""A from-scratch packed STR (Sort-Tile-Recursive) R-tree on numpy.

Role: the per-cell candidate index of the conflation join — the engine
analog of the reference's PostGIS ``ST_DWithin``-style probes
(``conflatePOI.py:294-380``) and of shapely's STRtree which is not
available in this environment. Bulk-loaded once per cell group (or per
actor in the actor-pool matcher), then queried with rectangles / kNN.

STR bulk loading (Leutenegger et al., ICDE 1997, public algorithm):
sort rects by center x into vertical slices of ~sqrt(n/cap) each, sort
each slice by center y, pack ``cap`` consecutive rects per leaf; build
parent levels the same way until one root remains.
"""

from __future__ import annotations

import heapq

import numpy as np


class STRtree:
    def __init__(self, boxes: np.ndarray, leaf_capacity: int = 16):
        """``boxes``: (n, 4) float64 [xmin, ymin, xmax, ymax]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.boxes = boxes
        self.cap = leaf_capacity
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        nleaf = int(np.ceil(self.n / leaf_capacity))
        nslices = int(np.ceil(np.sqrt(nleaf)))
        per_slice = int(np.ceil(self.n / nslices))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        for s in range(nslices):
            sl = by_x[s * per_slice:(s + 1) * per_slice]
            order[s * per_slice:s * per_slice + len(sl)] = sl[np.argsort(cy[sl], kind="stable")]
        self.order = order
        # level 0 = leaf MBRs over `order`, then parent levels (fanout=cap)
        self.levels = []
        cur = boxes[order]
        while True:
            ngroups = int(np.ceil(len(cur) / leaf_capacity))
            mbr = np.empty((ngroups, 4))
            for g in range(ngroups):
                chunk = cur[g * leaf_capacity:(g + 1) * leaf_capacity]
                mbr[g] = (chunk[:, 0].min(), chunk[:, 1].min(), chunk[:, 2].max(), chunk[:, 3].max())
            self.levels.append(mbr)
            if ngroups <= 1:
                break
            cur = mbr

    # -- rectangle intersection query -----------------------------------------
    def query(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Indices (into the original boxes array) intersecting the rect."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        cap = self.cap
        top = len(self.levels) - 1
        stack = [(top, i) for i in range(len(self.levels[top]))]
        out = []
        while stack:
            lvl, idx = stack.pop()
            b = self.levels[lvl][idx]
            if b[0] > xmax or b[2] < xmin or b[1] > ymax or b[3] < ymin:
                continue
            if lvl == 0:
                lo = idx * cap
                hi = min(lo + cap, self.n)
                cand = self.order[lo:hi]
                cb = self.boxes[cand]
                hit = ~((cb[:, 0] > xmax) | (cb[:, 2] < xmin) | (cb[:, 1] > ymax) | (cb[:, 3] < ymin))
                out.append(cand[hit])
            else:
                lo = idx * cap
                hi = min(lo + cap, len(self.levels[lvl - 1]))
                stack.extend((lvl - 1, j) for j in range(lo, hi))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    # -- k nearest neighbors ---------------------------------------------------
    def _dist2_box(self, b, x, y) -> float:
        dx = max(b[0] - x, 0.0, x - b[2])
        dy = max(b[1] - y, 0.0, y - b[3])
        return dx * dx + dy * dy

    def knn(self, x: float, y: float, k: int) -> np.ndarray:
        """Best-first kNN over box centers' MBR distance (ties by index)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        pq: list[tuple[float, int, int, int]] = []  # (dist2, kind(0=node,1=item), lvl, idx)
        for i in range(len(self.levels[top])):
            heapq.heappush(pq, (self._dist2_box(self.levels[top][i], x, y), 0, top, i))
        out: list[int] = []
        while pq and len(out) < k:
            d, kind, lvl, idx = heapq.heappop(pq)
            if kind == 1:
                out.append(idx)
                continue
            if lvl == 0:
                lo = idx * self.cap
                for j in self.order[lo:min(lo + self.cap, self.n)]:
                    heapq.heappush(pq, (self._dist2_box(self.boxes[j], x, y), 1, 0, int(j)))
            else:
                lo = idx * self.cap
                hi = min(lo + self.cap, len(self.levels[lvl - 1]))
                for j in range(lo, hi):
                    heapq.heappush(pq, (self._dist2_box(self.levels[lvl - 1][j], x, y), 0, lvl - 1, j))
        return np.asarray(out, dtype=np.int64)


def point_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: points (n,) vs one polygon ring
    (m, 2). Engine analog of ``shapely.contains`` gating at
    conflatePOI.py:406 / clip at osmhighways.py:243-252.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    x0, y0 = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    inside = np.zeros(len(px), dtype=bool)
    for i in range(len(poly)):
        cond = ((y0[i] > py) != (y1[i] > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0[i] + (py - y0[i]) / (y1[i] - y0[i] + 1e-300) * (x1[i] - x0[i])
        inside ^= cond & (px < xint)
    return inside
