"""Two-stage place retrieval.

Equivalent of ``search_ringkey`` + ``search_sc`` (search_place.h:25-85):
ringkey k-nearest-neighbors with an insertion lag of LOOP_MARGIN frames (so
recent frames never match), then the Scan Context signature difference over
the candidates. The FLANN KD-tree becomes a brute-force distance over the
ringkey database — 20-dim keys over a few thousand frames is a trivial
matmul (SURVEY.md §7) and exact where the KD-tree is approximate."""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Tuple

import numpy as np


class RingkeyDatabase:
    def __init__(self, knn: int = 3, loop_margin: int = 100,
                 ringkey_thres: float = 0.1):
        self.knn = knn
        self.loop_margin = loop_margin
        self.thres = ringkey_thres
        self.db: List[np.ndarray] = []
        self.pending = deque()        # insertion lag queue

    def search_and_insert(self, ringkey: np.ndarray) -> List[int]:
        """Returns candidate indices (into the order of insertion calls,
        0-based), then enqueues `ringkey` with the LOOP_MARGIN lag."""
        candidates: List[int] = []
        if len(self.db) > self.knn:
            mat = np.stack(self.db)
            d2 = ((mat - ringkey[None, :]) ** 2).sum(axis=1)
            order = np.argsort(d2)[: self.knn]
            for i in order:
                # reference quirk preserved: index 0 is rejected by the
                # `idces[0][i] > 0` check (search_place.h:37)
                if d2[i] < self.thres and i > 0:
                    candidates.append(int(i))
        # lag queue (search_place.h:42-56)
        self.pending.append(ringkey.copy())
        if len(self.pending) > self.loop_margin:
            self.db.append(self.pending.popleft())
        return candidates


def search_signatures(
    signature: np.ndarray,
    all_signatures: List[np.ndarray],
    candidates: List[int],
    num_sectors: int,
) -> Tuple[int, float]:
    """search_sc (search_place.h:59-85): best candidate by signature
    difference."""
    best_idx = candidates[0]
    best_diff = 1.1
    for c in candidates:
        prod = float(np.dot(signature, all_signatures[c]))
        diff = (1.0 - prod / num_sectors) / 2.0
        if diff < best_diff:
            best_idx, best_diff = c, diff
    return best_idx, best_diff
