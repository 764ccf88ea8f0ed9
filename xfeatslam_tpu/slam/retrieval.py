"""Place-recognition retrieval over float descriptors.

Replaces DBoW2 (/root/reference/thirdparty/DBoW2/) and KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc). The reference feeds XFeat float
descriptors through a binary ORB vocabulary by reinterpreting the first 32
bytes as bits (SURVEY.md §2.3.3) — quantization is essentially arbitrary.
Here retrieval is designed for floats: each KF gets a global descriptor
(mean of its local descriptors today; field for a learned aggregate), and
queries are one cosine-similarity matmul over all stored KFs — brute force
is exact and fast at SLAM scale (hundreds of KFs), and it batches on TPU.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np


class Retrieval:
    def __init__(self, dim: int = 64, capacity: int = 1024):
        self.dim = dim
        self.cap = capacity
        self.descs = np.zeros((capacity, dim), np.float32)
        self.kids = np.full(capacity, -1, np.int64)
        self.map_ids = np.full(capacity, -1, np.int64)
        self.n = 0
        self._index: Dict[int, int] = {}

    def add(self, kid: int, gdesc: np.ndarray, map_id: int = 0):
        """Atlas-wide: entries carry their map id (the reference keeps ONE
        KeyFrameDatabase across all Atlas maps, which is what makes map
        merging discoverable)."""
        if self.n >= self.cap:
            self.cap *= 2
            d = np.zeros((self.cap, self.dim), np.float32)
            d[: self.n] = self.descs[: self.n]
            self.descs = d
            for name in ("kids", "map_ids"):
                a = getattr(self, name)
                k = np.full(self.cap, -1, np.int64)
                k[: self.n] = a[: self.n]
                setattr(self, name, k)
        self.descs[self.n] = gdesc
        self.kids[self.n] = kid
        self.map_ids[self.n] = map_id
        self._index[kid] = self.n
        self.n += 1

    def remove(self, kid: int):
        i = self._index.pop(kid, None)
        if i is not None:
            self.kids[i] = -1

    def query(self, gdesc: np.ndarray, exclude: Set[int],
              top_n: int = 3, min_score: float = 0.30,
              with_map: bool = False, exclude_map_id: Optional[int] = None):
        """Top-N most similar stored KFs (cosine), excluding the covisible
        set — the DetectNBestCandidates role
        (/root/reference/src/KeyFrameDatabase.cc:604). With with_map=True
        returns (kid, map_id, score) triples (cross-map candidates drive
        map merging)."""
        if self.n == 0:
            return []
        sims = self.descs[: self.n] @ gdesc
        order = np.argsort(-sims)
        out = []
        for i in order:
            kid = int(self.kids[i])
            if kid < 0:
                continue
            # exclusion sets are keyframe ids of ONE map — ids collide
            # across maps, so only apply them to that map's entries
            if kid in exclude and (
                exclude_map_id is None
                or int(self.map_ids[i]) == exclude_map_id
            ):
                continue
            if sims[i] < min_score:
                break
            if with_map:
                out.append((kid, int(self.map_ids[i]), float(sims[i])))
            else:
                out.append((kid, float(sims[i])))
            if len(out) >= top_n:
                break
        return out
