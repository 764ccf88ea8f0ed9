"""LoopClosing: place recognition, Sim3 verification, loop correction.

Role of /root/reference/src/LoopClosing.cc (2,539 LoC): per new keyframe,
query retrieval for candidates (DetectNBestCandidates), geometric
verification (SearchByBoW -> Sim3Solver RANSAC -> OptimizeSim3 -> guided
reprojection, :578-897), then CorrectLoop (:969-1213): propagate the
corrected Sim3 through the covisible group, fuse duplicate landmarks,
optimize the essential graph, and refresh with a global bundle adjustment.

Device kernels do all the heavy math (batched matching, batched Horn RANSAC,
autodiff Sim3 LM, matrix-free pose graph + GBA); this module is the
control flow. Consecutive-confirmation count is configurable (the reference
requires 3 temporally-consistent detections, :396-444).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, matching
from ..optim import local_ba as ba_mod
from ..optim import pose_graph as pg
from ..optim import sim3 as sim3_mod
from ..utils.verbose import Level, print_mess
from .retrieval import Retrieval

PAIR_BUCKET = 512  # padded matched-MP pairs for Sim3 verification


def _bucket(n: int, lo: int = 8) -> int:
    """Round n up to a power of two (>= lo) so padded problem shapes hit a
    bounded set of jit signatures instead of one per map size."""
    return max(lo, 1 << max(0, int(n) - 1).bit_length())


class LoopClosing:
    def __init__(self, slam_map, cam, bf: float = 40.0,
                 fix_scale: bool = True, confirmations: int = 3,
                 run_gba: bool = True, atlas=None,
                 proj_matches: int = 50, proj_matches_strict: int = 80):
        """confirmations: consecutive temporally-consistent detections
        required before correcting (reference default 3,
        /root/reference/src/LoopClosing.cc:396-444). proj_matches /
        proj_matches_strict: Sim3-guided projection re-search gates
        (LoopClosing.cc:843-880, >=50 wide then >=80 strict)."""
        self.map = slam_map
        self.cam = cam
        self.bf = bf
        self.fix_scale = fix_scale  # RGBD/stereo: scale observable
        self.confirmations = confirmations
        self.proj_matches = proj_matches
        self.proj_matches_strict = proj_matches_strict
        self.run_gba = run_gba
        self.atlas = atlas  # enables cross-map candidates -> map merging
        from .retrieval import global_desc_dim

        self.retrieval = Retrieval(dim=global_desc_dim(slam_map.desc_dim))
        # evict culled KFs from the index (KeyFrameDatabase::erase on
        # SetBadFlag, /root/reference/src/KeyFrame.cc:655) — without this a
        # dead KF that later wins a query crashes _matched_pairs
        def _evict(map_id: int, kid: int):
            self.retrieval.remove(kid, map_id)

        self._evict = _evict
        if atlas is not None:
            atlas.kf_removed_hook = _evict
            for m in atlas.maps.values():
                m.on_kf_removed = atlas._dispatch_kf_removed
        else:
            slam_map.on_kf_removed = lambda mid, kid: _evict(mid, kid)
        self.detected: List[tuple] = []  # (kid, cand) raw candidates
        self.n_sim3_extended = 0  # pairs added by SearchBySim3 (stats/tests)
        self.closed: List[tuple] = []  # (kid, cand) corrected loops
        self.merged: List[tuple] = []  # (new_map_id, old_map_id)
        # MergeInertialBA hook (LoopClosing.cc:2051): System wires this to
        # LocalMapping.merge_inertial_ba; called with (welded current kid,
        # matched old-map kid) after an inertial merge
        self.welding_iba = None
        # temporal consistency: (candidate covisibility group, count, stamp)
        self._consistent: List[Tuple[set, int, int]] = []
        # budgeted GBA (the reference's detached abortable GBA thread,
        # LoopClosing.cc:1199-1207/2268-2511, re-designed as per-frame
        # ticks): >0 = after the inline robust stage, this many extra
        # rounds of gba_round_iters LM iterations run one per frame via
        # tick(), then apply with spanning propagation; 0 = fully inline
        self.gba_budget_rounds = 0
        self.gba_round_iters = 5
        self._gba_session = None

    # ------------------------------------------------------------------ main

    def process_keyframe(self, kid: int):
        kf = self.map.keyframes.get(kid)
        if kf is None:
            return
        try:
            exclude = set(self.map.covisible_kfs(kid)) | {kid}
            # temporal guard: recent KFs are trivially similar even when
            # covisibility is sparse (the reference leans on covisibility
            # exclusion alone because tracking guarantees overlap with
            # recent KFs; this guard covers the sparse case)
            exclude |= {k for k in self.map.keyframes if abs(k - kid) <= 5}
            if self.map.num_keyframes() >= 12:
                # same-map loop candidates: covisibility-group accumulated
                # scoring (DetectNBestCandidates, KeyFrameDatabase.cc:604)
                for ckid, _score in self.retrieval.query_grouped(
                    kf.global_desc, exclude,
                    covisibles=self.map.covisible_kfs, top_n=3,
                    map_id=self.map.map_id,
                ):
                    self.detected.append((kid, ckid))
                    if self._verify_and_correct(kid, ckid):
                        break
            if self.atlas is not None and len(self.atlas.maps) > 1:
                for ckid, cmap, _score in self.retrieval.query(
                    kf.global_desc, exclude, top_n=3, with_map=True,
                    exclude_map_id=self.map.map_id,
                ):
                    if cmap != self.map.map_id and cmap in self.atlas.maps:
                        if self._verify_and_merge(kid, ckid, cmap):
                            break
        finally:
            # kf.kid (not the argument): a merge fired above rewrites the
            # keyframe's id and map in place — indexing the stale id would
            # leave an unevictable entry pointing at a nonexistent KF
            self.retrieval.add(kf.kid, kf.global_desc, self.map.map_id)

    def _update_consistency(self, kid: int, ckid: int) -> int:
        """Temporal-consistency counting over covisibility groups
        (LoopClosing.cc:396-444): a verified candidate whose covisibility
        group overlaps a previously-verified group continues that chain."""
        group = {ckid} | set(self.map.covisible_kfs(ckid))
        best = 0
        for g, c, _stamp in self._consistent:
            if g & group:
                best = max(best, c)
        count = best + 1
        self._consistent.append((group, count, kid))
        # drop chains not refreshed within the last few keyframes
        self._consistent = [
            (g, c, s) for (g, c, s) in self._consistent if kid - s <= 3
        ]
        return count

    # ---------------------------------------------------------- verification

    def _matched_pairs(self, kid: int, ckid: int):
        """Descriptor-match the two KFs' map points; return matched slot
        pairs (role of SearchByBoW in DetectCommonRegionsFromBoW)."""
        kf1 = self.map.keyframes.get(kid)
        kf2 = self.map.keyframes.get(ckid)
        if kf1 is None or kf2 is None:
            # candidate culled between query and verification
            empty = np.zeros(0, np.int64)
            return kf1, kf2, empty, empty
        b1 = kf1.mp_ids >= 0
        b2 = kf2.mp_ids >= 0
        v1 = b1 & kf1.valid & self.map.points.alive[np.where(b1, kf1.mp_ids, 0)]
        v2 = b2 & kf2.valid & self.map.points.alive[np.where(b2, kf2.mp_ids, 0)]
        binary = self.map.desc_dim > 64
        res = matching.match_general(
            jnp.asarray(kf1.desc), jnp.asarray(v1),
            jnp.asarray(kf2.desc), jnp.asarray(v2),
            max_dist=jnp.float32(
                matching.ORB_TH_LOW if binary else matching.TH_LOW * 6
            ),
            ratio=0.75, binary=binary,
        )
        idx = np.asarray(res.idx)
        mask = np.asarray(res.mask)
        mask = matching.rotation_consistency_filter(
            kf1.angle, kf2.angle, np.clip(idx, 0, None), mask
        )
        slots1 = np.nonzero(mask)[0]
        slots2 = idx[slots1]
        return kf1, kf2, slots1, slots2

    def _sim3_pairs_arrays(self, m1, kf1, m2, kf2, slots1, slots2):
        """Camera-frame point/pixel arrays for a matched slot-pair set,
        padded to PAIR_BUCKET. Returns (Xc1, Xc2, uv1, uv2, valid)."""
        mp1 = kf1.mp_ids[slots1]
        mp2 = kf2.mp_ids[slots2]
        Xc1 = m1.points.pos[mp1] @ kf1.R.T + kf1.t
        Xc2 = m2.points.pos[mp2] @ kf2.R.T + kf2.t
        uv1 = kf1.kpts_un[slots1]
        uv2 = kf2.kpts_un[slots2]

        def pad(a, fill=0.0):
            out = np.full((PAIR_BUCKET,) + a.shape[1:], fill, a.dtype)
            out[: min(len(a), PAIR_BUCKET)] = a[:PAIR_BUCKET]
            return out

        if len(slots1) > PAIR_BUCKET:
            print_mess(f"Sim3 pair bucket cap hit: {PAIR_BUCKET} of "
                       f"{len(slots1)} matched pairs", Level.VERBOSE)
        valid = np.zeros(PAIR_BUCKET, bool)
        valid[: min(len(slots1), PAIR_BUCKET)] = True
        return (jnp.asarray(pad(Xc1)), jnp.asarray(pad(Xc2)),
                jnp.asarray(pad(uv1)), jnp.asarray(pad(uv2)),
                jnp.asarray(valid))

    def _search_by_sim3(self, m1, kf1, m2, kf2, slots1, slots2,
                        s12, R12, t12, radius: float = 7.5):
        """SearchBySim3 (/root/reference/src/ORBmatcher.cc:1642, used at
        LoopClosing.cc:769-841): extend a pairwise match set by BIDIRECTIONAL
        Sim3-guided projection — each side's landmarks are projected into the
        other keyframe through the verified Sim3 and matched within a window;
        only mutually-agreeing pairs are added. The caller re-runs
        OptimizeSim3 on the enlarged set, so marginal-but-true loops (20-30
        initial pairwise matches) get a Sim3 constrained by the full
        correspondence set rather than the initial sparse one.

        S12 maps kf2-camera coords into kf1-camera coords. Returns extended
        (slots1, slots2) arrays."""
        s12 = float(s12)
        R12 = np.asarray(R12)
        t12 = np.asarray(t12)
        binary = m1.desc_dim > 64
        max_dist = jnp.float32(
            matching.ORB_TH_HIGH if binary else matching.TH_HIGH)

        def landmark_slots(m, kf):
            b = kf.mp_ids >= 0
            ok = b & kf.valid & m.points.alive[np.where(b, kf.mp_ids, 0)]
            return np.nonzero(ok)[0]

        def project(m, kf_src, slots_src, kf_dst, sim3):
            """Project kf_src's landmarks into kf_dst through ``sim3``
            (s,R,t mapping src-cam -> dst-cam); window-match against
            kf_dst's landmark-bearing slots. Returns (dst_slot per src slot,
            mask) arrays over ``slots_src``."""
            s_, R_, t_ = sim3
            mps = kf_src.mp_ids[slots_src]
            Xc_src = m.points.pos[mps] @ kf_src.R.T + kf_src.t
            Xc_dst = s_ * (Xc_src @ R_.T) + t_
            z = Xc_dst[:, 2]
            vis = z > 0.05
            zs = np.where(vis, z, 1.0)
            u = float(self.cam.fx) * Xc_dst[:, 0] / zs + float(self.cam.cx)
            v = float(self.cam.fy) * Xc_dst[:, 1] / zs + float(self.cam.cy)
            uv = np.stack([u, v], -1).astype(np.float32)
            dst_has_mp = kf_dst.mp_ids >= 0
            res = matching.search_by_projection(
                jnp.asarray(uv), jnp.asarray(kf_src.desc[slots_src]),
                jnp.asarray(vis),
                jnp.asarray(kf_dst.kpts_un), jnp.asarray(kf_dst.desc),
                jnp.asarray(dst_has_mp & kf_dst.valid),
                radius=jnp.float32(radius), max_dist=max_dist,
                ratio=1.0, binary=binary,
            )
            return np.asarray(res.idx), np.asarray(res.mask)

        sl1 = landmark_slots(m1, kf1)
        sl2 = landmark_slots(m2, kf2)
        if len(sl1) == 0 or len(sl2) == 0:
            return slots1, slots2
        inv = lie.sim3_inverse(jnp.float32(s12), jnp.asarray(R12),
                               jnp.asarray(t12))
        s21, R21, t21 = float(inv[0]), np.asarray(inv[1]), np.asarray(inv[2])
        # kf1 landmarks -> kf2 image (S21), kf2 landmarks -> kf1 image (S12)
        idx12, ok12 = project(m1, kf1, sl1, kf2, (s21, R21, t21))
        idx21, ok21 = project(m2, kf2, sl2, kf1, (s12, R12, t12))
        # mutual agreement in slot space (vnMatch2[vnMatch1[i1]] == i1)
        back = -np.ones(len(kf1.mp_ids), np.int64)
        for j, slot2 in enumerate(sl2):
            if ok21[j]:
                back[idx21[j]] = slot2
        have1 = set(int(x) for x in slots1)
        have2 = set(int(x) for x in slots2)
        add1, add2 = [], []
        for i, slot1 in enumerate(sl1):
            if not ok12[i]:
                continue
            slot2 = int(idx12[i])
            if back[slot1] != slot2:
                continue
            if int(slot1) in have1 or slot2 in have2:
                continue
            add1.append(int(slot1))
            add2.append(slot2)
        if not add1:
            return slots1, slots2
        self.n_sim3_extended += len(add1)
        print_mess(f"SearchBySim3 extended {len(slots1)} -> "
                   f"{len(slots1) + len(add1)} pairs", Level.VERBOSE)
        return (np.concatenate([slots1, np.asarray(add1, slots1.dtype)]),
                np.concatenate([slots2, np.asarray(add2, slots2.dtype)]))

    def _verify_and_correct(self, kid: int, ckid: int) -> bool:
        kf1, kf2, slots1, slots2 = self._matched_pairs(kid, ckid)
        if len(slots1) < 20:  # reference needs >=20 BoW matches (:691)
            return False
        Xc1, Xc2, uv1, uv2, valid = self._sim3_pairs_arrays(
            self.map, kf1, self.map, kf2, slots1, slots2)
        res = sim3_mod.sim3_ransac(
            Xc1, Xc2, uv1, uv2, valid, self.cam, jax.random.PRNGKey(kid),
            min_inliers=15, fix_scale=self.fix_scale,
        )
        if not bool(res.success):
            return False
        s, R, t, inl, n_inl = sim3_mod.optimize_sim3(
            res.s, res.R, res.t, Xc1, Xc2, uv1, uv2, valid, self.cam,
            fix_scale=self.fix_scale,
        )
        if int(n_inl) < 20:  # OptimizeSim3 gate (:808)
            return False
        # SearchBySim3 correspondence extension + re-optimization on the
        # enlarged set (ORBmatcher.cc:1642; LoopClosing.cc:769-841)
        ext1, ext2 = self._search_by_sim3(self.map, kf1, self.map, kf2,
                                          slots1, slots2, s, R, t)
        if len(ext1) > len(slots1):
            Xc1, Xc2, uv1, uv2, valid = self._sim3_pairs_arrays(
                self.map, kf1, self.map, kf2, ext1, ext2)
            s, R, t, inl, n_inl = sim3_mod.optimize_sim3(
                s, R, t, Xc1, Xc2, uv1, uv2, valid, self.cam,
                fix_scale=self.fix_scale,
            )
            if int(n_inl) < 20:
                return False
        # Sim3-guided projection re-search (LoopClosing.cc:843-880): project
        # the loop window's landmarks into the current KF through the
        # verified Sim3 — a TRUE loop re-finds most of the old structure; a
        # texture alias that survived the pairwise gates does not.
        s, R, t = float(s), np.asarray(R), np.asarray(t)
        m_wide = self._guided_proj_count(kid, ckid, s, R, t, radius=8.0)
        if m_wide < self.proj_matches:
            return False
        m_strict = self._guided_proj_count(kid, ckid, s, R, t, radius=4.0)
        if m_strict < self.proj_matches_strict:
            return False
        # temporal consistency (reference: 3 consecutive KFs, :396-444)
        if self._update_consistency(kid, ckid) < self.confirmations:
            return False
        self._consistent.clear()

        self._correct_loop(kid, ckid, s, R, t)
        self.closed.append((kid, ckid))
        return True

    def _guided_proj_count(self, kid: int, ckid: int, s12, R12, t12,
                           radius: float) -> int:
        """Count matches from projecting the loop window's map points into
        the current KF through the verified Sim3 (SearchByProjection Sim3
        overload, /root/reference/src/ORBmatcher.cc:612,719)."""
        m = self.map
        kf1 = m.keyframes[kid]
        mps: List[int] = []
        for k in [ckid] + m.covisible_kfs(ckid, 10):
            kf = m.keyframes.get(k)
            if kf is None:
                continue
            mps.extend(int(x) for x in kf.mp_ids[kf.mp_ids >= 0])
        mps = [p for p in dict.fromkeys(mps) if m.points.alive[p]]
        if len(mps) > 4096:
            print_mess(f"Sim3-guided projection cap hit: 4096 of "
                       f"{len(mps)} loop-window points", Level.VERBOSE)
            mps = mps[:4096]
        if not mps:
            return 0
        kf2 = m.keyframes[ckid]
        pos = m.points.pos[mps]
        # corrected current-camera coords: X_c1 = S12(X_c2)
        Xc2 = pos @ kf2.R.T + kf2.t
        Xc1 = s12 * (Xc2 @ np.asarray(R12).T) + np.asarray(t12)
        z = Xc1[:, 2]
        vis = z > 0.05
        zs = np.where(vis, z, 1.0)
        u = float(self.cam.fx) * Xc1[:, 0] / zs + float(self.cam.cx)
        v = float(self.cam.fy) * Xc1[:, 1] / zs + float(self.cam.cy)
        uv = np.stack([u, v], -1).astype(np.float32)
        binary = m.desc_dim > 64
        res = matching.search_by_projection(
            jnp.asarray(uv), jnp.asarray(m.points.desc[mps]),
            jnp.asarray(vis & m.points.alive[mps]),
            jnp.asarray(kf1.kpts_un), jnp.asarray(kf1.desc),
            jnp.asarray(kf1.valid),
            radius=jnp.float32(radius),
            max_dist=jnp.float32(
                matching.ORB_TH_LOW if binary else matching.TH_LOW * 6
            ),
            ratio=0.9, binary=binary,
        )
        return int(np.asarray(res.mask).sum())

    # ------------------------------------------------------------ correction

    def _correct_loop(self, kid: int, ckid: int, s12, R12, t12):
        """CorrectLoop (/root/reference/src/LoopClosing.cc:969-1213).

        S12 maps candidate-KF camera coords into current-KF camera coords.
        Corrected current pose: S_1w_corr = S12 * S_2w (candidate side is
        trusted). The covisible group of the current KF is rigidly carried
        by the correction, their points transformed, then the essential
        graph is optimized and (optionally) a global BA refreshes the map.
        """
        m = self.map
        kf1 = m.keyframes[kid]
        kf2 = m.keyframes[ckid]
        # a new confirmed loop supersedes any in-flight budgeted GBA
        # (mbStopGBA, /root/reference/src/LoopClosing.cc:1199-1207)
        self._gba_session = None

        # corrected Sim3 for the current KF (world->cam1)
        s2, R2, t2 = 1.0, kf2.R, kf2.t
        s_corr = s12 * s2
        R_corr = R12 @ R2
        t_corr = s12 * (R12 @ t2) + t12

        # old (uncorrected) pose of current KF
        R_old, t_old = kf1.R.copy(), kf1.t.copy()

        # delta applied on the world side: S_corr = S_delta_applied-to-old
        # For each covisible KF i: S_i_corr = S_i_old * S_1w_old^{-1} * S_1w_corr
        inv = lie.sim3_inverse(jnp.float32(1.0), jnp.asarray(R_old), jnp.asarray(t_old))
        sD, RD, tD = lie.sim3_compose(*inv, jnp.float32(s_corr),
                                      jnp.asarray(R_corr), jnp.asarray(t_corr))
        sD, RD, tD = float(sD), np.asarray(RD), np.asarray(tD)
        # S_i_corr = S_i_old ∘ S_D  (S_D maps corrected-world to old-world)

        group = [kid] + m.covisible_kfs(kid)
        corrected_points = set()
        # pre-correction poses of the moved group: the essential graph needs
        # edge measurements from the UNcorrected geometry (the reference's
        # NonCorrectedSim3 map, LoopClosing.cc:1039-1135) — measuring edges
        # from post-correction poses would zero every non-loop residual and
        # make the pose-graph optimization a no-op.
        non_corrected = {}
        for gk in group:
            kf = m.keyframes.get(gk)
            if kf is None:
                continue
            non_corrected[gk] = (kf.R.copy(), kf.t.copy())
            si, Ri, ti = lie.sim3_compose(
                jnp.float32(1.0), jnp.asarray(kf.R), jnp.asarray(kf.t),
                jnp.float32(sD), jnp.asarray(RD), jnp.asarray(tD),
            )
            si, Ri, ti = float(si), np.asarray(Ri), np.asarray(ti)
            # correct this KF's points: X_corr = S_i_corr^{-1}( S_i_old(X) )
            mps = kf.mp_ids[kf.mp_ids >= 0]
            for mp in mps:
                mp = int(mp)
                if mp in corrected_points or not m.points.alive[mp]:
                    continue
                corrected_points.add(mp)
                Xc = kf.R @ m.points.pos[mp] + kf.t
                Xw = (Ri.T @ (Xc - ti)) / si
                m.points.pos[mp] = Xw.astype(np.float32)
            # corrected SE3 pose: [R | t/s] (reference :1110-1118)
            kf.R = lie.np_normalize_rotation(Ri)
            kf.t = (ti / si).astype(np.float32)

        kf1.loop_edges.add(ckid)
        kf2.loop_edges.add(kid)

        # loop fusion: project the loop side's landmarks into every
        # corrected-group keyframe and replace/bind duplicates
        # (SearchAndFuse, /root/reference/src/LoopClosing.cc:1120-1140)
        pre_covis = {gk: set(m.covisible_kfs(gk)) for gk in group
                     if gk in m.keyframes}
        n_fused = self._search_and_fuse(group, ckid)
        # connections that exist only AFTER fusion are the LoopConnections
        # (LoopClosing.cc:1142-1165): the essential graph must measure them
        # from the CORRECTED estimates — measuring them like ordinary covis
        # edges (pre-correction poses) would encode the drifted misclosure
        # as a constraint and fight the loop correction
        loop_connections = set()
        if n_fused:
            gset = set(group)
            for gk, before in pre_covis.items():
                if gk not in m.keyframes:
                    continue
                for nk in m.covisible_kfs(gk):
                    if nk in gset or nk in before or nk not in m.keyframes:
                        continue
                    loop_connections.add((min(gk, nk), max(gk, nk)))
            print_mess(f"loop fusion bound {n_fused} landmark duplicates, "
                       f"{len(loop_connections)} new connections",
                       Level.VERBOSE)

        # essential-graph optimization over all KFs
        self._optimize_essential_graph(kid, ckid, s12, R12, t12,
                                       non_corrected=non_corrected,
                                       loop_connections=loop_connections)
        if self.run_gba:
            self.global_bundle_adjust()
        m.change_index += 1

    def _essential_edges(self):
        """Spanning tree + loop edges + strong covisibility (>=100)
        (OptimizeEssentialGraph edge selection, Optimizer.cc:1559-1675)."""
        m = self.map
        edges = set()
        for kid, kf in m.keyframes.items():
            if kf.parent >= 0 and kf.parent in m.keyframes:
                edges.add((min(kid, kf.parent), max(kid, kf.parent)))
            # inertial temporal-chain edges (4DoF graph adds prev-KF edges,
            # Optimizer.cc:5448-5480 "1.1.1 Inertial edges")
            prev = getattr(kf, "prev_kf", None)
            if prev is not None and prev in m.keyframes:
                edges.add((min(kid, prev), max(kid, prev)))
            for lk in kf.loop_edges:
                if lk in m.keyframes:
                    edges.add((min(kid, lk), max(kid, lk)))
            for ck, w in m.covis.get(kid, {}).items():
                if w >= 100 and ck in m.keyframes:
                    edges.add((min(kid, ck), max(kid, ck)))
        return sorted(edges)

    def _optimize_essential_graph(self, kid: int, ckid: int, s12, R12, t12,
                                  non_corrected: Optional[dict] = None,
                                  loop_connections: Optional[set] = None):
        """Optimize ALL keyframes over the essential graph (no truncation;
        problem arrays are padded to power-of-two buckets to bound jit
        signatures). Edge measurements for keyframes moved by _correct_loop
        come from their PRE-correction poses (``non_corrected``), mirroring
        the reference's NonCorrectedSim3 (Optimizer.cc:1501-1784).
        ``loop_connections`` (covisibilities created by loop fusion) are
        included regardless of weight and measured from the CURRENT
        (corrected) estimates, the reference's LoopConnections edge class
        (Optimizer.cc:1559-1620 uses vScw, not NonCorrectedSim3, there)."""
        m = self.map
        kids = sorted(m.keyframes)
        if len(kids) < 3:
            return
        non_corrected = non_corrected or {}
        loop_connections = loop_connections or set()
        index = {k: i for i, k in enumerate(kids)}
        C = _bucket(len(kids))
        edges = sorted(set(self._essential_edges()) | loop_connections)
        E = _bucket(len(edges), lo=16)
        if len(kids) > 512:
            print_mess(f"essential graph: {len(kids)} KFs / {len(edges)} "
                       f"edges (buckets {C}/{E})", Level.VERBOSE)

        def pose_for_meas(k):
            """Pose used to BUILD measurements: pre-correction if the KF was
            moved by the loop snap, else current."""
            if k in non_corrected:
                return non_corrected[k]
            kf = m.keyframes[k]
            return kf.R, kf.t

        s0 = np.ones(C, np.float32)
        R0 = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
        t0 = np.zeros((C, 3), np.float32)
        cam_valid = np.zeros(C, bool)
        for k, i in index.items():
            kf = m.keyframes[k]
            R0[i] = kf.R
            t0[i] = kf.t
            cam_valid[i] = True
        fixed = np.zeros(C, bool)
        fixed[~cam_valid] = True
        # fix the loop-candidate side (reference fixes the loop KF, :1537)
        if ckid in index:
            fixed[index[ckid]] = True
        if m.kf_origin in index:
            fixed[index[m.kf_origin]] = True

        ei, ej, m_s, m_R, m_t = [], [], [], [], []
        loop_pair = (min(kid, ckid), max(kid, ckid))
        for (a, b) in edges:
            if a not in index or b not in index:
                continue
            if (a, b) == loop_pair:
                # measured relative from the VERIFIED Sim3 (S12: cand->curr)
                if a == ckid:  # m = S_b S_a^{-1} with (i=a, j=b)
                    # S_kid = S12 * S_ckid  => m(a->b) = S12
                    ms, mR, mt = s12, R12, t12
                else:
                    inv = lie.sim3_inverse(jnp.float32(s12), jnp.asarray(R12),
                                           jnp.asarray(t12))
                    ms, mR, mt = float(inv[0]), np.asarray(inv[1]), np.asarray(inv[2])
            elif (a, b) in loop_connections:
                # post-fusion loop-region connection: measured from the
                # CORRECTED estimates (vScw, Optimizer.cc:1559-1620)
                kfa, kfb = m.keyframes[a], m.keyframes[b]
                inv = lie.sim3_inverse(jnp.float32(1.0), jnp.asarray(kfa.R),
                                       jnp.asarray(kfa.t))
                comp = lie.sim3_compose(jnp.float32(1.0), jnp.asarray(kfb.R),
                                        jnp.asarray(kfb.t), *inv)
                ms, mR, mt = (float(comp[0]), np.asarray(comp[1]),
                              np.asarray(comp[2]))
            else:
                # m(a->b) = S_b * S_a^{-1} from pre-correction estimates
                Ra, ta = pose_for_meas(a)
                Rb, tb = pose_for_meas(b)
                inv = lie.sim3_inverse(jnp.float32(1.0), jnp.asarray(Ra),
                                       jnp.asarray(ta))
                comp = lie.sim3_compose(jnp.float32(1.0), jnp.asarray(Rb),
                                        jnp.asarray(tb), *inv)
                ms, mR, mt = float(comp[0]), np.asarray(comp[1]), np.asarray(comp[2])
            ei.append(index[a])
            ej.append(index[b])
            m_s.append(ms)
            m_R.append(mR)
            m_t.append(mt)
        n_e = len(ei)
        if n_e < 2:
            return

        def pad(a, n, fill=0, dtype=None):
            a = np.asarray(a, dtype)
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        prob = pg.PoseGraphProblem(
            s=jnp.asarray(s0), R=jnp.asarray(R0), t=jnp.asarray(t0),
            fixed=jnp.asarray(fixed), cam_valid=jnp.asarray(cam_valid),
            edge_i=jnp.asarray(pad(ei, E, 0, np.int32)),
            edge_j=jnp.asarray(pad(ej, E, 0, np.int32)),
            m_s=jnp.asarray(pad(m_s, E, 1.0, np.float32)),
            m_R=jnp.asarray(pad(np.stack(m_R), E) if m_R else np.tile(np.eye(3), (E, 1, 1))),
            m_t=jnp.asarray(pad(np.stack(m_t), E)),
            e_valid=jnp.asarray(pad(np.ones(n_e, bool), E, False)),
        )
        # inertial maps with gravity pinned optimize only yaw+translation
        # (OptimizeEssentialGraph4DoF is chosen over the Sim3 graph when the
        # map is inertial and initialized, LoopClosing.cc:618-632)
        mode = "4dof" if self.map.imu_initialized else "sim3"
        s1, R1, t1 = pg.optimize_pose_graph(prob, mode=mode)
        s1, R1, t1 = np.asarray(s1), np.asarray(R1), np.asarray(t1)

        # apply: KF SE3 = [R | t/s]; points via their reference KF correction
        old_poses = {k: (m.keyframes[k].R.copy(), m.keyframes[k].t.copy())
                     for k in index}
        for k, i in index.items():
            kf = m.keyframes.get(k)
            if kf is None or fixed[i]:
                continue
            kf.R = lie.np_normalize_rotation(R1[i])
            kf.t = (t1[i] / max(s1[i], 1e-9)).astype(np.float32)
        # transform points by their first-observing KF's correction
        # (CorrectLoop/RunGBA spanning propagation role)
        for mp, obs in list(m.obs.items()):
            if not m.points.alive[mp] or not obs:
                continue
            ref_k = min(obs)  # earliest observing KF: deterministic anchor
            if ref_k not in index:
                continue
            i = index[ref_k]
            if fixed[i]:
                continue
            R_o, t_o = old_poses[ref_k]
            Xc = R_o @ m.points.pos[mp] + t_o
            # new world position: X = S_new^{-1}(Xc) with S_new=[s R | t]
            Xw = (R1[i].T @ (Xc - t1[i] / max(s1[i], 1e-9)))
            m.points.pos[mp] = Xw.astype(np.float32)

    # ------------------------------------------------------------------- GBA

    def global_bundle_adjust(self, max_pts: int = 65536,
                             max_obs: int = 262144):
        """GlobalBundleAdjustemnt over the whole map
        (/root/reference/src/Optimizer.cc:52; RunGlobalBundleAdjustment
        LoopClosing.cc:2268) using the same batched LM kernel as local BA.

        ALL keyframes participate (the matrix-free PCG solver scales with
        problem size, so there is no camera cap); points/observations are
        padded to power-of-two buckets. The huge ``max_pts``/``max_obs``
        backstops exist only to bound device memory — hitting them is LOGGED,
        never silent, and drops the most-observed points last.

        With ``gba_budget_rounds > 0`` this is the reference's detached
        abortable GBA thread re-designed: the robust first stage runs now,
        the remaining LM rounds run one per frame via tick(), and the final
        apply propagates corrections to keyframes/points created meanwhile
        through the spanning tree (LoopClosing.cc:2369-2511)."""
        built = self._build_gba(max_pts, max_obs)
        if built is None:
            return
        prob, index, pt_ids, fixed, n_obs = built
        if self.gba_budget_rounds > 0:
            res = ba_mod.bundle_adjust(prob, self.cam, jnp.float32(self.bf),
                                       stage_iters=(10, 0))
            prob = prob._replace(R=res.R, t=res.t, X=res.X)
            self._gba_session = (prob, index, pt_ids, fixed,
                                 self.gba_budget_rounds, self.map,
                                 self.map.geometry_epoch)
            return
        res = ba_mod.bundle_adjust(prob, self.cam, jnp.float32(self.bf),
                                   stage_iters=(10, 10))
        self._apply_gba(res, index, pt_ids, fixed)

    def tick(self):
        """Advance the in-flight budgeted GBA session by one LM round
        (called by System every frame; the synchronous re-design of the
        reference's background GBA thread). The session aborts when the map
        identity or its geometry epoch changed (merge / IMU-init rescale) —
        the captured problem would undo the transform — and when a new loop
        correction starts (mbStopGBA, LoopClosing.cc:1199-1207)."""
        s = self._gba_session
        if s is None:
            return
        prob, index, pt_ids, fixed, rounds_left, smap, epoch = s
        if smap is not self.map or self.map.geometry_epoch != epoch:
            self._gba_session = None
            return
        res = ba_mod.bundle_adjust(prob, self.cam, jnp.float32(self.bf),
                                   stage_iters=(0, self.gba_round_iters))
        rounds_left -= 1
        if rounds_left <= 0:
            self._apply_gba(res, index, pt_ids, fixed, propagate=True)
            self._gba_session = None
        else:
            self._gba_session = (
                prob._replace(R=res.R, t=res.t, X=res.X), index, pt_ids,
                fixed, rounds_left, smap, epoch,
            )

    def flush(self):
        """Finish any in-flight budgeted GBA (System shutdown waits for the
        GBA thread in the reference, System.cc:~SaveTrajectory paths)."""
        guard = 0
        while self._gba_session is not None and guard < 64:
            self.tick()
            guard += 1

    def _build_gba(self, max_pts: int, max_obs: int):
        """Assemble the padded whole-map BA problem. Returns
        (prob, index, pt_ids, fixed, n_obs) or None."""
        m = self.map
        kids = sorted(m.keyframes)
        if len(kids) < 2:
            return None
        index = {k: i for i, k in enumerate(kids)}
        pt_ids = [mp for mp in m.obs if m.points.alive[mp]]
        if len(pt_ids) > max_pts:
            # keep the best-supported points; log the truncation
            pt_ids.sort(key=lambda mp: -len(m.obs.get(mp, {})))
            print_mess(f"GBA: point cap hit — optimizing {max_pts} of "
                       f"{len(pt_ids)} map points", Level.NORMAL)
            pt_ids = pt_ids[:max_pts]
        pt_index = {mp: i for i, mp in enumerate(pt_ids)}

        obs_cam, obs_pt, uv, ur, stereo = [], [], [], [], []
        dropped_obs = 0
        for mp in pt_ids:
            for k, slot in m.obs.get(mp, {}).items():
                ci = index.get(k)
                if ci is None:
                    continue
                if len(obs_cam) >= max_obs:
                    dropped_obs += 1
                    continue
                kf = m.keyframes[k]
                obs_cam.append(ci)
                obs_pt.append(pt_index[mp])
                uv.append(kf.kpts_un[slot])
                r = kf.ur[slot]
                ur.append(r if r > 0 else 0.0)
                stereo.append(r > 0)
        if dropped_obs:
            print_mess(f"GBA: obs cap hit — dropped {dropped_obs} of "
                       f"{dropped_obs + len(obs_cam)} observations",
                       Level.NORMAL)
        n_obs = len(obs_cam)
        if n_obs < 50:
            return None

        def pad(a, n, fill=0, dtype=None):
            a = np.asarray(a, dtype)
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        C = _bucket(len(kids))
        max_pts = _bucket(len(pt_ids), lo=256)
        max_obs = _bucket(n_obs, lo=1024)
        fixed = np.ones(C, bool)
        cam_valid = np.zeros(C, bool)
        R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
        t = np.zeros((C, 3), np.float32)
        for k, i in index.items():
            kf = m.keyframes[k]
            R[i] = kf.R
            t[i] = kf.t
            cam_valid[i] = True
            fixed[i] = k == m.kf_origin
        prob = ba_mod.BAProblem(
            R=jnp.asarray(R), t=jnp.asarray(t),
            fixed=jnp.asarray(fixed), cam_valid=jnp.asarray(cam_valid),
            X=jnp.asarray(pad(m.points.pos[pt_ids], max_pts)),
            p_valid=jnp.asarray(pad(np.ones(len(pt_ids), bool), max_pts, False)),
            obs_cam=jnp.asarray(pad(obs_cam, max_obs, 0, np.int32)),
            obs_pt=jnp.asarray(pad(obs_pt, max_obs, 0, np.int32)),
            uv=jnp.asarray(pad(uv, max_obs, 0.0, np.float32)),
            ur=jnp.asarray(pad(ur, max_obs, 0.0, np.float32)),
            stereo=jnp.asarray(pad(stereo, max_obs, False)),
            valid=jnp.asarray(pad(np.ones(n_obs, bool), max_obs, False)),
            inv_sigma2=jnp.ones(max_obs, jnp.float32),
        )
        return prob, index, pt_ids, fixed, n_obs

    def _apply_gba(self, res, index, pt_ids, fixed, propagate: bool = False):
        """Write GBA results back. With propagate=True (the budgeted path's
        final tick), keyframes and map points created AFTER the problem was
        captured are corrected through the spanning tree / their
        first-observing keyframe — RunGlobalBundleAdjustment's catch-up
        (/root/reference/src/LoopClosing.cc:2369-2511)."""
        import jax

        m = self.map
        res = jax.device_get(res)
        R1, t1, X1 = np.asarray(res.R), np.asarray(res.t), np.asarray(res.X)
        if not propagate:
            for k, i in index.items():
                if not fixed[i]:
                    kf = m.keyframes[k]
                    kf.R = lie.np_normalize_rotation(R1[i])
                    kf.t = t1[i]
            m.points.pos[pt_ids] = X1[: len(pt_ids)]
            m.change_index += 1
            return
        # pre-apply ("BefGBA") poses of every current keyframe
        cur = {k: (kf.R.copy(), kf.t.copy()) for k, kf in m.keyframes.items()}
        new_pose = {}
        for k, i in index.items():
            if k not in m.keyframes:
                continue  # culled during the session
            new_pose[k] = (cur[k] if fixed[i]
                           else (lie.np_normalize_rotation(R1[i]), t1[i]))
        # keyframes created during the session: T_new = T_rel * T_anc_new
        # where T_rel = T_cur * T_anc_cur^-1 over the spanning tree
        for k in sorted(m.keyframes):
            if k in new_pose:
                continue
            chain = [k]
            anc = m.keyframes[k].parent
            hops = 0
            while (anc >= 0 and anc in m.keyframes and anc not in new_pose
                   and hops < 1000):
                chain.append(anc)
                anc = m.keyframes[anc].parent
                hops += 1
            if anc not in new_pose:
                continue  # detached from the optimized graph: leave as-is
            for kk in reversed(chain):
                Rk, tk = cur[kk]
                p = m.keyframes[kk].parent
                Rp, tp = cur[p]
                Rn, tn = new_pose[p]
                R_rel = Rk @ Rp.T
                t_rel = tk - R_rel @ tp
                new_pose[kk] = (lie.np_normalize_rotation(R_rel @ Rn),
                                (R_rel @ tn + t_rel).astype(np.float32))
        # points optimized by the session take their GBA positions; points
        # created meanwhile ride their first-observing KF's correction
        in_gba = set(pt_ids)
        pt_arr = np.asarray(pt_ids)
        alive_mask = m.points.alive[pt_arr]
        m.points.pos[pt_arr[alive_mask]] = X1[: len(pt_ids)][alive_mask]
        for mp, obs in m.obs.items():
            if mp in in_gba or not m.points.alive[mp] or not obs:
                continue
            ref_k = min(obs)
            if ref_k not in new_pose or ref_k not in cur:
                continue
            R_o, t_o = cur[ref_k]
            R_n, t_n = new_pose[ref_k]
            Xc = R_o @ m.points.pos[mp] + t_o
            m.points.pos[mp] = (R_n.T @ (Xc - t_n)).astype(np.float32)
        for k, (R_n, t_n) in new_pose.items():
            kf = m.keyframes.get(k)
            if kf is not None:
                kf.R = R_n
                kf.t = np.asarray(t_n, np.float32)
        m.change_index += 1

    # ---------------------------------------------------------- map merging

    def _verify_and_merge(self, kid: int, ckid: int, cmap_id: int) -> bool:
        """Cross-map candidate: verify a Sim3 between the active map's KF and
        a stored map's KF, then weld the maps (MergeLocal role,
        /root/reference/src/LoopClosing.cc:1215-1782)."""
        m_new = self.map
        m_old = self.atlas.maps[cmap_id]
        kf1 = m_new.keyframes.get(kid)
        kf2 = m_old.keyframes.get(ckid)
        if kf1 is None or kf2 is None:
            return False

        b1 = kf1.mp_ids >= 0
        b2 = kf2.mp_ids >= 0
        v1 = b1 & kf1.valid & m_new.points.alive[np.where(b1, kf1.mp_ids, 0)]
        v2 = b2 & kf2.valid & m_old.points.alive[np.where(b2, kf2.mp_ids, 0)]
        binary = m_new.desc_dim > 64
        res = matching.match_general(
            jnp.asarray(kf1.desc), jnp.asarray(v1),
            jnp.asarray(kf2.desc), jnp.asarray(v2),
            max_dist=jnp.float32(
                matching.ORB_TH_LOW if binary else matching.TH_LOW * 6
            ),
            ratio=0.75, binary=binary,
        )
        idx = np.asarray(res.idx)
        mask = np.asarray(res.mask)
        mask = matching.rotation_consistency_filter(
            kf1.angle, kf2.angle, np.clip(idx, 0, None), mask
        )
        slots1 = np.nonzero(mask)[0]
        slots2 = idx[slots1]
        if len(slots1) < 20:
            return False
        Xc1, Xc2, uv1, uv2, valid = self._sim3_pairs_arrays(
            m_new, kf1, m_old, kf2, slots1, slots2)
        rs = sim3_mod.sim3_ransac(
            Xc1, Xc2, uv1, uv2, valid, self.cam,
            jax.random.PRNGKey(kid + 7777),
            min_inliers=15, fix_scale=self.fix_scale,
        )
        if not bool(rs.success):
            return False
        s, R, t, inl, n_inl = sim3_mod.optimize_sim3(
            rs.s, rs.R, rs.t, Xc1, Xc2, uv1, uv2, valid, self.cam,
            fix_scale=self.fix_scale,
        )
        if int(n_inl) < 20:
            return False
        # SearchBySim3 extension + re-optimization (also used on the merge
        # path: DetectCommonRegionsFromBoW serves both, LoopClosing.cc:769)
        ext1, ext2 = self._search_by_sim3(m_new, kf1, m_old, kf2,
                                          slots1, slots2, s, R, t)
        if len(ext1) > len(slots1):
            Xc1, Xc2, uv1, uv2, valid = self._sim3_pairs_arrays(
                m_new, kf1, m_old, kf2, ext1, ext2)
            s, R, t, inl, n_inl = sim3_mod.optimize_sim3(
                s, R, t, Xc1, Xc2, uv1, uv2, valid, self.cam,
                fix_scale=self.fix_scale,
            )
            if int(n_inl) < 20:
                return False
        self.merge_maps(m_new, m_old, kid, ckid,
                        float(s), np.asarray(R), np.asarray(t))
        return True

    def merge_maps(self, m_new, m_old, kid, ckid, s12, R12, t12):
        """Weld the active (new) map into the matched (old) map: express all
        new-map geometry in the old map's world frame via the verified Sim3,
        move keyframes/points over (id-shifted), fuse the welding-region
        duplicates, then a welding BA (MergeLocal semantics — the old map
        becomes the active map).

        Derivation: X_cam_kid = S12(X_cam_ckid) and X_cam_kid = S_kid(X_w_new)
        => X_w_new = S_kid^{-1} S12 S_ckid (X_w_old) =: D(X_w_old), so
        new-map content re-expressed in world_old uses D: poses S' = S ∘ D,
        points X_old = D^{-1}(X_new).
        """
        kf1 = m_new.keyframes[kid]
        kf2 = m_old.keyframes[ckid]
        inv1 = lie.sim3_inverse(jnp.float32(1.0), jnp.asarray(kf1.R),
                                jnp.asarray(kf1.t))
        mid = lie.sim3_compose(*inv1, jnp.float32(s12), jnp.asarray(R12),
                               jnp.asarray(t12))
        sD, RD, tD = lie.sim3_compose(*mid, jnp.float32(1.0),
                                      jnp.asarray(kf2.R), jnp.asarray(kf2.t))
        sD, RD, tD = float(sD), np.asarray(RD), np.asarray(tD)
        sDi, RDi, tDi = lie.sim3_inverse(jnp.float32(sD), jnp.asarray(RD),
                                         jnp.asarray(tD))
        sDi, RDi, tDi = float(sDi), np.asarray(RDi), np.asarray(tDi)

        kid_offset = (max(m_old.keyframes) + 1) if m_old.keyframes else 0
        mp_remap = {}
        # move points: X_old_world = D^{-1}(X_new_world)
        for mp in list(m_new.obs.keys()):
            if not m_new.points.alive[mp]:
                continue
            Xn = m_new.points.pos[mp]
            Xo = sDi * (RDi @ Xn) + tDi
            new_id = m_old.points.alloc(
                Xo.astype(np.float32), m_new.points.desc[mp],
                first_kf=-1, angle=float(m_new.points.angle[mp]),
            )
            m_old.obs[new_id] = {}
            mp_remap[mp] = new_id
        # move keyframes: pose S' = S_kf ∘ D, stored as SE3 [R | t/s]
        for okid in sorted(m_new.keyframes):
            kf = m_new.keyframes[okid]
            sP, RP, tP = lie.sim3_compose(
                jnp.float32(1.0), jnp.asarray(kf.R), jnp.asarray(kf.t),
                jnp.float32(sD), jnp.asarray(RD), jnp.asarray(tD),
            )
            sP, RP, tP = float(sP), np.asarray(RP), np.asarray(tP)
            kf.R = lie.np_normalize_rotation(RP)
            kf.t = (tP / max(sP, 1e-9)).astype(np.float32)
            kf.kid = okid + kid_offset
            kf.mp_ids = np.array(
                [mp_remap.get(int(m), -1) if m >= 0 else -1 for m in kf.mp_ids],
                np.int64,
            )
            kf.parent = kf.parent + kid_offset if kf.parent >= 0 else -1
            kf.children = {c + kid_offset for c in kf.children}
            # inertial chain travels with the keyframe (MergeLocal2,
            # /root/reference/src/LoopClosing.cc:1783: ApplyScaledRotation
            # with bScaleVel — world velocities rotate/scale like position
            # derivatives; biases are body-frame and unchanged;
            # preintegrations are body-frame and unchanged)
            if kf.prev_kf >= 0:
                kf.prev_kf = kf.prev_kf + kid_offset
            if kf.vel is not None:
                kf.vel = (sDi * (RDi @ kf.vel)).astype(np.float32)
            m_old.keyframes[kf.kid] = kf
            m_old.covis.setdefault(kf.kid, {})
            for slot in np.nonzero(kf.mp_ids >= 0)[0]:
                m_old.obs.setdefault(int(kf.mp_ids[slot]), {})[kf.kid] = int(slot)
        # link the welding pair in the spanning structure
        new_kid = kid + kid_offset
        m_old.keyframes[new_kid].loop_edges.add(ckid)
        kf2.merge_edges.add(new_kid)
        for okid in sorted(m_new.keyframes):
            m_old.update_connections(okid + kid_offset)
            mp_list = m_old.keyframes[okid + kid_offset].mp_ids
            for mp in mp_list[mp_list >= 0]:
                m_old.update_point(int(mp))
        # retrieval: re-tag moved KFs to the old map with their new ids
        self.retrieval.retag_map(m_new.map_id, m_old.map_id, kid_offset)
        # culled-KF trajectory anchors travel with the weld (id-shifted) so
        # frames referencing a culled KF of the dissolved map stay resolvable
        for ckid, (parent, R_cp, t_cp) in m_new.culled.items():
            m_old.culled[ckid + kid_offset] = (
                parent + kid_offset if parent >= 0 else -1, R_cp, t_cp
            )

        # inertial bookkeeping (MergeLocal2, LoopClosing.cc:1858-1878): the
        # welded map keeps the destination frame. If only the moved map was
        # IMU-initialized, its gravity alignment did not survive the weld —
        # clear the init flags so LocalMapping's schedule re-runs
        # InertialOptimization on the (intact) chain in the merged frame.
        if m_new.imu_initialized and not m_old.imu_initialized:
            m_old.imu_initialized = False
            m_old.imu_ba1 = False
            m_old.imu_ba2 = False
            m_old.imu_bg = m_new.imu_bg.copy()
            m_old.imu_ba = m_new.imu_ba.copy()
        elif m_new.imu_initialized:
            # both inertial: adopt the active map's (fresher) bias estimate
            m_old.imu_bg = m_new.imu_bg.copy()
            m_old.imu_ba = m_new.imu_ba.copy()
        # fuse duplicate landmarks around the weld: old-map welding-window
        # points projected into the moved KF AND its covisibles, old side
        # winning on conflict (SearchAndFuse over vpCurrentConnectedKFs,
        # /root/reference/src/LoopClosing.cc:1489-1529)
        self.map = m_old
        weld_group = [new_kid] + m_old.covisible_kfs(new_kid)
        n_weld_fused = self._search_and_fuse(weld_group, ckid)
        if n_weld_fused:
            print_mess(f"weld fusion bound {n_weld_fused} landmark "
                       f"duplicates", Level.VERBOSE)
        if m_old.imu_initialized and self.welding_iba is not None:
            # MergeInertialBA (LoopClosing.cc:2051 -> Optimizer.cc:3948):
            # joint visual-inertial refinement of the two temporal windows
            # around the weld instead of a visual GBA (the inertial chain
            # must stay consistent)
            self.welding_iba(new_kid, ckid)
        elif self.run_gba:
            self.global_bundle_adjust()
        # atlas: old map becomes active; new map dissolves. The remap record
        # lets trajectory resolution chase frames into the welded map.
        self.atlas.maps.pop(m_new.map_id, None)
        self.atlas.active_id = m_old.map_id
        self.atlas.remaps[m_new.map_id] = (m_old.map_id, kid_offset)
        self.merged.append((m_new.map_id, m_old.map_id))
        m_old.change_index += 1
        return kid_offset

    def _search_and_fuse(self, group, ckid: int) -> int:
        """Loop fusion (SearchAndFuse, /root/reference/src/LoopClosing.cc:
        1120-1140 + ORBmatcher::Fuse(Scw) ORBmatcher.cc:1640): project the
        loop side's landmarks (matched KF + its covisibles) into every
        corrected-group keyframe with a tight radius; a matched slot that
        already holds a landmark is REPLACED by the loop landmark (the loop
        side is trusted, MapPoint::Replace direction pRep->Replace(pLoopMP)),
        an empty slot gains an observation. This is what ties a revisit
        keyframe's freshly-triangulated duplicate landmarks back to the old
        map — without it those duplicates are single-observation points
        that constrain nothing in the subsequent GBA. Returns the number of
        fused/bound slots."""
        m = self.map
        loop_mps = []
        for k in [ckid] + m.covisible_kfs(ckid):
            kf = m.keyframes.get(k)
            if kf is None:
                continue
            loop_mps.extend(int(x) for x in kf.mp_ids[kf.mp_ids >= 0])
        loop_mps = [p for p in dict.fromkeys(loop_mps) if m.points.alive[p]]
        if len(loop_mps) > 4096:
            print_mess(f"SearchAndFuse cap hit: 4096 of {len(loop_mps)} "
                       f"loop points", Level.VERBOSE)
            loop_mps = loop_mps[:4096]
        if not loop_mps:
            return 0
        binary = m.desc_dim > 64
        fused = 0
        for gk in group:
            kf = m.keyframes.get(gk)
            if kf is None:
                continue
            # recompute aliveness each keyframe: replace_point retires
            # loop-side duplicates as we fuse
            alive = m.points.alive[loop_mps]
            pos = m.points.pos[loop_mps]
            Xc = pos @ kf.R.T + kf.t
            z = Xc[:, 2]
            vis = (z > 0.05) & alive
            zs = np.where(z > 0.05, z, 1.0)
            u = float(self.cam.fx) * Xc[:, 0] / zs + float(self.cam.cx)
            v = float(self.cam.fy) * Xc[:, 1] / zs + float(self.cam.cy)
            uv = np.stack([u, v], -1).astype(np.float32)
            res = matching.search_by_projection(
                jnp.asarray(uv), jnp.asarray(m.points.desc[loop_mps]),
                jnp.asarray(vis),
                jnp.asarray(kf.kpts_un), jnp.asarray(kf.desc),
                jnp.asarray(kf.valid),
                radius=4.0,
                max_dist=jnp.float32(
                    matching.ORB_TH_LOW if binary else matching.TH_LOW * 6
                ),
                ratio=0.9, binary=binary,
            )
            idx = np.asarray(res.idx)
            mask = np.asarray(res.mask)
            for i in np.nonzero(mask)[0]:
                lmp = loop_mps[i]
                if not m.points.alive[lmp]:
                    continue
                slot = int(idx[i])
                cur = int(kf.mp_ids[slot])
                if cur == lmp:
                    continue
                if cur >= 0 and m.points.alive[cur]:
                    m.replace_point(cur, lmp)
                    fused += 1
                elif gk not in m.obs.get(lmp, {}):
                    m.add_observation(lmp, gk, slot, update_links=False)
                    fused += 1
        if fused:
            # fusion creates the loop-region covisibilities the essential
            # graph consumes (LoopConnections, LoopClosing.cc:1142-1165)
            for gk in group:
                if gk in m.keyframes:
                    m.update_connections(gk)
        return fused

