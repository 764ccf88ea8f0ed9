"""LocalMapping: map maintenance after each new keyframe.

Role of /root/reference/src/LocalMapping.cc (Run loop :64-282): process the
new KF (associations + covisibility), cull recent map points, triangulate
new points with covisible neighbors, fuse duplicates, run local BA, cull
redundant KFs. Runs synchronously after tracking inserts a KF (design note
in slam/system.py).

This module currently implements: recent-point culling, neighbor
triangulation, fuse, and keyframe culling. Local BA is wired in when
optim/local_ba.py lands (construction order step 6, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..ops import camera as camera_ops
from ..ops import geometry, lie, matching
from ..optim import local_ba as ba

# static buckets for the local-BA problem (one XLA graph for all windows)
BA_MAX_CAMS = 32
BA_MAX_PTS = 4096
BA_MAX_OBS = 16384


class LocalMapping:
    def __init__(self, slam_map, cam, bf: float = 40.0,
                 enable_ba: bool = True,
                 profile: matching.MatchProfile = matching.XFEAT_PROFILE):
        self.map = slam_map
        self.cam = cam
        self.bf = bf
        self.enable_ba = enable_ba
        self.profile = profile
        # float descriptors need looser absolute thresholds than trained
        # weights would; binary (ORB) uses the reference values directly
        self.tri_max_dist = profile.th_low if profile.binary else profile.th_low * 6
        self.fuse_max_dist = self.tri_max_dist
        # mp -> kf id at creation, for the culling window
        self.recent_points: Dict[int, int] = {}

    def process_keyframe(self, kid: int):
        self._cull_map_points(kid)
        self._create_new_points(kid)
        self._fuse_neighbors(kid)
        if self.enable_ba and self.map.num_keyframes() > 2:
            self._local_ba(kid)
        self._cull_keyframes(kid)

    # -- LocalBundleAdjustment (/root/reference/src/Optimizer.cc:1116) ------

    def _local_ba(self, kid: int):
        """Build the padded covisibility-window problem, run the batched LM
        kernel (optim/local_ba.py), write back poses/points, drop outlier
        observations — the apply-under-map-mutex step of the reference
        (Optimizer.cc:1405-1500) is trivial here (single writer)."""
        kf0 = self.map.keyframes.get(kid)
        if kf0 is None:
            return
        opt_ids = [kid] + self.map.covisible_kfs(kid, BA_MAX_CAMS // 2 - 1)
        opt_set = set(opt_ids)
        # points seen by opt KFs
        pt_ids: List[int] = []
        seen = set()
        for k in opt_ids:
            kf = self.map.keyframes[k]
            for mp in kf.mp_ids[kf.mp_ids >= 0]:
                mp = int(mp)
                if mp not in seen and self.map.points.alive[mp]:
                    seen.add(mp)
                    pt_ids.append(mp)
        pt_ids = pt_ids[:BA_MAX_PTS]
        pt_index = {mp: i for i, mp in enumerate(pt_ids)}
        # fixed KFs: observers of local points outside the opt set
        fixed_ids: List[int] = []
        for mp in pt_ids:
            for k in self.map.obs.get(mp, {}):
                if k not in opt_set and k not in fixed_ids:
                    fixed_ids.append(k)
                    if len(opt_ids) + len(fixed_ids) >= BA_MAX_CAMS:
                        break
            if len(opt_ids) + len(fixed_ids) >= BA_MAX_CAMS:
                break
        if not fixed_ids:
            # gauge: fix the oldest KF in the window (reference pins KF0/1)
            oldest = min(opt_ids)
            opt_ids.remove(oldest)
            fixed_ids.append(oldest)
        cam_ids = opt_ids + fixed_ids
        cam_index = {k: i for i, k in enumerate(cam_ids)}
        C = len(cam_ids)

        obs_cam, obs_pt, uv, ur, stereo = [], [], [], [], []
        obs_ref = []  # (mp, kf) for writeback
        for mp in pt_ids:
            for k, slot in self.map.obs.get(mp, {}).items():
                ci = cam_index.get(k)
                if ci is None:
                    continue
                kf = self.map.keyframes[k]
                obs_cam.append(ci)
                obs_pt.append(pt_index[mp])
                uv.append(kf.kpts_un[slot])
                r = kf.ur[slot]
                ur.append(r if r > 0 else 0.0)
                stereo.append(r > 0)
                obs_ref.append((mp, k))
                if len(obs_cam) >= BA_MAX_OBS:
                    break
            if len(obs_cam) >= BA_MAX_OBS:
                break
        n_obs = len(obs_cam)
        if n_obs < 20:
            return

        def pad(a, n, fill=0, dtype=None):
            a = np.asarray(a, dtype)
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        R = np.stack([self.map.keyframes[k].R for k in cam_ids])
        t = np.stack([self.map.keyframes[k].t for k in cam_ids])
        fixed = np.zeros(C, bool)
        fixed[len(opt_ids):] = True
        # always keep the map origin fixed if present (gauge)
        if self.map.kf_origin in cam_index:
            fixed[cam_index[self.map.kf_origin]] = True

        prob = ba.BAProblem(
            R=jnp.asarray(pad(R, BA_MAX_CAMS)),
            t=jnp.asarray(pad(t, BA_MAX_CAMS)),
            fixed=jnp.asarray(pad(fixed, BA_MAX_CAMS, True)),
            cam_valid=jnp.asarray(pad(np.ones(C, bool), BA_MAX_CAMS, False)),
            X=jnp.asarray(pad(self.map.points.pos[pt_ids], BA_MAX_PTS)),
            p_valid=jnp.asarray(pad(np.ones(len(pt_ids), bool), BA_MAX_PTS, False)),
            obs_cam=jnp.asarray(pad(obs_cam, BA_MAX_OBS, 0, np.int32)),
            obs_pt=jnp.asarray(pad(obs_pt, BA_MAX_OBS, 0, np.int32)),
            uv=jnp.asarray(pad(uv, BA_MAX_OBS, 0.0, np.float32)),
            ur=jnp.asarray(pad(ur, BA_MAX_OBS, 0.0, np.float32)),
            stereo=jnp.asarray(pad(stereo, BA_MAX_OBS, False)),
            valid=jnp.asarray(pad(np.ones(n_obs, bool), BA_MAX_OBS, False)),
            inv_sigma2=jnp.ones(BA_MAX_OBS, jnp.float32),
        )
        res = ba.bundle_adjust(prob, self.cam, jnp.float32(self.bf))
        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)
        X_new = np.asarray(res.X)
        inlier = np.asarray(res.inlier)

        for k, i in cam_index.items():
            if not fixed[i]:
                kf = self.map.keyframes[k]
                kf.R = lie.np_normalize_rotation(R_new[i])
                kf.t = t_new[i]
        self.map.points.pos[pt_ids] = X_new[: len(pt_ids)]
        # drop outlier observations (Optimizer.cc:1405-1436)
        for o in np.nonzero(~inlier[:n_obs])[0]:
            mp, k = obs_ref[o]
            self.map.remove_observation(mp, k)
        for mp in pt_ids:
            if self.map.points.alive[mp]:
                self.map.update_point(mp)
        self.map.change_index += 1

    # -- MapPointCulling (/root/reference/src/LocalMapping.cc:346-385) ------

    def _cull_map_points(self, kid: int):
        for mp in list(self.recent_points):
            born = self.recent_points[mp]
            if not self.map.points.alive[mp]:
                del self.recent_points[mp]
                continue
            found_ratio = self.map.points.found[mp] / max(
                self.map.points.visible[mp], 1
            )
            age = kid - born
            if found_ratio < 0.25:
                self.map.remove_point(mp)
                del self.recent_points[mp]
            elif age >= 2 and self.map.points.n_obs[mp] <= 3:
                self.map.remove_point(mp)
                del self.recent_points[mp]
            elif age >= 3:
                del self.recent_points[mp]  # survived the probation window

    # -- CreateNewMapPoints (/root/reference/src/LocalMapping.cc:388-713) ---

    def _create_new_points(self, kid: int):
        kf1 = self.map.keyframes.get(kid)
        if kf1 is None:
            return
        neighbors = self.map.covisible_kfs(kid, 10)
        C1 = kf1.center()
        K = np.asarray(self.cam.K, np.float32)
        free1 = kf1.valid & (kf1.mp_ids < 0)
        if not free1.any():
            return
        for nkid in neighbors:
            kf2 = self.map.keyframes.get(nkid)
            if kf2 is None:
                continue
            C2 = kf2.center()
            baseline = float(np.linalg.norm(C2 - C1))
            # RGB-D gate: baseline must exceed 1% of median scene depth
            # (reference uses mb vs median depth, LocalMapping.cc:439-455)
            med_depth = float(np.median(kf2.depth[kf2.depth > 0])) if (
                kf2.depth > 0
            ).any() else 4.0
            if baseline < 0.01 * med_depth:
                continue
            free2 = kf2.valid & (kf2.mp_ids < 0)
            if not free2.any():
                continue
            # epipolar-gated descriptor matching (SearchForTriangulation role,
            # /root/reference/src/ORBmatcher.cc:1092; we gate by epipolar
            # distance matrix instead of BoW buckets)
            F12 = np.asarray(
                geometry.fundamental_from_poses(
                    jnp.asarray(K), jnp.asarray(kf1.R), jnp.asarray(kf1.t),
                    jnp.asarray(K), jnp.asarray(kf2.R), jnp.asarray(kf2.t),
                )
            )
            uv1 = kf1.kpts_un
            uv2 = kf2.kpts_un
            x1 = np.concatenate([uv1, np.ones((len(uv1), 1), np.float32)], -1)
            x2 = np.concatenate([uv2, np.ones((len(uv2), 1), np.float32)], -1)
            lines = x1 @ F12  # (N1,3): epipolar line of kp1 in image 2
            num = lines @ x2.T  # (N1,N2)
            den = lines[:, 0:1] ** 2 + lines[:, 1:2] ** 2
            epi_d2 = num * num / np.maximum(den, 1e-12)
            pair_ok = epi_d2 < 3.84  # chi2(1) at 95%
            res = matching.match_general(
                jnp.asarray(kf1.desc), jnp.asarray(free1),
                jnp.asarray(kf2.desc), jnp.asarray(free2),
                max_dist=jnp.float32(self.tri_max_dist), ratio=0.8,
                pair_mask=jnp.asarray(pair_ok), binary=self.profile.binary,
            )
            idx = np.asarray(res.idx)
            mask = np.asarray(res.mask)
            mask = matching.rotation_consistency_filter(
                kf1.angle, kf2.angle, np.clip(idx, 0, None), mask
            )
            slots1 = np.nonzero(mask)[0]
            if len(slots1) == 0:
                continue
            slots2 = idx[slots1]
            P1 = np.asarray(
                geometry.projection_matrix(
                    jnp.asarray(K), jnp.asarray(kf1.R), jnp.asarray(kf1.t)
                )
            )
            P2 = np.asarray(
                geometry.projection_matrix(
                    jnp.asarray(K), jnp.asarray(kf2.R), jnp.asarray(kf2.t)
                )
            )
            X = np.asarray(
                geometry.triangulate_dlt(
                    jnp.asarray(uv1[slots1]), jnp.asarray(uv2[slots2]),
                    jnp.asarray(P1), jnp.asarray(P2),
                )
            )
            cosp = np.asarray(
                geometry.parallax_cos(jnp.asarray(X), jnp.asarray(C1), jnp.asarray(C2))
            )
            # RGB-D rule (LocalMapping.cc:550-620): triangulate only when
            # the ray parallax beats the parallax a depth measurement would
            # give (cosParallaxStereo); otherwise unproject from depth, or
            # skip entirely at near-zero parallax.
            d1 = kf1.depth[slots1]
            d2 = kf2.depth[slots2]
            cos_stereo1 = np.where(
                d1 > 0, np.cos(2.0 * np.arctan2(self.bf / float(self.cam.fx) / 2.0,
                                                np.maximum(d1, 1e-3))), 2.0)
            cos_stereo2 = np.where(
                d2 > 0, np.cos(2.0 * np.arctan2(self.bf / float(self.cam.fx) / 2.0,
                                                np.maximum(d2, 1e-3))), 2.0)
            cos_stereo = np.minimum(cos_stereo1, cos_stereo2)
            good_tri = (cosp > 0) & (cosp < 0.9998) & (cosp < cos_stereo)
            # depth fallback for low-parallax candidates
            use_d1 = ~good_tri & (d1 > 0) & (cos_stereo1 <= cos_stereo2)
            use_d2 = ~good_tri & ~use_d1 & (d2 > 0)
            if use_d1.any():
                ray1 = np.concatenate(
                    [(uv1[slots1] - [float(self.cam.cx), float(self.cam.cy)])
                     / [float(self.cam.fx), float(self.cam.fy)],
                     np.ones((len(slots1), 1), np.float32)], -1)
                Xd1 = (ray1 * d1[:, None] - kf1.t) @ kf1.R
                X = np.where(use_d1[:, None], Xd1, X)
            if use_d2.any():
                ray2 = np.concatenate(
                    [(uv2[slots2] - [float(self.cam.cx), float(self.cam.cy)])
                     / [float(self.cam.fx), float(self.cam.fy)],
                     np.ones((len(slots2), 1), np.float32)], -1)
                Xd2 = (ray2 * d2[:, None] - kf2.t) @ kf2.R
                X = np.where(use_d2[:, None], Xd2, X)
            # acceptance gates: chirality + reprojection below
            Xc1 = X @ kf1.R.T + kf1.t
            Xc2 = X @ kf2.R.T + kf2.t
            ok = (Xc1[:, 2] > 0.05) & (Xc2[:, 2] > 0.05)
            ok &= good_tri | use_d1 | use_d2
            for which, (Xc, uv, ss) in enumerate(
                [(Xc1, uv1, slots1), (Xc2, uv2, slots2)]
            ):
                z = np.maximum(Xc[:, 2], 1e-6)
                u = float(self.cam.fx) * Xc[:, 0] / z + float(self.cam.cx)
                v = float(self.cam.fy) * Xc[:, 1] / z + float(self.cam.cy)
                err2 = (u - uv[ss][:, 0]) ** 2 + (v - uv[ss][:, 1]) ** 2
                ok &= err2 < 5.991
            for i in np.nonzero(ok)[0]:
                s1, s2 = int(slots1[i]), int(slots2[i])
                if kf1.mp_ids[s1] >= 0 or kf2.mp_ids[s2] >= 0:
                    continue
                mp = self.map.create_point(
                    X[i].astype(np.float32), kf1.desc[s1], kid,
                    float(kf1.angle[s1]),
                )
                self.map.add_observation(mp, kid, s1, update_links=False)
                self.map.add_observation(mp, nkid, s2, update_links=False)
                self.map.update_point(mp)
                self.recent_points[mp] = kid
            free1 = kf1.valid & (kf1.mp_ids < 0)
        self.map.update_connections(kid)

    # -- SearchInNeighbors / Fuse (/root/reference/src/LocalMapping.cc:714) -

    def _fuse_neighbors(self, kid: int):
        kf1 = self.map.keyframes.get(kid)
        if kf1 is None:
            return
        neighbors = self.map.covisible_kfs(kid, 10)
        # project this KF's points into neighbors and merge duplicates
        own = kf1.mp_ids[kf1.mp_ids >= 0]
        if len(own) == 0:
            return
        pos = self.map.points.pos[own]
        desc = self.map.points.desc[own]
        alive = self.map.points.alive[own]
        for nkid in neighbors:
            kf2 = self.map.keyframes.get(nkid)
            if kf2 is None:
                continue
            Xc = pos @ kf2.R.T + kf2.t
            z = Xc[:, 2]
            vis = z > 0.05
            zs = np.where(vis, z, 1.0)
            u = float(self.cam.fx) * Xc[:, 0] / zs + float(self.cam.cx)
            v = float(self.cam.fy) * Xc[:, 1] / zs + float(self.cam.cy)
            uv = np.stack([u, v], -1).astype(np.float32)
            res = matching.search_by_projection(
                jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(alive & vis),
                jnp.asarray(kf2.kpts_un), jnp.asarray(kf2.desc),
                jnp.asarray(kf2.valid),
                radius=3.0, max_dist=jnp.float32(self.fuse_max_dist),
                ratio=0.9, binary=self.profile.binary,
            )
            idx = np.asarray(res.idx)
            mask = np.asarray(res.mask)
            for m in np.nonzero(mask)[0]:
                mp1 = int(own[m])
                slot2 = int(idx[m])
                mp2 = int(kf2.mp_ids[slot2])
                if not self.map.points.alive[mp1]:
                    continue
                if mp2 >= 0 and self.map.points.alive[mp2]:
                    # keep the one with more observations
                    if self.map.points.n_obs[mp2] >= self.map.points.n_obs[mp1]:
                        self.map.replace_point(mp1, mp2)
                    else:
                        self.map.replace_point(mp2, mp1)
                elif mp2 < 0:
                    if nkid not in self.map.obs.get(mp1, {}):
                        self.map.add_observation(mp1, nkid, slot2)
        self.map.update_connections(kid)

    # -- KeyFrameCulling (/root/reference/src/LocalMapping.cc:902-1054) -----

    def _cull_keyframes(self, kid: int):
        """Remove covisible KFs whose map points are >=90% seen by >=3 other
        KFs (single-octave simplification of the scale-band check)."""
        for ckid in self.map.covisible_kfs(kid):
            kf = self.map.keyframes.get(ckid)
            if kf is None or ckid == self.map.kf_origin or ckid == kid:
                continue
            mps = kf.mp_ids[kf.mp_ids >= 0]
            if len(mps) == 0:
                continue
            redundant = 0
            for mp in mps:
                if self.map.points.n_obs[int(mp)] >= 4:  # this KF + 3 others
                    redundant += 1
            if redundant > 0.9 * len(mps):
                self.map.remove_keyframe(ckid)
