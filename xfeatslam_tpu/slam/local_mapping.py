"""LocalMapping: map maintenance after each new keyframe.

Role of /root/reference/src/LocalMapping.cc (Run loop :64-282): process the
new KF (associations + covisibility), cull recent map points, triangulate
new points with covisible neighbors, fuse duplicates, run local BA, cull
redundant KFs. Runs synchronously after tracking inserts a KF (design note
in slam/system.py).

Implements: recent-point culling, neighbor triangulation with the RGB-D
parallax-vs-depth rule, 2-hop fuse, budgeted/abortable local BA
(optim/local_ba.py via tick()), the IMU initialization schedule
(init -> VIBA1 -> VIBA2 -> mono ScaleRefinement), joint visual-inertial
window BA (optim/viba.py), and (inertial-aware) keyframe culling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as camera_ops
from ..ops import geometry, imu as imu_ops, lie, matching
from ..optim import local_ba as ba

# static buckets for the local-BA problem (one XLA graph for all windows)
BA_MAX_CAMS = 32
BA_MAX_PTS = 4096
BA_MAX_OBS = 16384
# inertial window buckets (LocalInertialBA uses ~10 temporal KFs,
# /root/reference/src/Optimizer.cc:2383)
IBA_MAX_KFS = 8  # temporal chain window
IBA_MAX_KFS_TOTAL = 16  # chain + fixed out-of-window observers
# MergeInertialBA: 2*Nd=12 free states + 2 window anchors + covisible fixed
# observers (the reference allows up to maxCovKF=30, Optimizer.cc:3956;
# merges are rare so the one-off compile at this bucket is acceptable)
MERGE_IBA_SLOTS = 24
IBA_MAX_PTS = 2048
IBA_MAX_OBS = 4096
# FullInertialBA backstops (whole-chain mode buckets to powers of two up to
# these; hitting them is LOGGED, never silent)
FIBA_MAX_PTS = 16384
FIBA_MAX_OBS = 65536


def _bucket(n: int, lo: int) -> int:
    """Round n up to a power of two >= lo (bounded set of jit signatures)."""
    return max(lo, 1 << max(0, int(n) - 1).bit_length())


class LocalMapping:
    def __init__(self, slam_map, cam, bf: float = 40.0,
                 enable_ba: bool = True,
                 profile: matching.MatchProfile = matching.XFEAT_PROFILE,
                 imu_calib: imu_ops.ImuCalib = None, mono: bool = False,
                 imu_init_time: float = 1.0, viba1_time: float = 5.0,
                 viba2_time: float = 15.0, imu_min_kfs: int = 6):
        self.map = slam_map
        self.cam = cam
        self.bf = bf
        self.enable_ba = enable_ba
        self.profile = profile
        # inertial initialization schedule (LocalMapping::Run,
        # /root/reference/src/LocalMapping.cc:181-242: first init, then
        # VIBA1 at tinit>5s, VIBA2 at tinit>15s)
        self.imu_calib = imu_calib
        self.mono = mono
        # mono scale is weakly observable from short gentle chains — the
        # reference waits for 10 KFs / 2 s before the first mono inertial
        # init (LocalMapping.cc:1190-1210 mTinit/minTime)
        self.imu_init_time = max(imu_init_time, 2.0) if mono else imu_init_time
        self.viba1_time = viba1_time
        self.viba2_time = viba2_time
        self.imu_min_kfs = max(imu_min_kfs, 10) if mono else imu_min_kfs
        # (s, R_wg) the system must forward to tracking after an IMU init
        # rescaled the map (Tracking::UpdateFrameIMU role)
        self.pending_map_transform = None
        # debug record of each inertial-init/refinement solve, consumed by
        # System.save_debug_data (mInitSect/mScale/mRwg/mCostTime role,
        # /root/reference/src/System.cc:1265-1303)
        self.init_sect = 0
        self.init_debug = []  # [(sect, scale, R_wg (3,3), cost, n_kfs)]
        # float descriptors need looser absolute thresholds than trained
        # weights would; binary (ORB) uses the reference values directly
        self.tri_max_dist = profile.th_low if profile.binary else profile.th_low * 6
        self.fuse_max_dist = self.tri_max_dist
        # mp -> kf id at creation, for the culling window
        self.recent_points: Dict[int, int] = {}
        # budgeted local BA: after the robust first stage, this many extra
        # rounds of ba_round_iters LM iterations run one-per-frame via
        # tick() instead of blocking the keyframe's frame (same total
        # budget as the synchronous (5,10) schedule); 0 = fully synchronous
        self.ba_budget_rounds = 2
        self.ba_round_iters = 5
        self._ba_session = None

    def process_keyframe(self, kid: int):
        # a new KF supersedes any in-flight budgeted BA session (the
        # reference's mbAbortBA, LocalMapping.cc:103: tracking enqueueing a
        # KF interrupts the running local BA)
        self._ba_session = None
        self._cull_map_points(kid)
        self._create_new_points(kid)
        self._fuse_neighbors(kid)
        if self.enable_ba and self.map.num_keyframes() > 2:
            if self.imu_calib is not None and self.map.imu_initialized:
                self._local_inertial_ba(kid)  # joint states+landmarks
            else:
                self._local_ba(kid)
        if self.imu_calib is not None:
            self._imu_step(kid)
        self._cull_keyframes(kid)

    def tick(self):
        """Run one budgeted round of the in-flight local-BA session (called
        every frame that did NOT insert a keyframe). This is the synchronous
        re-design of the reference's background LBA thread: the same total
        iteration budget, spread over the frames between keyframes, and
        aborted when a new keyframe arrives — so no single frame stalls on a
        full solve (SURVEY.md §7 hard-part 2)."""
        s = self._ba_session
        if s is None:
            return
        prob, obs_ref, cam_index, fixed, pt_ids, n_obs, rounds_left, chg = s
        if self.map.change_index != chg:
            # the map moved under the session (IMU init rescale, loop
            # correction, merge): the captured poses/points are stale and
            # applying them would UNDO the transform — abort
            self._ba_session = None
            return
        res = ba.bundle_adjust(prob, self.cam, jnp.float32(self.bf),
                               stage_iters=(0, self.ba_round_iters))
        prob = prob._replace(R=res.R, t=res.t, X=res.X)
        rounds_left -= 1
        self._apply_ba(res, obs_ref, cam_index, fixed, pt_ids, n_obs,
                       final=rounds_left <= 0)
        self._ba_session = None if rounds_left <= 0 else (
            prob, obs_ref, cam_index, fixed, pt_ids, n_obs, rounds_left,
            self.map.change_index,
        )

    # -- LocalBundleAdjustment (/root/reference/src/Optimizer.cc:1116) ------

    def _local_ba(self, kid: int, fix_cameras: bool = False):
        """Build the padded covisibility-window problem, run the batched LM
        kernel (optim/local_ba.py), write back poses/points, drop outlier
        observations — the apply-under-map-mutex step of the reference
        (Optimizer.cc:1405-1500) is trivial here (single writer).

        fix_cameras: landmark-only refinement (the visual half that
        alternates with the inertial state solve after IMU init)."""
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
        if len(pt_ids) > BA_MAX_PTS:
            from ..utils import verbose

            verbose.print_mess(
                f"local BA point cap hit: {BA_MAX_PTS} of "
                f"{len(pt_ids)} points", verbose.Level.VERBOSE)
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
                from ..utils import verbose

                verbose.print_mess(
                    f"local BA observation cap hit: {BA_MAX_OBS}",
                    verbose.Level.VERBOSE)
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
        if fix_cameras:
            fixed[:] = True
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
        if self.ba_budget_rounds > 0 and not fix_cameras:
            # budgeted/interleaved: robust first stage now (with the
            # between-stage chi2 prune), remaining rounds run one per frame
            # via tick() and abort on the next keyframe
            res = ba.bundle_adjust(prob, self.cam, jnp.float32(self.bf),
                                   stage_iters=(5, 0))
            self._apply_ba(res, obs_ref, cam_index, fixed, pt_ids, n_obs,
                           final=False)
            prob = prob._replace(R=res.R, t=res.t, X=res.X)
            self._ba_session = (prob, obs_ref, cam_index, fixed, pt_ids,
                                n_obs, self.ba_budget_rounds,
                                self.map.change_index)
        else:
            res = ba.bundle_adjust(prob, self.cam, jnp.float32(self.bf))
            self._apply_ba(res, obs_ref, cam_index, fixed, pt_ids, n_obs,
                           final=True)

    def _apply_ba(self, res, obs_ref, cam_index, fixed, pt_ids, n_obs,
                  final: bool):
        """Write back poses/points; on the final round also drop outlier
        observations (Optimizer.cc:1405-1436)."""
        import jax

        res = jax.device_get(res)
        R_new = res.R
        t_new = res.t
        X_new = res.X
        for k, i in cam_index.items():
            if not fixed[i]:
                kf = self.map.keyframes.get(k)
                if kf is not None:
                    kf.R = lie.np_normalize_rotation(R_new[i])
                    kf.t = t_new[i]
        alive = self.map.points.alive[pt_ids]
        ids = np.asarray(pt_ids)
        self.map.points.pos[ids[alive]] = X_new[: len(pt_ids)][alive]
        if final:
            inlier = res.inlier
            for o in np.nonzero(~inlier[:n_obs])[0]:
                mp, k = obs_ref[o]
                self.map.remove_observation(mp, k)
            for mp in pt_ids:
                if self.map.points.alive[mp]:
                    self.map.update_point(mp)
        self.map.change_index += 1

    # -- IMU initialization schedule (LocalMapping.cc:181-242,1173,1429) ----

    def _kf_chain(self, kid: int):
        """Temporal keyframe chain ending at kid (prev_kf links), oldest
        first."""
        chain = []
        k = kid
        while k is not None and k >= 0 and k in self.map.keyframes:
            chain.append(k)
            k = self.map.keyframes[k].prev_kf
        return chain[::-1]

    def _imu_step(self, kid: int):
        kf = self.map.keyframes.get(kid)
        if kf is None:
            return
        chain = self._kf_chain(kid)
        if len(chain) < 3:
            return
        span = kf.timestamp - self.map.keyframes[chain[0]].timestamp
        m = self.map
        if not m.imu_initialized:
            if len(chain) >= self.imu_min_kfs and span >= self.imu_init_time:
                # first init (InitializeIMU(1e2, 1e6/1e5),
                # LocalMapping.cc:1173): strong bias priors
                self._initialize_imu(chain, prior_g=1e2,
                                     prior_a=1e6 if self.mono else 1e5)
        else:
            # the VIBA stages are independent gates, not a strict ladder —
            # a late-arriving KF past both thresholds runs both refinements.
            # Flags latch only on SUCCESS (the reference sets mbIMU_BA1/2
            # inside a completed InitializeIMU and retries otherwise)
            if not m.imu_ba1 and span >= self.viba1_time:
                # VIBA1: relax priors once the trajectory excited the IMU
                if self._initialize_imu(chain, prior_g=1.0, prior_a=1e5):
                    m.imu_ba1 = True
            if not m.imu_ba2 and m.imu_ba1 and span >= self.viba2_time:
                # VIBA2: free refinement
                if self._initialize_imu(chain, prior_g=0.0, prior_a=0.0):
                    m.imu_ba2 = True
            if self.mono and span < 50.0:
                # ScaleRefinement (LocalMapping.cc:1429 + Optimizer.cc:3389
                # InertialOptimization scale/gravity-only): with biases
                # PINNED to the current estimate, scale decouples from the
                # acc-bias direction — the residual mono scale drift that a
                # free joint solve trades into the bias becomes observable.
                # Biases are NOT rewritten (update_bias=False): the solve is
                # pinned, and overwriting per-KF refined biases with the
                # stale shared estimate would undo the inertial BA's walk
                # tracking (reference solves only scale+gravity here)
                self._initialize_imu(chain, prior_g=1e8, prior_a=1e8,
                                     fiba=False, min_apply=0.005,
                                     update_bias=False)

    def _initialize_imu(self, chain, prior_g: float, prior_a: float,
                        fiba: bool = True, min_apply: float = 0.0,
                        update_bias: bool = True) -> bool:
        """InertialOptimization + ApplyScaledRotation
        (/root/reference/src/Optimizer.cc:3042, LocalMapping.cc:1173):
        estimate scale/gravity/shared-bias/velocities on fixed visual poses,
        then rotate+rescale the map so gravity is (0,0,-9.81) metric.

        Returns True when an estimate was computed and applied (callers
        latch schedule flags only then). update_bias=False runs the
        scale/gravity-only refinement without touching bias state."""
        import jax.numpy as jnp

        from ..optim import inertial as in_opt

        m = self.map
        cal = self.imu_calib
        K = len(chain)
        # pad the chain to a power-of-two bucket (one XLA graph per bucket)
        K_pad = 8
        while K_pad < K:
            K_pad *= 2
        R_wb = np.tile(np.eye(3, dtype=np.float32), (K_pad, 1, 1))
        p_wb = np.zeros((K_pad, 3), np.float32)
        for i, k in enumerate(chain):
            kf = m.keyframes[k]
            from ..optim.inertial import np_cam_to_body

            R_wb[i], p_wb[i] = np_cam_to_body(kf.R, kf.t, cal.R_bc, cal.t_bc)
        E = K_pad - 1
        dts = np.zeros(E, np.float32)
        dR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        dV = np.zeros((E, 3), np.float32)
        dP = np.zeros((E, 3), np.float32)
        J = {n: np.zeros((E, 3, 3), np.float32)
             for n in ["JRg", "JVg", "JVa", "JPg", "JPa"]}
        cov9 = np.tile(np.eye(9, dtype=np.float32), (E, 1, 1))
        e_valid = np.zeros(E, bool)
        bg0, ba0 = m.imu_bg, m.imu_ba
        for i in range(K - 1):
            kf_next = m.keyframes[chain[i + 1]]
            pre = kf_next.pre_kf
            if pre is None or kf_next.prev_kf != chain[i] or pre.dt <= 0:
                continue
            # re-express every edge at the map's common bias estimate so one
            # shared bias delta is solved across the chain
            pre_c = imu_ops.relinearize(pre, bg0, ba0)
            dts[i] = float(pre_c.dt)
            dR[i] = np.asarray(pre_c.dR)
            dV[i] = np.asarray(pre_c.dV)
            dP[i] = np.asarray(pre_c.dP)
            for n in J:
                J[n][i] = np.asarray(getattr(pre_c, n))
            cov9[i] = np.asarray(pre_c.cov)[:9, :9]
            e_valid[i] = True
        if e_valid.sum() < 2:
            return False
        res = in_opt.inertial_init(
            jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(dts),
            jnp.asarray(dR), jnp.asarray(dV), jnp.asarray(dP),
            jnp.asarray(J["JRg"]), jnp.asarray(J["JVg"]),
            jnp.asarray(J["JVa"]), jnp.asarray(J["JPg"]),
            jnp.asarray(J["JPa"]), jnp.asarray(cov9), jnp.asarray(e_valid),
            prior_g=prior_g, prior_a=prior_a, fix_scale=not self.mono,
        )
        s = float(res.scale)
        R_wg = np.asarray(res.R_wg, np.float32)
        from ..utils import verbose

        tilt = np.degrees(np.arccos(np.clip(R_wg[2, 2], -1, 1)))
        verbose.print_mess(
            f"IMU init (priorG={prior_g:g} priorA={prior_a:g}): scale={s:.4f}"
            f" gravity-tilt={tilt:.2f}deg cost={float(res.cost):.2f}",
            verbose.Level.VERBOSE,
        )
        self.init_sect += 1
        self.init_debug.append((self.init_sect, s, R_wg.copy(),
                                float(res.cost), K))
        if not np.isfinite(s) or s < 1e-2 or s > 1e2:
            verbose.print_mess("IMU init rejected: scale out of range",
                               verbose.Level.NORMAL)
            return False
        if min_apply > 0 and abs(s - 1.0) < min_apply and tilt < 0.2:
            return True  # converged: refinement below the apply threshold
            # (reference gates ApplyScaledRotation on |ds|>1e-5,
            # LocalMapping.cc:1450)
        bg = bg0 + np.asarray(res.bg, np.float32)
        ba = ba0 + np.asarray(res.ba, np.float32)
        vel = np.asarray(res.vel, np.float32)

        m.apply_scaled_rotation(R_wg, s)
        # chain velocities are metric in the OLD world orientation: rotate
        for i, k in enumerate(chain):
            kf = m.keyframes[k]
            kf.vel = (R_wg.T @ vel[i]).astype(np.float32)
            if update_bias:
                kf.bg = bg.copy()
                kf.ba = ba.copy()
        if update_bias:
            m.imu_bg = bg
            m.imu_ba = ba
        m.imu_initialized = True
        # compose with any not-yet-consumed transform
        if self.pending_map_transform is None:
            self.pending_map_transform = (s, R_wg)
        else:
            s0, R0 = self.pending_map_transform
            self.pending_map_transform = (s0 * s, (R0 @ R_wg).astype(np.float32))
        # FullInertialBA (Optimizer.cc:392, the bFIBA step of InitializeIMU):
        # joint visual-inertial BA over the whole chain with ALL states free
        # — this is what pulls a scale-drifted mono chain onto the IMU; the
        # scale/gravity fit alone leaves percent-level inconsistency that
        # otherwise diverges the per-frame visual-inertial tracking
        if fiba:
            self._local_inertial_ba(chain[-1], fix_anchor=False,
                                    full_chain=True)
        return True

    # -- LocalInertialBA (/root/reference/src/Optimizer.cc:2383) ------------

    def _local_inertial_ba(self, kid: int, window: int = IBA_MAX_KFS,
                           fix_anchor: bool = True,
                           full_chain: bool = False,
                           chain_override: Optional[List[int]] = None,
                           force_fixed: Sequence[int] = (),
                           total_slots: int = IBA_MAX_KFS_TOTAL):
        """Joint visual-inertial window BA (optim/viba.py): the temporal
        chain's body states AND the window landmarks in one solve, plus
        fixed out-of-window observer states — the reference's
        LocalInertialBA structure. (An alternating landmarks-fixed scheme
        provably diverges when the map scale disagrees with the IMU.)

        full_chain=True (+ fix_anchor=False) is FullInertialBA
        (/root/reference/src/Optimizer.cc:392-737): EVERY chain keyframe's
        state is free — the reference frees the whole map, and so does this
        path (power-of-two state buckets; landmarks/observations bucket up
        to FIBA_MAX_* with the cap LOGGED). Gravity pins roll/pitch + scale;
        the translation/yaw gauge is handled by LM damping. Run right after
        IMU initialization to pull the whole chain — including mono scale
        drift in the oldest section — onto the IMU.

        chain_override lets the caller supply the free-state list directly
        (MergeInertialBA's two temporal windows around a map weld — see
        merge_inertial_ba). IMU edges are only built between consecutive
        entries that are actually prev_kf-linked, so disjoint runs inside
        the list couple through shared landmarks, exactly like the two
        g2o windows of /root/reference/src/Optimizer.cc:3948-4035.
        force_fixed entries become fixed pose states (visual observations
        only — the reference's per-window anchor KFs and lFixedKeyFrames)."""
        import jax.numpy as jnp

        from ..optim import viba
        from ..optim.inertial import np_body_to_cam, np_cam_to_body
        from ..utils import verbose

        m = self.map
        cal = self.imu_calib
        if chain_override is not None:
            chain = list(chain_override)
        else:
            whole = self._kf_chain(kid)
            chain = whole if full_chain else whole[-window:]
        T = len(chain)
        if T < 3:
            return
        kfs = [m.keyframes[k] for k in chain]
        if any(kf.vel is None for kf in kfs):
            return
        b0g, b0a = kfs[0].bg, kfs[0].ba

        max_pts = FIBA_MAX_PTS if full_chain else IBA_MAX_PTS
        max_obs = FIBA_MAX_OBS if full_chain else IBA_MAX_OBS
        # landmarks observed by the window
        pt_ids: List[int] = []
        seen = set()
        n_seen = 0
        for kf in kfs:
            for mp in kf.mp_ids[kf.mp_ids >= 0]:
                mp = int(mp)
                if mp not in seen and m.points.alive[mp]:
                    seen.add(mp)
                    n_seen += 1
                    if len(pt_ids) < max_pts:
                        pt_ids.append(mp)
        if n_seen > len(pt_ids):
            verbose.print_mess(
                f"{'FullInertialBA' if full_chain else 'LocalInertialBA'}: "
                f"point cap hit — optimizing {len(pt_ids)} of {n_seen} "
                "landmarks", verbose.Level.NORMAL)
        pt_index = {mp: i for i, mp in enumerate(pt_ids)}
        if len(pt_ids) < 20:
            return
        # fixed observers outside the window (none in full-chain mode: the
        # chain IS the whole inertial map), ranked by how many optimized
        # landmarks each observes — the budget goes to the STRONGEST
        # covisible anchors, not whatever iteration order yields (the
        # reference fixes every observer up to maxFixKF=200,
        # Optimizer.cc:2383; here the solve is statically shaped, so the
        # slots must go to the best-anchoring states)
        chain_set = set(chain)
        fixed_ids: List[int] = [k for k in force_fixed
                                if k in m.keyframes and k not in chain_set]
        if not full_chain:
            counts: Dict[int, int] = {}
            for mp in pt_ids:
                for k in m.obs.get(mp, {}):
                    if k not in chain_set and k not in fixed_ids:
                        counts[k] = counts.get(k, 0) + 1
            budget = max(total_slots - T - len(fixed_ids), 0)
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            fixed_ids += [k for k, _ in ranked[:budget]]
            if len(counts) > budget:
                verbose.print_mess(
                    f"LocalInertialBA: fixed-observer cap — anchoring on "
                    f"the {budget} strongest of {len(counts)} "
                    "out-of-window observers", verbose.Level.VERBOSE)
        if not full_chain:
            fixed_ids = fixed_ids[:max(total_slots - T, 0)]
        cam_ids = chain + fixed_ids
        cam_index = {k: i for i, k in enumerate(cam_ids)}
        Kp = _bucket(len(cam_ids), lo=8) if full_chain else total_slots

        R_wb = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
        p_wb = np.zeros((Kp, 3), np.float32)
        v_w = np.zeros((Kp, 3), np.float32)
        bg = np.zeros((Kp, 3), np.float32)
        ba = np.zeros((Kp, 3), np.float32)
        fixed = np.ones(Kp, bool)
        state_valid = np.zeros(Kp, bool)
        for i, k in enumerate(cam_ids):
            kf = m.keyframes[k]
            R_wb[i], p_wb[i] = np_cam_to_body(kf.R, kf.t, cal.R_bc, cal.t_bc)
            if kf.vel is not None:
                v_w[i] = kf.vel
            bg[i] = kf.bg - b0g
            ba[i] = kf.ba - b0a
            state_valid[i] = True
        if fix_anchor:
            fixed[1:T] = False  # window free except the (oldest) anchor
        else:
            fixed[:T] = False  # FullInertialBA: every chain state free

        E = Kp - 1
        dts = np.zeros(E, np.float32)
        dR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        dV = np.zeros((E, 3), np.float32)
        dP = np.zeros((E, 3), np.float32)
        J = {n: np.zeros((E, 3, 3), np.float32)
             for n in ["JRg", "JVg", "JVa", "JPg", "JPa"]}
        L9 = np.zeros((E, 9, 9), np.float32)
        Lb = np.zeros((E, 6, 6), np.float32)
        e_valid = np.zeros(E, bool)
        for i in range(T - 1):
            pre = kfs[i + 1].pre_kf
            if pre is None or kfs[i + 1].prev_kf != chain[i] or pre.dt <= 0:
                continue
            pre_c = imu_ops.relinearize(pre, b0g, b0a)
            dts[i] = float(pre_c.dt)
            dR[i] = np.asarray(pre_c.dR)
            dV[i] = np.asarray(pre_c.dV)
            dP[i] = np.asarray(pre_c.dP)
            for n in J:
                J[n][i] = np.asarray(getattr(pre_c, n))
            c = np.asarray(pre_c.cov, np.float64)
            info9 = np.linalg.inv(c[:9, :9] + 1e-12 * np.eye(9))
            L9[i] = np.linalg.cholesky(0.5 * (info9 + info9.T))
            info6 = np.linalg.inv(c[9:, 9:] + 1e-10 * np.eye(6))
            Lb[i] = np.linalg.cholesky(0.5 * (info6 + info6.T))
            e_valid[i] = True
        if e_valid.sum() < 1:
            return

        obs_cam, obs_pt, uv, ur, stereo, s2 = [], [], [], [], [], []
        obs_ref = []
        dropped_obs = 0
        for mp in pt_ids:
            for k, slot in m.obs.get(mp, {}).items():
                ci = cam_index.get(k)
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
                s2.append(m.scale_factor ** (2.0 * int(kf.octave[slot])))
                obs_ref.append((mp, k))
        if dropped_obs:
            verbose.print_mess(
                f"{'FullInertialBA' if full_chain else 'LocalInertialBA'}: "
                f"obs cap hit — dropped {dropped_obs} of "
                f"{dropped_obs + len(obs_cam)} observations",
                verbose.Level.NORMAL)
        n_obs = len(obs_cam)
        if n_obs < 20:
            return

        def pad(a, n, fill=0, dtype=None):
            a = np.asarray(a, dtype)
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        # padded problem sizes: fixed window constants keep the local solve
        # on one compiled graph; full-chain mode buckets to powers of two
        P_pad = _bucket(len(pt_ids), lo=2048) if full_chain else IBA_MAX_PTS
        O_pad = _bucket(n_obs, lo=4096) if full_chain else IBA_MAX_OBS
        prob = viba.VIBAProblem(
            R_wb=jnp.asarray(R_wb), p_wb=jnp.asarray(p_wb),
            v_w=jnp.asarray(v_w), bg=jnp.asarray(bg), ba=jnp.asarray(ba),
            fixed=jnp.asarray(fixed), state_valid=jnp.asarray(state_valid),
            X=jnp.asarray(pad(m.points.pos[pt_ids], P_pad)),
            p_valid=jnp.asarray(pad(np.ones(len(pt_ids), bool),
                                    P_pad, False)),
            obs_cam=jnp.asarray(pad(obs_cam, O_pad, 0, np.int32)),
            obs_pt=jnp.asarray(pad(obs_pt, O_pad, 0, np.int32)),
            uv=jnp.asarray(pad(uv, O_pad, 0.0, np.float32)),
            ur=jnp.asarray(pad(ur, O_pad, 0.0, np.float32)),
            stereo=jnp.asarray(pad(stereo, O_pad, False)),
            valid=jnp.asarray(pad(np.ones(n_obs, bool), O_pad, False)),
            inv_sigma2=jnp.asarray(1.0 / pad(s2, O_pad, 1.0, np.float32)),
            dts=jnp.asarray(dts), dR=jnp.asarray(dR), dV=jnp.asarray(dV),
            dP=jnp.asarray(dP),
            JRg=jnp.asarray(J["JRg"]), JVg=jnp.asarray(J["JVg"]),
            JVa=jnp.asarray(J["JVa"]), JPg=jnp.asarray(J["JPg"]),
            JPa=jnp.asarray(J["JPa"]),
            L9=jnp.asarray(L9), Lb=jnp.asarray(Lb),
            e_valid=jnp.asarray(e_valid),
        )
        # the whole-chain solve moves much further (percent-level scale into
        # the oldest section) — give it a bigger LM/PCG budget; it runs only
        # at IMU-initialization events
        solve_kw = (dict(stage_iters=(8, 24), cg_iters=80) if full_chain
                    else {})
        res = viba.local_inertial_ba(prob, self.cam,
                                     jnp.asarray(cal.R_bc),
                                     jnp.asarray(cal.t_bc),
                                     jnp.float32(self.bf), **solve_kw)
        R_o = np.asarray(res.R_wb)
        p_o = np.asarray(res.p_wb)
        v_o = np.asarray(res.v_w)
        bg_o = np.asarray(res.bg)
        ba_o = np.asarray(res.ba)
        X_o = np.asarray(res.X)
        inlier = np.asarray(res.inlier)
        for i, k in enumerate(cam_ids):
            if fixed[i]:
                continue
            kf = m.keyframes[k]
            Rn = lie.np_normalize_rotation(R_o[i])
            kf.R, kf.t = np_body_to_cam(Rn, p_o[i], cal.R_bc, cal.t_bc)
            kf.vel = v_o[i].astype(np.float32)
            kf.bg = (b0g + bg_o[i]).astype(np.float32)
            kf.ba = (b0a + ba_o[i]).astype(np.float32)
        alive = m.points.alive[pt_ids]
        ids_arr = np.asarray(pt_ids)
        m.points.pos[ids_arr[alive]] = X_o[: len(pt_ids)][alive]
        for o in np.nonzero(~inlier[:n_obs])[0]:
            mp, k = obs_ref[o]
            m.remove_observation(mp, k)
        for mp in pt_ids:
            if m.points.alive[mp]:
                m.update_point(mp)
        m.change_index += 1

    # -- MergeInertialBA (/root/reference/src/Optimizer.cc:3948) ------------

    def merge_inertial_ba(self, curr_kid: int, merge_kid: int):
        """Visual-inertial BA over the map-weld region: TWO temporal windows
        — Nd=6 keyframes back from the current KF, plus Nd/2 before the
        matched (merge) KF extended forward with next-KFs until 2*Nd total
        states — all free, anchored by the fixed KF before each window
        (/root/reference/src/Optimizer.cc:3948-4035; called from
        LoopClosing.cc:2051 after an inertial map merge).

        After merge_maps the two prev_kf chains stay disjoint (the weld
        links maps by covisibility, not by IMU edge), so the solve couples
        the windows through the fused welding-region landmarks and the
        covisible fixed observers — the same structure as the reference's
        g2o graph. When a window has no predecessor, its oldest state is
        demoted to a fixed pose anchor (the reference does exactly this,
        Optimizer.cc:4010-4014)."""
        m = self.map
        if curr_kid not in m.keyframes or merge_kid not in m.keyframes:
            return
        Nd = 6
        chain_a = self._kf_chain(curr_kid)
        win_a = chain_a[-Nd:]
        anchor_a = chain_a[-Nd - 1] if len(chain_a) > Nd else None
        chain_b = self._kf_chain(merge_kid)
        win_b = chain_b[-(Nd // 2):]
        anchor_b = chain_b[-(Nd // 2) - 1] if len(chain_b) > Nd // 2 else None
        # extend the merge window forward (pMergeKF->mNextKF walk)
        nxt = {kf.prev_kf: k for k, kf in m.keyframes.items()
               if kf.prev_kf >= 0}
        seen = set(win_a) | set(win_b)
        while len(win_a) + len(win_b) < 2 * Nd:
            nk = nxt.get(win_b[-1])
            if nk is None or nk in seen:
                break
            win_b.append(nk)
            seen.add(nk)
        # anchor-less window: demote its oldest state to a fixed pose
        if anchor_a is None and len(win_a) > 1:
            anchor_a = win_a.pop(0)
        if anchor_b is None and len(win_b) > 1:
            anchor_b = win_b.pop(0)
        anchors = [a for a in (anchor_b, anchor_a) if a is not None]
        chain = win_b + win_a
        if len(chain) < 3:
            return
        self._local_inertial_ba(
            curr_kid, chain_override=chain, force_fixed=anchors,
            fix_anchor=not anchors, total_slots=MERGE_IBA_SLOTS)

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
        """One dispatch for the whole neighbor set: epipolar matching,
        triangulation, RGB-D depth fallback and acceptance gates run
        batched over the covisible neighbors
        (ops/geometry.triangulation_search_batched); the host keeps the
        baseline gate and the create-point bookkeeping. (The reference —
        and the previous per-neighbor loop — excluded a slot bound by an
        earlier neighbor from later DEVICE matching; now all neighbors
        match against the keyframe's initial free set and the host skips
        already-bound slots in loop order, which preserves the greedy
        first-neighbor-wins outcome.)"""
        kf1 = self.map.keyframes.get(kid)
        if kf1 is None:
            return
        neighbors = self.map.covisible_kfs(kid, 10)
        C1 = kf1.center()
        K = np.asarray(self.cam.K, np.float32)
        free1 = kf1.valid & (kf1.mp_ids < 0)
        if not free1.any():
            return
        use = []
        for nkid in neighbors:
            kf2 = self.map.keyframes.get(nkid)
            if kf2 is None:
                continue
            baseline = float(np.linalg.norm(kf2.center() - C1))
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
            use.append((nkid, kf2, free2))
        if not use:
            self.map.update_connections(kid)
            return
        Nn = max(2, 1 << (len(use) - 1).bit_length())  # bucketed signature

        def stack(get, fill=0.0):
            rows = [get(kf2, f2) for (_, kf2, f2) in use]
            out = np.full((Nn,) + rows[0].shape, fill, rows[0].dtype)
            out[: len(rows)] = rows
            return jnp.asarray(out)

        nb_valid = np.zeros(Nn, bool)
        nb_valid[: len(use)] = True
        idx, ok, X = geometry.triangulation_search_batched(
            jnp.asarray(K), jnp.asarray(kf1.R), jnp.asarray(kf1.t),
            jnp.asarray(kf1.kpts_un), jnp.asarray(kf1.desc),
            jnp.asarray(free1), jnp.asarray(kf1.depth),
            stack(lambda kf2, f2: kf2.R), stack(lambda kf2, f2: kf2.t),
            stack(lambda kf2, f2: kf2.kpts_un),
            stack(lambda kf2, f2: kf2.desc),
            stack(lambda kf2, f2: f2, fill=False),
            stack(lambda kf2, f2: kf2.depth),
            jnp.asarray(nb_valid),
            jnp.float32(self.cam.fx), jnp.float32(self.cam.fy),
            jnp.float32(self.cam.cx), jnp.float32(self.cam.cy),
            jnp.float32(self.bf), jnp.float32(self.tri_max_dist),
            ratio=0.8, binary=self.profile.binary,
        )
        idx, ok, X = jax.device_get((idx, ok, X))
        for j, (nkid, kf2, _f2) in enumerate(use):
            mask = matching.rotation_consistency_filter(
                kf1.angle, kf2.angle, np.clip(idx[j], 0, None), ok[j]
            )
            for s1 in np.nonzero(mask)[0]:
                s1 = int(s1)
                s2 = int(idx[j][s1])
                if kf1.mp_ids[s1] >= 0 or kf2.mp_ids[s2] >= 0:
                    continue
                mp = self.map.create_point(
                    X[j][s1].astype(np.float32), kf1.desc[s1], kid,
                    float(kf1.angle[s1]),
                )
                self.map.add_observation(mp, kid, s1, update_links=False)
                self.map.add_observation(mp, nkid, s2, update_links=False)
                self.map.update_point(mp)
                self.recent_points[mp] = kid
        self.map.update_connections(kid)

    # -- SearchInNeighbors / Fuse (/root/reference/src/LocalMapping.cc:714) -

    def _fuse_neighbors(self, kid: int):
        kf1 = self.map.keyframes.get(kid)
        if kf1 is None:
            return
        neighbors = self.map.covisible_kfs(kid, 10)
        # project this KF's points into ALL neighbors in one dispatch
        # (matching.fuse_project_batched) and merge duplicates; aliveness is
        # re-checked on the host per match since earlier fusions this call
        # can retire points
        own = kf1.mp_ids[kf1.mp_ids >= 0]
        if len(own) == 0:
            return
        kf2s = [(nkid, self.map.keyframes[nkid]) for nkid in neighbors
                if nkid in self.map.keyframes]
        if not kf2s:
            return
        pos = self.map.points.pos[own]
        desc = self.map.points.desc[own]
        alive = self.map.points.alive[own]
        Nn = max(2, 1 << (len(kf2s) - 1).bit_length())

        def stack(get, fill=0.0):
            rows = [get(kf2) for (_, kf2) in kf2s]
            out = np.full((Nn,) + rows[0].shape, fill, rows[0].dtype)
            out[: len(rows)] = rows
            return jnp.asarray(out)

        res = matching.fuse_project_batched(
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(alive),
            stack(lambda kf2: kf2.R), stack(lambda kf2: kf2.t),
            stack(lambda kf2: kf2.kpts_un), stack(lambda kf2: kf2.desc),
            stack(lambda kf2: kf2.valid, fill=False),
            jnp.float32(self.cam.fx), jnp.float32(self.cam.fy),
            jnp.float32(self.cam.cx), jnp.float32(self.cam.cy),
            radius=jnp.float32(3.0),
            max_dist=jnp.float32(self.fuse_max_dist),
            ratio=0.9, binary=self.profile.binary,
        )
        idx_all, mask_all = jax.device_get((res.idx, res.mask))
        for j, (nkid, kf2) in enumerate(kf2s):
            idx, mask = idx_all[j], mask_all[j]
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
        KFs (single-octave simplification of the scale-band check). In
        inertial mode the temporal chain is preserved: the culled KF's
        preintegration merges into its successor's, and culling is skipped
        when it would open a >3 s gap or touch the 3 newest chain KFs
        (LocalMapping.cc:902-1054 inertial branch)."""
        inertial = self.imu_calib is not None
        recent = set(self._kf_chain(kid)[-3:]) if inertial else set()
        for ckid in self.map.covisible_kfs(kid):
            kf = self.map.keyframes.get(ckid)
            if kf is None or ckid == self.map.kf_origin or ckid == kid:
                continue
            succ = None
            if inertial:
                if ckid in recent:
                    continue
                succ = next((k for k in self.map.keyframes.values()
                             if k.prev_kf == ckid), None)
                prev = self.map.keyframes.get(kf.prev_kf)
                if succ is not None and prev is not None:
                    if succ.timestamp - prev.timestamp > 3.0:
                        continue
            mps = kf.mp_ids[kf.mp_ids >= 0]
            if len(mps) == 0:
                continue
            redundant = 0
            for mp in mps:
                if self.map.points.n_obs[int(mp)] >= 4:  # this KF + 3 others
                    redundant += 1
            if redundant > 0.9 * len(mps):
                if inertial and succ is not None:
                    if kf.pre_kf is not None and succ.pre_kf is not None:
                        merged = imu_ops.merge_previous(kf.pre_kf, succ.pre_kf)
                        succ.pre_kf = imu_ops.Preintegrated(
                            *[np.asarray(f) for f in merged]
                        )
                    succ.prev_kf = kf.prev_kf
                self.map.remove_keyframe(ckid)
