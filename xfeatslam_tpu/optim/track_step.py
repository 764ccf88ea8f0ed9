"""Fused per-frame tracking step: project -> match -> rotation check ->
widen-on-failure -> robust pose LM, as ONE XLA graph.

Dispatch-count optimization for the online path: the reference interleaves
these stages on the CPU (Tracking::TrackWithMotionModel
/root/reference/src/Tracking.cc:2892 calls ORBmatcher::SearchByProjection
then Optimizer::PoseOptimization), which as separate device calls costs a
host<->device round trip per stage — the dominant per-frame cost when the
accelerator sits behind a network tunnel (~15 ms RTT). Fusing the whole
frame step keeps every intermediate (distance matrix, match indices,
normal equations) on device and returns only the final bindings.

Two configurations cover the two tracking stages:
  - motion-model step: fresh bindings, widen x2 when matches are scarce
    (Tracking.cc:2939-2947)
  - local-map step: keeps existing bindings as extra pose edges, gates
    candidates by distance band / viewing angle / predicted scale
    (Frame::isInFrustum + ORBmatcher.cc:92-131)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import matching
from ..ops.camera import Pinhole
from . import pose_opt

INVALID = 1e9


class TrackStepResult(NamedTuple):
    R: jnp.ndarray  # (3,3) optimized Tcw
    t: jnp.ndarray  # (3,)
    slot_mp: jnp.ndarray  # (N,) row into the map-point arrays or -1 (new binds)
    inlier: jnp.ndarray  # (N,) pose-opt inlier classification per keypoint
    n_matched: jnp.ndarray  # () new matches found (post rotation check)
    n_inliers: jnp.ndarray  # () pose-opt inliers
    visible: jnp.ndarray  # (M,) map points that passed the frustum gates


def _rotation_consistency(mp_angle, kpt_angle, idx, mask,
                          n_bins: int = 30):
    """In-graph rotation-histogram check (ORBmatcher HISTO_LENGTH=30 +
    ComputeThreeMaxima, /root/reference/src/ORBmatcher.cc:2198-2240): keep
    matches in the 3 dominant delta-angle bins (2nd/3rd only if >0.1x max).
    No-op when neither side carries orientation (XFeat)."""
    has_angle = (jnp.max(jnp.abs(mp_angle)) > 1e-9) | (
        jnp.max(jnp.abs(kpt_angle)) > 1e-9
    )
    d = mp_angle - kpt_angle[jnp.clip(idx, 0, None)]
    d = jnp.mod(d, 2.0 * jnp.pi)
    bins = jnp.minimum((d / (2.0 * jnp.pi) * n_bins).astype(jnp.int32),
                       n_bins - 1)
    counts = jnp.zeros(n_bins, jnp.int32).at[bins].add(mask.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)[0]
    thr = jnp.maximum(top3[2], (0.1 * top3[0]).astype(jnp.int32))
    keep_bin = counts >= jnp.maximum(thr, 1)
    ok = keep_bin[bins]
    return jnp.where(has_angle, mask & ok, mask)


def _match_pose_step_impl(
    R0, t0,
    # map-point side (M rows, padded)
    pos_w, mp_desc, valid_mp, mp_angle, mp_octave, dmin, dmax, normal,
    # frame side (N slots, padded)
    kpt_uv, kpt_desc, kpt_valid, kpt_angle, kpt_octave, obs_ur, inv_sigma2,
    kpt_free,
    # previously bound edges (from an earlier stage), included in pose opt
    prev_Xw, prev_valid,
    cam: Pinhole, bf,
    radius, max_dist, ratio, widen_below, scale_factor,
    img_w, img_h,
    binary: bool = False, scale_gate: bool = False, band_gate: bool = False,
    n_levels: int = 1, widen: bool = True,
):
    """One fused tracking step. Returns TrackStepResult.

    widen_below: retry with a 2x radius when the first pass finds fewer new
    matches (the reference's widen-on-failure, Tracking.cc:2939). Both
    passes are computed in-graph and selected — on the MXU the second
    distance matrix is cheaper than a host round trip.
    """
    # ---- frustum + gating (Frame::isInFrustum, Frame.cc:705) -------------
    Xc = pos_w @ R0.T + t0
    z = Xc[:, 2]
    vis = z > 0.05
    zs = jnp.where(vis, z, 1.0)
    u = cam.fx * Xc[:, 0] / zs + cam.cx
    v = cam.fy * Xc[:, 1] / zs + cam.cy
    vis &= (u >= -20) & (u < img_w + 20) & (v >= -20) & (v < img_h + 20)
    C = -R0.T @ t0
    dvec = pos_w - C
    dist = jnp.linalg.norm(dvec, axis=-1)
    if band_gate:
        vis &= (dist >= 0.8 * dmin) & (dist <= 1.2 * dmax)
        view = dvec / jnp.maximum(dist[:, None], 1e-9)
        vis &= jnp.sum(view * normal, axis=-1) > 0.5
    pred_uv = jnp.stack([u, v], -1)
    valid_m = valid_mp & vis

    # ---- per-point radius + octave window ---------------------------------
    if scale_gate and n_levels > 1:
        # PredictScale (MapPoint.cc:579) in-graph
        ratio_d = dmax / jnp.maximum(dist, 1e-9)
        level = jnp.ceil(jnp.log(jnp.maximum(ratio_d, 1e-9))
                         / jnp.log(scale_factor))
        level = jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)
        r_scale = scale_factor ** level.astype(jnp.float32)
        oct_kw = dict(kpt_octave=kpt_octave, oct_lo=level - 1, oct_hi=level)
    elif n_levels > 1:
        # frame-to-frame: window around the LAST observation's octave
        r_scale = scale_factor ** mp_octave.astype(jnp.float32)
        oct_kw = dict(kpt_octave=kpt_octave, oct_lo=mp_octave - 1,
                      oct_hi=mp_octave + 1)
    else:
        r_scale = jnp.ones_like(dist)
        oct_kw = {}

    def one_pass(mult):
        res = matching.search_by_projection(
            pred_uv, mp_desc, valid_m, kpt_uv, kpt_desc, kpt_valid,
            radius=radius * r_scale * mult, max_dist=max_dist, ratio=ratio,
            kpt_free=kpt_free, binary=binary, **oct_kw,
        )
        mask = _rotation_consistency(mp_angle, kpt_angle, res.idx, res.mask)
        return res.idx, mask

    idx1, m1 = one_pass(jnp.float32(1.0))
    n1 = jnp.sum(m1.astype(jnp.int32))
    if widen:
        idx2, m2 = one_pass(jnp.float32(2.0))
        use2 = n1 < widen_below
        idx = jnp.where(use2, idx2, idx1)
        mask = jnp.where(use2, m2, m1)
    else:
        # static no-widen configuration (the local-map step): skip the
        # second distance matrix entirely — widen_below is 0 there and a
        # traced select cannot be dead-code-eliminated by XLA
        idx, mask = idx1, m1
    n_matched = jnp.sum(mask.astype(jnp.int32))

    # ---- scatter matches to keypoint slots ---------------------------------
    N = kpt_uv.shape[0]
    M = pos_w.shape[0]
    slot_mp = jnp.full((N,), -1, jnp.int32)
    rows = jnp.arange(M, dtype=jnp.int32)
    slot_mp = slot_mp.at[jnp.where(mask, idx, N)].set(
        jnp.where(mask, rows, -1), mode="drop")
    new_valid = slot_mp >= 0
    Xw_new = pos_w[jnp.clip(slot_mp, 0, None)]
    # union with previously bound edges (new bindings only fill free slots,
    # so prev wins where both exist)
    edge_valid = prev_valid | new_valid
    Xw = jnp.where(prev_valid[:, None], prev_Xw, Xw_new)

    # ---- robust pose LM (Optimizer::PoseOptimization) ----------------------
    res = pose_opt.pose_optimization(
        R0, t0, Xw, kpt_uv, obs_ur, inv_sigma2,
        (obs_ur > 0) & edge_valid, edge_valid & kpt_valid, cam, bf,
    )
    return TrackStepResult(res.R, res.t, slot_mp, res.inliers,
                           n_matched, res.num_inliers, vis & valid_mp)


match_pose_step = functools.partial(
    jax.jit, static_argnames=("binary", "scale_gate", "band_gate",
                              "n_levels", "widen"))(_match_pose_step_impl)


def _two_stage_impl(
    R0, t0,
    pos1, desc1, valid1, angle1, octave1, ids1,
    pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
    kpt_uv, kpt_desc, kpt_valid, kpt_angle, kpt_octave, obs_ur, inv_sigma2,
    cam: Pinhole, bf,
    radius1, radius2, max_dist, ratio, widen_below, scale_factor,
    img_w, img_h,
    binary: bool = False, n_levels: int = 1,
):
    """Traceable body of two_stage_track_step (shared with the whole-frame
    fused graph below)."""
    N = kpt_uv.shape[0]
    zeros1 = jnp.zeros(pos1.shape[0], jnp.float32)
    no_prev = jnp.zeros((N, 3), jnp.float32)
    r1 = _match_pose_step_impl(
        R0, t0,
        pos1, desc1, valid1, angle1, octave1,
        zeros1, zeros1 + 1e9, jnp.zeros((pos1.shape[0], 3), jnp.float32),
        kpt_uv, kpt_desc, kpt_valid, kpt_angle, kpt_octave, obs_ur,
        inv_sigma2, jnp.ones(N, bool), no_prev, jnp.zeros(N, bool),
        cam, bf, radius1, max_dist, ratio, widen_below, scale_factor,
        img_w, img_h,
        binary=binary, scale_gate=False, band_gate=False,
        n_levels=n_levels, widen=True,
    )
    bound1 = (r1.slot_mp >= 0) & r1.inlier
    prev_Xw = pos1[jnp.clip(r1.slot_mp, 0, None)]
    bid = jnp.where(bound1, ids1[jnp.clip(r1.slot_mp, 0, None)], -1)
    # snapshot rows already bound by stage 1 are not fresh candidates
    # (valid2 rows carry ids >= 0, so the -1 sentinel never collides)
    fresh2 = valid2 & ~jnp.any(ids2[:, None] == bid[None, :], axis=1)
    zeros2 = jnp.zeros(pos2.shape[0], jnp.float32)
    r2 = _match_pose_step_impl(
        r1.R, r1.t,
        pos2, desc2, fresh2, angle2, octave2,
        zeros2, dmax2, jnp.zeros((pos2.shape[0], 3), jnp.float32),
        kpt_uv, kpt_desc, kpt_valid, kpt_angle, kpt_octave, obs_ur,
        inv_sigma2, ~bound1, prev_Xw, bound1,
        cam, bf, radius2, max_dist, ratio, jnp.int32(0), scale_factor,
        img_w, img_h,
        binary=binary, scale_gate=True, band_gate=False,
        n_levels=n_levels, widen=False,
    )
    return r1, r2


@functools.partial(jax.jit, static_argnames=("binary", "n_levels"))
def two_stage_track_step(
    R0, t0,
    # stage 1: motion-model candidates (last frame's bindings, M1 rows)
    pos1, desc1, valid1, angle1, octave1, ids1,
    # stage 2: local-map snapshot (M2 rows)
    pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
    # frame side (N slots)
    kpt_uv, kpt_desc, kpt_valid, kpt_angle, kpt_octave, obs_ur, inv_sigma2,
    cam: Pinhole, bf,
    radius1, radius2, max_dist, ratio, widen_below, scale_factor,
    img_w, img_h,
    binary: bool = False, n_levels: int = 1,
):
    """BOTH per-frame tracking stages — TrackWithMotionModel then
    TrackLocalMap (/root/reference/src/Tracking.cc:2892,2987) — as ONE XLA
    graph: one dispatch, one host round trip for the whole frame.

    The motion stage's inlier bindings become the local stage's prior pose
    edges in-graph (the split path ferries them through the host); the
    local stage masks out snapshot rows whose map id stage 1 already bound.
    The caller supplies the local snapshot SPECULATIVELY (voted from the
    last frame's bindings) and falls back to the split two-dispatch path
    when either stage under-delivers — so the fused path is a pure
    fast-path, never a behavior change."""
    return _two_stage_impl(
        R0, t0,
        pos1, desc1, valid1, angle1, octave1, ids1,
        pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
        kpt_uv, kpt_desc, kpt_valid, kpt_angle, kpt_octave, obs_ur,
        inv_sigma2, cam, bf,
        radius1, radius2, max_dist, ratio, widen_below, scale_factor,
        img_w, img_h, binary=binary, n_levels=n_levels,
    )


@functools.partial(jax.jit,
                   static_argnames=("num_keypoints", "n_levels",
                                    "has_depth"))
def xfeat_rgbd_frame_step(
    params, image, depth_m,
    R0, t0,
    # stage 1: motion-model candidates (last frame's bindings, M1 rows)
    pos1, desc1, valid1, angle1, octave1, ids1,
    # stage 2: local-map snapshot (M2 rows)
    pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
    cam: Pinhole, bf, depth_edge_rel, inv_sigma2_0,
    radius1, radius2, max_dist, ratio, widen_below, scale_factor,
    img_w, img_h,
    num_keypoints: int, n_levels: int = 1, has_depth: bool = True,
):
    """The ENTIRE steady-state RGB-D XFeat frame as ONE XLA graph: CNN
    extraction + keypoint undistortion + depth->virtual-right conversion +
    both tracking stages. One device dispatch and one host fetch per frame
    — the per-frame floor on launch overhead (or, behind this environment's
    remote-device tunnel, on RTT).

    Replaces, in-graph, what the reference spreads over
    XFextractor::operator() (/root/reference/src/XFextractor.cc:250-357),
    Frame::UndistortKeyPoints + ComputeStereoFromRGBD
    (/root/reference/src/Frame.cc:940,1177-1198) and the two tracking
    stages (Tracking.cc:2892,2987).

    depth_m: (H,W) float32 metric depth. The 3x3 min/max depth-discontinuity
    gate (silhouette rejection, see slam/frame.py build_rgbd) is evaluated
    with 9 clipped neighborhood gathers at the K keypoints — identical to
    eroding/dilating the full map (border clipping reproduces cv2's
    ignore-outside border semantics) without materializing two full-res
    maps. XFeat only: single-scale, angle-free keypoints (binary=False).

    has_depth=False is the MONOCULAR configuration: depth_m is a dummy
    (1,1) array, every keypoint becomes a mono observation (d=0, ur=-1) —
    the same graph serves mono_tum/mono_kitti/mono_euroc steady-state
    tracking with the depth gathers compiled out.
    """
    from ..models.extractor import extract_fn
    from ..ops import camera as camera_ops

    out = extract_fn(params, image, num_keypoints)
    kpts = out["kpts"][0]
    kpts_un = camera_ops.undistort_points(cam, out["kpts"])[0]
    desc = out["desc"][0]
    valid = out["valid"][0]
    K = kpts.shape[0]

    if has_depth:
        H, W = depth_m.shape
        xi = jnp.clip(jnp.round(kpts[:, 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(kpts[:, 1]).astype(jnp.int32), 0, H - 1)
        d0 = depth_m[yi, xi]
        dmin = d0
        dmax = d0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                dn = depth_m[jnp.clip(yi + dy, 0, H - 1),
                             jnp.clip(xi + dx, 0, W - 1)]
                dmin = jnp.minimum(dmin, dn)
                dmax = jnp.maximum(dmax, dn)
        d = jnp.where(valid, d0, 0.0)
        edge = (dmax - dmin) > depth_edge_rel * jnp.maximum(d, 1e-6)
        d = jnp.where(edge | (dmin <= 0), 0.0, d)
        ur = jnp.where(d > 0,
                       kpts_un[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    else:
        d = jnp.zeros(K, jnp.float32)
        ur = jnp.full(K, -1.0, jnp.float32)

    zeros_k = jnp.zeros(K, jnp.float32)
    r1, r2 = _two_stage_impl(
        R0, t0,
        pos1, desc1, valid1, angle1, octave1, ids1,
        pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
        kpts_un, desc, valid, zeros_k, zeros_k.astype(jnp.int32),
        ur.astype(jnp.float32), zeros_k + inv_sigma2_0,
        cam, bf,
        radius1, radius2, max_dist, ratio, widen_below, scale_factor,
        img_w, img_h, binary=False, n_levels=n_levels,
    )
    frame_out = {
        "kpts": kpts, "kpts_un": kpts_un, "desc": desc,
        "scores": out["scores"][0], "valid": valid,
        "depth": d.astype(jnp.float32), "ur": ur.astype(jnp.float32),
    }
    return frame_out, r1, r2


@functools.partial(jax.jit,
                   static_argnames=("num_keypoints", "n_levels"))
def xfeat_stereo_frame_step(
    params, images,
    R0, t0,
    pos1, desc1, valid1, angle1, octave1, ids1,
    pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
    cam: Pinhole, bf, min_disp, max_disp, stereo_max_dist, inv_sigma2_0,
    radius1, radius2, max_dist, ratio, widen_below, scale_factor,
    img_w, img_h,
    num_keypoints: int, n_levels: int = 1,
):
    """The steady-state rectified-STEREO XFeat frame as ONE XLA graph:
    both views extracted in a single batched CNN pass (the reference
    spawns two threads for the two extractions, Frame.cc:123-124 — here
    batch dim 2 fills the device instead), row-banded stereo matching
    (Frame::ComputeStereoMatches role), disparity->depth, and both
    tracking stages. One dispatch per frame where the unfused path costs
    four (2x extract + stereo match + track).

    images: (2, H, W, 1) float32 — left at index 0, right at index 1.
    """
    from ..models.extractor import extract_fn
    from ..ops import camera as camera_ops
    from ..ops import matching

    out = extract_fn(params, images, num_keypoints)
    kpts_un = camera_ops.undistort_points(cam, out["kpts"])
    kl_un, kr_un = kpts_un[0], kpts_un[1]
    dl, dr = out["desc"][0], out["desc"][1]
    vl, vr = out["valid"][0], out["valid"][1]
    K = kl_un.shape[0]
    oct0 = jnp.zeros(K, jnp.int32)

    res, disp = matching.stereo_match_rows(
        kl_un, dl, vl, oct0, kr_un, dr, vr, oct0,
        min_disp=min_disp, max_disp=max_disp, max_dist=stereo_max_dist,
        binary=False,
    )
    d = jnp.where(res.mask & (disp > min_disp),
                  bf / jnp.maximum(disp, 1e-6), 0.0)
    ur = jnp.where(d > 0, kl_un[:, 0] - disp, -1.0)

    zeros_k = jnp.zeros(K, jnp.float32)
    r1, r2 = _two_stage_impl(
        R0, t0,
        pos1, desc1, valid1, angle1, octave1, ids1,
        pos2, desc2, valid2, angle2, octave2, ids2, dmax2,
        kl_un, dl, vl, zeros_k, oct0,
        ur.astype(jnp.float32), zeros_k + inv_sigma2_0,
        cam, bf,
        radius1, radius2, max_dist, ratio, widen_below, scale_factor,
        img_w, img_h, binary=False, n_levels=n_levels,
    )
    frame_out = {
        "kpts": out["kpts"][0], "kpts_un": kl_un, "desc": dl,
        "scores": out["scores"][0], "valid": vl,
        "depth": d.astype(jnp.float32), "ur": ur.astype(jnp.float32),
    }
    return frame_out, r1, r2
