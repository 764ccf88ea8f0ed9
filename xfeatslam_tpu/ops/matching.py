"""Descriptor matching kernels: distance matrices, mutual-NN, projection and
window searches — batched matmul formulations for the MXU.

TPU-native replacement for ORBmatcher (/root/reference/src/ORBmatcher.cc,
2,268 LoC of per-feature grid loops). Where the reference walks per-feature
grid cells and BoW buckets, these kernels compute masked (M,N) score matrices
in one shot; candidate gating (search radius, scale bands) becomes masks.

Distance convention (reference ORBmatcher::DescriptorDistance,
/root/reference/src/ORBmatcher.cc:2242-2266): XFeat mode is squared-L2 x 512
on L2-normalized descriptors, thresholds TH_HIGH=1000, TH_LOW=100
(:34-35). With normalized descriptors d = (2 - 2 a.b) * 512, so the whole
matrix is one matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

# Reference thresholds, /root/reference/src/ORBmatcher.cc:34-35:
# XFeat mode (USE_ORB unset): L2^2*512 with TH_HIGH=1000, TH_LOW=100;
# ORB mode: raw Hamming with TH_HIGH=100, TH_LOW=50.
TH_HIGH = 1000.0
TH_LOW = 100.0
ORB_TH_HIGH = 100.0
ORB_TH_LOW = 50.0
INVALID = jnp.float32(1e9)


class MatchProfile(NamedTuple):
    """Distance semantics per feature backend (the USE_ORB switch,
    SURVEY.md §2.3.1)."""

    binary: bool
    th_high: float
    th_low: float


XFEAT_PROFILE = MatchProfile(False, TH_HIGH, TH_LOW)
ORB_PROFILE = MatchProfile(True, ORB_TH_HIGH, ORB_TH_LOW)


# Descriptor-similarity matmuls run at Precision.DEFAULT (one bf16 MXU
# pass), overriding the package-global jax_default_matmul_precision=highest
# (6 passes) which the 3x3 GEOMETRY math needs but similarity does not:
# XFeat descriptors are unit-norm so bf16 rounding costs <0.4% of |sim|
# against integer thresholds of 100/1000 on a 0..2048 scale, and ORB 0/1
# vectors are EXACT in bf16 (f32 accumulation keeps the integer Hamming
# exact). CPU backends ignore the precision hint, so tests are unchanged.
_SIM_PREC = jax.lax.Precision.DEFAULT


def xfeat_distance_matrix(desc_a, desc_b):
    """(N,D),(M,D) L2-normalized -> (N,M) distances = L2^2 * 512."""
    sim = jnp.matmul(desc_a, desc_b.T, precision=_SIM_PREC,
                     preferred_element_type=jnp.float32)
    return (2.0 - 2.0 * sim) * 512.0


def hamming_distance_matrix(desc_a, desc_b):
    """(N,D),(M,D) 0/1 vectors -> (N,M) Hamming distance via one matmul
    (popcnt replacement: on binary vectors L2^2 == Hamming)."""
    na = jnp.sum(desc_a, axis=-1, keepdims=True)
    nb = jnp.sum(desc_b, axis=-1)
    prod = jnp.matmul(desc_a, desc_b.T, precision=_SIM_PREC,
                      preferred_element_type=jnp.float32)
    return na + nb[None, :] - 2.0 * prod


def distance_matrix(desc_a, desc_b, binary: bool = False):
    return hamming_distance_matrix(desc_a, desc_b) if binary else (
        xfeat_distance_matrix(desc_a, desc_b)
    )


def _mask_dist(dist, valid_a, valid_b):
    m = valid_a[:, None] & valid_b[None, :]
    return jnp.where(m, dist, INVALID)


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (N,) best column per row (-1 if unmatched)
    dist: jnp.ndarray  # (N,) distance of the match
    mask: jnp.ndarray  # (N,) bool valid match


def _best_two(dist):
    """Row-wise best and second-best. dist (N,M) -> (best, second, argbest)."""
    if dist.shape[1] < 2:
        best = dist[:, 0]
        return best, jnp.full_like(best, INVALID), jnp.zeros(dist.shape[0], jnp.int32)
    neg = -dist
    vals, idx = lax.top_k(neg, 2)
    return -vals[:, 0], -vals[:, 1], idx[:, 0]


def _use_pallas() -> bool:
    """Route float-descriptor MNN through the fused Pallas kernel when the
    default backend is TPU (falls back to the XLA path everywhere else)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("binary", "fused"))
def match_mutual_nn(desc_a, desc_b, valid_a, valid_b,
                    max_dist: float = TH_LOW, ratio: float = 1.0,
                    binary: bool = False, fused: Optional[bool] = None):
    """Mutual nearest-neighbor matching with optional Lowe ratio test.

    The batched-offline equivalent of SearchForInitialization-style matching
    and the XFeat paper's MNN matcher; used by the throughput benchmark
    config (BASELINE.md config 4).

    On TPU the float path runs through the fused Pallas similarity+top-2
    kernel (ops/pallas_kernels.py) so the (N,M) matrix never round-trips
    HBM; `fused` overrides the platform auto-detection (tests use it with
    interpret mode off-TPU).

    Returns MatchResult over rows of desc_a.
    """
    if fused is None:
        fused = (not binary) and _use_pallas()
    if fused and not binary:
        from . import pallas_kernels as pk

        interpret = jax.default_backend() != "tpu"
        best, second, idx, col_best_row = pk.mutual_nn_top2(
            desc_a, desc_b, valid_a, valid_b, interpret=interpret
        )
        mutual = col_best_row[jnp.clip(idx, 0, desc_b.shape[0] - 1)] == (
            jnp.arange(desc_a.shape[0])
        )
        ok = (best <= max_dist) & (best <= ratio * second) & mutual & valid_a
        return MatchResult(jnp.where(ok, idx, -1), best, ok)
    dist = _mask_dist(distance_matrix(desc_a, desc_b, binary), valid_a, valid_b)
    best, second, idx = _best_two(dist)
    # mutual check: row i's best column j must have row i as ITS best row
    col_best_row = jnp.argmin(dist, axis=0)  # (M,)
    mutual = col_best_row[idx] == jnp.arange(dist.shape[0])
    ok = (best <= max_dist) & (best <= ratio * second) & mutual & valid_a
    return MatchResult(jnp.where(ok, idx, -1), best, ok)


@functools.partial(jax.jit, static_argnames=("binary",))
def search_by_projection(
    pred_uv, mp_desc, valid_mp,
    kpt_uv, kpt_desc, valid_kpt,
    radius, max_dist=TH_HIGH, ratio: float = 0.9,
    kpt_free: Optional[jnp.ndarray] = None, binary: bool = False,
    kpt_octave: Optional[jnp.ndarray] = None,
    oct_lo: Optional[jnp.ndarray] = None,
    oct_hi: Optional[jnp.ndarray] = None,
):
    """Projection-guided matching: map points -> keypoints within a pixel
    radius (ORBmatcher::SearchByProjection family,
    /root/reference/src/ORBmatcher.cc:42-213,1861-2030).

    Args:
      pred_uv: (M,2) predicted pixel of each map point in the frame.
      mp_desc: (M,D) map-point descriptors; valid_mp (M,) bool.
      kpt_uv: (N,2) frame keypoints (undistorted); kpt_desc (N,D);
        valid_kpt (N,) bool.
      radius: scalar or (M,) per-point search radius in pixels (the reference
        scales by viewing-cos and predicted octave, ORBmatcher.cc:92-105;
        pass per-point radii for that behavior — XFeat is single-octave).
      max_dist: accept threshold (TH_HIGH for tracking).
      ratio: best/second ratio gate (mfNNratio; applied like the reference's
        best-vs-second-best check within the window).
      kpt_free: optional (N,) bool — keypoint not already bound to a map
        point (reference skips those, e.g. ORBmatcher.cc:137-146).
      kpt_octave/oct_lo/oct_hi: optional scale gate — keypoint n is a
        candidate for map point m only when oct_lo[m] <= kpt_octave[n] <=
        oct_hi[m] (the reference's nPredictedLevel window,
        ORBmatcher.cc:122-131: a wrong-scale detection of similar texture is
        the dominant wrong-match source on repetitive scenes).

    Returns MatchResult over map points, deduplicated so each keypoint keeps
    only its best map point (the reference dedups first-come-first-served;
    min-distance dedup is deterministic and strictly better).
    """
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (pred_uv.shape[0],))
    d_uv = pred_uv[:, None, :] - kpt_uv[None, :, :]
    within = (jnp.abs(d_uv[..., 0]) <= radius[:, None]) & (
        jnp.abs(d_uv[..., 1]) <= radius[:, None]
    )
    if kpt_free is not None:
        within = within & kpt_free[None, :]
    if kpt_octave is not None and oct_lo is not None:
        within = within & (
            (kpt_octave[None, :] >= oct_lo[:, None])
            & (kpt_octave[None, :] <= oct_hi[:, None])
        )
    dist = _mask_dist(distance_matrix(mp_desc, kpt_desc, binary), valid_mp, valid_kpt)
    dist = jnp.where(within, dist, INVALID)

    best, second, idx = _best_two(dist)
    ok = (best <= max_dist) & (best <= ratio * second) & valid_mp

    # dedup: keep the best map point per keypoint (scatter-min)
    N = kpt_uv.shape[0]
    keyed = jnp.where(ok, best, INVALID)
    col_min = jnp.full((N,), INVALID).at[jnp.where(ok, idx, 0)].min(keyed)
    keep = ok & (best <= col_min[jnp.clip(idx, 0, N - 1)])
    return MatchResult(jnp.where(keep, idx, -1), best, keep)


@functools.partial(jax.jit, static_argnames=("binary",))
def fuse_project_batched(pos, desc, alive, R2, t2, kpt_uv, kpt_desc,
                         valid_kpt, fx, fy, cx, cy,
                         radius, max_dist, ratio: float = 0.9,
                         binary: bool = False):
    """Project ONE keyframe's landmark set into a STACK of neighbor
    keyframes and window-match, all in one dispatch.

    The SearchInNeighbors fuse loop (/root/reference/src/LocalMapping.cc:714
    + ORBmatcher::Fuse :1333) runs once per covisible neighbor; as separate
    device calls that is ~10 dispatches per keyframe — the dominant
    jitted-dispatch source of the online path after the fused frame step
    (bench.py --mode online call-site audit). Here the projection and the
    window search vmap over the neighbor axis.

    Args: pos/desc/alive — (M,...) landmark set; R2/t2/kpt_uv/kpt_desc/
    valid_kpt — (Nn,...) stacked neighbor poses and keypoints (pad with
    valid_kpt=False rows to bucket Nn). Returns MatchResult with (Nn,M)
    leaves."""
    def one(R, t, kuv, kd, kv):
        Xc = pos @ R.T + t
        z = Xc[:, 2]
        vis = z > 0.05
        zs = jnp.where(vis, z, 1.0)
        u = fx * Xc[:, 0] / zs + cx
        v = fy * Xc[:, 1] / zs + cy
        uv = jnp.stack([u, v], -1)
        return search_by_projection(
            uv, desc, alive & vis, kuv, kd, kv,
            radius=radius, max_dist=max_dist, ratio=ratio, binary=binary)

    return jax.vmap(one)(R2, t2, kpt_uv, kpt_desc, valid_kpt)


@functools.partial(jax.jit, static_argnames=("binary",))
def search_window(
    kpt_uv1, desc1, valid1,
    kpt_uv2, desc2, valid2,
    radius: float = 100.0, max_dist: float = TH_LOW, ratio: float = 0.9,
    binary: bool = False,
):
    """Windowed matching around same pixel location, for monocular
    initialization (ORBmatcher::SearchForInitialization,
    /root/reference/src/ORBmatcher.cc:833-1030: window, best/second ratio,
    mutual-consistency via reverse assignment).

    Returns MatchResult over rows of frame 1.
    """
    d_uv = kpt_uv1[:, None, :] - kpt_uv2[None, :, :]
    within = (jnp.abs(d_uv[..., 0]) <= radius) & (jnp.abs(d_uv[..., 1]) <= radius)
    dist = _mask_dist(distance_matrix(desc1, desc2, binary), valid1, valid2)
    dist = jnp.where(within, dist, INVALID)
    best, second, idx = _best_two(dist)
    ok = (best <= max_dist) & (best <= ratio * second) & valid1
    # reverse-best dedup (reference erases earlier match when a better row
    # claims the same column, ORBmatcher.cc:935-950)
    N2 = kpt_uv2.shape[0]
    keyed = jnp.where(ok, best, INVALID)
    col_min = jnp.full((N2,), INVALID).at[jnp.where(ok, idx, 0)].min(keyed)
    keep = ok & (best <= col_min[jnp.clip(idx, 0, N2 - 1)])
    return MatchResult(jnp.where(keep, idx, -1), best, keep)


@functools.partial(jax.jit, static_argnames=("binary",))
def match_general(desc_a, valid_a, desc_b, valid_b,
                  max_dist: float = TH_LOW, ratio: float = 0.75,
                  pair_mask: Optional[jnp.ndarray] = None,
                  binary: bool = False):
    """General masked best-match with ratio test and column dedup.

    Covers the SearchByBoW role (/root/reference/src/ORBmatcher.cc:408-560):
    the reference restricts candidates to shared vocabulary nodes purely as a
    speedup for CPU Hamming loops; on the MXU the full (N,M) matrix is one
    matmul, so the node gating is unnecessary — semantics (best match +
    ratio + dedup) are preserved. An optional pair_mask (N,M) reintroduces
    gating when needed (e.g. epipolar constraints for triangulation).
    """
    dist = _mask_dist(distance_matrix(desc_a, desc_b, binary), valid_a, valid_b)
    if pair_mask is not None:
        dist = jnp.where(pair_mask, dist, INVALID)
    best, second, idx = _best_two(dist)
    ok = (best <= max_dist) & (best <= ratio * second) & valid_a
    M = desc_b.shape[0]
    keyed = jnp.where(ok, best, INVALID)
    col_min = jnp.full((M,), INVALID).at[jnp.where(ok, idx, 0)].min(keyed)
    keep = ok & (best <= col_min[jnp.clip(idx, 0, M - 1)])
    return MatchResult(jnp.where(keep, idx, -1), best, keep)


def rotation_consistency_filter(angles_a, angles_b, idx, mask,
                                n_bins: int = 30, keep_bins: int = 3):
    """Host-side rotation-histogram consistency check
    (ORBmatcher HISTO_LENGTH=30 + ComputeThreeMaxima,
    /root/reference/src/ORBmatcher.cc:418-421,2198-2240): keep only matches
    whose angle delta falls in the 3 dominant bins. No-op when either side
    has no orientation info (all angles ~0, e.g. XFeat)."""
    import numpy as np

    angles_a = np.asarray(angles_a)
    angles_b = np.asarray(angles_b)
    idx = np.asarray(idx)
    mask = np.asarray(mask).copy()
    if not mask.any():
        return mask
    if np.abs(angles_a).max() < 1e-9 and np.abs(angles_b).max() < 1e-9:
        return mask
    rows = np.nonzero(mask)[0]
    d = angles_a[rows] - angles_b[idx[rows]]
    d = np.mod(d, 2.0 * np.pi)
    bins = np.minimum((d / (2.0 * np.pi) * n_bins).astype(int), n_bins - 1)
    counts = np.bincount(bins, minlength=n_bins)
    order = np.argsort(-counts)
    best = {order[0]}
    if counts[order[1]] > 0.1 * counts[order[0]]:
        best.add(order[1])
    if counts[order[2]] > 0.1 * counts[order[0]]:
        best.add(order[2])
    ok = np.isin(bins, list(best))
    mask[rows[~ok]] = False
    return mask


@functools.partial(jax.jit, static_argnames=("binary",))
def stereo_match_rows(
    kpt_uv_l, desc_l, valid_l, octave_l,
    kpt_uv_r, desc_r, valid_r, octave_r,
    min_disp: float = 0.0, max_disp: float = 128.0,
    row_band: float = 2.0, max_dist: float = (ORB_TH_HIGH + ORB_TH_LOW) / 2,
    binary: bool = True,
):
    """Row-banded stereo matching for rectified pairs.

    Role of Frame::ComputeStereoMatches (/root/reference/src/Frame.cc:
    1004-1174): for each left keypoint, search right keypoints within
    +-row_band rows (scaled by octave there) and [min_disp, max_disp]
    disparity, accept the best descriptor distance below
    (TH_HIGH+TH_LOW)/2 (thOrbDist, Frame.cc:1027). (The reference then
    refines with an image-patch SAD parabola; descriptor-level matching is
    the shape-static equivalent — subpixel refinement belongs to the
    extractor's subpixel stage in this design.)

    Returns MatchResult over left keypoints + the disparity of each match.
    """
    dv = kpt_uv_l[:, None, 1] - kpt_uv_r[None, :, 1]
    disp = kpt_uv_l[:, None, 0] - kpt_uv_r[None, :, 0]
    same_oct = octave_l[:, None] == octave_r[None, :]
    within = (
        (jnp.abs(dv) <= row_band)
        & (disp >= min_disp)
        & (disp <= max_disp)
        & same_oct
    )
    dist = _mask_dist(distance_matrix(desc_l, desc_r, binary), valid_l, valid_r)
    dist = jnp.where(within, dist, INVALID)
    best, second, idx = _best_two(dist)
    ok = (best <= max_dist) & valid_l
    N2 = kpt_uv_r.shape[0]
    keyed = jnp.where(ok, best, INVALID)
    col_min = jnp.full((N2,), INVALID).at[jnp.where(ok, idx, 0)].min(keyed)
    keep = ok & (best <= col_min[jnp.clip(idx, 0, N2 - 1)])
    disparity = jnp.take_along_axis(disp, idx[:, None], axis=1)[:, 0]
    return MatchResult(jnp.where(keep, idx, -1), best, keep), jnp.where(
        keep, disparity, -1.0
    )
