"""ORB classic feature path (FAST + oriented BRIEF), TPU-native.

Replacement for /root/reference/src/ORBextractor.cc (1,197 LoC): the same
capabilities — 8-level 1.2x pyramid, per-cell adaptive FAST with ini/min
thresholds, quadtree balancing, intensity-centroid orientation, 256-bit
rotated BRIEF on a 7x7-blurred image — designed for the TPU rather than
translated:

  * FAST is a dense vectorized op: the 16-point circle test is 32 shifted
    comparisons + a circular run-length reduction over the whole level at
    once (the reference loops 35px cells on CPU, :555-650).
  * Orientation moments come from two convolutions (x- and y-weighted
    circular masks) instead of per-keypoint patch loops (IC_Angle :76-105).
  * BRIEF bits are batched gathers of a rotated sampling pattern; the
    descriptor is emitted as a (256,) float32 0/1 vector so Hamming distance
    is the SAME matmul kernel as XFeat's L2 (ops/matching.py) — on binary
    vectors squared-L2 == Hamming (ORBmatcher::DescriptorDistance POPCNT,
    /root/reference/src/ORBmatcher.cc:2253-2266).
  * The sampling pattern is generated (seeded isotropic Gaussian pairs, the
    BRIEF-paper G-II recipe) rather than copying the learned OpenCV table;
    descriptors never need to interoperate with OpenCV bitstrings.
  * Quadtree keypoint balancing (DistributeOctTree :555-877) runs on host
    over the NMS survivors — pure control flow.

Matching thresholds in ORB mode: TH_HIGH=100, TH_LOW=50 raw Hamming
(/root/reference/src/ORBmatcher.cc:34-35).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_LEVELS = 8
SCALE_FACTOR = 1.2
PATCH_RADIUS = 15  # orientation patch (HALF_PATCH_SIZE)
EDGE = 19  # EDGE_THRESHOLD margin like the reference
TH_HIGH = 100.0
TH_LOW = 50.0

# FAST circle of 16 offsets (radius 3), standard Bresenham circle
_CIRCLE = np.array(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)],
    np.int32,
)  # (dx, dy)


def make_brief_pattern(seed: int = 7, n_bits: int = 256, sigma: float = 6.5,
                       rmax: float = 13.0) -> np.ndarray:
    """(n_bits, 4) int8 sampling pairs (x1,y1,x2,y2), Gaussian G-II style."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, sigma, (n_bits, 4))
    pts = np.clip(pts, -rmax, rmax)
    return np.round(pts).astype(np.int8)


def _load_pattern() -> np.ndarray:
    """Sampling-pattern resolution: $XFEATSLAM_BRIEF_PATTERN (a .npy path,
    or the literal "gaussian" for the legacy generated pattern), else the
    committed learned pattern (greedy-decorrelation over rendered oriented
    patches, tools/learn_brief_pattern.py — the selection recipe behind the
    reference's bit_pattern_31_, /root/reference/src/ORBextractor.cc:149),
    else the generated Gaussian fallback."""
    import os

    env = os.environ.get("XFEATSLAM_BRIEF_PATTERN")
    if env == "gaussian":
        return make_brief_pattern()
    if env and os.path.exists(env):
        return np.load(env).astype(np.int8)
    default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "brief_pattern.npy")
    if os.path.exists(default):
        return np.load(default).astype(np.int8)
    return make_brief_pattern()


_PATTERN = _load_pattern()


def _shift2d(img, dx: int, dy: int):
    """Shift (H,W) image by (dx,dy) with edge padding."""
    return jnp.roll(img, shift=(dy, dx), axis=(0, 1))


@functools.partial(jax.jit, static_argnames=())
def fast_score_map(img, threshold):
    """Dense FAST-9 corner response for one pyramid level.

    img: (H,W) float32 in [0,255]. Returns (H,W) score map (0 = not corner).
    Score = sum of |p - circle_i| over contributing arc pixels (OpenCV-style
    response used for NMS/quadtree 'best' selection).
    """
    p = img
    brighter = []
    darker = []
    diffs = []
    for (dx, dy) in _CIRCLE:
        q = _shift2d(img, -int(dx), -int(dy))
        brighter.append(q > p + threshold)
        darker.append(q < p - threshold)
        diffs.append(jnp.abs(q - p))
    B = jnp.stack(brighter, -1)  # (H,W,16)
    D = jnp.stack(darker, -1)
    A = jnp.stack(diffs, -1)

    def has_run9(M):
        M2 = jnp.concatenate([M, M[..., :8]], axis=-1)  # wrap
        runs = []
        for s in range(16):
            runs.append(jnp.all(M2[..., s : s + 9], axis=-1))
        return jnp.any(jnp.stack(runs, -1), axis=-1)

    corner = has_run9(B) | has_run9(D)
    score = jnp.sum(jnp.where(B | D, A, 0.0), axis=-1)
    return jnp.where(corner, score, 0.0)


@jax.jit
def nms3_mask(score):
    m = lax.reduce_window(
        score[None, :, :, None], -jnp.inf, lax.max,
        (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )[0, :, :, 0]
    return (score == m) & (score > 0)


def _gauss_kernel7(sigma: float = 2.0):
    x = np.arange(7) - 3
    g = np.exp(-x * x / (2 * sigma * sigma))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _circle_mask(radius: int):
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    # reference uses a row-wise circular patch via umax (ORBextractor.cc:113-130)
    return (x * x + y * y <= radius * radius).astype(np.float32), x, y


@jax.jit
def orientation_maps(img):
    """m10/m01 moment maps via convolution (IC_Angle equivalent)."""
    mask, xs, ys = _circle_mask(PATCH_RADIUS)
    kx = (mask * xs).astype(np.float32)[:, :, None, None]
    ky = (mask * ys).astype(np.float32)[:, :, None, None]
    x4 = img[None, :, :, None]

    def conv(k):
        return lax.conv_general_dilated(
            x4, jnp.asarray(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    return conv(kx), conv(ky)


@jax.jit
def blur7(img):
    k = _gauss_kernel7()[:, :, None, None]
    return lax.conv_general_dilated(
        img[None, :, :, None], jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("n_kpts",))
def describe(blurred, m10, m01, kpts, valid, n_kpts: int):
    """Oriented BRIEF at integer keypoint positions.

    blurred: (H,W); kpts: (n_kpts,2) float (x,y) level coords.
    Returns (desc (n_kpts,256) float 0/1, angles (n_kpts,) radians).
    """
    H, W = blurred.shape
    xi = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, H - 1)
    flat = blurred.reshape(-1)
    m10v = m10.reshape(-1)[yi * W + xi]
    m01v = m01.reshape(-1)[yi * W + xi]
    angle = jnp.arctan2(m01v, m10v)
    ca, sa = jnp.cos(angle), jnp.sin(angle)

    pat = jnp.asarray(_PATTERN, jnp.float32)  # (256,4)
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    def rot(px, py):
        rx = ca[:, None] * px[None, :] - sa[:, None] * py[None, :]
        ry = sa[:, None] * px[None, :] + ca[:, None] * py[None, :]
        gx = jnp.clip(xi[:, None] + jnp.round(rx).astype(jnp.int32), 0, W - 1)
        gy = jnp.clip(yi[:, None] + jnp.round(ry).astype(jnp.int32), 0, H - 1)
        return flat[gy * W + gx]  # (n_kpts, 256)

    v1 = rot(x1, y1)
    v2 = rot(x2, y2)
    bits = (v1 < v2).astype(jnp.float32)
    return bits * valid[:, None], angle


@functools.partial(jax.jit, static_argnames=("sizes", "caps", "mins"))
def orb_candidates(img0, sizes, caps, mins, ini_thr, min_thr):
    """ALL pyramid levels' FAST candidates in ONE XLA graph (one dispatch).

    The per-level host loop this replaces cost ~4 dispatches + two
    image-sized host transfers per level (~30 round trips per frame —
    the dominant online-mode cost when the device sits behind a network
    tunnel). Here every level is resized, FAST-scored at BOTH thresholds
    (the adaptive ini/min retry of ORBextractor.cc:617-648 becomes a
    jnp.where select — dense FAST is cheap on the VPU, the round trip is
    not), NMS'd, border-masked, top-K'd and subpixel-refined on device;
    only (cap, 2) candidate arrays ever reach the host.

    Args:
      img0: (H0,W0) float32 level-0 image.
      sizes: static tuple of (h, w) per level.
      caps: static tuple — candidate cap per level (top-K size).
      mins: static tuple — fire count below which the min threshold is used.
    Returns list of (xy (cap,2) subpixel level coords, score (cap,),
    valid (cap,)) per level.
    """
    outs = []
    for lvl, (h, w) in enumerate(sizes):
        if lvl == 0:
            x = img0
        else:
            x = jax.image.resize(img0, (h, w), "bilinear")
        s_ini = fast_score_map(x, ini_thr)
        m_ini = nms3_mask(s_ini)
        s_min = fast_score_map(x, min_thr)
        m_min = nms3_mask(s_min)
        yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inb = ((yy >= EDGE) & (yy < h - EDGE)
               & (xx >= EDGE) & (xx < w - EDGE))
        m_ini &= inb
        m_min &= inb
        use_min = jnp.sum(m_ini.astype(jnp.int32)) < mins[lvl]
        score = jnp.where(use_min, s_min, s_ini)
        mask = jnp.where(use_min, m_min, m_ini)
        flat = jnp.where(mask, score, -1.0).reshape(-1)
        top, idx = lax.top_k(flat, caps[lvl])
        xs = idx % w
        ys = idx // w
        # 1D quadratic subpixel on the FAST response (same fit as before)
        sf = score.reshape(-1)

        def at(dy, dx):
            return sf[jnp.clip(ys + dy, 0, h - 1) * w
                      + jnp.clip(xs + dx, 0, w - 1)]

        c = top
        num_x = at(0, 1) - at(0, -1)
        den_x = 2.0 * (2.0 * c - at(0, 1) - at(0, -1))
        num_y = at(1, 0) - at(-1, 0)
        den_y = 2.0 * (2.0 * c - at(1, 0) - at(-1, 0))
        off_x = jnp.clip(jnp.where(jnp.abs(den_x) > 1e-6,
                                   num_x / jnp.where(den_x == 0, 1.0, den_x),
                                   0.0), -0.5, 0.5)
        off_y = jnp.clip(jnp.where(jnp.abs(den_y) > 1e-6,
                                   num_y / jnp.where(den_y == 0, 1.0, den_y),
                                   0.0), -0.5, 0.5)
        xy = jnp.stack([xs.astype(jnp.float32) + off_x,
                        ys.astype(jnp.float32) + off_y], -1)
        outs.append((xy, top, top > 0.0))
    return outs


@functools.partial(jax.jit, static_argnames=("sizes",))
def orb_describe_all(img0, sizes, kpts_list, valid_list):
    """Oriented BRIEF for all levels in ONE graph (second dispatch): resize,
    blur, orientation moments, and descriptor gathers per level, returning
    per-level (desc, angle) tuples. Level images are recomputed on device —
    cheaper than shipping them to the host and back."""
    outs = []
    for lvl, (h, w) in enumerate(sizes):
        if lvl == 0:
            x = img0
        else:
            x = jax.image.resize(img0, (h, w), "bilinear")
        m10, m01 = orientation_maps(x)
        desc, ang = describe(blur7(x), m10, m01, kpts_list[lvl],
                             valid_list[lvl], kpts_list[lvl].shape[0])
        outs.append((desc, ang))
    return outs


def distribute_quadtree(kpts: np.ndarray, scores: np.ndarray, n_target: int,
                        bounds: Tuple[float, float, float, float]) -> np.ndarray:
    """Quadtree balancing: split nodes until >= n_target, keep the best
    corner per node (DistributeOctTree,
    /root/reference/src/ORBextractor.cc:555-877). Returns selected indices.

    Uses the native C++ implementation (xfeatslam_tpu/native) when
    available; this Python version is the fallback."""
    from .. import native

    sel = native.quadtree_select(kpts, scores, n_target, bounds)
    if sel is not None:
        return sel
    x0, y0, x1, y1 = bounds
    if len(kpts) <= n_target:
        return np.arange(len(kpts))
    nodes = [(x0, y0, x1, y1, np.arange(len(kpts)))]
    final = []
    while True:
        if len(nodes) + len(final) >= n_target or not nodes:
            break
        # split the node with most points first
        nodes.sort(key=lambda n: len(n[4]), reverse=True)
        nx0, ny0, nx1, ny1, idx = nodes.pop(0)
        if len(idx) == 1:
            final.append((nx0, ny0, nx1, ny1, idx))
            continue
        mx, my = (nx0 + nx1) / 2, (ny0 + ny1) / 2
        pts = kpts[idx]
        for qx0, qy0, qx1, qy1 in [
            (nx0, ny0, mx, my), (mx, ny0, nx1, my),
            (nx0, my, mx, ny1), (mx, my, nx1, ny1),
        ]:
            sel = idx[
                (pts[:, 0] >= qx0) & (pts[:, 0] < qx1)
                & (pts[:, 1] >= qy0) & (pts[:, 1] < qy1)
            ]
            if len(sel) == 1:
                final.append((qx0, qy0, qx1, qy1, sel))
            elif len(sel) > 1:
                nodes.append((qx0, qy0, qx1, qy1, sel))
            pts = kpts[idx]
    out = []
    for (_, _, _, _, idx) in final + nodes:
        if len(idx):
            out.append(idx[np.argmax(scores[idx])])
    return np.array(sorted(out), np.int64)


class ORBExtractor:
    """Drop-in alternative to XFeatExtractor with the classic pipeline
    (USE_ORB mode, SURVEY.md §2.3.1). Returns the same dict shape with
    256-d binary descriptors and per-keypoint octave/size metadata."""

    def __init__(self, nfeatures: int = 1000, scale_factor: float = SCALE_FACTOR,
                 n_levels: int = N_LEVELS, ini_threshold: float = 20.0,
                 min_threshold: float = 7.0):
        self.nfeatures = nfeatures
        self.n_levels = n_levels
        self.scale_factor = scale_factor
        self.ini_threshold = ini_threshold
        self.min_threshold = min_threshold
        self.scales = [scale_factor ** i for i in range(n_levels)]
        # per-level feature budget, geometric split (ORBextractor.cc:100-111)
        factor = 1.0 / scale_factor
        n_desired = nfeatures * (1 - factor) / (1 - factor ** n_levels)
        self.n_per_level = []
        acc = 0
        for i in range(n_levels - 1):
            n = round(n_desired)
            self.n_per_level.append(n)
            acc += n
            n_desired *= factor
        self.n_per_level.append(max(nfeatures - acc, 0))

    def _level_sizes(self, H0: int, W0: int):
        """Static (h, w) per usable level for one image size."""
        sizes = []
        for lvl in range(self.n_levels):
            h = H0 if lvl == 0 else int(round(H0 / self.scales[lvl]))
            w = W0 if lvl == 0 else int(round(W0 / self.scales[lvl]))
            if h <= 2 * EDGE + 7 or w <= 2 * EDGE + 7:
                break
            sizes.append((h, w))
        return tuple(sizes)

    def __call__(self, image: np.ndarray):
        """image: (H,W) uint8/float. Returns dict kpts/scores/desc/valid/
        octave/size with kpts in level-0 coordinates (B=1 leading dim).

        Two device dispatches per frame: orb_candidates (all levels fused),
        host quadtree balancing (pure control flow on small arrays), then
        orb_describe_all (all levels fused)."""
        img0 = np.asarray(image, np.float32)
        if img0.ndim == 3:
            img0 = img0.mean(-1)
        H0, W0 = img0.shape
        K = self.nfeatures
        sizes = self._level_sizes(H0, W0)
        caps = tuple(min(self.n_per_level[lvl] * 8, h * w)
                     for lvl, (h, w) in enumerate(sizes))
        mins = tuple(2 * self.n_per_level[lvl] for lvl in range(len(sizes)))

        x0 = jnp.asarray(img0)
        cands = orb_candidates(x0, sizes, caps, mins,
                               jnp.float32(self.ini_threshold),
                               jnp.float32(self.min_threshold))
        cands = [(np.asarray(xy), np.asarray(sc), np.asarray(va))
                 for (xy, sc, va) in cands]

        kp_pad, va_pad, keep = [], [], []
        for lvl, (h, w) in enumerate(sizes):
            xy, sc, va = cands[lvl]
            xy, sc = xy[va], sc[va]
            n_pad = self.n_per_level[lvl] * 2
            kp = np.zeros((n_pad, 2), np.float32)
            vm = np.zeros(n_pad, bool)
            if len(xy):
                sel = distribute_quadtree(
                    xy, sc, self.n_per_level[lvl],
                    (EDGE, EDGE, w - EDGE, h - EDGE),
                )
                xy, sc = xy[sel], sc[sel]
                n = min(len(xy), n_pad)
                kp[:n] = xy[:n]
                vm[:n] = True
                keep.append((lvl, xy[:n], sc[:n]))
            kp_pad.append(jnp.asarray(kp))
            va_pad.append(jnp.asarray(vm))

        desc_all = orb_describe_all(x0, sizes, tuple(kp_pad), tuple(va_pad))

        all_kpts, all_scores, all_desc, all_oct, all_ang = [], [], [], [], []
        for (lvl, xy, sc) in keep:
            n = len(xy)
            desc, ang = desc_all[lvl]
            all_kpts.append(xy * self.scales[lvl])
            all_scores.append(sc)
            all_desc.append(np.asarray(desc)[:n])
            all_ang.append(np.asarray(ang)[:n])
            all_oct.append(np.full(n, lvl, np.int32))

        kpts = np.concatenate(all_kpts) if all_kpts else np.zeros((0, 2), np.float32)
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0, np.float32)
        desc = np.concatenate(all_desc) if all_desc else np.zeros((0, 256), np.float32)
        octv = np.concatenate(all_oct) if all_oct else np.zeros(0, np.int32)
        angs = np.concatenate(all_ang) if all_ang else np.zeros(0, np.float32)

        out_k = np.zeros((1, K, 2), np.float32)
        out_s = np.zeros((1, K), np.float32)
        out_d = np.zeros((1, K, 256), np.float32)
        out_v = np.zeros((1, K), bool)
        out_o = np.zeros((1, K), np.int32)
        out_a = np.zeros((1, K), np.float32)
        n = min(len(kpts), K)
        if n:
            order = np.argsort(-scores)[:n]
            out_k[0, :n] = kpts[order]
            out_s[0, :n] = scores[order]
            out_d[0, :n] = desc[order]
            out_o[0, :n] = octv[order]
            out_a[0, :n] = angs[order]
            out_v[0, :n] = True
        return {"kpts": out_k, "scores": out_s, "desc": out_d,
                "valid": out_v, "octave": out_o, "angle": out_a}
