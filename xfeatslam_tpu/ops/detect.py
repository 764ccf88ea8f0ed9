"""Keypoint detection post-processing: softmax heatmap, NMS, top-K, descriptor
sampling — one fixed-shape XLA graph.

TPU-native re-design of the libtorch post-processing in the reference
(/root/reference/src/XFextractor.cc:204-305): where the reference builds a
dynamic list of NMS survivors (`nonzero` + per-batch padding, :219-248) and
reads keypoints back one `.item<float>()` at a time (:321-343), this kernel
keeps every shape static (dense masks + a single top-K) and returns one
fixed-size batch of (coords, scores, descriptors, valid) so the host does a
single device->host transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import image as image_ops


def keypoint_heatmap(logits, softmax_temp: float = 1.0):
    """(B,H8,W8,65) keypoint logits -> (B,H,W,1) full-res heatmap.

    softmax over the 65 channels, drop the dustbin (65th), pixel-shuffle the
    64 = 8x8 cells back to full resolution (reference
    /root/reference/src/XFextractor.cc:204-217; channel k = i*8+j with i the
    row offset, inverse of unfold2d).
    """
    B, H8, W8, C = logits.shape
    scores = jax.nn.softmax(logits * softmax_temp, axis=-1)[..., :64]
    x = scores.reshape(B, H8, W8, 8, 8)
    x = x.transpose(0, 1, 3, 2, 4)  # (B,H8,8,W8,8)
    return x.reshape(B, H8 * 8, W8 * 8, 1)


def nms_mask(heatmap, threshold: float = 0.05, kernel_size: int = 5):
    """Local-maximum mask: value equals the 5x5 max and exceeds threshold
    (reference NMS, /root/reference/src/XFextractor.cc:219-248)."""
    pad = kernel_size // 2
    local_max = lax.reduce_window(
        heatmap,
        -jnp.inf,
        lax.max,
        (1, kernel_size, kernel_size, 1),
        (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return (heatmap == local_max) & (heatmap > threshold)


def _nms_topk_tiled(ranked, k: int, tile_h: int = 8, tile_w: int = 16,
                    per_tile: int = 24):
    """Exact top-k over an NMS-masked score map, in two stages.

    A flat lax.top_k over B x (H*W) is the single most expensive op in the
    extraction pipeline on TPU (measured 130 ms of a 192 ms batch-256
    graph — tools/profile_pipeline.py). But 5x5 NMS survivors are spaced:
    two distinct local maxima within the same window cannot both survive,
    so any 8x16 tile holds at most ceil(8/3)*ceil(16/3) = 18 survivors
    (ties on exactly-equal plateau scores could exceed this; per_tile=24
    leaves margin, and a lost tie is an identical-score duplicate the NMS
    exists to remove). Stage 1 takes a per-tile top-``per_tile`` over 128
    elements; stage 2 runs the real top-k over the ~7x smaller candidate
    set. Returns (scores (B,k), flat indices (B,k)) identical to
    lax.top_k(ranked.reshape(B,-1), k) up to pathological ties.
    """
    B, H, W = ranked.shape
    nth, ntw = H // tile_h, W // tile_w
    t = ranked.reshape(B, nth, tile_h, ntw, tile_w)
    t = t.transpose(0, 1, 3, 2, 4).reshape(B, nth * ntw, tile_h * tile_w)
    vals, loc = lax.top_k(t, per_tile)  # (B, nt, per_tile)
    ty, tx = loc // tile_w, loc % tile_w
    tile_ids = jnp.arange(nth * ntw, dtype=jnp.int32)
    gy = (tile_ids // ntw)[None, :, None] * tile_h + ty
    gx = (tile_ids % ntw)[None, :, None] * tile_w + tx
    gidx = (gy * W + gx).reshape(B, -1)
    scores, sel = lax.top_k(vals.reshape(B, -1), k)
    idx = jnp.take_along_axis(gidx, sel, axis=1)
    return scores, idx


@functools.partial(jax.jit, static_argnames=("num_keypoints", "subpixel"))
def select_keypoints(feats, logits, heatmap, num_keypoints: int,
                     threshold: float = 0.05, softmax_temp: float = 1.0,
                     subpixel: bool = False):
    """Fixed-shape keypoint selection + descriptor sampling.

    Args:
      feats: (B,H8,W8,64) dense descriptors (unnormalized network output).
      logits: (B,H8,W8,65) keypoint logits.
      heatmap: (B,H8,W8,1) reliability map.
      num_keypoints: K, static.

    Returns dict of:
      kpts: (B,K,2) float (x,y) in resized-image pixels.
      scores: (B,K) reliability*keypoint score; <=0 where invalid.
      desc: (B,K,64) L2-normalized descriptors.
      valid: (B,K) bool.

    Pipeline parity with /root/reference/src/XFextractor.cc:269-305:
    L2-normalize dense feats -> softmax/pixel-shuffle heatmap -> 5x5 NMS ->
    score = nearest(K1h)*bilinear(H1) -> top-K -> bilinear descriptors ->
    L2 normalize. (The reference then rescales coords by (rw,rh); done by
    the caller which knows the original size.)
    """
    B, H8, W8, _ = feats.shape
    H, W = H8 * 8, W8 * 8

    featsn = feats * lax.rsqrt(
        jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12
    )

    k1h = keypoint_heatmap(logits, softmax_temp)  # (B,H,W,1)
    mask = nms_mask(k1h, threshold)[..., 0]  # (B,H,W)

    # Ranking score, replicating the sampler quirks of the reference:
    # nearest-sample of K1h at its own integer coords equals K1h except the
    # sampler's +x/(W-1)-0.5 shift pushes the last row/col out of bounds
    # (score 0 there); bilinear reliability comes from upsampling H1 with the
    # same grid mapping.
    rel = image_ops.dense_grid_sample_bilinear(heatmap, (H, W))[..., 0]
    k1h_nearest = k1h[..., 0]
    # zero the last row/col to mirror grid_sample zero padding at px=W-0.5
    k1h_nearest = k1h_nearest.at[:, -1, :].set(0.0).at[:, :, -1].set(0.0)
    score_map = k1h_nearest * rel

    neg_inf = jnp.float32(-1.0)
    ranked = jnp.where(mask, score_map, neg_inf)
    scores, idx = _nms_topk_tiled(ranked, num_keypoints)
    xs_i = idx % W
    ys_i = idx // W
    kpts = jnp.stack([xs_i.astype(jnp.float32),
                      ys_i.astype(jnp.float32)], axis=-1)  # (B,K,2)

    valid = scores > 0.0

    if subpixel:
        # 3x3 soft-argmax on the keypoint heatmap around each NMS peak:
        # centroid of the local probability mass gives a sub-pixel offset
        # (the reference keeps integer XFeat coords, XFextractor.cc:297 — a
        # documented improvement: localization below the pixel grid feeds
        # directly into triangulation/BA accuracy)
        k1f = k1h[..., 0].reshape(B, H * W)
        wsum = jnp.zeros_like(scores)
        dxsum = jnp.zeros_like(scores)
        dysum = jnp.zeros_like(scores)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs2 = jnp.clip(xs_i + dx, 0, W - 1)
                ys2 = jnp.clip(ys_i + dy, 0, H - 1)
                w = jnp.take_along_axis(k1f, ys2 * W + xs2, axis=1)
                wsum = wsum + w
                dxsum = dxsum + w * dx
                dysum = dysum + w * dy
        off = jnp.stack([dxsum, dysum], -1) / jnp.maximum(
            wsum, 1e-9)[..., None]
        kpts = kpts + jnp.clip(off, -1.0, 1.0)

    desc = image_ops.sample_bilinear(featsn, kpts, (H, W))
    desc = desc * lax.rsqrt(jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12)
    desc = desc * valid[..., None]

    return {"kpts": kpts, "scores": scores, "desc": desc, "valid": valid}
