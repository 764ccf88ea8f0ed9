"""Image preprocessing and sampling kernels (XLA-fused, fixed shapes).

Replaces the OpenCV/libtorch preprocessing in the reference
(/root/reference/src/XFextractor.cc:161-202 parseInput/preprocessTensor and
the grid_sample-based InterpolateSparse2d, /root/reference/src/XFeat.cc:176-210).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_float_image(img):
    """uint8 (B,H,W,C) or (H,W[,C]) -> float32 (B,H,W,C) in [0,1]."""
    x = jnp.asarray(img)
    if x.ndim == 2:
        x = x[None, :, :, None]
    elif x.ndim == 3:
        x = x[None]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def resize_bilinear(x, out_hw):
    """Half-pixel-center bilinear resize (torch align_corners=False parity,
    used by preprocessTensor /root/reference/src/XFextractor.cc:182-202)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], C), method="bilinear")


def _grid_sample_coords(coords_xy, src_hw, norm_hw):
    """Map keypoint coords to source-grid positions, replicating the
    reference sampler's normalization chain (normgrid by (W-1,H-1) then
    grid_sample align_corners=False):
        px = x * Ws / (Wn - 1) - 0.5
    (/root/reference/src/XFeat.cc:181-196).
    """
    Hs, Ws = src_hw
    Hn, Wn = norm_hw
    px = coords_xy[..., 0] * (Ws / (Wn - 1.0)) - 0.5
    py = coords_xy[..., 1] * (Hs / (Hn - 1.0)) - 0.5
    return px, py


def sample_bilinear(img, coords_xy, norm_hw):
    """Sparse bilinear sampling with zero padding (grid_sample parity).

    Args:
      img: (B, Hs, Ws, C) source.
      coords_xy: (B, K, 2) keypoint coords in the `norm_hw` pixel frame.
      norm_hw: (Hn, Wn) the frame the coords live in (the resized image).
    Returns: (B, K, C)
    """
    B, Hs, Ws, C = img.shape
    px, py = _grid_sample_coords(coords_xy, (Hs, Ws), norm_hw)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < Hs) & (xi >= 0) & (xi < Ws)
        yc = jnp.clip(yi, 0, Hs - 1)
        xc = jnp.clip(xi, 0, Ws - 1)
        flat = img.reshape(B, Hs * Ws, C)
        idx = yc * Ws + xc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * inb[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def sample_bilinear_px(img, coords_xy):
    """Sparse bilinear sampling at EXACT pixel coordinates (value at
    integer (x, y) is img[y, x]; zero padding out of bounds).

    sample_bilinear above replicates the reference's grid_sample
    normalization chain — right for descriptor-map parity, but it shifts
    positions by up to half a pixel near the borders, which corrupts
    geometric lookups (e.g. sampling a dense correspondence field at a
    predicted peak in the localization-agreement loss, parallel/train.py).
    """
    B, Hs, Ws, C = img.shape
    px = coords_xy[..., 0]
    py = coords_xy[..., 1]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < Hs) & (xi >= 0) & (xi < Ws)
        idx = jnp.clip(yi, 0, Hs - 1) * Ws + jnp.clip(xi, 0, Ws - 1)
        vals = jnp.take_along_axis(img.reshape(B, Hs * Ws, C),
                                   idx[..., None], axis=1)
        return vals * inb[..., None]

    return (gather(y0i, x0i) * (1 - wx) * (1 - wy)
            + gather(y0i, x0i + 1) * wx * (1 - wy)
            + gather(y0i + 1, x0i) * (1 - wx) * wy
            + gather(y0i + 1, x0i + 1) * wx * wy)


def sample_nearest(img, coords_xy, norm_hw):
    """Sparse nearest sampling with zero padding (grid_sample parity)."""
    B, Hs, Ws, C = img.shape
    px, py = _grid_sample_coords(coords_xy, (Hs, Ws), norm_hw)
    xi = jnp.floor(px + 0.5).astype(jnp.int32)
    yi = jnp.floor(py + 0.5).astype(jnp.int32)
    inb = (yi >= 0) & (yi < Hs) & (xi >= 0) & (xi < Ws)
    yc = jnp.clip(yi, 0, Hs - 1)
    xc = jnp.clip(xi, 0, Ws - 1)
    flat = img.reshape(B, Hs * Ws, C)
    idx = yc * Ws + xc
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return vals * inb[..., None]


def dense_grid_sample_bilinear(img, out_hw):
    """Dense equivalent of sample_bilinear over every pixel of an (out_hw)
    grid — used to upsample the reliability map to full resolution with the
    exact sampler semantics. Separable implementation (two 1-D passes) so it
    lowers to cheap vectorized gathers.
    """
    B, Hs, Ws, C = img.shape
    Hn, Wn = out_hw

    def axis_weights(n_out, n_src, n_norm):
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_src / (n_norm - 1.0)) - 0.5
        i0 = jnp.floor(pos)
        w = pos - i0
        i0 = i0.astype(jnp.int32)
        inb0 = (i0 >= 0) & (i0 < n_src)
        inb1 = (i0 + 1 >= 0) & (i0 + 1 < n_src)
        return (
            jnp.clip(i0, 0, n_src - 1),
            jnp.clip(i0 + 1, 0, n_src - 1),
            (1 - w) * inb0,
            w * inb1,
        )

    x0, x1, wx0, wx1 = axis_weights(Wn, Ws, Wn)
    y0, y1, wy0, wy1 = axis_weights(Hn, Hs, Hn)

    # sample along W
    gx = img[:, :, x0, :] * wx0[None, None, :, None] + img[:, :, x1, :] * wx1[None, None, :, None]
    # sample along H
    out = gx[:, y0, :, :] * wy0[None, :, None, None] + gx[:, y1, :, :] * wy1[None, :, None, None]
    return out
