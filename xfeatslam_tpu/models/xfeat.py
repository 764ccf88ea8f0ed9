"""XFeat network (CVPR 2024 'XFeat: Accelerated Features') as functional JAX.

TPU-native re-design of the libtorch implementation in the reference
(/root/reference/src/XFeat.cc:30-173, include/XFeat.h). Differences from the
reference are deliberate TPU choices, not behavior changes:

  * NHWC layout (XLA's native conv layout on TPU).
  * BatchNorm (affine=False) running statistics are folded into the conv
    weights at parameter-build time, so inference is conv+bias+relu only.
  * The whole forward runs under one jit; optional bfloat16 compute for the
    conv stack with float32 accumulation (MXU-friendly). Under bf16, the
    inter-layer activations are also STORED bf16 (each conv re-casts its
    input to bf16 regardless, so f32 storage adds no precision — it only
    doubles the HBM traffic of the bandwidth-bound early layers); head
    outputs (feats/logits/heatmap) are always float32.

Architecture (reference /root/reference/src/XFeat.cc:36-121):
  norm       InstanceNorm2d(1)
  skip1      AvgPool(4,4) -> Conv1x1(1->24)
  block1     BasicLayer(1->4 s1, 4->8 s2, 8->8 s1, 8->24 s2)
  block2     BasicLayer(24->24 s1) x2
  block3     BasicLayer(24->64 s2, 64->64 s1, 64->64 k1 s1)
  block4     BasicLayer(64->64 s2, 64->64 s1, 64->64 s1)
  block5     BasicLayer(64->128 s2, 128->128 s1 x2, 128->64 k1 s1)
  fusion     BasicLayer(64->64 s1) x2 + Conv1x1(64->64, bias)
  heatmap    BasicLayer(64->64 k1) x2 + Conv1x1(64->1, bias) + sigmoid
  keypoint   unfold2d(x,8): BasicLayer(64->64 k1) x3 + Conv1x1(64->65, bias)
  fine_matcher  MLP 128->512x4->64 (declared by the reference, unused at
                inference — /root/reference/src/XFeat.cc:92-108; we keep it
                for weight-compat and the refinement API)

BasicLayer = Conv2d(bias=False) + BatchNorm2d(affine=False) + ReLU
(/root/reference/src/XFeat.cc:7-28).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BN_EPS = 1e-5

# (name, [(cin, cout, ksize, stride), ...]) for the BasicLayer stacks.
_BASIC_STACKS = {
    "block1": [(1, 4, 3, 1), (4, 8, 3, 2), (8, 8, 3, 1), (8, 24, 3, 2)],
    "block2": [(24, 24, 3, 1), (24, 24, 3, 1)],
    "block3": [(24, 64, 3, 2), (64, 64, 3, 1), (64, 64, 1, 1)],
    "block4": [(64, 64, 3, 2), (64, 64, 3, 1), (64, 64, 3, 1)],
    "block5": [(64, 128, 3, 2), (128, 128, 3, 1), (128, 128, 3, 1), (128, 64, 1, 1)],
    "block_fusion": [(64, 64, 3, 1), (64, 64, 3, 1)],
    "heatmap_head": [(64, 64, 1, 1), (64, 64, 1, 1)],
    "keypoint_head": [(64, 64, 1, 1), (64, 64, 1, 1), (64, 64, 1, 1)],
}
# (name, cin, cout) for the plain (bias) convs that end each head.
_FINAL_CONVS = {
    "skip1_conv": (1, 24, 1),
    "block_fusion_final": (64, 64, 1),
    "heatmap_final": (64, 1, 1),
    "keypoint_final": (64, 65, 1),
}
_FINE_MATCHER = [(128, 512), (512, 512), (512, 512), (512, 512), (512, 64)]

Params = Dict[str, Any]


def init_params(key: jax.Array, dtype=jnp.float32,
                analytic_detector: bool = True) -> Params:
    """Deterministic He-init parameters (BN stats identity => fold is no-op).

    The reference loads `weights/xfeat.pt` (missing from the snapshot,
    /root/reference/.MISSING_LARGE_BLOBS); use models.weights.load_torch
    to convert real weights when available.

    analytic_detector: replace the random keypoint head with handcrafted
    weights implementing a local-contrast detector (logit of cell pixel k =
    gain * (x_k - mean(x))). The pixel-shuffle decoding maps softmax channel
    k to position k within each 8x8 cell, so an untrained head yields
    content-hash positions with +-8 px error — useless for geometry. The
    analytic head keeps the full network path (convs, softmax, NMS,
    samplers) while giving repeatable, localized keypoints until trained
    weights are loaded.
    """
    params: Params = {}
    n_keys = sum(len(v) for v in _BASIC_STACKS.values()) + len(_FINAL_CONVS) + len(_FINE_MATCHER)
    keys = list(jax.random.split(key, n_keys))

    def he(k, shape, fan_in):
        return (jax.random.normal(k, shape, dtype) * np.sqrt(2.0 / fan_in)).astype(dtype)

    for name, layers in _BASIC_STACKS.items():
        stack = []
        for (cin, cout, ks, _s) in layers:
            k = keys.pop()
            stack.append(
                {
                    "w": he(k, (ks, ks, cin, cout), ks * ks * cin),
                    "b": jnp.zeros((cout,), dtype),
                }
            )
        params[name] = stack
    for name, (cin, cout, ks) in _FINAL_CONVS.items():
        k = keys.pop()
        params[name] = {
            "w": he(k, (ks, ks, cin, cout), ks * ks * cin),
            "b": jnp.zeros((cout,), dtype),
        }
    fm = []
    for (cin, cout) in _FINE_MATCHER:
        k = keys.pop()
        fm.append({"w": he(k, (cin, cout), cin), "b": jnp.zeros((cout,), dtype)})
    params["fine_matcher"] = fm

    if analytic_detector:
        shift = jnp.float32(10.0)
        eye = jnp.eye(64, dtype=dtype)[None, None]
        for i in range(3):
            params["keypoint_head"][i] = {
                "w": eye,
                "b": jnp.full((64,), shift, dtype),
            }
        gain = 5.0  # graded softmax: higher gains saturate per-cell and cost repeatability
        w_final = gain * (jnp.eye(64, dtype=dtype) - 1.0 / 64.0)
        # dustbin channel: constant 0 logit (weights sum to 0 kills the shift)
        w_final = jnp.concatenate([w_final, jnp.zeros((64, 1), dtype)], axis=1)
        params["keypoint_final"] = {
            "w": w_final[None, None],
            "b": jnp.zeros((65,), dtype),
        }
    return params


def _conv(x, w, b, stride: int, pad: int, dt=jnp.float32, out_dt=jnp.float32):
    """Explicit-padding conv matching torch Conv2d(padding=pad, stride=stride).

    Inputs are cast to the compute dtype `dt` (bf16 for MXU speed); the
    accumulation stays float32 via preferred_element_type. `out_dt` sets the
    STORAGE dtype of the result: inter-layer activations are kept in `dt`
    on TPU — the next conv re-casts to `dt` anyway, so storing f32 between
    layers buys no precision (relu commutes with rounding: monotone, 0->0)
    while doubling the HBM traffic of the full/half-resolution early layers,
    which is where the forward pass's time goes (PERF.md: the conv stack is
    bandwidth-bound, not MXU-bound). Head outputs stay f32.
    """
    y = lax.conv_general_dilated(
        x.astype(dt),
        w.astype(dt),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(out_dt)


def _basic_stack(x, stack_params, layers, dt=jnp.float32):
    for p, (_cin, _cout, ks, stride) in zip(stack_params, layers):
        x = _conv(x, p["w"], p["b"], stride, ks // 2, dt, out_dt=dt)
        x = jnp.maximum(x, 0.0)
    return x


def instance_norm(x, eps: float = BN_EPS):
    """InstanceNorm over (H, W) per sample/channel (torch InstanceNorm2d,
    affine=False, reference /root/reference/src/XFeat.cc:148-149)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def unfold2d(x, ws: int = 8):
    """Space-to-depth: (B,H,W,1) -> (B,H/ws,W/ws,ws*ws), channel = i*ws+j
    with i the row offset (matches torch unfold order,
    /root/reference/src/XFeat.cc:124-133)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // ws, W // ws, ws * ws * C)


def _resize_bilinear(x, out_hw):
    """Bilinear resize with half-pixel centers (= torch align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], C), method="bilinear")


def forward(params: Params, x, *, compute_dtype=jnp.float32):
    """XFeat forward pass.

    Args:
      params: folded inference params (init_params / weights.load_torch).
      x: (B, H, W, C) float images in [0,1], H and W multiples of 32.
      compute_dtype: jnp.bfloat16 casts conv inputs for MXU speed (f32
        accumulation is kept via preferred_element_type).

    Returns:
      feats:   (B, H/8, W/8, 64) dense descriptors (unnormalized)
      logits:  (B, H/8, W/8, 65) keypoint logits
      heatmap: (B, H/8, W/8, 1) reliability in (0,1)
    (reference /root/reference/src/XFeat.cc:135-173)
    """
    x = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    x = instance_norm(x)

    dt = compute_dtype
    p = params

    x1 = _basic_stack(x, p["block1"], _BASIC_STACKS["block1"], dt)

    # skip1: avg-pool 4x4 stride 4 then 1x1 conv (reference XFeat.cc:36-39)
    skip = lax.reduce_window(
        x, 0.0, lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID"
    ) * 0.0625
    skip = _conv(skip, p["skip1_conv"]["w"], p["skip1_conv"]["b"], 1, 0, dt,
                 out_dt=dt)

    x2 = _basic_stack(x1 + skip, p["block2"], _BASIC_STACKS["block2"], dt)
    x3 = _basic_stack(x2, p["block3"], _BASIC_STACKS["block3"], dt)
    x4 = _basic_stack(x3, p["block4"], _BASIC_STACKS["block4"], dt)
    x5 = _basic_stack(x4, p["block5"], _BASIC_STACKS["block5"], dt)

    # pyramid fusion at 1/8 resolution (reference XFeat.cc:158-166)
    hw8 = (x3.shape[1], x3.shape[2])
    x4u = _resize_bilinear(x4, hw8)
    x5u = _resize_bilinear(x5, hw8)
    fused = _basic_stack(
        x3 + x4u + x5u, p["block_fusion"], _BASIC_STACKS["block_fusion"], dt
    )
    feats = _conv(
        fused, p["block_fusion_final"]["w"], p["block_fusion_final"]["b"], 1, 0, dt
    )

    # heads
    h = _basic_stack(feats, p["heatmap_head"], _BASIC_STACKS["heatmap_head"], dt)
    heatmap = jax.nn.sigmoid(
        _conv(h, p["heatmap_final"]["w"], p["heatmap_final"]["b"], 1, 0, dt)
    )

    kin = unfold2d(x.astype(dt), ws=8)
    k = _basic_stack(kin, p["keypoint_head"], _BASIC_STACKS["keypoint_head"], dt)
    logits = _conv(k, p["keypoint_final"]["w"], p["keypoint_final"]["b"], 1, 0, dt)

    return feats, logits, heatmap


def fine_matcher_mlp(params: Params, x):
    """The refinement MLP (128 -> 64 logits). x: (..., 128).

    Inference-folded like the convs. (reference XFeat.cc:92-108; unused by
    the SLAM pipeline at inference but part of the model family.)
    """
    h = x
    for i, p in enumerate(params["fine_matcher"]):
        h = h @ p["w"] + p["b"]
        if i < len(params["fine_matcher"]) - 1:
            h = jnp.maximum(h, 0.0)
    return h


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def forward_jit(params, x, compute_dtype=jnp.float32):
    return forward(params, x, compute_dtype=compute_dtype)
