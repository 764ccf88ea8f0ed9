"""Sharded batched pipelines: offline extract+match throughput mode.

BASELINE config 4 ("Batched offline XFeat extract + mutual-NN match over
TUM fr1+fr2+fr3") — process whole sequences as sharded tensors: every chip
extracts features for its shard of frames under one pjit, then consecutive
frame pairs are matched with batched MNN. The reference's equivalent is a
serial per-frame CPU loop (SURVEY.md §5.7a).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import xfeat
from ..ops import detect as detect_ops
from ..ops import matching


def extract_batch(params, images, num_keypoints: int,
                  compute_dtype=jnp.float32):
    """(B,H,W,C) float -> dict of (B,K,...) features. Jittable, shardable
    over the batch dim."""
    feats, logits, heat = xfeat.forward(params, images, compute_dtype=compute_dtype)
    return detect_ops.select_keypoints(feats, logits, heat, num_keypoints)


def match_consecutive(desc, valid, max_dist=matching.TH_LOW * 6, ratio=0.95,
                      fused=None):
    """MNN-match frames (i, i+1) for all i. desc (B,K,D) -> results (B-1,...).

    On TPU this runs the pair-batched fused kernel
    (pallas_kernels.mutual_nn_pairs): one grid step per pair instead of
    2*(B-1)*K/256 steps of per-tile calls under vmap — the vmapped form
    measured 39.5 ms for 255 pairs at K=1000 (~0.84 TFLOP/s of pure
    per-step overhead, PERF.md)."""
    if fused is None:
        fused = matching._use_pallas()
    if fused:
        from ..ops import pallas_kernels as pk

        interpret = jax.default_backend() != "tpu"
        best, second, idx, colb = pk.mutual_nn_pairs(
            desc[:-1], desc[1:], valid[:-1], valid[1:], interpret=interpret)
        K = desc.shape[1]
        mutual = jnp.take_along_axis(
            colb, jnp.clip(idx, 0, K - 1), axis=1) == jnp.arange(K)[None]
        ok = ((best <= max_dist) & (best <= ratio * second) & mutual
              & valid[:-1])
        return matching.MatchResult(jnp.where(ok, idx, -1), best, ok)
    fn = jax.vmap(
        lambda da, db, va, vb: matching.match_mutual_nn(
            da, db, va, vb, max_dist=max_dist, ratio=ratio
        )
    )
    return fn(desc[:-1], desc[1:], valid[:-1], valid[1:])


def make_sharded_pipeline(mesh: Mesh, params, num_keypoints: int = 1000,
                          compute_dtype=jnp.bfloat16):
    """Returns a jitted function images(B,H,W,C) -> (kpts, desc, valid,
    match_idx, match_mask) with the batch sharded over the mesh's data axis
    and parameters replicated. B must be divisible by the data-axis size."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    params = jax.device_put(params, repl)

    @functools.partial(
        jax.jit,
        in_shardings=(data,),
        out_shardings=None,
    )
    def pipeline(images):
        out = extract_batch(params, images, num_keypoints, compute_dtype)
        res = match_consecutive(out["desc"], out["valid"])
        return out["kpts"], out["desc"], out["valid"], res.idx, res.mask

    return pipeline
