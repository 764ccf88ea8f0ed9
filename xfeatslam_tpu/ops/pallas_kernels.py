"""Pallas TPU kernels for matcher hot ops.

The descriptor matchers (ops/matching.py) are the per-frame hot path after
the CNN: an (N,M) distance matrix plus row-wise best/second-best. XLA
materializes the full matrix in HBM between the matmul and the top-k; this
kernel fuses similarity (MXU) with the top-2 reduction (VPU) per row tile,
so only O(N) results ever leave VMEM — an HBM-bandwidth win at SLAM sizes
(N=M=1000..4096) and the pattern to scale from.

Wired into ops/matching.py: ``match_mutual_nn`` routes float-descriptor
mutual-NN through ``mutual_nn_top2`` when the default backend is TPU
(``matching._use_pallas()``); everything else (binary Hamming, masked
window searches) stays on the XLA path, as does every platform without
Pallas TPU support (the kernel also runs under pltpu interpret mode for
tests).

Measured on one v5e chip (1024x1024x64): device-side both this kernel and
the XLA matmul+top_k run at ~0.6 us/iter — XLA's own fusion is already
near-optimal at SLAM sizes, and per-call latency is dominated by dispatch.
The kernel matters as the scaling pattern: at retrieval/mapping sizes
(N,M >= 16k) the fused path avoids an O(N*M) HBM round-trip that XLA's
two-op lowering must write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _top2_kernel(a_ref, b_ref, vb_ref, out_ref):
    """a: (TILE_N, D), b: (M, D), vb: (1, M) column validity -> out
    (TILE_N, 8) packed [sim_best, sim_second, idx_best, 0, 0, 0, 0, 0]."""
    sim = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
    sim = jnp.where(vb_ref[0, :][None, :] > 0, sim, -jnp.inf)
    s1 = jnp.max(sim, axis=1)
    i1 = jnp.argmax(sim, axis=1)
    cols = lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim2 = jnp.where(cols == i1[:, None], -jnp.inf, sim)
    s2 = jnp.max(sim2, axis=1)
    out = jnp.stack(
        [s1, s2, i1.astype(jnp.float32)] + [jnp.zeros_like(s1)] * 5, axis=1
    )
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def similarity_top2(desc_a, desc_b, valid_b=None, interpret: bool = False):
    """Fused A@B^T + row-wise top-2 similarity over valid columns.

    Args:
      desc_a: (N, D) float32, N % TILE_N == 0 (pad upstream; asserted).
      desc_b: (M, D) float32.
      valid_b: optional (M,) bool column mask (invalid columns score -inf).
    Returns (sim_best (N,), sim_second (N,), idx_best (N,) int32).
    """
    N, D = desc_a.shape
    M = desc_b.shape[0]
    assert N % TILE_N == 0, (
        f"similarity_top2 requires N % {TILE_N} == 0, got N={N}; pad upstream"
    )
    if valid_b is None:
        valid_b = jnp.ones((M,), jnp.float32)
    vb = valid_b.astype(jnp.float32).reshape(1, M)
    grid = (N // TILE_N,)
    out = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * D, bytes_accessed=(N * D + M * D + N * 8) * 4,
            transcendentals=0,
        ),
    )(desc_a, desc_b, vb)
    return out[:, 0], out[:, 1], out[:, 2].astype(jnp.int32)


def _pad_rows(x, mult: int):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n


def xfeat_best_two_distances(desc_a, desc_b, valid_a=None, valid_b=None,
                             interpret: bool = False):
    """Row-wise (best, second, argbest) XFeat distances = (2-2*sim)*512,
    fused via the Pallas kernel; rows padded to TILE_N internally. Monotonic
    map: max similarity = min distance, so top-2 similarity gives the two
    smallest distances. Invalid rows/columns get distance INVALID-like inf."""
    desc_a_p, n = _pad_rows(desc_a, TILE_N)
    s1, s2, i1 = similarity_top2(desc_a_p, desc_b, valid_b,
                                 interpret=interpret)
    d1 = (2.0 - 2.0 * s1[:n]) * 512.0
    d2 = (2.0 - 2.0 * s2[:n]) * 512.0
    i1 = i1[:n]
    if valid_a is not None:
        d1 = jnp.where(valid_a, d1, jnp.inf)
        d2 = jnp.where(valid_a, d2, jnp.inf)
    return d1, d2, i1


def mutual_nn_top2(desc_a, desc_b, valid_a, valid_b, interpret: bool = False):
    """Exact mutual-NN primitives via two fused kernel calls, never
    materializing the (N,M) matrix in HBM: forward top-2 over rows of A and
    the per-column best row (= forward top-1 of B vs A).

    Returns (best (N,), second (N,), idx (N,), col_best_row (M,)) with the
    same semantics as the XLA path in ops/matching.py (argmin over distance,
    first-match tie-breaking)."""
    d1, d2, i1 = xfeat_best_two_distances(desc_a, desc_b, valid_a, valid_b,
                                          interpret=interpret)
    desc_b_p, m = _pad_rows(desc_b, TILE_N)
    _, _, col_best = similarity_top2(desc_b_p, desc_a, valid_a,
                                     interpret=interpret)
    return d1, d2, i1, col_best[:m]
