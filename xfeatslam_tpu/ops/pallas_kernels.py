"""Pallas TPU kernels for the extraction/matching hot ops.

Three kernel families:
- matcher (``similarity_top2``/``mutual_nn_top2``): fused A@B^T + top-2,
  never materializing the (N,M) matrix in HBM;
- detect post-processing (``detect_candidates``): the whole
  softmax -> 5x5 NMS -> reliability -> rank -> soft-argmax -> per-cell
  candidate chain in VMEM over cell-row strips (bit-identical to the XLA
  cell path in ops/detect.py, which serves every other backend);
- descriptor sampling (``bilinear_desc_sample``): the 4-tap bilinear
  gather expressed as a one-hot MXU contraction.

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

# MXU input dtype for the similarity/sampling contractions on real TPU.
# The package pins jax_default_matmul_precision=highest (3x3 geometry math
# needs it), which lowers f32xf32 dots to the multi-pass MXU path — 6x the
# cost of one bf16 pass. Descriptors are L2-normalized (|sim| <= 1), so
# bf16 inputs with f32 accumulation cost ~0.4% relative similarity error
# against coarse integer thresholds (TH_HIGH/TH_LOW = 1000/100,
# /root/reference/src/ORBmatcher.cc:34-35). Interpret mode (CPU tests)
# keeps f32 so the bit-parity tests against the XLA path stay exact.
# Every bf16 dot must ALSO pass precision=DEFAULT explicitly: Mosaic
# rejects a bf16 x bf16 dot_general inheriting the global HIGHEST
# precision ("Bad lhs type" at TPU compile).
_DOT_PREC = lax.Precision.DEFAULT


def _mxu_dt(interpret: bool):
    return jnp.float32 if interpret else jnp.bfloat16


def _top2_kernel(a_ref, b_ref, vb_ref, out_ref, *, mxu_dt=jnp.float32):
    """a: (TILE_N, D), b: (M, D), vb: (1, M) column validity -> out
    (TILE_N, 8) packed [sim_best, sim_second, idx_best, 0, 0, 0, 0, 0]."""
    sim = jnp.dot(a_ref[:].astype(mxu_dt), b_ref[:].T.astype(mxu_dt),
                  precision=_DOT_PREC,
                  preferred_element_type=jnp.float32)
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
    # cast ONCE outside the kernel: halves the descriptor HBM traffic and
    # avoids re-casting the full (M,D) operand on every grid step (the
    # in-kernel astype below is then a no-op)
    mdt = _mxu_dt(interpret)
    desc_a = desc_a.astype(mdt)
    desc_b = desc_b.astype(mdt)
    grid = (N // TILE_N,)
    out = pl.pallas_call(
        functools.partial(_top2_kernel, mxu_dt=_mxu_dt(interpret)),
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


# Per-cell candidate count: 5x5 NMS forces >=3 px spacing, so an 8x8 cell
# holds at most ceil(8/3)^2 = 9 distinct-score survivors; more than 9
# requires exactly-equal tied plateaus, and a lost tie is an identical-
# score duplicate the NMS exists to remove. 9 (not a padded 12) keeps the
# stage-2 top-K input 25% smaller — it is 35% of detect time.
NC_CAND = 9
STRIP_ROWS = 16


def _strip_candidates(l, h, cyi, threshold: float, softmax_temp: float,
                      H8: int, nc: int = NC_CAND):
    """One cell-row strip (with 1-row halos) of the detect post-processing
    in VMEM, transposed cell layout (S+2, 64ch, W8): softmax(65) -> 5x5
    NMS -> bilinear reliability -> ranked score -> 3x3 soft-argmax offsets
    -> per-cell top-NC_CAND candidate extraction. Channel c = py*8+px is
    the pixel (cy*8+py, cx*8+px); channels sit on SUBLANES and cx on LANES
    so that the (rows,W8) reliability map broadcasts over channels as a
    natural sublane replicate (the straight layout needs a lane->sublane
    relayout Mosaic lowers catastrophically). Same math as
    ops/detect.ranked_score_cells + _cells_topk stage 1 + the soft-argmax
    in select_keypoints; the ~40 shifted intermediates never touch HBM.

    Every neighbour op needs at most ONE cell row beyond the strip (5x5
    NMS spans +-2 px = +-1 cell row, the reliability y-pass two adjacent
    rows of the per-row x-pass, the 3x3 soft-argmax +-1 px), so ``l``/``h``
    carry one halo row on each side; the S interior rows are returned.
    ``cyi`` is the GLOBAL cell row of each local row and every
    border/bounds mask uses the real image height ``H8``, so results are
    bit-identical to the XLA cell path: at image borders the halo rows are
    zero-filled, whose softmax is uniform 1/65 — below any meaningful NMS
    threshold, and excluded from reliability/offsets by the global bounds
    masks.

    Returns (vals, aux) each (S, NC_CAND, W8): per cell and candidate
    rank, score (-1 for non-survivors and rows past the true image
    height) and the packed (channel, quantized sub-pixel offset) integer
    (see the packing note below)."""
    S = l.shape[0] - 2
    W8 = l.shape[1]
    neg = jnp.float32(-jnp.inf)

    lt = jnp.transpose(l, (0, 2, 1))  # (S+2, 65, W8) - one VMEM transpose
    if softmax_temp != 1.0:
        lt = lt * softmax_temp
    m = jnp.max(lt, axis=1, keepdims=True)
    e = jnp.exp(lt - m)
    p = (e / jnp.sum(e, axis=1, keepdims=True))[:, :64, :]  # (S+2, 64, W8)

    ci = jax.lax.broadcasted_iota(jnp.int32, (1, 64, 1), 1)
    py = ci // 8
    px = ci % 8
    cxi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W8), 2)

    def roll_ch(x, s):
        """Channel roll = sublane roll in this layout."""
        return pltpu.roll(x, s % 64, axis=1)

    def shift_rows(x, delta, fill):
        """Cell-row shift (axis 0, untiled): slice + concat."""
        n = x.shape[0]
        pad = jnp.full((abs(delta),) + x.shape[1:], fill, x.dtype)
        if delta > 0:
            return jnp.concatenate([x[delta:], pad], axis=0)
        return jnp.concatenate([pad, x[:n + delta]], axis=0)

    def shift_cols(x, delta, fill):
        """Cell-column shift (axis 2 = lanes): circular roll + edge mask."""
        n = x.shape[2]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        r = pltpu.roll(x, (-delta) % n, axis=2)
        mask = idx < n - delta if delta > 0 else idx >= -delta
        return jnp.where(mask, r, jnp.full_like(x, fill))

    # ---- 5x5 NMS (separable max), y pass then x pass ----
    p_down = shift_rows(p, 1, neg)
    p_up = shift_rows(p, -1, neg)
    my = p
    for dy in (1, 2):
        my = jnp.maximum(my, jnp.where(py < 8 - dy, roll_ch(p, -8 * dy),
                                       roll_ch(p_down, -8 * dy)))
        my = jnp.maximum(my, jnp.where(py >= dy, roll_ch(p, 8 * dy),
                                       roll_ch(p_up, 8 * dy)))
    my_right = shift_cols(my, 1, neg)
    my_left = shift_cols(my, -1, neg)
    mx = my
    for dx in (1, 2):
        mx = jnp.maximum(mx, jnp.where(px < 8 - dx, roll_ch(my, -dx),
                                       roll_ch(my_right, 8 - dx)))
        mx = jnp.maximum(mx, jnp.where(px >= dx, roll_ch(my, dx),
                                       roll_ch(my_left, dx - 8)))
    nms = (p == mx) & (p > threshold)

    # ---- bilinear reliability in cell space (bit-for-bit parity with
    # image_ops.dense_grid_sample_bilinear: same pos formula, same x-then-y
    # grouping, zero weight out of bounds) ----
    W, H = W8 * 8, H8 * 8
    h1 = h[:, None, :]  # (S+2, 1, W8) - sublane broadcast is free
    pos_x = (cxi * 8 + px).astype(jnp.float32) * (W8 / (W - 1.0)) - 0.5
    x0 = jnp.floor(pos_x)
    wxf = pos_x - x0
    x0i = x0.astype(jnp.int32)
    wx0 = (1.0 - wxf) * ((x0i >= 0) & (x0i < W8))
    wx1 = wxf * (x0i + 1 < W8)
    mx0 = x0i == cxi - 1  # else x0 == cx (pos-cx ranges (-0.5, 0.52))
    s_xm1 = shift_cols(h1, -1, 0.0)
    s_xp1 = shift_cols(h1, 1, 0.0)
    gx = (jnp.where(mx0, s_xm1, h1) * wx0
          + jnp.where(mx0, h1, s_xp1) * wx1)  # (H8, 64, W8)

    pos_y = (cyi * 8 + py).astype(jnp.float32) * (H8 / (H - 1.0)) - 0.5
    y0 = jnp.floor(pos_y)
    wyf = pos_y - y0
    y0i = y0.astype(jnp.int32)
    wy0 = (1.0 - wyf) * ((y0i >= 0) & (y0i < H8))
    wy1 = wyf * (y0i + 1 < H8)
    my0 = y0i == cyi - 1
    g_ym1 = shift_rows(gx, -1, 0.0)
    g_yp1 = shift_rows(gx, 1, 0.0)
    rel = (jnp.where(my0, g_ym1, gx) * wy0
           + jnp.where(my0, gx, g_yp1) * wy1)

    last = ((cyi == H8 - 1) & (py == 7)) | ((cxi == W8 - 1) & (px == 7))
    ranked = jnp.where(nms, jnp.where(last, 0.0, p) * rel,
                       jnp.float32(-1.0))
    # rows past the true image height (strip-alignment padding) never rank
    ranked = jnp.where(cyi >= H8, jnp.float32(-1.0), ranked)

    # ---- dense 3x3 soft-argmax neighbour sums (coords clamp at the image
    # border exactly like the jnp.clip in the sparse original) ----
    def nbr_y(x, dy):
        oob = (cyi == H8 - 1) & (py == 7) if dy > 0 else (cyi == 0) & (
            py == 0)
        std = jnp.where(py < 8 - dy if dy > 0 else py >= -dy,
                        roll_ch(x, -8 * dy),
                        roll_ch(shift_rows(x, 1 if dy > 0 else -1, 0.0),
                                -8 * dy))
        return jnp.where(oob, x, std)

    def nbr_x(x, dx):
        oob = (cxi == W8 - 1) & (px == 7) if dx > 0 else (cxi == 0) & (
            px == 0)
        std = jnp.where(px < 8 - dx if dx > 0 else px >= -dx,
                        roll_ch(x, -dx),
                        roll_ch(shift_cols(x, 1 if dx > 0 else -1, 0.0),
                                8 - dx if dx > 0 else (-dx) - 8))
        return jnp.where(oob, x, std)

    ty = nbr_y(p, -1) + p + nbr_y(p, 1)
    uy = nbr_y(p, 1) - nbr_y(p, -1)
    s_sum = nbr_x(ty, -1) + ty + nbr_x(ty, 1)
    sx = nbr_x(ty, 1) - nbr_x(ty, -1)
    sy = nbr_x(uy, -1) + uy + nbr_x(uy, 1)
    inv = 1.0 / jnp.maximum(s_sum, 1e-9)
    offx_d = jnp.clip(sx * inv, -1.0, 1.0)
    offy_d = jnp.clip(sy * inv, -1.0, 1.0)

    # ---- pack (channel, quantized offsets) into ONE f32-exact integer:
    # ch<<18 | qx<<9 | qy with q = round((off+1)*255) in [0,510] (0.004 px
    # steps — the 3x3 soft-argmax's own noise is ~0.3 px). Max value
    # 63*2^18 + 510*2^9 + 510 < 2^24, exactly representable in f32. One
    # packed aux halves the extraction passes below (one masked min
    # replaces a channel-select plus two masked offset sums) and stage 2
    # gathers ONE aux row per selected keypoint instead of a 3-wide row
    # (the aux gather was ~45% of the stage, PERF.md round 5). ----
    aux_d = (ci.astype(jnp.float32) * 262144.0
             + jnp.round((offx_d + 1.0) * 255.0) * 512.0
             + jnp.round((offy_d + 1.0) * 255.0))

    # ---- per-cell top-NC_CAND extraction over channels (sublane axis) on
    # the S INTERIOR rows (halo rows need computing above — NMS spans into
    # them — but their candidates are another strip's job); see the
    # NC_CAND note for why every survivor is among the top-9 ----
    v = ranked[1:S + 1]
    aux_i = aux_d[1:S + 1]
    big = jnp.float32(1.7e7)  # > any packed aux
    va, aa = [], []
    for r in range(nc):
        mval = jnp.max(v, axis=1, keepdims=True)           # (S,1,W8)
        # ties within a cell resolve to the smallest packed aux = smallest
        # channel (ch sits in the high bits), matching the previous
        # min-channel rule bit for bit
        paux = jnp.min(jnp.where(v == mval, aux_i, big), axis=1,
                       keepdims=True)
        va.append(mval[:, 0, :])
        aa.append(paux[:, 0, :])
        v = jnp.where((v == mval) & (aux_i == paux), neg, v)
    return jnp.stack(va, axis=1), jnp.stack(aa, axis=1)


def _detect_kernel(logits_ref, heat_ref, vals_ref, aux_ref, *,
                   threshold: float, softmax_temp: float,
                   H8: int, S: int, nc: int):
    """One IMAGE per grid step; strips run as an in-kernel fori_loop over
    the VMEM-resident (1-row zero-padded) image block. The whole-image
    single-pass kernel oversubscribes scoped VMEM by ~9 MB at 640x480 —
    strips bound the live set — while a strip-per-grid-step variant
    multiplies the per-step overhead by n_strips (grid-step count, not
    compute, dominated its time); fori allocates each strip's temporaries
    once. Halos are the adjacent rows of the resident block itself (the
    padded zero rows at the image borders)."""
    ns = (logits_ref.shape[1] - 2) // S

    def strip_body(s, carry):
        rows2 = pl.ds(s * S, S + 2)
        l = logits_ref[0, rows2]
        h = heat_ref[0, rows2]
        cyi = (jax.lax.broadcasted_iota(jnp.int32, (S + 2, 1, 1), 0)
               + s * S - 1)
        va, aa = _strip_candidates(l, h, cyi, threshold, softmax_temp,
                                   H8, nc)
        rows = pl.ds(s * S, S)
        vals_ref[0, rows] = va
        aux_ref[0, rows] = aa
        return carry

    lax.fori_loop(0, ns, strip_body, 0)


@functools.partial(jax.jit, static_argnames=(
    "threshold", "softmax_temp", "interpret", "nc"))
def detect_candidates(logits, heatmap, threshold: float = 0.05,
                      softmax_temp: float = 1.0, interpret: bool = False,
                      nc: int = NC_CAND):
    """Fused detect post-processing on TPU. (B,H8,W8,65) logits +
    (B,H8,W8,1) reliability -> per-cell candidates:
      vals (B,H8,NC,W8) ranking scores (-1 where not an NMS survivor),
      aux  (B,H8,NC,W8) f32-exact packed int ch<<18 | qx<<9 | qy with
           ch = py*8+px the channel within the cell and qx/qy the
           3x3 soft-argmax offsets quantized to (q/255 - 1) px.
    Candidate (b, cy, r, cx) is pixel (cy*8+ch//8, cx*8+ch%8). The caller
    runs the exact top-K over vals.reshape(B,-1) (see detect.py).

    The grid is (B,): the image block (zero-padded one row top/bottom —
    the zero rows double as image-border halos) stays VMEM-resident and
    STRIP_ROWS-row strips run as an in-kernel fori_loop (see
    _detect_kernel)."""
    B, H8, W8, _ = logits.shape
    # the kernel's VMEM working set scales with (S+2)*W8; STRIP_ROWS is
    # sized for W8=80 (640 px), so shrink strips for wider images (kept a
    # multiple of 8: strip starts index the sublane dim of the heat block)
    S = max(8, min((STRIP_ROWS * 80 // max(W8, 1)) // 8 * 8, H8))
    NS = -(-H8 // S)
    H8p = NS * S
    heat3 = heatmap.reshape(B, H8, W8)
    # one zero halo row top and bottom, plus strip-alignment padding rows
    logits = jnp.pad(logits, ((0, 0), (1, 1 + H8p - H8), (0, 0), (0, 0)))
    heat3 = jnp.pad(heat3, ((0, 0), (1, 1 + H8p - H8), (0, 0)))

    fsh = jax.ShapeDtypeStruct((B, H8p, nc, W8), jnp.float32)
    spec = pl.BlockSpec((1, H8p, nc, W8), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vals, aux = pl.pallas_call(
        functools.partial(_detect_kernel, threshold=threshold,
                          softmax_temp=softmax_temp, H8=H8, S=S, nc=nc),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H8p + 2, W8, 65), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H8p + 2, W8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec),
        out_shape=(fsh, fsh),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=400 * B * H8 * W8 * 64,
            bytes_accessed=(B * H8 * W8 * (65 + 1)
                            + 2 * B * H8 * nc * W8) * 4,
            transcendentals=B * H8 * W8 * 65,
        ),
    )(logits, heat3)
    if H8p != H8:
        vals, aux = vals[:, :H8], aux[:, :H8]
    return vals, aux


KPT_TILE = 256
PIX_CHUNK = 1024


def _pick_chunk(npix: int):
    """Largest equal chunking of the pixel axis with chunk <= PIX_CHUNK,
    preferring 8-aligned (sublane-whole) chunks."""
    nch = -(-npix // PIX_CHUNK)
    best = None
    while nch <= npix:
        if npix % nch == 0:
            if (npix // nch) % 8 == 0:
                return nch, npix // nch
            if best is None:
                best = nch
        nch += 1
    nch = best or npix
    return nch, npix // nch


def _desc_sample_kernel(feats_ref, idx_ref, w_ref, out_ref, fn_ref, *,
                        mxu_dt=jnp.float32):
    """One 128-keypoint tile of one image: build the 4-tap bilinear weight
    matrix as a one-hot-sum (VPU compares) and contract it against the
    L2-normalized dense (NP, 64) descriptor grid on the MXU — a gather
    expressed as a matmul, which is the fast form on TPU (random row
    gathers lower ~30x slower, PERF.md). Rows are renormalized in-kernel;
    invalid keypoints carry all-zero weights and come out zero.

    The grid is (B,) with BOTH the keypoint-tile and pixel-chunk loops as
    in-kernel fori_loops (temporaries allocated once per loop, not per
    unrolled iteration — a fully unrolled tile x chunk loop allocates
    every iteration's (KPT_TILE, NP) temporaries on Mosaic's stack at
    once and oversubscribes scoped VMEM by ~6 MB at 640x480; a
    tile-per-grid-step variant fits but runs 8x more grid steps and is
    per-step-overhead bound — measured 19 ms vs ~10)."""
    npix, C = fn_ref.shape
    kp = out_ref.shape[1]
    nch, chunk = _pick_chunk(npix)

    f = feats_ref[0]
    fn_ref[:] = (f * lax.rsqrt(
        jnp.sum(f * f, axis=-1, keepdims=True) + 1e-12)).astype(fn_ref.dtype)

    def tile_body(t, carry):
        sl = pl.ds(t * KPT_TILE, KPT_TILE)
        itap = [idx_ref[0, sl, tap][:, None] for tap in range(4)]
        wtap = [w_ref[0, sl, tap][:, None] for tap in range(4)]

        def chunk_body(ci, d):
            c0 = ci * chunk
            cols = (lax.broadcasted_iota(jnp.int32, (KPT_TILE, chunk), 1)
                    + c0)
            wmat = jnp.zeros((KPT_TILE, chunk), jnp.float32)
            for tap in range(4):
                wmat = wmat + jnp.where(cols == itap[tap], wtap[tap], 0.0)
            # bf16 rounding of the bilinear weights costs < 0.4% relative
            # per tap on unit-norm descriptors; the row renormalization
            # below removes the common-mode part of it.
            return d + jnp.dot(wmat.astype(mxu_dt),
                               fn_ref[pl.ds(c0, chunk), :],
                               precision=_DOT_PREC,
                               preferred_element_type=jnp.float32)

        d = lax.fori_loop(0, nch, chunk_body,
                          jnp.zeros((KPT_TILE, C), jnp.float32))
        d = d * lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)
        out_ref[0, sl, :] = d
        return carry

    lax.fori_loop(0, kp // KPT_TILE, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_desc_sample(feats, idx4, w4, interpret: bool = False):
    """Fused normalize -> 4-tap bilinear descriptor sampling -> renormalize.

    Args:
      feats: (B, NP, C) raw dense descriptors (NP = H8*W8 grid pixels).
      idx4: (B, K, 4) int32 grid-row index of each bilinear tap (clipped
        in-bounds; out-of-bounds taps must carry weight 0).
      w4: (B, K, 4) float32 tap weights (already folded with OOB/valid
        masks). K must be a multiple of 128 (pad upstream).
    Returns (B, K, C) L2-normalized interpolated descriptors.
    """
    B, NP, C = feats.shape
    K = idx4.shape[1]
    assert K % KPT_TILE == 0, f"K={K} must be a multiple of {KPT_TILE}"
    return pl.pallas_call(
        functools.partial(_desc_sample_kernel, mxu_dt=_mxu_dt(interpret)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, NP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NP, C), _mxu_dt(interpret))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * NP * C,
            bytes_accessed=(B * NP * C + 2 * B * K * 4 + B * K * C) * 4,
            transcendentals=0,
        ),
    )(feats, idx4, w4)


def _mnn_pair_kernel(a_ref, b_ref, va_ref, vb_ref, row_ref, col_ref, *,
                     mxu_dt=jnp.float32):
    """One frame PAIR per grid step: similarity (KP,K) on the MXU, row-wise
    top-2 + argbest AND column-wise best-row in the same pass, tiled over
    TILE_N row blocks so the matrix never exceeds ~1 MB of VMEM (a whole
    (KP,K) similarity plus its argmax temporaries would not fit).

    The vmapped two-call form (similarity_top2 x2) runs 2*(B-1)*KP/TILE_N
    grid steps of (TILE_N,D)@(D,K) — measured 39.5 ms for 255 pairs at
    K=1000 (~0.84 TFLOP/s, pure per-step overhead). One pair per step
    re-uses the B block for both directions and quadruples the matmul M
    dim.

    Masking matches ops/matching._mask_dist exactly: columns invalid by
    vb are -inf for the row pass; the column pass additionally masks
    va rows; ties break to the first index in both passes (strict >
    accumulator update keeps the earliest tile).

    Outputs: row_ref (1, KP, 8) packed [s1, s2, i1, 0...]; col_ref
    (1, 8, K) packed [colmax, col_best_row, 0...] as lane vectors."""
    kp = a_ref.shape[1]
    k = b_ref.shape[1]
    nt = kp // TILE_N
    bt = b_ref[0].T.astype(mxu_dt)
    vb = vb_ref[0, 0, :][None, :] > 0
    gmax = jnp.full((1, k), -jnp.inf, jnp.float32)
    grow = jnp.zeros((1, k), jnp.int32)
    for t in range(nt):
        sl = pl.ds(t * TILE_N, TILE_N)
        sim = jnp.dot(a_ref[0, sl, :].astype(mxu_dt), bt,
                      precision=_DOT_PREC,
                      preferred_element_type=jnp.float32)
        sim = jnp.where(vb, sim, -jnp.inf)
        s1 = jnp.max(sim, axis=1)
        i1 = jnp.argmax(sim, axis=1)
        cols = lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        s2 = jnp.max(jnp.where(cols == i1[:, None], -jnp.inf, sim), axis=1)
        row_ref[0, sl, :] = jnp.stack(
            [s1, s2, i1.astype(jnp.float32)] + [jnp.zeros_like(s1)] * 5,
            axis=1)
        simv = jnp.where(va_ref[0, 0, sl][:, None] > 0, sim, -jnp.inf)
        tmax = jnp.max(simv, axis=0)[None, :]
        targ = (jnp.argmax(simv, axis=0).astype(jnp.int32)[None, :]
                + t * TILE_N)
        better = tmax > gmax
        grow = jnp.where(better, targ, grow)
        gmax = jnp.maximum(gmax, tmax)
    col_ref[0] = jnp.concatenate(
        [gmax, grow.astype(jnp.float32),
         jnp.zeros((6, k), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mutual_nn_pairs(desc_a, desc_b, valid_a, valid_b,
                    interpret: bool = False):
    """Batched fused mutual-NN primitives over aligned frame pairs.

    Args:
      desc_a/desc_b: (P, K, D) float32 descriptor banks, pair i matching
        desc_a[i] against desc_b[i]. K % TILE_N need not hold — rows are
        padded here.
      valid_a/valid_b: (P, K) bool.
    Returns (best (P,K), second (P,K), idx (P,K) int32, col_best_row
    (P,K) int32) with identical semantics to mutual_nn_top2 per pair.
    """
    P, K, D = desc_a.shape
    KP = -(-K // TILE_N) * TILE_N
    # cast once outside the kernel (see similarity_top2)
    mdt = _mxu_dt(interpret)
    desc_a = desc_a.astype(mdt)
    desc_b = desc_b.astype(mdt)
    if KP != K:
        pad = ((0, 0), (0, KP - K), (0, 0))
        desc_a = jnp.pad(desc_a, pad)
    va = valid_a.astype(jnp.float32).reshape(P, 1, K)
    if KP != K:
        va = jnp.pad(va, ((0, 0), (0, 0), (0, KP - K)))
    vb = valid_b.astype(jnp.float32).reshape(P, 1, K)
    row, col = pl.pallas_call(
        functools.partial(_mnn_pair_kernel, mxu_dt=_mxu_dt(interpret)),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, KP, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, KP, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, KP, 8), jnp.float32),
            jax.ShapeDtypeStruct((P, 8, K), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * P * KP * K * D,
            bytes_accessed=(P * (KP + K) * D + P * KP * 8 + P * 8 * K) * 4,
            transcendentals=0,
        ),
    )(desc_a, desc_b, va, vb)
    s1 = row[:, :K, 0]
    s2 = row[:, :K, 1]
    idx = row[:, :K, 2].astype(jnp.int32)
    col_best = col[:, 1, :].astype(jnp.int32)
    best = (2.0 - 2.0 * s1) * 512.0
    second = (2.0 - 2.0 * s2) * 512.0
    return best, second, idx, col_best


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
