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


def _shift_cells(x, axis: int, delta: int, fill):
    """x shifted along a cell axis so out[..., i, ...] = x[..., i+delta, ...]
    with `fill` padding at the boundary (static slices + concat — fusible)."""
    n = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(delta)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if delta > 0:
        body = lax.slice_in_dim(x, delta, n, axis=axis)
        return jnp.concatenate([body, pad], axis=axis)
    body = lax.slice_in_dim(x, 0, n + delta, axis=axis)
    return jnp.concatenate([pad, body], axis=axis)


def _roll_ch(x, shift: int):
    """Circular roll along the 64-wide cell-channel axis (last)."""
    return jnp.roll(x, shift, axis=-1)


def nms_mask_cells(p, threshold: float = 0.05):
    """5x5 full-resolution NMS computed directly in cell space.

    ``p`` is the softmaxed keypoint tensor (B,H8,W8,64) whose channel
    c = py*8+px is the full-res pixel (cy*8+py, cx*8+px). A row shift of the
    full-res map by dy is, in cell space, a channel roll by -8*dy — except
    for the rows that cross the 8-px cell border, which come from the
    vertically adjacent cell with the SAME roll (the roll is mod 64). One
    select on py stitches the two; columns work the same way along px with
    rolls by -dx / 8-dx. The separable 5x5 max (y pass then x pass) is then
    24 lane-rolls + shifts + maxes with NO full-res materialization, exactly
    equal to reduce_window on the pixel-shuffled map (max is exact).
    Returns the boolean survivor mask in cell layout (B,H8,W8,64).
    """
    neg = jnp.float32(-jnp.inf)
    c = jnp.arange(64, dtype=jnp.int32)
    py = (c // 8)[None, None, None, :]
    px = (c % 8)[None, None, None, :]

    p_down = _shift_cells(p, 1, 1, neg)   # cell row cy+1
    p_up = _shift_cells(p, 1, -1, neg)    # cell row cy-1
    my = p
    for dy in (1, 2):
        same = _roll_ch(p, -8 * dy)
        down = _roll_ch(p_down, -8 * dy)
        my = jnp.maximum(my, jnp.where(py < 8 - dy, same, down))
        same = _roll_ch(p, 8 * dy)
        up = _roll_ch(p_up, 8 * dy)
        my = jnp.maximum(my, jnp.where(py >= dy, same, up))
    my_right = _shift_cells(my, 2, 1, neg)   # cell col cx+1
    my_left = _shift_cells(my, 2, -1, neg)   # cell col cx-1
    mx = my
    for dx in (1, 2):
        same = _roll_ch(my, -dx)
        right = _roll_ch(my_right, 8 - dx)
        mx = jnp.maximum(mx, jnp.where(px < 8 - dx, same, right))
        same = _roll_ch(my, dx)
        left = _roll_ch(my_left, dx - 8)
        mx = jnp.maximum(mx, jnp.where(px >= dx, same, left))
    return (p == mx) & (p > threshold)


def _rel_cells(heatmap, H8: int, W8: int):
    """Bilinear reliability upsample evaluated in cell space.

    Replicates image_ops.dense_grid_sample_bilinear((B,H8,W8,1),(H,W))
    bit-for-bit (same pos formula, same separable x-then-y grouping, same
    zero weighting out of bounds) without materializing the (B,H,W) map:
    for every full-res pixel the two x-taps are H1[cx-1 or cx] and the next
    column, a function of the channel px plus a slow per-column drift, so
    two selects over +-1-shifted H1 maps with per-(cx,px) weights give the
    x pass; the y pass shifts that result along cell rows the same way.
    """
    H, W = H8 * 8, W8 * 8
    h1 = heatmap[..., 0]  # (B,H8,W8)

    c = jnp.arange(64, dtype=jnp.int32)
    py_c = (c // 8)[None, None, :]
    px_c = (c % 8)[None, None, :]

    # x pass: pos = x*(W8/(W-1)) - 0.5, x = cx*8+px
    cx = jnp.arange(W8, dtype=jnp.int32)[None, :, None]
    xg = (cx * 8 + px_c).astype(jnp.float32)  # (1,W8,64)
    pos_x = xg * (W8 / (W - 1.0)) - 0.5
    x0 = jnp.floor(pos_x)
    wx = pos_x - x0
    x0i = x0.astype(jnp.int32)
    inb_x0 = (x0i >= 0) & (x0i < W8)
    inb_x1 = (x0i + 1 >= 0) & (x0i + 1 < W8)
    wx0 = (1.0 - wx) * inb_x0
    wx1 = wx * inb_x1
    mx = x0i == cx - 1  # else x0 == cx (proved range: pos-cx in (-0.5, 0.52))

    s_xm1 = _shift_cells(h1, 2, -1, 0.0)[..., None]  # H1[cx-1]
    s_x0 = h1[..., None]                              # H1[cx]
    s_xp1 = _shift_cells(h1, 2, 1, 0.0)[..., None]    # H1[cx+1]
    mxb = mx[None]  # (1,1,W8,64)
    gx = (jnp.where(mxb, s_xm1, s_x0) * wx0[None]
          + jnp.where(mxb, s_x0, s_xp1) * wx1[None])  # (B,H8,W8,64)

    # y pass on gx: taps gx[cy-1 or cy] and the next cell row
    cy = jnp.arange(H8, dtype=jnp.int32)[:, None, None]
    yg = (cy * 8 + py_c).astype(jnp.float32)  # (H8,1,64)
    pos_y = yg * (H8 / (H - 1.0)) - 0.5
    y0 = jnp.floor(pos_y)
    wy = pos_y - y0
    y0i = y0.astype(jnp.int32)
    inb_y0 = (y0i >= 0) & (y0i < H8)
    inb_y1 = (y0i + 1 >= 0) & (y0i + 1 < H8)
    wy0 = (1.0 - wy) * inb_y0
    wy1 = wy * inb_y1
    my = (y0i == cy - 1)[None]  # (1,H8,1,64)

    g_ym1 = _shift_cells(gx, 1, -1, 0.0)
    g_yp1 = _shift_cells(gx, 1, 1, 0.0)
    rel = (jnp.where(my, g_ym1, gx) * wy0[None]
           + jnp.where(my, gx, g_yp1) * wy1[None])
    return rel


def ranked_score_cells(logits, heatmap, threshold: float = 0.05,
                       softmax_temp: float = 1.0):
    """NMS-masked ranking score map in cell layout (B,H8,W8,64).

    The full-res score pipeline (softmax -> pixel shuffle -> 5x5 NMS ->
    nearest(K1h)*bilinear(H1) -> mask) computed without ever leaving the
    stride-8 cell tensor: no pixel-shuffle transpose, no reduce_window, no
    dense upsample — each of which cost a full-res HBM round trip (~35 ms
    each at batch 256, PERF.md). Entry [b,cy,cx,py*8+px] is the ranked
    score of pixel (cy*8+py, cx*8+px); non-survivors are -1.
    """
    B, H8, W8, _ = logits.shape
    p = jax.nn.softmax(logits * softmax_temp, axis=-1)[..., :64]
    mask = nms_mask_cells(p, threshold)
    rel = _rel_cells(heatmap, H8, W8)

    # zero the last full-res row/col (grid_sample nearest pushes them OOB)
    c = jnp.arange(64, dtype=jnp.int32)
    last_row = (jnp.arange(H8) == H8 - 1)[None, :, None, None] & (
        c // 8 == 7)[None, None, None, :]
    last_col = (jnp.arange(W8) == W8 - 1)[None, None, :, None] & (
        c % 8 == 7)[None, None, None, :]
    p_nearest = jnp.where(last_row | last_col, 0.0, p)

    score = p_nearest * rel
    return jnp.where(mask, score, jnp.float32(-1.0)), p


def _cells_topk(ranked_cells, k: int, per_cell: int = 9):
    """Exact top-k over the cell-layout ranked map, two stages.

    5x5 NMS survivors are spaced: an 8x8 cell holds at most
    ceil(8/3)^2 = 9 distinct-score survivors (a 10th requires exactly
    tied plateaus, and a lost tie is an identical-score duplicate), so a
    per-cell top-9 over the 64 channels keeps every survivor and the real
    top-k runs over the 7x smaller candidate set. Returns (scores (B,k),
    flat full-res indices (B,k)) identical to the flat top-k up to
    equal-score ties.
    """
    B, H8, W8, _ = ranked_cells.shape
    W = W8 * 8
    t = ranked_cells.reshape(B, H8 * W8, 64)
    vals, loc = lax.top_k(t, per_cell)  # (B, NT, per_cell)
    cell = jnp.arange(H8 * W8, dtype=jnp.int32)[None, :, None]
    gy = (cell // W8) * 8 + loc // 8
    gx = (cell % W8) * 8 + loc % 8
    gidx = (gy * W + gx).reshape(B, -1)
    scores, sel = lax.top_k(vals.reshape(B, -1), k)
    idx = jnp.take_along_axis(gidx, sel, axis=1)
    return scores, idx


def _nms_topk_candidates(ranked, tile_h: int = 8, tile_w: int = 16,
                         per_tile: int = 24):
    """Stage 1 of the exact two-stage NMS top-k: per-tile candidates.

    A flat lax.top_k over B x (H*W) is the single most expensive op in the
    extraction pipeline on TPU (measured 130 ms of a 192 ms batch-256
    graph — tools/profile_pipeline.py). But 5x5 NMS survivors are spaced:
    two distinct local maxima within the same window cannot both survive,
    so any 8x16 tile holds at most ceil(8/3)*ceil(16/3) = 18 survivors
    (ties on exactly-equal plateau scores could exceed this; per_tile=24
    leaves margin, and a lost tie is an identical-score duplicate the NMS
    exists to remove). Because per_tile exceeds the survivor bound, the
    candidate set contains EVERY survivor — stage 2 may re-rank by any
    per-candidate score (e.g. after multiplying sparse reliability) and
    remain exact. Returns (vals (B, nt*per_tile), flat indices same shape).
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
    return vals.reshape(B, -1), gidx


def _nms_topk_tiled(ranked, k: int, tile_h: int = 8, tile_w: int = 16,
                    per_tile: int = 24):
    """Exact top-k over an NMS-masked score map (both stages). Returns
    (scores (B,k), flat indices (B,k)) identical to
    lax.top_k(ranked.reshape(B,-1), k) up to pathological ties."""
    vals, gidx = _nms_topk_candidates(ranked, tile_h, tile_w, per_tile)
    scores, sel = lax.top_k(vals, k)
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

    # Score + NMS + reliability + sub-pixel offsets computed entirely in
    # cell space: the full-res pixel-shuffle, reduce_window NMS and dense
    # reliability upsample were each a ~300 MB/batch HBM round trip (~1/3
    # of detect time apiece, PERF.md). On TPU the whole post-processing
    # runs as one Pallas kernel emitting per-cell candidates (the ~40
    # shifted intermediates stay in vector registers and the dense score
    # map never touches HBM); elsewhere the same math runs as XLA ops. (A
    # sparse-gather variant was also tried and measured 6x SLOWER — 57k
    # random gathers per image lower poorly on TPU.)
    if _use_pallas():
        from . import pallas_kernels as pk
        interp = jax.default_backend() != "tpu"
        # The per-cell extraction loop prices by candidate slots, and
        # real frames never fill slot 4 (ranks 4+ measured exactly zero
        # over rendered sequences — a 5th 5x5-NMS survivor needs a
        # near-perfect distance-3 lattice in one 8x8 cell). Run the
        # NC_FAST-slot kernel, certify in-graph that slot NC_FAST-1 is
        # empty (a 5th survivor would sit there, and only then could a
        # 6th exist), and lax.cond into the full 9-slot kernel on
        # overflow — exact either way.
        NC_FAST = 5
        vals, aux = pk.detect_candidates(
            logits, heatmap, threshold, softmax_temp,
            interpret=interp, nc=NC_FAST)

        def full_path():
            v9, a9 = pk.detect_candidates(
                logits, heatmap, threshold, softmax_temp, interpret=interp)
            return _candidates_topk(v9, a9, num_keypoints, W8)

        scores, idx, off = lax.cond(
            jnp.any(vals[:, :, NC_FAST - 1, :] > 0.0),
            full_path,
            lambda: _candidates_topk(vals, aux, num_keypoints, W8),
        )
        kpts = jnp.stack([(idx % W).astype(jnp.float32),
                          (idx // W).astype(jnp.float32)], axis=-1)
        valid = scores > 0.0
        if subpixel:
            kpts = kpts + off
        desc = _desc_sample_pallas(feats, kpts, valid, H8, W8)
        return {"kpts": kpts, "scores": scores, "desc": desc, "valid": valid}

    featsn = feats * lax.rsqrt(
        jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12
    )
    ranked, p_cells = ranked_score_cells(logits, heatmap, threshold,
                                         softmax_temp)
    scores, idx = _cells_topk(ranked, num_keypoints)
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
        # directly into triangulation/BA accuracy). Gathers index the cell
        # tensor: pixel (y,x) lives at cell (y//8)*W8 + x//8, ch y%8*8+x%8.
        k1f = p_cells.reshape(B, H8 * W8 * 64)
        wsum = jnp.zeros_like(scores)
        dxsum = jnp.zeros_like(scores)
        dysum = jnp.zeros_like(scores)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs2 = jnp.clip(xs_i + dx, 0, W - 1)
                ys2 = jnp.clip(ys_i + dy, 0, H - 1)
                cidx = ((ys2 // 8) * W8 + xs2 // 8) * 64 + (
                    ys2 % 8) * 8 + xs2 % 8
                w = jnp.take_along_axis(k1f, cidx, axis=1)
                wsum = wsum + w
                dxsum = dxsum + w * dx
                dysum = dysum + w * dy
        off = jnp.stack([dxsum, dysum], -1) / jnp.maximum(
            wsum, 1e-9)[..., None]
        # quantize exactly like the Pallas kernel's packed aux (q/255 - 1,
        # 0.004 px steps) so the two paths stay bit-identical
        off = jnp.round((jnp.clip(off, -1.0, 1.0) + 1.0) * 255.0)
        off = off / 255.0 - 1.0  # decode exactly as _candidates_topk does
        kpts = kpts + off

    desc = image_ops.sample_bilinear(featsn, kpts, (H, W))
    desc = desc * lax.rsqrt(
        jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12)
    desc = desc * valid[..., None]

    return {"kpts": kpts, "scores": scores, "desc": desc, "valid": valid}


_FORCE_PALLAS = False  # tests flip this to exercise the kernels off-TPU


def _use_pallas() -> bool:
    """Route the detect hot path through the fused Pallas kernels on TPU
    (same policy as ops/matching; _FORCE_PALLAS exercises the kernels in
    interpreter mode on other backends for tests)."""
    if _FORCE_PALLAS:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _candidates_topk(vals, aux, k: int, W8: int):
    """Exact top-k over the per-cell candidates emitted by the fused
    Pallas kernel. Candidate (b,cy,r,cx) is pixel (cy*8+ch//8, cx*8+ch%8);
    every NMS survivor is among the candidates (see pallas_kernels
    NC_CAND), so this equals the flat top-k up to equal-score ties.
    ``aux`` is the kernel's packed ch<<18 | qx<<9 | qy integer — ONE
    gathered row per keypoint recovers channel and sub-pixel offsets
    (off = q/255 - 1), vs the 3-wide row gather it replaces.

    The flat ``lax.top_k`` lowers to a full sort on TPU (11.2 ms at
    batch 256, n=43200, k=1000 — the most expensive single op of the
    extraction pipeline), and its price tracks n, not k. On real frames
    the candidate tensor is SPARSE in the rank axis: rank slices hold
    the per-cell NMS survivors in descending order, and measured over
    rendered sequences rank 0 holds ~600 positive scores, rank 1 ~90,
    ranks 2-3 ~5, ranks 4+ exactly zero (a 5x5-NMS 8x8 cell needs a
    distance-3 survivor lattice to fill them). So: sort only the first
    SHALLOW rank slices (n=SHALLOW*4800) merged with the top-DEEP_K of
    the deep remainder, and certify exactness in-graph — selectable
    candidates downstream are strictly-positive scores (valid = score >
    0, select_keypoints), so if the deep slices hold <= DEEP_K positive
    scores (measured: <= ~6, certified per batch) the merge provably
    contains every selectable candidate of the flat sort; a lax.cond
    falls back to the flat sort otherwise. Same selected set up to
    equal-score ties (the pre-existing caveat of the cell layout — tie
    order across the shallow/deep seam differs from flat order).

    Alternatives measured and rejected: a threshold-certified rank
    decomposition (T0 = rank-0 k-th score) — defeated by the -1 fill
    values that dominate real frames; jax.lax.approx_max_k (TPU
    PartialReduce, 4.95 ms at recall 0.95) — drops ~5% of tail
    selections, and selection identity is what the stability tests and
    the reference contract pin down.

    Returns (scores (B,k), flat full-res indices (B,k), offsets (B,k,2))."""
    B, H8, NC, _ = vals.shape
    W = W8 * 8
    SHALLOW, DEEP_K = 2, 64
    if NC > SHALLOW and k <= SHALLOW * H8 * W8:
        ncells = H8 * W8
        ndeep = NC - SHALLOW
        shallow = vals[:, :, :SHALLOW, :].reshape(B, SHALLOW * ncells)
        deep = vals[:, :, SHALLOW:, :].reshape(B, ndeep * ncells)
        c_deep = jnp.sum(deep > 0.0, axis=1)
        sd, idd = lax.top_k(deep, DEEP_K)
        # map both index spaces back to the flat (cy*NC + r)*W8 + cx layout
        i_sh = jnp.arange(SHALLOW * ncells, dtype=jnp.int32)
        f_sh = ((i_sh // (SHALLOW * W8)) * NC
                + (i_sh % (SHALLOW * W8)) // W8) * W8 + i_sh % W8
        f_dp = ((idd // (ndeep * W8)) * NC + SHALLOW
                + (idd % (ndeep * W8)) // W8) * W8 + idd % W8
        sm = jnp.concatenate([shallow, sd], axis=1)
        fm = jnp.concatenate([jnp.broadcast_to(f_sh, (B,) + f_sh.shape),
                              f_dp], axis=1)
        sc2, sel2 = lax.top_k(sm, k)
        scores, sel = lax.cond(
            jnp.all(c_deep <= DEEP_K),
            lambda: (sc2, jnp.take_along_axis(fm, sel2, axis=1)),
            lambda: tuple(lax.top_k(vals.reshape(B, -1), k)),
        )
    else:
        scores, sel = lax.top_k(vals.reshape(B, -1), k)
    g = jnp.take_along_axis(aux.reshape(B, -1), sel, axis=1)
    gi = g.astype(jnp.int32)
    chs = gi >> 18
    off = jnp.stack([((gi >> 9) & 511).astype(jnp.float32),
                     (gi & 511).astype(jnp.float32)], -1) / 255.0 - 1.0
    cy = sel // (NC * W8)
    cx = sel % W8
    y = cy * 8 + chs // 8
    x = cx * 8 + chs % 8
    return scores, y * W + x, off


def _desc_sample_pallas(feats, kpts, valid, H8: int, W8: int):
    """Bilinear descriptor sampling as a fused Pallas gather-matmul:
    compute the 4 grid-sample taps + weights here (exact
    image_ops.sample_bilinear semantics incl. zero padding), fold the
    validity mask into the weights, and let the kernel do
    normalize -> contract -> renormalize without the dense normalize pass
    or the random row gathers (which lower poorly on TPU, PERF.md)."""
    from . import pallas_kernels as pk

    B, K, _ = kpts.shape
    H, W = H8 * 8, W8 * 8
    px, py = image_ops._grid_sample_coords(kpts, (H8, W8), (H, W))
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, w):
        inb = (yi >= 0) & (yi < H8) & (xi >= 0) & (xi < W8)
        idx = jnp.clip(yi, 0, H8 - 1) * W8 + jnp.clip(xi, 0, W8 - 1)
        return idx, w * inb

    i00, w00 = tap(y0i, x0i, (1 - wx) * (1 - wy))
    i01, w01 = tap(y0i, x0i + 1, wx * (1 - wy))
    i10, w10 = tap(y0i + 1, x0i, (1 - wx) * wy)
    i11, w11 = tap(y0i + 1, x0i + 1, wx * wy)
    idx4 = jnp.stack([i00, i01, i10, i11], axis=-1)
    w4 = jnp.stack([w00, w01, w10, w11], axis=-1) * valid[..., None]

    kp = -(-K // pk.KPT_TILE) * pk.KPT_TILE
    if kp != K:
        idx4 = jnp.pad(idx4, ((0, 0), (0, kp - K), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, kp - K), (0, 0)))
    desc = pk.bilinear_desc_sample(
        feats.reshape(B, H8 * W8, -1), idx4, w4,
        interpret=jax.default_backend() != "tpu")
    return desc[:, :K]
