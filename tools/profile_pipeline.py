#!/usr/bin/env python
"""Per-stage device profile of the batched extract+match pipeline.

VERDICT round-2 Weak #1 asked for a written breakdown of where the
batch-256 graph's time goes. jax.profiler traces don't survive the axon
tunnel, and `block_until_ready` does NOT fence device completion through
it either (measured: an 8192^3 matmul "completes" in 0.05 ms; a host
fetch of the result takes 40+ ms) — so each stage is timed by running
`repeats` data-dependent iterations inside ONE jitted lax.scan, forcing
completion with a scalar host fetch, and subtracting one measured tunnel
round-trip: ms = (t_fetch - RTT) / repeats. The scan carry perturbs an
input and folds every output leaf so XLA can neither hoist the body out
of the loop nor dead-code any stage output.

    python tools/profile_pipeline.py [--batch 256] [--hw 480 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def conv_flops(hw):
    """Analytic FLOPs/frame of the XFeat conv stack at input hw."""
    H, W = hw
    f = 0
    # (Hout, Wout, cin, cout, k)
    layers = [
        (H, W, 1, 4, 3), (H // 2, W // 2, 4, 8, 3),
        (H // 2, W // 2, 8, 8, 3), (H // 4, W // 4, 8, 24, 3),  # block1
        (H // 4, W // 4, 1, 24, 1),  # skip1
        (H // 4, W // 4, 24, 24, 3), (H // 4, W // 4, 24, 24, 3),  # block2
        (H // 8, W // 8, 24, 64, 3), (H // 8, W // 8, 64, 64, 3),
        (H // 8, W // 8, 64, 64, 1),  # block3
        (H // 16, W // 16, 64, 64, 3), (H // 16, W // 16, 64, 64, 3),
        (H // 16, W // 16, 64, 64, 3),  # block4
        (H // 32, W // 32, 64, 128, 3), (H // 32, W // 32, 128, 128, 3),
        (H // 32, W // 32, 128, 128, 3), (H // 32, W // 32, 128, 64, 1),  # b5
        (H // 8, W // 8, 64, 64, 3), (H // 8, W // 8, 64, 64, 3),
        (H // 8, W // 8, 64, 64, 1),  # fusion
        (H // 8, W // 8, 64, 64, 1), (H // 8, W // 8, 64, 64, 1),
        (H // 8, W // 8, 64, 1, 1),  # heatmap head
        (H // 8, W // 8, 64, 64, 1), (H // 8, W // 8, 64, 64, 1),
        (H // 8, W // 8, 64, 64, 1), (H // 8, W // 8, 64, 65, 1),  # kp head
    ]
    for (h, w, ci, co, k) in layers:
        f += 2 * h * w * ci * co * k * k
    return f


_RTT = None


def tunnel_rtt():
    """One sync round trip through the tunnel (median of 5 tiny fetches)."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda v: v + 1.0)
        float(f(jnp.float32(0)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        _RTT = sorted(ts)[2]
    return _RTT


def timeit(fn, *args, repeats=16):
    """Device-side seconds per fn(*args) via scan-chaining (see module
    docstring). Returns (seconds, fn(*args))."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def perturb(a, c):
        out, done = [], False
        for x in a:
            if not done and hasattr(x, "dtype") and jnp.issubdtype(
                    x.dtype, jnp.floating):
                out.append(x + c.astype(x.dtype) * 1e-30)
                done = True
            else:
                out.append(x)
        return tuple(out)

    @jax.jit
    def loop(*a):
        def body(c, _):
            o = fn(*perturb(a, c))
            s = sum(jnp.sum(leaf.astype(jnp.float32)) * 1e-30
                    for leaf in jax.tree_util.tree_leaves(o))
            return c + s, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=repeats)
        return c

    rtt = tunnel_rtt()
    float(loop(*args))  # compile + warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return max(best - rtt, 0.0) / repeats, fn(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hw", type=int, nargs=2, default=[480, 640])
    ap.add_argument("--kpts", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xfeatslam_tpu.models import xfeat
    from xfeatslam_tpu.ops import detect as detect_ops
    from xfeatslam_tpu.ops import image as image_ops
    from xfeatslam_tpu.parallel import batched

    platform = jax.devices()[0].platform
    dt = jnp.bfloat16 if platform == "tpu" else jnp.float32
    H, W = args.hw
    B, K = args.batch, args.kpts
    print(f"platform={platform} batch={B} hw={H}x{W} K={K} dtype={dt.__name__}")

    if (H, W) == (480, 640):
        import bench
        x = jnp.asarray(bench.make_images(B))  # the bench workload
    else:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((B, H, W, 1), np.float32))
    # shipped weights, not random init: the detect stage's certified
    # sparse fast paths key on the candidate sparsity trained weights
    # produce (see bench._bench_params); random weights time the
    # overflow fallback instead
    wpath = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "weights", "xfeat_synthetic.npz")
    if os.path.exists(wpath):
        from xfeatslam_tpu.models import weights as wio
        params = wio.load_npz(wpath)
    else:
        params = xfeat.init_params(jax.random.PRNGKey(0))

    fwd = jax.jit(lambda im: xfeat.forward(params, im, compute_dtype=dt))
    t_fwd, (feats, logits, heat) = timeit(fwd, x)

    # detection sub-stages
    heatk = jax.jit(detect_ops.keypoint_heatmap)
    t_heat, k1h = timeit(heatk, logits)
    nmsf = jax.jit(lambda h: detect_ops.nms_mask(h))
    t_nms, mask = timeit(nmsf, k1h)

    def rank_and_topk(k1h, mask, heat):
        rel = image_ops.dense_grid_sample_bilinear(heat, (H, W))[..., 0]
        k1n = k1h[..., 0].at[:, -1, :].set(0.0).at[:, :, -1].set(0.0)
        ranked = jnp.where(mask[..., 0], k1n * rel, -1.0)
        return detect_ops._nms_topk_tiled(ranked, K)

    topkf = jax.jit(rank_and_topk)
    t_topk, (scores, idx) = timeit(topkf, k1h, mask, heat)

    def sample_desc(feats, idx):
        featsn = feats * jax.lax.rsqrt(
            jnp.sum(feats * feats, -1, keepdims=True) + 1e-12)
        kpts = jnp.stack([(idx % W).astype(jnp.float32),
                          (idx // W).astype(jnp.float32)], -1)
        d = image_ops.sample_bilinear(featsn, kpts, (H, W))
        return d * jax.lax.rsqrt(jnp.sum(d * d, -1, keepdims=True) + 1e-12)

    sampf = jax.jit(sample_desc)
    t_samp, desc = timeit(sampf, feats, idx)

    detf = jax.jit(lambda f, l, h: detect_ops.select_keypoints(
        f, l, h, K, subpixel=True))
    t_det, out = timeit(detf, feats, logits, heat)

    # Pallas-path sub-stages (the path select_keypoints actually takes on
    # TPU): fused candidate kernel, exact top-K + packed-aux gather,
    # gather-matmul descriptor sampling
    pallas_rows = []
    if detect_ops._use_pallas():
        from xfeatslam_tpu.ops import pallas_kernels as pk

        H8, W8 = H // 8, W // 8
        candf = jax.jit(lambda l, h: pk.detect_candidates(l, h))
        t_cand, (vals, aux) = timeit(candf, logits, heat)
        ctopf = jax.jit(lambda v, a: detect_ops._candidates_topk(
            v, a, K, W8))
        t_ctop, (sc, idxp, off) = timeit(ctopf, vals, aux)
        kpts_p = jnp.stack([(idxp % W).astype(jnp.float32),
                            (idxp // W).astype(jnp.float32)], -1)
        dsf = jax.jit(lambda f, kp, v: detect_ops._desc_sample_pallas(
            f, kp, v, H8, W8))
        t_ds, _ = timeit(dsf, feats, kpts_p, sc > 0)
        pallas_rows = [
            ("  [pallas] candidates", t_cand, ""),
            ("  [pallas] topk+aux", t_ctop, ""),
            ("  [pallas] desc sample", t_ds, ""),
        ]

    matchf = jax.jit(lambda d, v: batched.match_consecutive(d, v))
    t_match, _ = timeit(matchf, out["desc"], out["valid"])

    pipef = jax.jit(lambda im: batched.match_consecutive(
        *(lambda o: (o["desc"], o["valid"]))(
            batched.extract_batch(params, im, K, dt))))
    t_pipe, _ = timeit(pipef, x)

    fl = conv_flops((H, W)) * B
    rows = [
        ("forward (CNN)", t_fwd, f"{fl / t_fwd / 1e12:.2f} TFLOP/s"),
        ("  heatmap decode", t_heat, ""),
        ("  NMS 5x5", t_nms, ""),
        ("  rank+top-K", t_topk, ""),
        ("  desc sampling", t_samp, ""),
        ("detect (fused select)", t_det, ""),
        *pallas_rows,
        ("match consecutive", t_match, ""),
        ("end-to-end pipeline", t_pipe,
         f"{B / t_pipe:.0f} fps"),
    ]
    print(f"{'stage':24s} {'ms/batch':>10s} {'ms/frame':>10s}  note")
    for name, t, note in rows:
        print(f"{name:24s} {t * 1e3:10.2f} {t * 1e3 / B:10.4f}  {note}")
    acc = t_fwd + t_det + t_match
    print(f"{'sum fwd+det+match':24s} {acc * 1e3:10.2f} "
          f"{acc * 1e3 / B:10.4f}  (vs pipeline {t_pipe * 1e3:.2f})")


if __name__ == "__main__":
    main()
