#!/usr/bin/env python
"""Benchmark: batched XFeat extract + mutual-NN match throughput.

Default: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} —
the north-star throughput config (BASELINE.md config 4): frames/second of
full feature extraction (preprocess -> CNN -> NMS -> top-K -> descriptors)
plus consecutive-frame mutual-NN matching at 640x480, 1000 keypoints.
vs_baseline = speedup over the reference's libtorch-CPU equivalent measured
on this host (reference pipeline: /root/reference/src/XFextractor.cc:250-357
per frame + ORBmatcher matching).

Other BASELINE.md configs via --mode:
  --mode online   per-frame RGB-D SLAM tracking fps, XFeat backend, batch 1
                  (configs 2's fps axis; vs_baseline = the 30 fps real-time
                  pacing the reference targets, TUM1.yaml Camera.fps)
  --mode orb      same, ORB backend (config 1)
  --mode all      all of the above, one JSON line each
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H, W, K = 480, 640, 1000
# Operating point from the round-3 B-sweep on one v5e chip (tiled top-k):
# 128->1660, 256->2009, 512->2098, 1024->2218 fps — the knee stays ~256
# (dispatch overhead amortized; past it gains are <10% for 4x the memory).
BATCH = 256
WARMUP = 2
ITERS = 8


def make_images(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    imgs = []
    for i in range(n):
        img = 0.5 + 0.3 * np.sin(xx / 21 + i) * np.cos(yy / 17 - i)
        for _ in range(40):
            cy, cx = rng.uniform(20, H - 20), rng.uniform(20, W - 20)
            img += 0.4 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 25.0)
        imgs.append(np.clip(img, 0, 1).astype(np.float32))
    return np.stack(imgs)[..., None]


def _bench_params():
    """The shipped fine-tuned weights, falling back to random init.

    Random-init weights produce a near-uniform keypoint heatmap whose NMS
    survivors densely fill the per-cell candidate slots, which disables
    the certified sparse fast paths of the detect stage (5-slot
    extraction + shallow/deep top-k merge, ops/detect.py) — the bench
    would then time the overflow fallback that real frames never take.
    Trained weights give the candidate sparsity production sees."""
    from xfeatslam_tpu.models import weights as wio
    from xfeatslam_tpu.models import xfeat

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "xfeat_synthetic.npz")
    if os.path.exists(path):
        return wio.load_npz(path)
    import jax
    return xfeat.init_params(jax.random.PRNGKey(0))


def bench_jax(images):
    """Device-side throughput of the batched extract+match pipeline.

    Timed by running ITERS data-dependent repeats inside ONE jitted
    lax.scan, forcing completion with a scalar host fetch, and subtracting
    one measured round trip — `jax.block_until_ready` does NOT fence
    execution through the remote-device tunnel of this environment, and a
    sync-per-iteration loop is queue/RTT-paced (it UNDERSTATED the device
    by ~1.5x; see PERF.md "honest device timing")."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from xfeatslam_tpu.models import xfeat
    from xfeatslam_tpu.parallel import batched

    platform = jax.devices()[0].platform
    compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    params = _bench_params()

    def pipeline(images):
        out = batched.extract_batch(params, images, K, compute_dtype)
        res = batched.match_consecutive(out["desc"], out["valid"])
        return out["kpts"], out["desc"], res.idx, res.mask

    @jax.jit
    def loop(images):
        def body(c, _):
            o = pipeline(images + c * 1e-30)
            s = sum(jnp.sum(leaf.astype(jnp.float32)) * 1e-30
                    for leaf in jax.tree_util.tree_leaves(o))
            return c + s, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    rtt_probe = jax.jit(lambda v: v + 1.0)
    x = jnp.asarray(images)
    float(loop(x))  # compile + warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(rtt_probe(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    best = None
    for _ in range(WARMUP):
        t0 = time.perf_counter()
        float(loop(x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dt = max(best - rtt, 1e-9) / ITERS
    fps = len(images) / dt
    return fps, platform


def pinned_baseline_fps():
    """Read the pinned libtorch-CPU baseline (BASELINE_CPU.json, written by
    tools/pin_baseline.py). Pinning keeps vs_baseline stable across bench
    runs — re-measuring under variable host load moved the recorded ratio
    508x -> 358x between rounds with no repo change (VERDICT r4 item 6).
    Returns None if the file is absent (then the baseline is measured)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_CPU.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        fps = float(rec["value"])
        print(f"# baseline: pinned {fps} fps from BASELINE_CPU.json "
              f"({rec.get('environment', '?')})", file=sys.stderr)
        return fps
    except (OSError, KeyError, ValueError):
        return None


def bench_torch_cpu(images, n_frames=2):
    """Reference-equivalent libtorch-CPU pipeline (same network shape +
    post-processing), timed per frame."""
    try:
        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        import torch_xfeat_ref as tref

        torch.manual_seed(0)
        model = tref.TorchXFeat().eval()
        x = torch.from_numpy(images[:n_frames, ..., 0]).unsqueeze(1)
        with torch.no_grad():
            tref.reference_extract(model, x[:1], top_k=K)  # warmup
            t0 = time.perf_counter()
            for i in range(n_frames):
                kp, sc, ds = tref.reference_extract(model, x[i : i + 1], top_k=K)
            dt = (time.perf_counter() - t0) / n_frames
        # add a representative matching cost (torch cdist 1000x1000x64)
        a = torch.randn(K, 64)
        t1 = time.perf_counter()
        for _ in range(5):
            d = torch.cdist(a, a)
            d.min(dim=1)
        dt += (time.perf_counter() - t1) / 5
        return 1.0 / dt
    except Exception as e:
        print(f"# torch baseline unavailable ({e}); using recorded value",
              file=sys.stderr)
        return 2.8  # measured libtorch-CPU fps on the dev host


_DISPATCH_COUNTER = None


def _install_dispatch_counter():
    """Wrap every module-level jitted callable in the tracking compute path
    with a counting proxy — a dispatches-per-tracked-frame gauge for the
    online mode (each jitted call is >= 1 device round trip; through the
    axon tunnel each RTT is ~15-30 ms, which is what bounds batch-1 fps
    here). Returns the counter dict. Idempotent: a second install (--mode
    all runs two online benches) must reuse the live counter — re-wrapping
    skips the already-wrapped callables and would silently count zero."""
    global _DISPATCH_COUNTER
    import jax

    from xfeatslam_tpu.models import extractor, orb, xfeat
    from xfeatslam_tpu.ops import camera, detect, geometry, imu, matching
    from xfeatslam_tpu.optim import (inertial, local_ba, pnp, pose_opt,
                                     sim3, track_step, two_view)

    if _DISPATCH_COUNTER is not None:
        _DISPATCH_COUNTER["n"] = 0
        _DISPATCH_COUNTER["by"].clear()
        return _DISPATCH_COUNTER

    jit_type = type(jax.jit(lambda: 0))
    counter = {"n": 0, "by": {}}
    _DISPATCH_COUNTER = counter
    mods = [extractor, orb, xfeat, camera, detect, geometry, imu, matching,
            inertial, local_ba, pnp, pose_opt, sim3, track_step, two_view]
    for mod in mods:
        for name in list(vars(mod)):
            obj = vars(mod)[name]
            if isinstance(obj, jit_type):
                def make(f, site):
                    def wrapped(*a, **k):
                        counter["n"] += 1
                        counter["by"][site] = counter["by"].get(site, 0) + 1
                        return f(*a, **k)
                    return wrapped
                setattr(mod, name,
                        make(obj, f"{mod.__name__.split('.')[-1]}.{name}"))
    return counter


def bench_online(backend: str, n_frames: int = 40):
    """Per-frame SLAM tracking latency (the online path the reference's
    rgbd_tum example reports, /root/reference/examples/RGB-D/rgbd_tum.cc:
    131-139): full System.track_rgbd per frame — extract, match, pose-opt,
    keyframe policy, synchronous backend — on a rendered synthetic room
    sequence, batch 1.

    The sequence runs TWICE with a fresh System: the first pass compiles
    every shape the state machine reaches (20-40 s per graph through the
    tunnel); the second pass is the steady-state measurement."""
    import jax

    from xfeatslam_tpu.ops.camera import Pinhole
    from xfeatslam_tpu.slam.settings import Settings
    from xfeatslam_tpu.slam.system import Sensor, System
    from xfeatslam_tpu.utils import synthetic

    platform = jax.devices()[0].platform
    seq = synthetic.make_sequence(n_frames=n_frames)
    K = seq["K"]
    counter = _install_dispatch_counter()

    def run():
        settings = Settings(
            cam=Pinhole.from_list([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
            bf=40.0, th_depth=3.0, depth_map_factor=1.0,
        )
        system = System(settings, Sensor.RGBD, backend=backend,
                        enable_loop_closing=False)
        times = []
        for i in range(n_frames):
            t0 = time.perf_counter()
            system.track_rgbd(seq["images"][i], seq["depths"][i],
                              seq["timestamps"][i])
            times.append(time.perf_counter() - t0)
        return np.array(times)

    run()  # compile pass
    counter["n"] = 0
    counter["by"].clear()
    steady = run()[2:]
    fps = 1.0 / steady.mean()
    dpf = counter["n"] / n_frames
    print(f"# online[{backend}] median={np.median(steady)*1e3:.1f}ms "
          f"mean={steady.mean()*1e3:.1f}ms p90={np.percentile(steady,90)*1e3:.1f}ms "
          f"jitted-dispatches/frame={dpf:.1f}",
          file=sys.stderr)
    sites = sorted(counter["by"].items(), key=lambda kv: -kv[1])
    print("# online dispatch sites/frame: " + ", ".join(
        f"{k}={v / n_frames:.2f}" for k, v in sites[:10]), file=sys.stderr)
    return fps, platform, dpf


def bench_loop(n_kf: int = 40, period: int = 36, revisit_tail: int = 4):
    """Loop-closure-heavy workload (BASELINE config 5, the TUM
    fr3/long_office_household role): a drifted keyframe chain that revisits
    its start; every KF runs the full place-recognition ladder (grouped
    VLAD retrieval -> pair match -> Sim3 RANSAC -> OptimizeSim3 -> guided
    re-search -> 3 temporal confirmations) and the confirmed loop runs
    CorrectLoop + essential graph + GBA
    (/root/reference/src/LoopClosing.cc:324-1213,2268).

    Reports the saved-map ATE RMSE after correction; vs_baseline is the
    improvement factor over the drifted (pre-correction) trajectory.

    The map carries RGB-D (stereo-disparity) observations and loop closing
    runs with fix_scale=True, exactly the reference's RGB-D configuration
    (LoopClosing.cc:72 mbFixScale = sensor != MONOCULAR): scale is
    observable, so the post-GBA unaligned ATE is gauge-free and meaningful.
    (A mono variant of this map leaves BA a free scale gauge about the
    fixed origin KF — unaligned ATE then mostly measures the arbitrary
    gauge, not map quality.)"""
    import jax

    from xfeatslam_tpu.ops.camera import Pinhole
    from xfeatslam_tpu.slam.loop_closing import LoopClosing
    from xfeatslam_tpu.utils.synthetic import make_loop_map

    platform = jax.devices()[0].platform
    cam = Pinhole.from_list([517.3, 516.5, 318.6, 255.3])
    rng = np.random.default_rng(0)
    m, gt, est = make_loop_map(rng, n_kf=n_kf, n_pts=1200,
                               period=period, revisit_tail=revisit_tail,
                               bf=40.0)
    lc = LoopClosing(m, cam, bf=40.0, fix_scale=True, confirmations=3,
                     run_gba=True, proj_matches=25, proj_matches_strict=30)
    t0 = time.perf_counter()
    for kid in sorted(m.keyframes):
        lc.process_keyframe(kid)
    wall = time.perf_counter() - t0
    err_b = np.array([np.linalg.norm(est[k][1] - gt[k][1])
                      for k in m.keyframes])
    err_a = np.array([np.linalg.norm(m.keyframes[k].t - gt[k][1])
                      for k in m.keyframes])
    rmse_b = float(np.sqrt((err_b ** 2).mean()))
    rmse_a = float(np.sqrt((err_a ** 2).mean()))
    print(f"# loop: {len(lc.closed)} closure(s) over {n_kf} KFs, "
          f"ATE rmse {rmse_b*100:.2f} -> {rmse_a*100:.2f} cm, "
          f"{wall:.1f}s wall ({wall/n_kf*1e3:.0f} ms/KF incl. tunnel RTT)",
          file=sys.stderr)
    return rmse_a, rmse_b, len(lc.closed), platform


def bench_loop_mono(n_kf: int = 40, period: int = 36, revisit_tail: int = 4):
    """Monocular loop-closure workload (the sensor class of BASELINE
    configs 2-3): the same drifted revisit chain with MONOCULAR
    observations (bf=0) — scale is unobservable, so loop closing runs the
    FREE-SCALE Sim3 ladder and essential graph exactly as the reference
    does for MONOCULAR (mbFixScale=false, /root/reference/src/
    LoopClosing.cc:72; Sim3 graph Optimizer.cc:1501).

    A mono map has a real gauge freedom (scale + frame), so the reported
    number is the Sim(3)-ALIGNED ATE RMSE of keyframe centers (Umeyama) —
    unaligned ATE of a mono map measures the arbitrary gauge, not map
    quality (PERF.md round-4 diagnosis). vs_baseline = improvement factor
    over the drifted trajectory's aligned ATE."""
    import jax

    from xfeatslam_tpu.ops.camera import Pinhole
    from xfeatslam_tpu.slam.loop_closing import LoopClosing
    from xfeatslam_tpu.utils.synthetic import make_loop_map

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from evaluate_trajectory import umeyama

    platform = jax.devices()[0].platform
    cam = Pinhole.from_list([517.3, 516.5, 318.6, 255.3])
    rng = np.random.default_rng(0)
    m, gt, est = make_loop_map(rng, n_kf=n_kf, n_pts=1200,
                               period=period, revisit_tail=revisit_tail,
                               bf=0.0)
    lc = LoopClosing(m, cam, bf=0.0, fix_scale=False, confirmations=3,
                     run_gba=True, proj_matches=25, proj_matches_strict=30)
    t0 = time.perf_counter()
    for kid in sorted(m.keyframes):
        lc.process_keyframe(kid)
    wall = time.perf_counter() - t0

    kids = sorted(m.keyframes)
    gt_c = np.stack([-gt[k][0].T @ gt[k][1] for k in kids])

    def aligned_rmse(centers):
        s, R, t = umeyama(centers, gt_c, with_scale=True)
        aligned = (s * (R @ centers.T)).T + t
        return float(np.sqrt((np.linalg.norm(aligned - gt_c, axis=1) ** 2
                              ).mean()))

    est_c = np.stack([-est[k][0].T @ est[k][1] for k in kids])
    cur_c = np.stack([-m.keyframes[k].R.T @ m.keyframes[k].t for k in kids])
    rmse_b = aligned_rmse(est_c)
    rmse_a = aligned_rmse(cur_c)
    print(f"# loop-mono: {len(lc.closed)} closure(s) over {n_kf} KFs, "
          f"Sim3-aligned ATE rmse {rmse_b*100:.2f} -> {rmse_a*100:.3f} cm, "
          f"{wall:.1f}s wall", file=sys.stderr)
    return rmse_a, rmse_b, len(lc.closed), platform


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="offline",
                    choices=["offline", "online", "orb", "loop",
                             "loop-mono", "all"])
    args = ap.parse_args()

    if args.mode in ("offline", "all"):
        images = make_images(BATCH)
        fps, platform = bench_jax(images)
        base_fps = pinned_baseline_fps()
        if base_fps is None:
            base_fps = bench_torch_cpu(images)
        print(json.dumps({
            "metric": f"xfeat_extract_match_throughput_{platform}",
            "value": round(fps, 2),
            "unit": f"frames/s (640x480, 1000 kpts, batch {BATCH})",
            "vs_baseline": round(fps / base_fps, 2),
        }))
    if args.mode in ("online", "all"):
        fps, platform, dpf = bench_online("xfeat")
        print(json.dumps({
            "metric": f"slam_online_tracking_fps_{platform}",
            "value": round(fps, 2),
            "unit": ("frames/s (per-frame RGB-D tracking incl. backend, "
                     f"batch 1, {dpf:.0f} jitted dispatches/frame; through "
                     "the axon tunnel each dispatch costs ~15-30 ms RTT)"),
            "vs_baseline": round(fps / 30.0, 2),  # 30 fps real-time pacing
        }))
    if args.mode in ("loop", "all"):
        rmse_a, rmse_b, n_closed, platform = bench_loop()
        print(json.dumps({
            "metric": f"slam_loop_closure_ate_rmse_{platform}",
            "value": round(rmse_a * 100, 3),
            "unit": (f"cm ATE RMSE, unaligned, after {n_closed} loop "
                     "closure(s) on a 40-KF drifted RGB-D revisit chain "
                     "(retrieval + Sim3 + fusion + essential graph + GBA; "
                     "BASELINE config 5 role)"),
            "vs_baseline": round(rmse_b / max(rmse_a, 1e-9), 2),
        }))
    if args.mode in ("loop-mono", "all"):
        rmse_a, rmse_b, n_closed, platform = bench_loop_mono()
        print(json.dumps({
            "metric": f"slam_loop_mono_ate_rmse_{platform}",
            "value": round(rmse_a * 100, 3),
            "unit": (f"cm ATE RMSE, Sim3-aligned, after {n_closed} loop "
                     "closure(s) on a 40-KF drifted MONOCULAR revisit chain "
                     "(free-scale Sim3 ladder + essential graph + GBA; "
                     "BASELINE configs 2-3 sensor class)"),
            "vs_baseline": round(rmse_b / max(rmse_a, 1e-9), 2),
        }))
    if args.mode in ("orb", "all"):
        fps, platform, dpf = bench_online("orb")
        print(json.dumps({
            "metric": f"slam_online_tracking_fps_orb_{platform}",
            "value": round(fps, 2),
            "unit": ("frames/s (per-frame RGB-D tracking incl. backend, "
                     f"batch 1, {dpf:.0f} jitted dispatches/frame; through "
                     "the axon tunnel each dispatch costs ~15-30 ms RTT)"),
            "vs_baseline": round(fps / 30.0, 2),
        }))


if __name__ == "__main__":
    main()
