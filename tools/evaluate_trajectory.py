#!/usr/bin/env python
"""Trajectory evaluation: ATE (absolute trajectory error) and RPE
(relative pose error) for TUM-format trajectory files.

The reference emits `CameraTrajectory.txt` / `KeyFrameTrajectory.txt` in
TUM format (role documented at /root/reference/include/System.h:143-146)
and relies on the external TUM-benchmark scripts (evaluate_ate.py /
evaluate_rpe.py) for the actual error numbers. This tool ships that
workflow in-repo so a sequence run can be scored against ground truth
without third-party scripts:

- timestamp association (nearest neighbor within --max-diff, one-to-one),
- ATE: Umeyama/Horn SE(3) alignment (optionally Sim(3) with --scale for
  monocular, where absolute scale is unobservable), then translational
  RMSE/mean/median/std/min/max,
- RPE: relative-pose deltas over a fixed time (--delta seconds) or frame
  (--delta-frames) spacing, translational + rotational stats.

Usage:
  python tools/evaluate_trajectory.py groundtruth.txt CameraTrajectory.txt
  python tools/evaluate_trajectory.py gt.txt traj.txt --scale --delta 1.0 --json
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load_tum_trajectory(path: str) -> dict:
    """Parse a TUM trajectory file: `t tx ty tz qx qy qz qw` per line
    ('#' comments skipped). Returns {timestamp: 4x4 T_world_cam}."""
    traj = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.replace(",", " ").split()]
            if len(vals) < 8:
                continue
            t, tx, ty, tz, qx, qy, qz, qw = vals[:8]
            traj[t] = _se3(_quat_xyzw_to_rot((qx, qy, qz, qw)),
                           np.array([tx, ty, tz]))
    return traj


def _quat_xyzw_to_rot(q) -> np.ndarray:
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _se3(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def associate(ts_a, ts_b, max_diff: float = 0.02):
    """One-to-one nearest-timestamp pairing (greedy by |dt|, the TUM
    associate.py semantics). Returns list of (ta, tb)."""
    ts_a, ts_b = sorted(ts_a), sorted(ts_b)
    cands = []
    j0 = 0
    for ta in ts_a:
        while j0 < len(ts_b) and ts_b[j0] < ta - max_diff:
            j0 += 1
        j = j0
        while j < len(ts_b) and ts_b[j] <= ta + max_diff:
            cands.append((abs(ta - ts_b[j]), ta, ts_b[j]))
            j += 1
    cands.sort()
    used_a, used_b, pairs = set(), set(), []
    for _d, ta, tb in cands:
        if ta in used_a or tb in used_b:
            continue
        used_a.add(ta)
        used_b.add(tb)
        pairs.append((ta, tb))
    pairs.sort()
    return pairs


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform dst ≈ s*R@src + t (Umeyama 1991).
    src/dst: (N,3). Returns (s, R, t)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float((D * np.diag(S)).sum() / var_s) if var_s > 0 else 1.0
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def _stats(err: np.ndarray) -> dict:
    return {
        "rmse": float(np.sqrt(np.mean(err ** 2))),
        "mean": float(np.mean(err)),
        "median": float(np.median(err)),
        "std": float(np.std(err)),
        "min": float(np.min(err)),
        "max": float(np.max(err)),
        "n": int(len(err)),
    }


def evaluate_ate(gt: dict, est: dict, max_diff: float = 0.02,
                 with_scale: bool = False) -> dict:
    """Aligned absolute trajectory error over associated timestamps."""
    pairs = associate(list(gt), list(est), max_diff)
    if len(pairs) < 3:
        raise ValueError(
            f"only {len(pairs)} associated pairs (need >=3); "
            "check timestamps / --max-diff")
    p_gt = np.array([gt[ta][:3, 3] for ta, _ in pairs])
    p_est = np.array([est[tb][:3, 3] for _, tb in pairs])
    s, R, t = umeyama(p_est, p_gt, with_scale)
    aligned = (s * (R @ p_est.T)).T + t
    err = np.linalg.norm(aligned - p_gt, axis=1)
    out = _stats(err)
    out["scale"] = s
    out["pairs"] = len(pairs)
    return out


def evaluate_rpe(gt: dict, est: dict, max_diff: float = 0.02,
                 delta: float = 1.0, delta_frames: int = 0) -> dict:
    """Relative pose error: for each associated frame i, compare the
    estimated motion to the true motion over a window of `delta` seconds
    (or `delta_frames` frames when given). Translational error in meters,
    rotational in degrees."""
    pairs = associate(list(gt), list(est), max_diff)
    if len(pairs) < 2:
        raise ValueError("not enough associated pairs for RPE")
    terrs, rerrs = [], []
    times = [ta for ta, _ in pairs]
    for i, (ta_i, tb_i) in enumerate(pairs):
        if delta_frames > 0:
            j = i + delta_frames
            if j >= len(pairs):
                break
        else:
            tj = ta_i + delta
            j = int(np.searchsorted(times, tj))
            if j >= len(pairs):
                break
        ta_j, tb_j = pairs[j]
        d_gt = np.linalg.inv(gt[ta_i]) @ gt[ta_j]
        d_est = np.linalg.inv(est[tb_i]) @ est[tb_j]
        e = np.linalg.inv(d_gt) @ d_est
        terrs.append(np.linalg.norm(e[:3, 3]))
        cos = (np.trace(e[:3, :3]) - 1.0) / 2.0
        rerrs.append(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
    if not terrs:
        raise ValueError("no RPE windows fit inside the trajectory")
    return {"trans": _stats(np.array(terrs)),
            "rot_deg": _stats(np.array(rerrs))}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("groundtruth", help="TUM-format ground-truth file")
    ap.add_argument("estimate", help="TUM-format estimated trajectory")
    ap.add_argument("--max-diff", type=float, default=0.02,
                    help="max timestamp difference for association [s]")
    ap.add_argument("--scale", action="store_true",
                    help="Sim(3) alignment (monocular: scale unobservable)")
    ap.add_argument("--delta", type=float, default=1.0,
                    help="RPE window in seconds")
    ap.add_argument("--delta-frames", type=int, default=0,
                    help="RPE window in frames (overrides --delta)")
    ap.add_argument("--no-rpe", action="store_true")
    ap.add_argument("--json", action="store_true",
                    help="print one JSON object instead of text")
    args = ap.parse_args(argv)

    gt = load_tum_trajectory(args.groundtruth)
    est = load_tum_trajectory(args.estimate)
    report = {"ate": evaluate_ate(gt, est, args.max_diff, args.scale)}
    if not args.no_rpe:
        report["rpe"] = evaluate_rpe(gt, est, args.max_diff, args.delta,
                                     args.delta_frames)
    if args.json:
        print(json.dumps(report))
    else:
        a = report["ate"]
        print(f"ATE over {a['pairs']} pairs (scale={a['scale']:.6f}):")
        print(f"  rmse {a['rmse']:.6f} m  mean {a['mean']:.6f}  "
              f"median {a['median']:.6f}  std {a['std']:.6f}  "
              f"min {a['min']:.6f}  max {a['max']:.6f}")
        if "rpe" in report:
            rt, rr = report["rpe"]["trans"], report["rpe"]["rot_deg"]
            print(f"RPE over {rt['n']} windows:")
            print(f"  trans rmse {rt['rmse']:.6f} m  mean {rt['mean']:.6f}")
            print(f"  rot   rmse {rr['rmse']:.6f} deg  mean {rr['mean']:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
