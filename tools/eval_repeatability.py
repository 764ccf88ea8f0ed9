#!/usr/bin/env python
"""Keypoint repeatability / localization evaluation on rendered scenes.

Measures the detector axis the SLAM front-end depends on (the reference
trusts xfeat.pt's detector; ours is trained in-framework, so it needs its
own gauge): render view pairs with known pose+depth, extract keypoints in
both, project view A's keypoints into view B through the depth map, and
report

  * repeatability@r: fraction of A's (covisible) keypoints with a B
    detection within r px, r in {1, 2, 3};
  * loc-err: mean distance to the nearest B detection over matches < 3 px
    (the localization precision that bounds triangulation/BA accuracy).

    python tools/eval_repeatability.py [--weights W.npz] [--pairs 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def eval_pairs(extractor, pairs, max_r=3.0):
    """pairs: list of (img_a, depth_a, img_b, (R_ab, t_ab), K). Returns
    dict of aggregated metrics. R_ab,t_ab: camera-B <- camera-A."""
    rep = {1.0: [], 2.0: [], 3.0: []}
    loc = []
    for img_a, depth_a, img_b, (R_ab, t_ab), K in pairs:
        out = extractor(np.stack([img_a, img_b])[..., None])
        kps, valid = out["kpts"], out["valid"]
        ka, kb = kps[0][valid[0]], kps[1][valid[1]]
        if len(ka) == 0 or len(kb) == 0:
            continue
        # project A's keypoints into B via the rendered depth
        ui, vi = ka[:, 0].astype(int), ka[:, 1].astype(int)
        H, W = depth_a.shape
        ui = np.clip(ui, 0, W - 1)
        vi = np.clip(vi, 0, H - 1)
        z = depth_a[vi, ui]
        ok = z > 0
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        Xa = np.stack([(ka[:, 0] - cx) / fx * z, (ka[:, 1] - cy) / fy * z, z], -1)
        Xb = Xa @ R_ab.T + t_ab
        ok &= Xb[:, 2] > 0.05
        zb = np.maximum(Xb[:, 2], 1e-6)
        ub = fx * Xb[:, 0] / zb + cx
        vb = fy * Xb[:, 1] / zb + cy
        ok &= (ub >= 8) & (ub < W - 8) & (vb >= 8) & (vb < H - 8)
        proj = np.stack([ub, vb], -1)[ok]
        if len(proj) == 0:
            continue
        d = np.linalg.norm(proj[:, None, :] - kb[None, :, :], axis=-1).min(-1)
        for r in rep:
            rep[r].append(float((d <= r).mean()))
        loc.append(float(d[d <= max_r].mean()) if (d <= max_r).any() else max_r)
    return {f"rep@{r:g}px": float(np.mean(v)) for r, v in rep.items()} | {
        "loc_err_px": float(np.mean(loc))
    }


def make_eval_pairs(n_pairs=8, hw=(240, 320), seed=7):
    from xfeatslam_tpu.utils import synthetic

    K = np.array([[260.0, 0, hw[1] / 2], [0, 260.0, hw[0] / 2], [0, 0, 1]],
                 np.float32)
    rng = np.random.default_rng(seed)
    pairs = []
    for i in range(n_pairs):
        scene = synthetic.RoomScene(seed=500 + i)
        poses = synthetic.orbit_trajectory(2, radius=0.25,
                                           forward_per_frame=0.03)
        (Ra, ta), (Rb, tb) = poses
        # extra random rotation on view B (not just the orbit step)
        w = rng.normal(0, 0.02, 3)
        th = np.linalg.norm(w)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        dR = np.eye(3) + np.sinc(th / np.pi) * Kx + 0.5 * np.sinc(th / (2 * np.pi)) ** 2 * (Kx @ Kx)
        Rb = (dR @ Rb).astype(np.float32)
        img_a, depth_a = scene.render(K, Ra, ta, hw)
        img_b, _ = scene.render(K, Rb, tb, hw)
        R_ab = Rb @ Ra.T
        t_ab = tb - R_ab @ ta
        pairs.append((img_a, depth_a, img_b,
                      (R_ab.astype(np.float32), t_ab.astype(np.float32)), K))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--nfeatures", type=int, default=600)
    args = ap.parse_args()

    from xfeatslam_tpu.models.extractor import XFeatExtractor

    ext = XFeatExtractor(weights_path=args.weights,
                         nfeatures=args.nfeatures)
    pairs = make_eval_pairs(args.pairs)
    metrics = eval_pairs(ext, pairs)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
