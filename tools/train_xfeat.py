#!/usr/bin/env python
"""Self-supervised XFeat training on synthetic scenes.

The reference consumes pretrained weights (weights/xfeat.pt — absent from
the snapshot); this derives weights IN-FRAMEWORK: the sharded train step
(parallel/train.py: shift-equivariance InfoNCE on descriptors + contrast
pseudo-labels for the keypoint head + agreement regression for reliability)
over procedurally rendered room scenes. Runs on whatever jax.devices()
offers (the single TPU chip under axon, or CPU).

    python tools/train_xfeat.py --steps 2000 --out weights/xfeat_synthetic.npz
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def make_batches(rng, n_scenes=6, hw=(128, 160), per_scene=64):
    """Pre-render a pool of synthetic views to sample training batches from."""
    from xfeatslam_tpu.utils import synthetic

    pool = []
    for s in range(n_scenes):
        scene = synthetic.RoomScene(seed=100 + s)
        K = np.array([[130.0, 0, hw[1] / 2], [0, 130.0, hw[0] / 2], [0, 0, 1]],
                     np.float32)
        poses = synthetic.orbit_trajectory(per_scene, radius=0.3,
                                           forward_per_frame=0.01)
        for (R, t) in poses:
            img, _ = scene.render(K, R, t, hw)
            pool.append(img.astype(np.float32) / 255.0)
    return np.stack(pool)[..., None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default="weights/xfeat_synthetic.npz")
    ap.add_argument("--save-every", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from xfeatslam_tpu.models import weights as wio
    from xfeatslam_tpu.models import xfeat
    from xfeatslam_tpu.parallel import mesh as mesh_lib, train

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    print("rendering training pool...", flush=True)
    pool = make_batches(rng)
    print(f"pool: {pool.shape}", flush=True)

    mesh = mesh_lib.make_mesh()
    optimizer = optax.adam(args.lr)
    init_fn, step_fn = train.make_train_step(mesh, optimizer)
    params = xfeat.init_params(jax.random.PRNGKey(0))
    params, opt_state = init_fn(params)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, len(pool), args.batch)
        batch = jnp.asarray(pool[idx])
        params, opt_state, loss, aux = step_fn(params, opt_state, batch)
        if step % 50 == 0:
            jax.block_until_ready(loss)
            print(f"step {step}: loss={float(loss):.4f} "
                  f"nce={float(aux['nce']):.3f} kp={float(aux['kp']):.3f} "
                  f"rel={float(aux['rel']):.3f} "
                  f"({(time.time()-t0)/max(step,1):.2f}s/step)", flush=True)
        if step and step % args.save_every == 0:
            wio.save_npz(args.out, jax.device_get(params))
            print(f"saved {args.out} at step {step}", flush=True)
    wio.save_npz(args.out, jax.device_get(params))
    print(f"done: {args.out}", flush=True)


if __name__ == "__main__":
    main()
