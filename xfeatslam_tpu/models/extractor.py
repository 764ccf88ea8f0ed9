"""XFeat feature extractor: the device-side front-end of the SLAM pipeline.

TPU-native equivalent of XFextractor::operator()
(/root/reference/src/XFextractor.cc:250-357): one jitted graph runs
preprocess -> CNN -> detection -> descriptor sampling for a whole batch and
returns fixed-size arrays in a single device->host transfer (the reference
does a per-keypoint `.item<float>()` readback loop, :321-343 — the known
hot-path antipattern this design removes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import detect as detect_ops
from ..ops import image as image_ops
from . import xfeat


@functools.partial(jax.jit, static_argnames=("num_keypoints", "compute_dtype"))
def extract_fn(params, images, num_keypoints: int, compute_dtype=jnp.float32):
    """Jittable batched extraction.

    Args:
      images: (B, H, W, C) float32 in [0,1]. H, W need not be /32; the graph
        resizes to the floor multiple like preprocessTensor
        (/root/reference/src/XFextractor.cc:182-202) and rescales coords back.
    Returns dict: kpts (B,K,2) in ORIGINAL pixel coords, scores (B,K),
      desc (B,K,64) L2-normalized, valid (B,K).
    """
    B, H, W, C = images.shape
    H32, W32 = (H // 32) * 32, (W // 32) * 32
    x = images
    if (H32, W32) != (H, W):
        x = image_ops.resize_bilinear(x, (H32, W32))
    feats, logits, heatmap = xfeat.forward(params, x, compute_dtype=compute_dtype)
    out = detect_ops.select_keypoints(feats, logits, heatmap, num_keypoints,
                                      subpixel=True)
    rw, rh = W / W32, H / H32
    out["kpts"] = out["kpts"] * jnp.array([rw, rh], jnp.float32)
    return out


class XFeatExtractor:
    """Host-side facade holding params + static config.

    Mirrors the role of XFextractor (/root/reference/include/XFextractor.h)
    with a batched, fixed-shape API. `nfeatures` matches the YAML
    ORBextractor.nFeatures setting (1000 in examples/RGB-D/TUM1.yaml).
    """

    def __init__(
        self,
        params=None,
        nfeatures: int = 1000,
        weights_path: Optional[str] = None,
        compute_dtype=jnp.float32,
        seed: int = 0,
    ):
        if params is None:
            if weights_path is None:
                weights_path = self._default_weights()
            if weights_path is not None:
                from . import weights as w

                if weights_path.endswith(".npz"):
                    params = w.load_npz(weights_path)
                else:
                    params = w.load_torch(weights_path)
            else:
                params = xfeat.init_params(jax.random.PRNGKey(seed))
        self.params = params
        self.nfeatures = nfeatures
        self.compute_dtype = compute_dtype

    @staticmethod
    def _default_weights():
        """Weight resolution order: $XFEATSLAM_WEIGHTS, then repo-level
        weights/xfeat_synthetic.npz (tools/train_xfeat.py output), then
        weights/xfeat.pt (the reference's checkpoint name,
        /root/reference/src/XFextractor.cc:133). None -> analytic init."""
        import os

        env = os.environ.get("XFEATSLAM_WEIGHTS")
        if env and os.path.exists(env):
            return env
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for name in ("weights/xfeat_synthetic.npz", "weights/xfeat.pt"):
            p = os.path.join(repo, name)
            if os.path.exists(p):
                return p
        return None

    def __call__(self, images):
        """images: uint8/float (H,W), (H,W,C), or (B,H,W,C) -> numpy dict."""
        x = image_ops.to_float_image(images)
        out = extract_fn(self.params, x, self.nfeatures, self.compute_dtype)
        return jax.tree_util.tree_map(np.asarray, out)
