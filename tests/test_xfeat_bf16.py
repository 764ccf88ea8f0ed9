"""bf16 compute-path stability: keypoint selection and descriptors under
``compute_dtype=bfloat16`` must agree with the float32 path.

The TPU default stores inter-layer activations in bf16 (xfeat._conv out_dt)
to halve HBM traffic of the bandwidth-bound early convs; heads stay f32.
This guards the property that actually matters downstream of that choice:
the SELECTED keypoints (what the SLAM layer consumes) are stable, not the
raw pre-softmax logits. Role parity: the reference runs the CNN in whatever
dtype libtorch picks on the device (/root/reference/src/XFextractor.cc:141-149)
and has no cross-dtype guarantee at all.
"""

import os

import numpy as np

import jax.numpy as jnp

from xfeatslam_tpu.models.extractor import XFeatExtractor
from xfeatslam_tpu.utils.synthetic import RoomScene


def _rendered_frame(hw=(480, 640)):
    K = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float32)
    scene = RoomScene(seed=4)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, -0.4, -0.2], np.float32)
    gray, _ = scene.render(K, R, t, hw)
    return gray


def test_bf16_selection_matches_f32():
    weights = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "xfeat_synthetic.npz")
    img = _rendered_frame()
    kw = dict(nfeatures=500)
    if os.path.exists(weights):
        kw["weights_path"] = weights
    ex32 = XFeatExtractor(compute_dtype=jnp.float32, **kw)
    ex16 = XFeatExtractor(params=ex32.params, compute_dtype=jnp.bfloat16,
                          nfeatures=500)
    o32 = ex32(img)
    o16 = ex16(img)
    v32 = o32["valid"][0]
    k32 = o32["kpts"][0][v32]
    s32 = o32["scores"][0][v32]
    k16 = o16["kpts"][0][o16["valid"][0]]
    assert len(k32) >= 100 and len(k16) >= 100

    # Selection near the score cutoff legitimately shuffles between dtypes
    # (measured: top-100 98% / top-200 91% / top-500 70% within 1 px, and
    # identical with f32 inter-layer storage — the tail jitter is inherent
    # to bf16 compute, not to the storage dtype). Guard the band that
    # carries the matching: the 200 strongest f32 keypoints must each have
    # a bf16 keypoint within 1 px.
    top = np.argsort(-s32)[:200]
    d = np.linalg.norm(k32[top, None, :] - k16[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    frac_stable = float((nearest <= 1.0).mean())
    assert frac_stable >= 0.85, frac_stable

    # descriptors at agreeing keypoints: high cosine similarity
    j = d.argmin(axis=1)
    agree = nearest <= 1.0
    d32 = o32["desc"][0][v32][top][agree]
    d16 = o16["desc"][0][o16["valid"][0]][j[agree]]
    cos = (d32 * d16).sum(-1)
    assert float(np.median(cos)) >= 0.995, float(np.median(cos))
