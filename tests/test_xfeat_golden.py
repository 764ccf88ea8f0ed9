"""Golden-value tests: JAX XFeat vs an independent torch implementation of
the reference architecture (/root/reference/src/XFeat.cc, XFextractor.cc).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xfeatslam_tpu.models import weights as w  # noqa: E402
from xfeatslam_tpu.models import xfeat  # noqa: E402
from xfeatslam_tpu.ops import detect as detect_ops  # noqa: E402
from xfeatslam_tpu.ops import image as image_ops  # noqa: E402

import torch_xfeat_ref as tref  # noqa: E402


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    m = tref.TorchXFeat().eval()
    tref.randomize_bn_stats(m, seed=3)
    # Sharpen the keypoint logits so the random-weight detector actually
    # fires above the 0.05 NMS threshold (real weights produce peaky maps).
    with torch.no_grad():
        m.keypoint_head[3].weight *= 12.0
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return w.from_torch_state_dict(tref.state_dict_for_converter(torch_model))


@pytest.fixture(scope="module")
def test_image():
    rng = np.random.default_rng(11)
    # structured image: blobs + gradient, 96x128, single channel
    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 0.3 * xx / W + 0.2 * yy / H
    for _ in range(20):
        cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
        img += 0.5 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
    img += rng.normal(0, 0.02, (H, W)).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32)


class TestForwardGolden:
    def test_backbone_outputs(self, torch_model, jax_params, test_image):
        x_t = torch.from_numpy(test_image)[None, None]
        with torch.no_grad():
            feats_t, logits_t, heat_t = torch_model(x_t)
        x_j = jnp.asarray(test_image)[None, :, :, None]
        feats_j, logits_j, heat_j = xfeat.forward(jax_params, x_j)

        np.testing.assert_allclose(
            np.asarray(feats_j), feats_t.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(logits_j), logits_t.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(heat_j), heat_t.numpy().transpose(0, 2, 3, 1),
            atol=1e-4,
        )

    def test_fine_matcher(self, torch_model, jax_params, rng):
        x = rng.standard_normal((32, 128)).astype(np.float32)
        with torch.no_grad():
            y_t = torch_model.fine_matcher(torch.from_numpy(x)).numpy()
        y_j = np.asarray(xfeat.fine_matcher_mlp(jax_params, jnp.asarray(x)))
        np.testing.assert_allclose(y_j, y_t, atol=2e-3, rtol=1e-3)


class TestPostProcessGolden:
    def test_keypoint_heatmap(self, torch_model, jax_params, test_image):
        x_t = torch.from_numpy(test_image)[None, None]
        with torch.no_grad():
            _, logits_t, _ = torch_model(x_t)
        k1h_t = tref.get_kpts_heatmap(logits_t).numpy()  # (B,1,H,W)
        k1h_j = np.asarray(
            detect_ops.keypoint_heatmap(jnp.asarray(logits_t.numpy().transpose(0, 2, 3, 1)))
        )
        np.testing.assert_allclose(k1h_j[..., 0], k1h_t[:, 0], atol=1e-5)

    def test_sparse_samplers_match_grid_sample(self, rng):
        B, H, W, C = 1, 12, 16, 5
        Hn, Wn = 96, 128
        img = rng.standard_normal((B, H, W, C)).astype(np.float32)
        pos = np.stack(
            [rng.uniform(0, Wn - 1, (B, 40)), rng.uniform(0, Hn - 1, (B, 40))], -1
        ).astype(np.float32)
        img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
        out_bt = tref.interpolate_sparse2d(img_t, torch.from_numpy(pos), Hn, Wn, "bilinear").numpy()
        out_nt = tref.interpolate_sparse2d(img_t, torch.from_numpy(pos), Hn, Wn, "nearest").numpy()
        out_bj = np.asarray(image_ops.sample_bilinear(jnp.asarray(img), jnp.asarray(pos), (Hn, Wn)))
        out_nj = np.asarray(image_ops.sample_nearest(jnp.asarray(img), jnp.asarray(pos), (Hn, Wn)))
        np.testing.assert_allclose(out_bj, out_bt, atol=1e-5)
        np.testing.assert_allclose(out_nj, out_nt, atol=1e-5)

    def test_full_extraction_golden(self, torch_model, jax_params, test_image):
        """End-to-end keypoints/scores/descriptors match the reference
        pipeline (up to top-K tie order)."""
        K = 200
        x_t = torch.from_numpy(test_image)[None, None]
        kpts_t, scores_t, desc_t = tref.reference_extract(torch_model, x_t, top_k=K)
        kpts_t, scores_t, desc_t = kpts_t.numpy()[0], scores_t.numpy()[0], desc_t.numpy()[0]

        x_j = jnp.asarray(test_image)[None, :, :, None]
        feats, logits, heat = xfeat.forward(jax_params, x_j)
        out = detect_ops.select_keypoints(feats, logits, heat, K)
        kpts_j = np.asarray(out["kpts"])[0]
        scores_j = np.asarray(out["scores"])[0]
        desc_j = np.asarray(out["desc"])[0]
        valid_j = np.asarray(out["valid"])[0]

        vt = scores_t > 0
        vj = valid_j
        assert vt.sum() == vj.sum(), f"valid counts differ: {vt.sum()} vs {vj.sum()}"
        n = vt.sum()
        # same keypoint sets (sort by (y,x))
        set_t = {tuple(p) for p in kpts_t[vt].astype(int)}
        set_j = {tuple(p) for p in kpts_j[vj].astype(int)}
        jaccard = len(set_t & set_j) / max(len(set_t | set_j), 1)
        assert jaccard > 0.98, f"keypoint sets differ (jaccard {jaccard})"
        # score distributions match
        np.testing.assert_allclose(
            np.sort(scores_j[vj]), np.sort(scores_t[vt]), atol=1e-4
        )
        # descriptors: match rows via keypoint identity
        idx_t = {tuple(p): i for i, p in enumerate(kpts_t[vt].astype(int))}
        err = []
        for i, p in enumerate(kpts_j[vj].astype(int)):
            ti = idx_t.get(tuple(p))
            if ti is not None:
                err.append(np.abs(desc_j[vj][i] - desc_t[vt][ti]).max())
        assert len(err) > 0.9 * n
        assert np.max(err) < 5e-3, f"descriptor mismatch {np.max(err)}"
