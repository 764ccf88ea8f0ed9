"""Matcher kernel tests (semantics parity targets:
/root/reference/src/ORBmatcher.cc)."""

import numpy as np
import jax.numpy as jnp

from xfeatslam_tpu.ops import matching


def make_descs(rng, n, d=64):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestDistance:
    def test_scaled_l2(self, rng):
        a = make_descs(rng, 10)
        b = make_descs(rng, 12)
        d = np.asarray(matching.xfeat_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        d_ref = 512.0 * np.linalg.norm(a[:, None] - b[None, :], axis=-1) ** 2
        np.testing.assert_allclose(d, d_ref, atol=0.2)

    def test_identical_descriptor_zero(self, rng):
        a = make_descs(rng, 5)
        d = np.asarray(matching.xfeat_distance_matrix(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-3)


class TestMutualNN:
    def test_perfect_permutation(self, rng):
        a = make_descs(rng, 50)
        perm = rng.permutation(50)
        b = a[perm]
        res = matching.match_mutual_nn(
            jnp.asarray(a), jnp.asarray(b),
            jnp.ones(50, bool), jnp.ones(50, bool),
        )
        idx = np.asarray(res.idx)
        mask = np.asarray(res.mask)
        assert mask.all()
        # b[idx[i]] == a[i]  =>  perm[idx[i]] == i
        np.testing.assert_array_equal(perm[idx], np.arange(50))

    def test_noise_rejected(self, rng):
        a = make_descs(rng, 30)
        b = make_descs(rng, 30)  # unrelated
        res = matching.match_mutual_nn(
            jnp.asarray(a), jnp.asarray(b),
            jnp.ones(30, bool), jnp.ones(30, bool),
            max_dist=matching.TH_LOW,
        )
        # random unit vectors in 64-d: distances ~ 2*512 = 1024 >> 100
        assert np.asarray(res.mask).sum() == 0

    def test_validity_mask(self, rng):
        a = make_descs(rng, 20)
        b = a.copy()
        valid_b = np.ones(20, bool)
        valid_b[5] = False
        res = matching.match_mutual_nn(
            jnp.asarray(a), jnp.asarray(b), jnp.ones(20, bool), jnp.asarray(valid_b)
        )
        assert not np.asarray(res.mask)[5]
        assert np.asarray(res.mask).sum() == 19


class TestSearchByProjection:
    def test_radius_gate(self, rng):
        n = 40
        desc = make_descs(rng, n)
        kpt_uv = rng.uniform(0, 600, (n, 2)).astype(np.float32)
        # map points predicted exactly at keypoints, same descriptors
        res = matching.search_by_projection(
            jnp.asarray(kpt_uv), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(kpt_uv), jnp.asarray(desc), jnp.ones(n, bool),
            radius=7.0,
        )
        assert np.asarray(res.mask).all()
        np.testing.assert_array_equal(np.asarray(res.idx), np.arange(n))

        # shift predictions far away -> no matches
        res2 = matching.search_by_projection(
            jnp.asarray(kpt_uv + 1000.0), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(kpt_uv), jnp.asarray(desc), jnp.ones(n, bool),
            radius=7.0,
        )
        assert np.asarray(res2.mask).sum() == 0

    def test_dedup_keeps_best(self, rng):
        # two map points both nearest to keypoint 0; closer descriptor wins
        kpt_uv = np.array([[100.0, 100.0]], np.float32)
        kdesc = make_descs(rng, 1)
        noise = rng.standard_normal(64).astype(np.float32) * 0.05
        mdesc = np.stack([kdesc[0], kdesc[0] + noise])
        mdesc /= np.linalg.norm(mdesc, axis=-1, keepdims=True)
        pred = np.array([[100.0, 100.0], [101.0, 100.0]], np.float32)
        res = matching.search_by_projection(
            jnp.asarray(pred), jnp.asarray(mdesc), jnp.ones(2, bool),
            jnp.asarray(kpt_uv), jnp.asarray(kdesc), jnp.ones(1, bool),
            radius=7.0, ratio=1.0,
        )
        mask = np.asarray(res.mask)
        assert mask[0] and not mask[1]


class TestWindowAndGeneral:
    def test_window_match(self, rng):
        n = 60
        desc = make_descs(rng, n)
        uv1 = rng.uniform(50, 500, (n, 2)).astype(np.float32)
        uv2 = uv1 + rng.uniform(-20, 20, (n, 2)).astype(np.float32)
        res = matching.search_window(
            jnp.asarray(uv1), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(uv2), jnp.asarray(desc), jnp.ones(n, bool),
            radius=100.0,
        )
        assert np.asarray(res.mask).sum() == n
        np.testing.assert_array_equal(np.asarray(res.idx), np.arange(n))

    def test_general_ratio(self, rng):
        base = make_descs(rng, 10)
        # queries are noisy versions; database holds two near-identical
        # copies of each target -> best ~ second -> ratio test rejects
        a = base + 0.04 * rng.standard_normal((10, 64)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b = np.concatenate([base, base + 0.001 * rng.standard_normal((10, 64)).astype(np.float32)])
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        res = matching.match_general(
            jnp.asarray(a), jnp.ones(10, bool), jnp.asarray(b), jnp.ones(20, bool),
            ratio=0.75,
        )
        assert np.asarray(res.mask).sum() == 0
        # without the duplicates the same queries match fine
        res2 = matching.match_general(
            jnp.asarray(a), jnp.ones(10, bool), jnp.asarray(b[:10]), jnp.ones(10, bool),
            ratio=0.75,
        )
        assert np.asarray(res2.mask).sum() == 10


class TestStereoMatch:
    def test_rectified_pair(self, rng):
        n = 80
        desc = make_descs(rng, n, d=64)
        uv_l = np.stack([rng.uniform(100, 600, n), rng.uniform(10, 470, n)], -1).astype(np.float32)
        disp_true = rng.uniform(5, 60, n).astype(np.float32)
        uv_r = uv_l.copy()
        uv_r[:, 0] -= disp_true
        uv_r[:, 1] += rng.uniform(-0.5, 0.5, n)  # rectification noise
        octv = np.zeros(n, np.int32)
        res, disp = matching.stereo_match_rows(
            jnp.asarray(uv_l), jnp.asarray(desc), jnp.ones(n, bool), jnp.asarray(octv),
            jnp.asarray(uv_r), jnp.asarray(desc), jnp.ones(n, bool), jnp.asarray(octv),
            max_dist=100.0, binary=False,
        )
        mask = np.asarray(res.mask)
        assert mask.sum() == n
        np.testing.assert_array_equal(np.asarray(res.idx)[mask], np.arange(n))
        np.testing.assert_allclose(np.asarray(disp)[mask], disp_true, atol=1e-3)

    def test_disparity_bounds(self, rng):
        desc = make_descs(rng, 10, d=64)
        uv_l = np.stack([np.full(10, 300.0), np.linspace(50, 400, 10)], -1).astype(np.float32)
        uv_r = uv_l.copy()
        uv_r[:, 0] += 5.0  # NEGATIVE disparity (behind camera) -> rejected
        res, disp = matching.stereo_match_rows(
            jnp.asarray(uv_l), jnp.asarray(desc), jnp.ones(10, bool), jnp.zeros(10, jnp.int32),
            jnp.asarray(uv_r), jnp.asarray(desc), jnp.ones(10, bool), jnp.zeros(10, jnp.int32),
            binary=False,
        )
        assert np.asarray(res.mask).sum() == 0
