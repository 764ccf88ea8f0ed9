"""Pallas matcher-kernel tests (interpret mode on CPU; the compiled path is
exercised on TPU by bench/production)."""

import numpy as np
import jax.numpy as jnp

from xfeatslam_tpu.ops import pallas_kernels as pk


class TestSimilarityTop2:
    def test_matches_xla_reference(self, rng):
        N, M, D = 512, 384, 64
        a = rng.standard_normal((N, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b = rng.standard_normal((M, D)).astype(np.float32)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        s1, s2, i1 = pk.similarity_top2(jnp.asarray(a), jnp.asarray(b),
                                        interpret=True)
        sim = a @ b.T
        ref_i1 = sim.argmax(1)
        ref_s1 = sim.max(1)
        sim2 = sim.copy()
        sim2[np.arange(N), ref_i1] = -np.inf
        ref_s2 = sim2.max(1)
        np.testing.assert_array_equal(np.asarray(i1), ref_i1)
        np.testing.assert_allclose(np.asarray(s1), ref_s1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2), ref_s2, atol=1e-5)

    def test_distance_mapping(self, rng):
        N, M, D = 256, 256, 64
        a = rng.standard_normal((N, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        d1, d2, i1 = pk.xfeat_best_two_distances(
            jnp.asarray(a), jnp.asarray(a), interpret=True
        )
        # best match of a row with itself is itself at distance ~0
        np.testing.assert_array_equal(np.asarray(i1), np.arange(N))
        np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-2)
        assert (np.asarray(d2) > np.asarray(d1)).all()

    def test_row_padding_and_column_mask(self, rng):
        # N NOT a multiple of TILE_N: wrapper pads internally; masked
        # columns must never be selected.
        N, M, D = 300, 200, 64
        a = rng.standard_normal((N, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b = rng.standard_normal((M, D)).astype(np.float32)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        valid_b = np.ones(M, bool)
        valid_b[::3] = False
        d1, d2, i1 = pk.xfeat_best_two_distances(
            jnp.asarray(a), jnp.asarray(b), valid_b=jnp.asarray(valid_b),
            interpret=True,
        )
        assert d1.shape == (N,)
        assert valid_b[np.asarray(i1)].all()
        sim = a @ b.T
        sim[:, ~valid_b] = -np.inf
        np.testing.assert_array_equal(np.asarray(i1), sim.argmax(1))

    def test_mutual_nn_matches_xla_path(self, rng):
        from xfeatslam_tpu.ops import matching

        N, M, D = 333, 257, 64
        a = rng.standard_normal((N, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b = rng.standard_normal((M, D)).astype(np.float32)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        # make some true correspondences so matches exist under max_dist
        b[:100] = a[:100] + 0.01 * rng.standard_normal((100, D)).astype(np.float32)
        b[:100] /= np.linalg.norm(b[:100], axis=-1, keepdims=True)
        va = np.ones(N, bool)
        va[7::50] = False
        vb = np.ones(M, bool)
        vb[3::40] = False
        ref = matching.match_mutual_nn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(va), jnp.asarray(vb),
            max_dist=200.0, ratio=0.95, fused=False,
        )
        got = matching.match_mutual_nn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(va), jnp.asarray(vb),
            max_dist=200.0, ratio=0.95, fused=True,
        )
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))

class TestDetectCandidates:
    """The fused detect post-processing kernel (strip-mined) must be
    bit-identical to the XLA cell path — same NMS mask, ranking scores,
    sub-pixel offsets and candidate set (docstring guarantees in
    pallas_kernels._detect_kernel)."""

    def _run_pair(self, rng, H8, W8, K, B=2):
        from xfeatslam_tpu.ops import detect

        feats = jnp.asarray(rng.standard_normal((B, H8, W8, 64)).astype(np.float32))
        logits = jnp.asarray((rng.standard_normal((B, H8, W8, 65)) * 3).astype(np.float32))
        heat = jnp.asarray(rng.uniform(size=(B, H8, W8, 1)).astype(np.float32))
        try:
            detect._FORCE_PALLAS = False
            ref = detect.select_keypoints(feats, logits, heat, K)
            detect._FORCE_PALLAS = True
            got = detect.select_keypoints(feats, logits, heat, K)
        finally:
            detect._FORCE_PALLAS = False
        return ref, got

    def _assert_equal(self, ref, got):
        v = np.asarray(ref["valid"])
        np.testing.assert_array_equal(v, np.asarray(got["valid"]))
        assert v.any()
        for k in ("kpts", "scores", "desc"):
            r, g = np.asarray(ref[k])[v], np.asarray(got[k])[v]
            np.testing.assert_array_equal(r, g, err_msg=k)

    def test_bitwise_parity_multistrip(self, rng):
        # H8=30 does not divide the 16-row strips: exercises the padded
        # last strip and the -1 forcing of rows past the true height
        self._assert_equal(*self._run_pair(rng, H8=30, W8=40, K=300))

    def test_bitwise_parity_single_strip(self, rng):
        self._assert_equal(*self._run_pair(rng, H8=16, W8=24, K=150))

    def test_bitwise_parity_sparse_fast_path(self, rng):
        # Random logits overflow the NC_FAST=5 candidate slots (measured:
        # a handful of rank-4 survivors) and so exercise the full-kernel
        # cond branch; real frames never do. Sparse isolated peaks pin
        # the fast branch: <= 2 survivors per cell, slot 4 stays empty.
        from xfeatslam_tpu.ops import detect

        H8, W8, K, B = 30, 40, 300, 2
        logits = np.full((B, H8, W8, 65), -8.0, np.float32)
        for b in range(B):
            cy = rng.integers(0, H8, 250)
            cx = rng.integers(0, W8, 250)
            ch = rng.integers(0, 64, 250)
            logits[b, cy, cx, ch] = rng.uniform(4.0, 9.0, 250)
        feats = jnp.asarray(
            rng.standard_normal((B, H8, W8, 64)).astype(np.float32))
        heat = jnp.asarray(rng.uniform(size=(B, H8, W8, 1)).astype(np.float32))
        logits = jnp.asarray(logits)
        # certify this input takes the fast branch
        import xfeatslam_tpu.ops.pallas_kernels as pk
        vals, _ = pk.detect_candidates(logits, heat, interpret=True, nc=5)
        assert not (np.asarray(vals)[:, :, 4, :] > 0).any()
        try:
            detect._FORCE_PALLAS = False
            ref = detect.select_keypoints(feats, logits, heat, K)
            detect._FORCE_PALLAS = True
            got = detect.select_keypoints(feats, logits, heat, K)
        finally:
            detect._FORCE_PALLAS = False
        self._assert_equal(ref, got)


class TestCandidatesTopkMerge:
    """The certified shallow/deep merge in detect._candidates_topk must
    select the same positive-score candidate set as a flat top-k — on
    the sparse rank structure real frames produce (fast path), on dense
    adversarial input (certificate overflow -> flat-sort fallback), and
    on an all-empty frame."""

    def _check(self, vals, aux, k, W8):
        import jax
        from jax import lax

        from xfeatslam_tpu.ops import detect

        B, H8, NC, _ = vals.shape
        s1, i1, _ = jax.jit(
            lambda v, a: detect._candidates_topk(v, a, k, W8))(vals, aux)
        sref, selref = lax.top_k(jnp.asarray(vals).reshape(B, -1), k)
        vpos = np.asarray(sref) > 0
        g = jnp.take_along_axis(jnp.asarray(aux).reshape(B, -1), selref,
                                axis=1).astype(jnp.int32)
        chs = g >> 18
        cy = selref // (NC * W8)
        cx = selref % W8
        iref = (cy * 8 + chs // 8) * (W8 * 8) + (cx * 8 + chs % 8)
        np.testing.assert_array_equal(np.asarray(s1) > 0, vpos)
        np.testing.assert_array_equal(np.asarray(s1)[vpos],
                                      np.asarray(sref)[vpos])
        np.testing.assert_array_equal(np.asarray(i1)[vpos],
                                      np.asarray(iref)[vpos])

    def _aux(self, rng, shape):
        return rng.integers(0, 2 ** 26, shape).astype(np.float32)

    def test_sparse_fast_path(self, rng):
        B, H8, NC, W8 = 3, 60, 9, 80
        vals = np.full((B, H8, NC, W8), -1.0, np.float32)
        for b in range(B):
            # measured real-frame profile: rank 0 ~600, 1 ~90, 2-3 ~5
            for r, n in [(0, 700), (1, 90), (2, 5), (3, 1)]:
                cy = rng.integers(0, H8, n)
                cx = rng.integers(0, W8, n)
                vals[b, cy, r, cx] = rng.uniform(0.01, 1.0, n)
            vals[b] = -np.sort(-vals[b], axis=1)  # per-cell rank order
        self._check(jnp.asarray(vals), jnp.asarray(self._aux(rng, vals.shape)),
                    1000, W8)

    def test_dense_fallback(self, rng):
        B, H8, NC, W8 = 2, 60, 9, 80
        vals = rng.standard_normal((B, H8, NC, W8)).astype(np.float32)
        vals = -np.sort(-vals, axis=2)
        self._check(jnp.asarray(vals), jnp.asarray(self._aux(rng, vals.shape)),
                    1000, W8)

    def test_empty_frame(self, rng):
        B, H8, NC, W8 = 2, 30, 9, 40
        vals = np.full((B, H8, NC, W8), -1.0, np.float32)
        self._check(jnp.asarray(vals), jnp.asarray(self._aux(rng, vals.shape)),
                    500, W8)


class TestBilinearDescSample:
    def test_matches_dense_normalize_and_sample(self, rng):
        """Kernel (normalize -> one-hot matmul gather -> renormalize) vs
        the straight XLA ops it replaces."""
        from xfeatslam_tpu.ops import detect, image as image_ops
        from jax import lax

        B, H8, W8, K = 2, 16, 24, 200
        H, W = H8 * 8, W8 * 8
        feats = jnp.asarray(rng.standard_normal((B, H8, W8, 64)).astype(np.float32))
        kpts = jnp.asarray(
            np.stack([rng.uniform(0, W - 1, (B, K)),
                      rng.uniform(0, H - 1, (B, K))], -1).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=(B, K)) > 0.2)

        featsn = feats * lax.rsqrt(
            jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12)
        d = image_ops.sample_bilinear(featsn, kpts, (H, W))
        d = d * lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)
        ref = np.asarray(d * valid[..., None])

        got = np.asarray(detect._desc_sample_pallas(feats, kpts, valid, H8, W8))
        v = np.asarray(valid)
        np.testing.assert_allclose(got[v], ref[v], atol=2e-6)
        assert np.abs(got[~v]).max() == 0.0

class TestMutualNNPairs:
    def test_matches_vmapped_xla_path(self, rng):
        """Pair-batched fused kernel vs the vmapped XLA reference over
        aligned frame pairs, including validity masks and ratio test."""
        from xfeatslam_tpu.parallel import batched

        B, K, D = 4, 300, 64
        d = rng.standard_normal((B, K, D)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # plant true correspondences so mutual matches exist
        d[1:, :150] = d[:-1, :150] + 0.01 * rng.standard_normal(
            (B - 1, 150, D)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        valid = rng.uniform(size=(B, K)) > 0.1

        dj, vj = jnp.asarray(d), jnp.asarray(valid)
        ref = batched.match_consecutive(dj, vj, fused=False)
        got = batched.match_consecutive(dj, vj, fused=True)
        np.testing.assert_array_equal(np.asarray(got.mask),
                                      np.asarray(ref.mask))
        np.testing.assert_array_equal(np.asarray(got.idx),
                                      np.asarray(ref.idx))
        m = np.asarray(ref.mask)
        assert m.any()
        np.testing.assert_allclose(np.asarray(got.dist)[m],
                                   np.asarray(ref.dist)[m], atol=1e-3)
