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
