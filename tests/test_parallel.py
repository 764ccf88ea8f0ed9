"""Multi-chip sharding tests. The virtual-8-CPU-device mesh requires a
python process WITHOUT the axon PJRT sitecustomize (it defeats
--xla_force_host_platform_device_count), so these run in a subprocess with a
sanitized environment."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_clean(code: str, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=timeout,
    )


class TestMultichip:
    def test_dryrun_multichip(self):
        r = run_clean(
            "import __graft_entry__ as g; g.dryrun_multichip(8)"
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "dryrun_multichip OK" in r.stdout, r.stdout

    def test_entry_compiles(self):
        r = run_clean(
            "import jax, __graft_entry__ as g\n"
            "fn, args = g.entry()\n"
            "out = jax.jit(fn)(*args)\n"
            "jax.block_until_ready(out['kpts'])\n"
            "print('entry OK', out['kpts'].shape)\n"
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "entry OK" in r.stdout, r.stdout

    def test_sharded_matches_single_device(self):
        """The sharded pipeline must produce identical results to an
        unsharded run (collectives/shardings change layout, not values)."""
        code = """
import jax, numpy as np, jax.numpy as jnp
from xfeatslam_tpu.models import xfeat
from xfeatslam_tpu.parallel import mesh as mesh_lib, batched
params = xfeat.init_params(jax.random.PRNGKey(0))
imgs = jnp.asarray(np.random.default_rng(1).random((8, 64, 96, 1), np.float32))
# single-device reference
out = batched.extract_batch(params, imgs, 128)
res = batched.match_consecutive(out["desc"], out["valid"])
# sharded
mesh = mesh_lib.make_mesh(8)
pipe = batched.make_sharded_pipeline(mesh, params, num_keypoints=128,
                                     compute_dtype=jnp.float32)
from jax.sharding import NamedSharding, PartitionSpec as P
imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P("data")))
kpts, desc, valid, midx, mmask = pipe(imgs_sh)
np.testing.assert_allclose(np.asarray(kpts), np.asarray(out["kpts"]), atol=1e-5)
np.testing.assert_array_equal(np.asarray(mmask), np.asarray(res.mask))
print("sharded == single-device OK")
"""
        r = run_clean(code)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "OK" in r.stdout
