"""xfeatslam_tpu — a TPU-native visual SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of xfeatSLAM
(ORB-SLAM3 + the XFeat deep local-feature network, see /root/reference):
monocular + RGB-D tracking, local mapping with bundle adjustment, multi-map
(Atlas) recovery, relocalization, and loop closing with Sim3 pose-graph and
global bundle adjustment.

Layout (device/host split, not the reference's class structure):
  ops/       device kernels: Lie groups, cameras, matching, detection
  models/    XFeat network (functional JAX) + weight IO, classic ORB path
  optim/     batched Levenberg-Marquardt solvers: pose, local/global BA,
             Sim3, pose graph, RANSAC solvers (PnP, two-view, Horn Sim3)
  slam/      host orchestration: map, tracking, local mapping, loop closing
  parallel/  jax.sharding meshes and multi-chip batched pipelines
  utils/     dataset IO (TUM), timing stats, config
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compiled-executable cache: in this environment every XLA
# compile goes through the remote-device tunnel (tens of seconds per graph;
# a trivial jit measured 147 s cold vs 43 s cached end-to-end), so tests,
# benches and tools re-paying compilation dominates wall clock. Opt out
# with XFEATSLAM_NO_COMPILE_CACHE=1 or by setting JAX_COMPILATION_CACHE_DIR
# yourself.
if (not _os.environ.get("XFEATSLAM_NO_COMPILE_CACHE")
        and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        # never for local-CPU runs: entries written by the remote-compile
        # service carry its machine features and can SIGILL this host
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    _cache_dir = _os.path.expanduser("~/.cache/jax_xfeatslam")
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, AttributeError):  # read-only fs / old jax: best effort
        pass

# Geometry/optimization kernels need true float32 matmuls (3x3 rotation
# algebra, normal equations). The default bf16 MXU passthrough costs ~5e-3
# relative error, which breaks pose optimization. The XFeat network opts in
# to bf16 explicitly where it is safe (models/xfeat.py).
_jax.config.update("jax_default_matmul_precision", "highest")
