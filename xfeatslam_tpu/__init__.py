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

import jax as _jax

# Geometry/optimization kernels need true float32 matmuls (3x3 rotation
# algebra, normal equations). The default bf16 MXU passthrough costs ~5e-3
# relative error, which breaks pose optimization. The XFeat network opts in
# to bf16 explicitly where it is safe (models/xfeat.py).
_jax.config.update("jax_default_matmul_precision", "highest")
