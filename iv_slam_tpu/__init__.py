"""iv_slam_tpu — TPU-native introspective vision SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ut-amrl/IV_SLAM
(introspective ORB-SLAM2): stereo/mono/RGB-D visual SLAM with ORB features,
Hamming matching, batched Levenberg-Marquardt pose optimization and bundle
adjustment, loop closure, plus the IV-SLAM introspection loop (an FCN that
predicts per-pixel feature-reliability cost maps which reweight extraction and
optimization, and a training-data-generation mode scoring features by
uncertainty-normalized epipolar error with GP-interpolated heatmaps).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  geometry/   SE3/Sim3/camera math (batched, jit-friendly)
  ops/        dense perception kernels: pyramid, FAST, rBRIEF, Hamming (MXU),
              stereo matching, projection search, GP heatmaps
  solvers/    batched LM pose optimization, Schur-complement local BA,
              EPnP / Sim3 / essential-graph / monocular initializer
  slam/       frame, map store (fixed-capacity SoA), tracking state machine,
              local mapping, loop closing, system facade
  models/     introspection FCN (MobileNetV2-dilated + C1-DeepSup, Flax)
  train/      FCN training (masked MSE, deep supervision, SGD poly decay)
  parallel/   device mesh / sharding utilities (dp x mp), pmean sync-BN
  introspection/  feature evaluator + dataset creator
  io/         KITTI/EuRoC/TUM loaders, trajectory writers, PFM
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/solver math is f32 and precision-sensitive (poses, Jacobians,
# Cholesky). Keep f32 matmuls at full precision on the MXU; the FCN compute
# path opts into bf16 explicitly via its own dtype parameters.
_jax.config.update("jax_default_matmul_precision", "highest")
