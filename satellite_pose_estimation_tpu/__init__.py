"""satellite_pose_estimation_tpu: a TPU-native (JAX/XLA/Pallas) framework for
monocular satellite pose estimation with the capabilities of
wwhitecyan/satellite-pose-estimation.

The framework re-implements, TPU-first, both reference pipelines:

* R1 "Revisiting Monocular Satellite Pose Estimation With Transformer":
  ResNet-s8 backbone + DETR keypoint-set predictor + P3P-RANSAC PnP.
* R2 "Uncertainty Estimation and Self-Assessment": PResNet-vd +
  HybridEncoder (AIFI/CCFM) + RT-DETR point decoder with per-point Gaussian
  sigma heads + sigma-weighted Huber PnP with self-assessment fallback.

Design: everything from crop -> keypoints -> PnP -> score runs as one jitted
XLA program (device-resident, batched via vmap, data-parallel via
jax.sharding.Mesh); host code only decodes images and writes logs.
"""

__version__ = "0.1.0"
