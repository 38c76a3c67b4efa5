"""vio_msckf_tpu — a TPU-native stereo MSCKF visual-inertial odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NonStopEagle137/Visual-Inertial-Odometry-MSCKF-Stereo (reference mounted at
/root/reference). The reference is an event-driven, dynamically-shaped,
numba/OpenCV-backed Python pipeline; this engine inverts those choices for
TPU hardware:

  * fixed shapes everywhere — one `FilterState` pytree with a constant-size
    covariance + active-clone masks; the feature map is a fixed-slot table;
  * the whole per-frame pipeline (front-end + filter) is a single jitted
    `step(state, frame) -> (state, output)`; sequences run under `lax.scan`;
  * per-feature math (triangulation LM, measurement Jacobians, chi-square
    gating) is vmapped over the feature axis;
  * the reference's tall-QR + SVD measurement compression is replaced by an
    equivalent information-form Cholesky compression (all fixed-shape
    matmuls on the MXU);
  * scale-out goes through `jax.sharding.Mesh` (sequence replicas +
    feature-block sharded update reductions with psum over ICI).

Subpackage map:
  math/      JPL quaternion + SE(3) primitives (reference: MSCKF/utils.py)
  ops/       image/geometry compute kernels (FAST, LK, distortion, linalg)
  filter/    the MSCKF estimator core (reference: MSCKF/msckf.py, feature.py)
  frontend/  stereo feature detect/track pipeline (reference: MSCKF/image.py)
  eskf/      the secondary loosely-coupled ESKF pipeline (reference: ESKF/)
  data/      EuRoC reader, synthetic simulator, host->device feeding
  parallel/  device-mesh sharding: replicas + feature-block update reduction
  runtime/   native (C++) host runtime: async dataset decode + ring buffer
  utils/     metrics (ATE/RPE), profiling, checkpointing, logging
"""

__version__ = "0.1.0"
