"""Configuration for the TPU MSCKF engine.

Mirrors every tunable of the reference (MSCKF/config.py:5-124) but as frozen
dataclasses with explicit sizing constants for the fixed-shape TPU design
(clone window, feature-table capacity, per-frame IMU padding). Calibration
defaults are the EuRoC MAV values from MSCKF/config.py:90-124.

Config objects are *static*: they are closed over at trace time, so changing
a config triggers a recompile (by design — shapes and constants bake into
the XLA program).
"""

import dataclasses
from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class TriangulationConfig:
    """Inverse-depth LM solver settings (reference config.py:5-15)."""

    translation_threshold: float = -1.0  # <0 disables check_motion, config.py:10
    huber_epsilon: float = 0.01
    estimation_precision: float = 5e-7
    initial_damping: float = 1e-3
    outer_loop_max_iteration: int = 5
    inner_loop_max_iteration: int = 5


@dataclass(frozen=True)
class FrontendConfig:
    """Feature detect/track settings (reference config.py:22-44)."""

    grid_row: int = 4
    grid_col: int = 5
    grid_min_feature_num: int = 3
    grid_max_feature_num: int = 5
    fast_threshold: float = 15.0
    stereo_threshold: float = 5.0  # epipolar gate in norm-pixel units
    # Pyramidal LK (reference config.py:31-44: 15x15 window, maxLevel 3,
    # 30 iters, eps 0.01, USE_INITIAL_FLOW).
    lk_patch_size: int = 15
    lk_pyramid_levels: int = 3  # coarsest level index; 4 levels total
    lk_max_iteration: int = 30
    lk_track_precision: float = 0.01
    # Stereo-match gates (reference image.py:585-598).
    stereo_backward_err_px: float = 3.0
    stereo_disparity_max_px: float = 20.0
    # Forward-backward consistency gate on the TEMPORAL track. The
    # reference has no equivalent (its planned 2-pt RANSAC is a stub,
    # image.py:292-293) and leans on cv2 LK's internal quality checks;
    # our LK is gated explicitly instead — round-trip prev->curr->prev
    # must land within this many pixels.
    temporal_backward_err_px: float = 3.0
    # Mask half-width for suppressing re-detection near existing features
    # (7x7 box, reference image.py:330).
    mask_radius: int = 3
    # Fixed-shape capacities (new: TPU design).
    max_tracks: int = 128        # track-table slots; >= grid_num * grid_max
    max_detections_per_cell: int = 8  # FAST candidates kept per grid cell
    # FAST-9 implementation: "pallas" = fused score+NMS VMEM kernel
    # (ops/fast_pallas.py, TPU only), "xla" = dense jnp version
    # (ops/fast.py), "auto" = pallas on TPU, xla elsewhere.
    fast_backend: str = "auto"
    # Pyramidal-LK level backend: "pallas" = fused VMEM Newton-loop kernel
    # with per-block early exit (ops/klt_pallas.py, TPU only), "xla" =
    # the lane-row implementation in ops/klt.py, "auto" = pallas on TPU.
    lk_backend: str = "auto"


@dataclass(frozen=True)
class NoiseConfig:
    """Process / measurement noise variances (reference config.py:71-88)."""

    gyro_noise: float = 0.005 ** 2
    acc_noise: float = 0.05 ** 2
    gyro_bias_noise: float = 0.001 ** 2
    acc_bias_noise: float = 0.01 ** 2
    observation_noise: float = 0.035 ** 2
    velocity_cov: float = 0.25
    gyro_bias_cov: float = 0.01
    acc_bias_cov: float = 0.01
    extrinsic_rotation_cov: float = 3.0462e-4
    extrinsic_translation_cov: float = 2.5e-5


@dataclass(frozen=True)
class FilterConfig:
    """Estimator settings (reference config.py:47-69) + TPU sizing."""

    gravity_acc: float = 9.81
    frame_rate: float = 20.0
    max_cam_state_size: int = 20           # clone window N_MAX, config.py:57
    position_std_threshold: float = 8.0    # online-reset gate, config.py:64
    # Post-ONLINE-reset velocity variance (m^2/s^2). The reference reuses
    # the init value 0.25 (msckf.py:884 -> reset_state_cov), which keeps a
    # wrong nominal velocity nearly certain after a divergence-triggered
    # reset and turns transient glitches into permanent dead-reckoning;
    # 25.0 (5 m/s std) lets subsequent updates pull the velocity back.
    online_reset_velocity_cov: float = 25.0
    # Keyframe redundancy thresholds (config.py:67-69; the reference also
    # hard-codes these at msckf.py:717 — single source of truth here).
    rotation_threshold: float = 0.2618
    translation_threshold: float = 0.4
    tracking_rate_threshold: float = 0.5
    # Measurement-row budget per update (reference msckf.py:678).
    max_update_rows: int = 1500
    # Static-init window (reference msckf.py:176).
    init_imu_samples: int = 200
    # Fixed-shape capacities (new: TPU design).
    max_features: int = 160        # feature-map slots (map_server capacity)
    # Lost-feature candidates triangulated/gated per frame. Candidates
    # beyond this are dropped from the update (still cleared from the
    # map) — same information-only loss as the reference's 1500-row cap,
    # which admits at most ~125 (and typically ~19) features anyway.
    # 128 (r5, was 64): a hostile-world occluder sweep measurably killed
    # 72 tracks in one frame and overflowed the old budget
    # (FilterOutput.lost_overflow fired); 128 matches the reference's
    # effective cap and covers everything short of near-total track loss,
    # which the online reset handles instead.
    max_lost_candidates: int = 128
    # Chi-square-gate SPD solve: "pallas" = batched Gauss-Jordan kernel
    # (ops/spd_pallas.py; the r5 profile measured the batched Cholesky
    # custom call at ~20 GFLOP/s), "cholesky" = jax.scipy cho_solve,
    # "auto" = pallas on TPU.
    gamma_solver: str = "auto"
    # Padded IMU samples per frame bundle: ~10 real at 200 Hz IMU / 20 Hz
    # camera, sized with headroom so a dropped camera frame (~20 pending
    # samples) still fits in one bundle instead of deferring to the next
    # frame. The propagation scan is log-depth in this count
    # (filter/propagation.py), so the extra padded steps are nearly free.
    imu_per_frame: int = 32


@dataclass(frozen=True)
class CameraConfig:
    """Single-camera calibration (reference config.py:94-121)."""

    intrinsics: tuple  # (fx, fy, cx, cy)
    distortion_model: str
    distortion_coeffs: tuple  # (k1, k2, p1, p2)
    resolution: tuple  # (width, height)
    T_imu_cam: tuple  # 4x4 row-major nested tuple, vec_imu -> vec_cam

    @property
    def T_imu_cam_np(self):
        return np.asarray(self.T_imu_cam, dtype=np.float64)

    @property
    def K(self):
        fx, fy, cx, cy = self.intrinsics
        return np.array(
            [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=np.float64
        )


def _t(a):
    return tuple(map(tuple, a))


# EuRoC MAV calibration (reference config.py:94-121).
EUROC_CAM0 = CameraConfig(
    intrinsics=(458.654, 457.296, 367.215, 248.375),
    distortion_model="radtan",
    distortion_coeffs=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
    resolution=(752, 480),
    T_imu_cam=_t(
        [
            [0.014865542981794, 0.999557249008346, -0.025774436697440, 0.065222909535531],
            [-0.999880929698575, 0.014967213324719, 0.003756188357967, -0.020706385492719],
            [0.004140296794224, 0.025715529947966, 0.999660727177902, -0.008054602460030],
            [0.0, 0.0, 0.0, 1.0],
        ]
    ),
)

EUROC_CAM1 = CameraConfig(
    intrinsics=(457.587, 456.134, 379.999, 255.238),
    distortion_model="radtan",
    distortion_coeffs=(-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05),
    resolution=(752, 480),
    T_imu_cam=_t(
        [
            [0.012555267089103, 0.999598781151433, -0.025389800891747, -0.044901980682509],
            [-0.999755099723116, 0.013011905181504, 0.017900583825251, -0.020569771258915],
            [0.018223771455443, 0.025158836311552, 0.999517347077547, -0.008638135126028],
            [0.0, 0.0, 0.0, 1.0],
        ]
    ),
)

# cam0 -> cam1 transform (reference config.py:111-115).
EUROC_T_CN_CNM1 = _t(
    [
        [0.999997256477881, 0.002312067192424, 0.000376008102415, -0.110073808127187],
        [-0.002317135723281, 0.999898048506644, 0.014089835846648, 0.000399121547014],
        [-0.000343393120525, -0.014090668452714, 0.999900662637729, -0.000853702503357],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


@dataclass(frozen=True)
class VIOConfig:
    """Top-level engine configuration (reference ConfigEuRoC, config.py:17-124)."""

    cam0: CameraConfig = EUROC_CAM0
    cam1: CameraConfig = EUROC_CAM1
    T_cn_cnm1: tuple = EUROC_T_CN_CNM1  # vec_cam0 -> vec_cam1
    T_imu_body: tuple = _t(np.eye(4))
    triangulation: TriangulationConfig = field(default_factory=TriangulationConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    noise: NoiseConfig = field(default_factory=NoiseConfig)
    filter: FilterConfig = field(default_factory=FilterConfig)

    @property
    def grid_num(self):
        return self.frontend.grid_row * self.frontend.grid_col

    @property
    def gravity(self):
        return np.array([0.0, 0.0, -self.filter.gravity_acc])

    @property
    def T_cn_cnm1_np(self):
        return np.asarray(self.T_cn_cnm1, dtype=np.float64)

    @property
    def state_dim(self):
        """Error-state dimension: 21 IMU/extrinsic + 6 per clone slot."""
        return 21 + 6 * self.filter.max_cam_state_size

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def euroc_config(**overrides):
    """The default EuRoC configuration, with optional field overrides."""
    cfg = VIOConfig()
    return cfg.replace(**overrides) if overrides else cfg
