"""Fixed-shape filter state pytrees — the TPU replacement for the
reference's object graph (IMUState/CAMState/StateServer, MSCKF/msckf.py:16-101,
and the map_server feature dict, msckf.py:117).

Design (SURVEY.md section 7): one constant-size covariance of dimension
``D = 21 + 6 * N_MAX`` with an active-clone count; clone augmentation is a
masked block write, pruning is a gather permutation — no reallocation ever.
The feature map is a fixed table of ``F_MAX`` slots whose observations are
indexed by *clone slot* so they shift together with the clone window.

Error-state layout (identical to reference msckf.py:566-595):
  [0:3]   dtheta (IMU attitude)      [3:6]   gyro bias
  [6:9]   velocity                   [9:12]  acc bias
  [12:15] position                   [15:18] extrinsic rotation
  [18:21] extrinsic translation      [21+6k : 27+6k] clone k (dtheta, dp)
"""

import numpy as np
import jax.numpy as jnp
from flax import struct

from vio_msckf_tpu.config import VIOConfig


@struct.dataclass
class FilterState:
    """The estimator state: IMU + extrinsics + clone window + covariance."""

    # --- IMU nominal state (reference IMUState, msckf.py:16-59) ---
    q: jnp.ndarray          # (4,)  JPL world->IMU
    p: jnp.ndarray          # (3,)  IMU position in world
    v: jnp.ndarray          # (3,)  IMU velocity in world
    bg: jnp.ndarray         # (3,)  gyro bias
    ba: jnp.ndarray         # (3,)  acc bias
    # Extrinsics (part of the error state, slots 15:21).
    R_imu_cam0: jnp.ndarray  # (3,3) vec_imu -> vec_cam0
    t_cam0_imu: jnp.ndarray  # (3,)  cam0 origin in IMU frame
    # OC-EKF nullspace anchors (msckf.py:53-55, updated at msckf.py:366-368).
    q_null: jnp.ndarray     # (4,)
    p_null: jnp.ndarray     # (3,)
    v_null: jnp.ndarray     # (3,)
    # Gravity in world frame, set by the static init (msckf.py:255).
    gravity: jnp.ndarray    # (3,)

    # --- Camera clone window (reference CAMState dict, msckf.py:62-96) ---
    clone_q: jnp.ndarray       # (N, 4) world->cam0
    clone_p: jnp.ndarray       # (N, 3) cam0 position in world
    clone_q_null: jnp.ndarray  # (N, 4)
    clone_p_null: jnp.ndarray  # (N, 3)
    clone_valid: jnp.ndarray   # (N,) bool
    n_clones: jnp.ndarray      # () int32 active count; slot order = age order

    # --- Covariance (reference state_cov, msckf.py:99) ---
    P: jnp.ndarray          # (D, D) with D = 21 + 6N; inactive rows/cols zero

    # --- misc ---
    tracking_rate: jnp.ndarray  # () f32 (msckf.py:427)


@struct.dataclass
class FeatureMap:
    """Fixed-slot feature map (reference map_server + Feature,
    msckf.py:117, feature.py:7-31)."""

    fid: jnp.ndarray        # (F,) int32 external feature id, -1 when empty
    valid: jnp.ndarray      # (F,) bool slot occupied
    obs: jnp.ndarray        # (F, N, 4) normalized stereo obs per clone slot
    obs_valid: jnp.ndarray  # (F, N) bool
    position: jnp.ndarray   # (F, 3) triangulated world position
    initialized: jnp.ndarray  # (F,) bool (feature.py:28)


@struct.dataclass
class MsckfParams:
    """Trace-time device constants derived from the config (the analog of
    the class-level statics set at reference msckf.py:139-155)."""

    R_cam0_cam1: jnp.ndarray   # (3,3) vec_cam0 -> vec_cam1
    t_cam0_cam1: jnp.ndarray   # (3,)
    continuous_noise: jnp.ndarray  # (12,) diagonal of Q_c (msckf.py:132-137)
    observation_noise: float = struct.field(pytree_node=False)
    chi2_table: jnp.ndarray    # (100,) chi2.ppf(0.05, dof), dof=index
    # Initial covariance diagonal pattern (reset_state_cov, msckf.py:820-830).
    init_cov_diag: jnp.ndarray  # (21,)
    config: VIOConfig = struct.field(pytree_node=False)


def make_params(config: VIOConfig, dtype=jnp.float32) -> MsckfParams:
    """Build device constants from a config.

    The chi-square 0.05-quantile table mirrors reference msckf.py:120-123
    (confidence-level comment notwithstanding, the reference tabulates
    ``chi2.ppf(0.05, dof)`` — a lenient gate — and so do we).
    """
    from scipy.stats import chi2 as _chi2

    T01 = config.T_cn_cnm1_np
    n = config.noise
    cont = np.concatenate(
        [
            np.full(3, n.gyro_noise),
            np.full(3, n.gyro_bias_noise),
            np.full(3, n.acc_noise),
            np.full(3, n.acc_bias_noise),
        ]
    )
    table = np.zeros(100)
    table[1:] = _chi2.ppf(0.05, np.arange(1, 100))
    diag = np.zeros(21)
    diag[3:6] = n.gyro_bias_cov
    diag[6:9] = n.velocity_cov
    diag[9:12] = n.acc_bias_cov
    diag[15:18] = n.extrinsic_rotation_cov
    diag[18:21] = n.extrinsic_translation_cov
    return MsckfParams(
        R_cam0_cam1=jnp.asarray(T01[:3, :3], dtype),
        t_cam0_cam1=jnp.asarray(T01[:3, 3], dtype),
        continuous_noise=jnp.asarray(cont, dtype),
        observation_noise=float(n.observation_noise),
        chi2_table=jnp.asarray(table, dtype),
        init_cov_diag=jnp.asarray(diag, dtype),
        config=config,
    )


def reset_cov(params: MsckfParams, dtype=jnp.float32,
              velocity_cov=None) -> jnp.ndarray:
    """Initial/reset covariance (reference reset_state_cov, msckf.py:820-830):
    nonzero only on the 21x21 IMU/extrinsic diagonal pattern.

    `velocity_cov` overrides the velocity-block variance: the ONLINE reset
    keeps the (possibly wrong) nominal velocity, and the reference's
    0.25 m^2/s^2 makes the filter so sure of it that chi-square gating
    rejects every measurement afterwards and the system dead-reckons away
    (observed in round 2: a 55 m/s runaway surviving reset). Passing a
    large variance lets the next updates pull the velocity back.
    """
    D = params.config.state_dim
    diag = params.init_cov_diag.astype(dtype)
    if velocity_cov is not None:
        diag = diag.at[6:9].set(jnp.asarray(velocity_cov, dtype))
    P = jnp.zeros((D, D), dtype)
    return P.at[jnp.arange(21), jnp.arange(21)].set(diag)


def init_filter_state(
    config: VIOConfig,
    params: MsckfParams,
    q0=None,
    bg0=None,
    gravity=None,
    dtype=jnp.float32,
) -> FilterState:
    """Fresh filter state. ``q0 / bg0 / gravity`` come from the static
    gravity-and-bias initialization (reference msckf.py:235-258), computed
    host-side from the first `init_imu_samples` IMU messages."""
    N = config.filter.max_cam_state_size
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)
    z3 = jnp.zeros(3, dtype)
    T_i_c0 = np.asarray(config.cam0.T_imu_cam, dtype=np.float64)
    T_c0_i = np.linalg.inv(T_i_c0)
    # R_imu_cam0 / t_cam0_imu follow reference msckf.py:143-145.
    return FilterState(
        q=ident if q0 is None else jnp.asarray(q0, dtype),
        p=z3,
        v=z3,
        bg=z3 if bg0 is None else jnp.asarray(bg0, dtype),
        ba=z3,
        R_imu_cam0=jnp.asarray(T_c0_i[:3, :3].T, dtype),
        t_cam0_imu=jnp.asarray(T_c0_i[:3, 3], dtype),
        q_null=ident if q0 is None else jnp.asarray(q0, dtype),
        p_null=z3,
        v_null=z3,
        gravity=(
            jnp.asarray(config.gravity, dtype)
            if gravity is None
            else jnp.asarray(gravity, dtype)
        ),
        clone_q=jnp.tile(ident, (N, 1)),
        clone_p=jnp.zeros((N, 3), dtype),
        clone_q_null=jnp.tile(ident, (N, 1)),
        clone_p_null=jnp.zeros((N, 3), dtype),
        clone_valid=jnp.zeros(N, bool),
        n_clones=jnp.zeros((), jnp.int32),
        P=reset_cov(params, dtype),
        tracking_rate=jnp.ones((), dtype),
    )


def init_feature_map(config: VIOConfig, dtype=jnp.float32) -> FeatureMap:
    F = config.filter.max_features
    N = config.filter.max_cam_state_size
    return FeatureMap(
        fid=jnp.full((F,), -1, jnp.int32),
        valid=jnp.zeros(F, bool),
        obs=jnp.zeros((F, N, 4), dtype),
        obs_valid=jnp.zeros((F, N), bool),
        position=jnp.zeros((F, 3), dtype),
        initialized=jnp.zeros(F, bool),
    )
