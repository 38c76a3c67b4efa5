"""18-state error-state Kalman filter core (Sola-style ESKF).

Functional re-design of the reference's loosely-coupled filter
(ESKF/vio.py:11-162, driven by ESKF/eskf_vio.py:94-166):

  * error state x = (dp, dv, dtheta, da_b, dw_b, dg) in R^18;
  * nominal state carries the rotation as a 3x3 matrix (camera -> world),
    matching the reference's use of scipy Rotation;
  * IMU propagation is a `lax.scan` over the padded per-frame IMU slice
    (the reference interleaves IMU/image events in a Python while loop,
    eskf_vio.py:94-121 — here the filter is frame-clocked like the MSCKF
    engine, with identical math per sample);
  * the per-feature measurement updates are SEQUENTIAL relinearized EKF
    steps exactly like the reference's inner loop (eskf_vio.py:136-153),
    expressed as a `lax.scan` over the padded feature axis with masked
    writes — one compiled loop instead of Python per-feature dispatch.

All dynamics/measurement equations follow ESKF/vio.py:40-162.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from vio_msckf_tpu.math import axis_angle_to_rot, skew


@struct.dataclass
class EskfParams:
    gyro_noise: float           # gyroscope_noise_density
    acc_noise: float            # accelerometer_noise_density
    gyro_walk: float            # gyroscope_random_walk
    acc_walk: float             # accelerometer_random_walk
    meas_cov: jnp.ndarray       # (2, 2) image measurement covariance Q
    error_threshold: float      # innovation gate (normalized units)


@struct.dataclass
class EskfState:
    """Nominal state; rotation R maps camera -> world (ESKF/vio.py:25-27)."""

    p: jnp.ndarray   # (3,)
    v: jnp.ndarray   # (3,)
    R: jnp.ndarray   # (3, 3)
    a_b: jnp.ndarray  # (3,)
    w_b: jnp.ndarray  # (3,)
    g: jnp.ndarray   # (3,)


def init_state(g0, dtype=jnp.float32):
    """Zero pose/velocity/biases; gravity from the first accelerometer
    sample scaled to -9.8 (eskf_vio.py:77-79)."""
    z = jnp.zeros(3, dtype)
    return EskfState(
        p=z, v=z, R=jnp.eye(3, dtype=dtype), a_b=z, w_b=z,
        g=jnp.asarray(g0, dtype),
    )


def init_covariance(dtype=jnp.float32):
    """Reference initial sigma diag (eskf_vio.py:84)."""
    diag = np.array([
        0, 0, 0, 0.2, 0.2, 0.2, 0.1, 0.1, 0.1,
        0.25, 0.25, 0.25, 0.02, 0.02, 0.02, 0, 0, 0,
    ])
    return jnp.asarray(np.diag(diag), dtype)


def _nominal_step(s: EskfState, w_m, a_m, dt):
    """Nominal-state integration (ESKF/vio.py:11-37)."""
    acc_w = s.R @ (a_m - s.a_b) + s.g
    p = s.p + s.v * dt + 0.5 * dt * dt * acc_w
    v = s.v + acc_w * dt
    dR = axis_angle_to_rot((w_m - s.w_b) * dt)
    return s.replace(p=p, v=v, R=s.R @ dR)


def _covariance_step(s: EskfState, P, w_m, a_m, dt, params: EskfParams):
    """Error covariance propagation P <- Fx P Fx^T + Fi Qi Fi^T
    (ESKF/vio.py:40-105). Fx is built densely (18x18 is tiny; XLA fuses
    the block writes)."""
    dtype = P.dtype
    I3 = jnp.eye(3, dtype=dtype)
    R = s.R
    a_hat = skew(a_m - s.a_b)
    Rw = axis_angle_to_rot((w_m - s.w_b) * dt)

    Fx = jnp.eye(18, dtype=dtype)
    Fx = Fx.at[0:3, 3:6].set(dt * I3)
    Fx = Fx.at[3:6, 6:9].set(-(R @ a_hat) * dt)
    Fx = Fx.at[3:6, 9:12].set(-R * dt)
    Fx = Fx.at[3:6, 15:18].set(dt * I3)
    Fx = Fx.at[6:9, 6:9].set(Rw.T)
    Fx = Fx.at[6:9, 12:15].set(-dt * I3)

    P = Fx @ P @ Fx.T
    # Fi Qi Fi^T is block-diagonal on (v, theta, a_b, w_b).
    dt2 = dt * dt
    P = P.at[3:6, 3:6].add(params.acc_noise ** 2 * dt2 * I3)
    P = P.at[6:9, 6:9].add(params.gyro_noise ** 2 * dt2 * I3)
    P = P.at[9:12, 9:12].add(params.acc_walk ** 2 * dt * I3)
    P = P.at[12:15, 12:15].add(params.gyro_walk ** 2 * dt * I3)
    return P


def propagate(state: EskfState, P, gyro, acc, dt, valid,
              params: EskfParams):
    """Scan the nominal+covariance step over a padded IMU slice.

    gyro/acc: (M, 3) already expressed in the camera frame (the reference
    rotates IMU samples by R_LB up front, eskf_vio.py:106-107); dt (M,);
    valid (M,) masks padding.
    """
    def body(carry, inp):
        s, P = carry
        w_m, a_m, dti, vi = inp
        dti = jnp.where(vi, dti, 0.0)
        P2 = _covariance_step(s, P, w_m, a_m, dti, params)
        s2 = _nominal_step(s, w_m, a_m, dti)
        # dt == 0 makes both updates identity; masking keeps shapes static.
        return (s2, P2), None

    (state, P), _ = jax.lax.scan(body, (state, P), (gyro, acc, dt, valid))
    return state, P


def _one_update(s: EskfState, P, uv, Pw, params: EskfParams):
    """Single-feature relinearized EKF update (ESKF/vio.py:108-162).

    Returns (state, P, innovation); the update is applied only when the
    innovation passes the gate, exactly like the reference's if-branch.
    """
    dtype = P.dtype
    R = s.R
    Pc = R.T @ (Pw - s.p)
    z = Pc[2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv_pred = Pc[:2] / safe_z
    innovation = uv - uv_pred

    accept = (jnp.linalg.norm(innovation) < params.error_threshold) & (
        z > 1e-6
    )

    # d(uv)/d(Pc) = 1/z * [[1,0,-u],[0,1,-v]]
    d_zt_d_Pc = jnp.stack([
        jnp.asarray([1.0, 0.0, 0.0], dtype) - jnp.asarray(
            [0.0, 0.0, 1.0], dtype) * uv_pred[0],
        jnp.asarray([0.0, 1.0, 0.0], dtype) - jnp.asarray(
            [0.0, 0.0, 1.0], dtype) * uv_pred[1],
    ]) / safe_z

    H = jnp.zeros((2, 18), dtype)
    H = H.at[:, 0:3].set(d_zt_d_Pc @ (-R.T))      # d/dp
    H = H.at[:, 6:9].set(d_zt_d_Pc @ skew(Pc))    # d/dtheta

    S = H @ P @ H.T + params.meas_cov
    K = P @ H.T @ jnp.linalg.inv(S)
    dx = K @ innovation

    IKH = jnp.eye(18, dtype=dtype) - K @ H
    P_new = IKH @ P @ IKH.T + K @ params.meas_cov @ K.T  # Joseph form

    s_new = s.replace(
        p=s.p + dx[0:3],
        v=s.v + dx[3:6],
        R=R @ axis_angle_to_rot(dx[6:9]),
        a_b=s.a_b + dx[9:12],
        w_b=s.w_b + dx[12:15],
        g=s.g + dx[15:18],
    )

    s_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), s_new, s
    )
    P_out = jnp.where(accept, P_new, P)
    return s_out, P_out, innovation


def update_features(state: EskfState, P, uvd1, uvd2, valid, last_R, last_t,
                    params: EskfParams):
    """Sequential per-feature updates over the padded match table.

    uvd1/uvd2: (K, 3) normalized (u, v, d) at the previous/current frame
    (d = disparity / (f * baseline), so depth = 1/d — stereo.py:338-373);
    the world point is back-projected through the LAST stereo pose
    (eskf_vio.py:137-146). Returns (state, P, innovations (K, 2)).
    """
    def body(carry, inp):
        s, P = carry
        m1, m2, ok = inp
        d1 = m1[2]
        ok = ok & (d1 > 0)  # eskf_vio.py:140
        safe_d = jnp.where(ok, d1, 1.0)
        P1 = jnp.stack([m1[0] / safe_d, m1[1] / safe_d, 1.0 / safe_d])
        Pw = last_R @ P1 + last_t
        s2, P2, inno = _one_update(s, P, m2[:2], Pw, params)
        s = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), s2, s
        )
        P = jnp.where(ok, P2, P)
        inno = jnp.where(ok, inno, 0.0)
        return (s, P), inno

    (state, P), innovations = jax.lax.scan(
        body, (state, P), (uvd1, uvd2, valid)
    )
    return state, P, innovations


def eskf_frame_step(state: EskfState, P, frame, params: EskfParams):
    """One image-clocked ESKF step: IMU scan then stereo feature updates.

    frame: dict with imu_gyro/imu_acc (M,3) in camera frame, imu_dt (M,),
    imu_valid (M,), uvd1/uvd2 (K,3), match_valid (K,), last_R (3,3),
    last_t (3,).
    """
    state, P = propagate(
        state, P, frame["imu_gyro"], frame["imu_acc"], frame["imu_dt"],
        frame["imu_valid"], params,
    )
    state, P, innovations = update_features(
        state, P, frame["uvd1"], frame["uvd2"], frame["match_valid"],
        frame["last_R"], frame["last_t"], params,
    )
    return state, P, innovations
