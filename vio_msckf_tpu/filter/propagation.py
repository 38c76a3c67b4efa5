"""IMU state + covariance propagation as one scanned jit.

Replaces the reference's per-message Python loop and numba kernels
(batch_imu_processing / process_model / predict_new_state,
MSCKF/msckf.py:262-380; kernels MSCKF/jit_utils.py:6-135) with a single
`lax.scan` over the frame's padded IMU slice. Invalid (padding) steps are
identity.

Semantics notes:
  * Error-state F (21x21), G (21x12) and the 3rd-order Phi expansion match
    jit_utils.py:6-43 exactly.
  * Nominal-state integration is RK4 with the zeroth-order quaternion
    integrator (jit_utils.py:46-128). The reference's numba port reuses a
    stale vector-skew when forming the k1/k2/k3 rotations
    (jit_utils.py:86,94,104 all use the skew of dq_dt's vector part); we
    instead form each rotation from its own quaternion — the behavior of
    the original msckf_vio this code descends from. The difference is
    O(|gyro| dt) per step and below sensor noise.
  * The observability-constrained (OC-EKF) Phi fix-up follows
    msckf.py:328-344, the covariance propagation msckf.py:346-363
    (including the cam-block strip multiply and the symmetrization).
"""

import jax
import jax.numpy as jnp

from vio_msckf_tpu.math import quat_to_rot, quat_normalize, skew
from vio_msckf_tpu.filter.state import FilterState, MsckfParams


def _error_state_jacobians(gyro, acc, R_w_i, dt, dtype):
    """F, G, Phi of the 21-dim error state (jit_utils.py:6-43)."""
    F = jnp.zeros((21, 21), dtype)
    F = F.at[0:3, 0:3].set(-skew(gyro))
    F = F.at[0:3, 3:6].set(-jnp.eye(3, dtype=dtype))
    F = F.at[6:9, 0:3].set(-R_w_i.T @ skew(acc))
    F = F.at[6:9, 9:12].set(-R_w_i.T)
    F = F.at[12:15, 6:9].set(jnp.eye(3, dtype=dtype))

    G = jnp.zeros((21, 12), dtype)
    G = G.at[0:3, 0:3].set(-jnp.eye(3, dtype=dtype))
    G = G.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
    G = G.at[6:9, 6:9].set(-R_w_i.T)
    G = G.at[9:12, 9:12].set(jnp.eye(3, dtype=dtype))

    Fdt = F * dt
    Fdt2 = Fdt @ Fdt
    Fdt3 = Fdt2 @ Fdt
    Phi = jnp.eye(21, dtype=dtype) + Fdt + Fdt2 / 2.0 + Fdt3 / 6.0
    return F, G, Phi


def _integrate_quaternion(q, gyro, dt):
    """Zeroth-order quaternion integrator (jit_utils.py:48-73).

    Returns the quaternion advanced by dt and by dt/2 (for RK4 midpoints).
    """
    norm = jnp.linalg.norm(gyro)
    Omega = jnp.zeros((4, 4), q.dtype)
    Omega = Omega.at[0:3, 0:3].set(-skew(gyro))
    Omega = Omega.at[0:3, 3].set(gyro)
    Omega = Omega.at[3, 0:3].set(-gyro)
    eye = jnp.eye(4, dtype=q.dtype)

    def prop(h):
        big = jnp.cos(norm * h) * eye + jnp.sin(norm * h) / jnp.where(
            norm > 1e-5, norm, 1.0
        ) * Omega
        small = jnp.cos(norm * h) * (eye + Omega * h)
        return jnp.where(norm > 1e-5, big, small) @ q

    return quat_normalize(prop(dt * 0.5)), quat_normalize(prop(dt * 0.25))


def _rk4_predict(q, v, p, gyro, acc, gravity, dt):
    """RK4 nominal-state integration (jit_utils.py:97-126)."""
    dq_dt, dq_dt2 = _integrate_quaternion(q, gyro, dt)
    dR_dt_T = quat_to_rot(dq_dt).T
    dR_dt2_T = quat_to_rot(dq_dt2).T
    R_T = quat_to_rot(q).T

    k1_v = R_T @ acc + gravity
    k1_p = v

    k2_v = dR_dt2_T @ acc + gravity
    k2_p = v + k1_v * dt / 2.0

    k3_v = dR_dt2_T @ acc + gravity
    k3_p = v + k2_v * dt / 2.0

    k4_v = dR_dt_T @ acc + gravity
    k4_p = v + k3_v * dt

    q_new = dq_dt
    v_new = v + (k1_v + 2 * k2_v + 2 * k3_v + k4_v) * dt / 6.0
    p_new = p + (k1_p + 2 * k2_p + 2 * k3_p + k4_p) * dt / 6.0
    return q_new, v_new, p_new


def _oc_ekf_fix(Phi, q_new, q_null, v_new, v_null, p_new, p_null, gravity, dt):
    """Observability-constrained Phi correction (msckf.py:328-344)."""
    R_kk_1 = quat_to_rot(q_null)
    Phi = Phi.at[0:3, 0:3].set(quat_to_rot(q_new) @ R_kk_1.T)

    u = R_kk_1 @ gravity
    s = u / jnp.maximum(u @ u, 1e-20)

    A1 = Phi[6:9, 0:3]
    w1 = skew(v_null - v_new) @ gravity
    Phi = Phi.at[6:9, 0:3].set(A1 - jnp.outer(A1 @ u - w1, s))

    A2 = Phi[12:15, 0:3]
    w2 = skew(dt * v_null + p_null - p_new) @ gravity
    Phi = Phi.at[12:15, 0:3].set(A2 - jnp.outer(A2 @ u - w2, s))
    return Phi


def propagate(
    state: FilterState,
    params: MsckfParams,
    imu_gyro: jnp.ndarray,  # (M, 3) measured angular velocity
    imu_acc: jnp.ndarray,   # (M, 3) measured linear acceleration
    imu_dt: jnp.ndarray,    # (M,) integration interval per sample
    imu_valid: jnp.ndarray,  # (M,) bool padding mask
) -> FilterState:
    """Scan the frame's IMU slice through the process model
    (batch_imu_processing, msckf.py:262-287)."""
    dtype = state.P.dtype
    Qc = jnp.diag(params.continuous_noise.astype(dtype))

    def step(carry, inp):
        q, p, v, bg, ba, q_null, p_null, v_null, P = carry
        m_gyro, m_acc, dt, valid = inp

        gyro = m_gyro - bg
        acc = m_acc - ba
        R_w_i = quat_to_rot(q)
        _, G, Phi = _error_state_jacobians(gyro, acc, R_w_i, dt, dtype)

        q_new, v_new, p_new = _rk4_predict(
            q, v, p, gyro, acc, state.gravity, dt
        )
        Phi = _oc_ekf_fix(
            Phi, q_new, q_null, v_new, v_null, p_new, p_null, state.gravity, dt
        )

        # Covariance strips (msckf.py:348-363).
        P11 = P[:21, :21]
        Q = (Phi @ G) @ Qc @ (Phi @ G).T * dt
        P11_new = Phi @ P11 @ Phi.T + Q
        P_new = P.at[:21, :21].set(P11_new)
        P_new = P_new.at[:21, 21:].set(Phi @ P[:21, 21:])
        P_new = P_new.at[21:, :21].set(P[21:, :21] @ Phi.T)
        P_new = (P_new + P_new.T) / 2.0

        new_carry = (
            q_new, p_new, v_new, bg, ba,
            # Null anchors track the post-propagation state (msckf.py:366-368).
            q_new, p_new, v_new,
            P_new,
        )
        old_carry = (q, p, v, bg, ba, q_null, p_null, v_null, P)
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(valid, n, o), new_carry, old_carry
        )
        return carry, None

    init = (
        state.q, state.p, state.v, state.bg, state.ba,
        state.q_null, state.p_null, state.v_null, state.P,
    )
    (q, p, v, bg, ba, q_null, p_null, v_null, P), _ = jax.lax.scan(
        step, init, (imu_gyro, imu_acc, imu_dt, imu_valid)
    )
    return state.replace(
        q=q, p=p, v=v, bg=bg, ba=ba,
        q_null=q_null, p_null=p_null, v_null=v_null, P=P,
    )
