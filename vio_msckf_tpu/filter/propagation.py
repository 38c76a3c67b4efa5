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

from vio_msckf_tpu.math import quat_mul, quat_to_rot, quat_normalize, skew
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


def _quat_increment(gyro, dt):
    """The JPL left-increment quaternion dq with q(t+dt) = dq (x) q(t) —
    the closed form of the zeroth-order integrator (jit_utils.py:48-73):
    exp(Omega(w) dt / 2) q == quat([w/|w| sin(|w|dt/2), cos(|w|dt/2)]) (x) q
    (Trawny & Roumeliotis Eq. 96-101)."""
    dtype = gyro.dtype
    norm = jnp.linalg.norm(gyro)
    h = 0.5 * dt
    safe = jnp.where(norm > 1e-5, norm, 1.0)
    vec = jnp.where(
        norm > 1e-5, gyro * (jnp.sin(norm * h) / safe), gyro * h
    )
    w = jnp.where(norm > 1e-5, jnp.cos(norm * h), jnp.ones((), dtype))
    return quat_normalize(jnp.concatenate([vec, w[None]]))


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

    # LOG-DEPTH parallel propagation. Two structural facts make the whole
    # frame's IMU slice parallelizable instead of a 16-step sequential
    # scan of tiny ops (which is pure dispatch latency on TPU):
    #
    #  1. The biases are CONSTANT within a frame, so every per-step
    #     quaternion increment dq_i = Q(gyro_i - bg, dt_i) depends only on
    #     inputs — computable in batch. Attitudes are then prefix products
    #     q_i = (dq_{i} ... dq_1) (x) q_0 via an associative scan
    #     (quaternion multiplication is associative); velocities and
    #     positions follow from batched RK4 increments + cumulative sums.
    #  2. The covariance update P <- Phi_i P Phi_i^T + Q_i composes as
    #     (Phi_b, Q_b) o (Phi_a, Q_a) = (Phi_b Phi_a, Phi_b Q_a Phi_b^T
    #     + Q_b) — associative, so (Phi_acc, Q_acc) also reduce in log
    #     depth, and the big (D, D) covariance is touched ONCE
    #     (P11' = Phi_acc P11 Phi_acc^T + Q_acc, P1x' = Phi_acc P1x;
    #     the clone block never changes during propagation,
    #     msckf.py:348-363).
    #
    # Padding steps enter as exact identities (dq = identity, dv = dp = 0,
    # Phi = I, Q = 0).
    M = imu_gyro.shape[0]
    g_w = state.gravity
    valid = imu_valid
    dt = jnp.where(valid, imu_dt, 0.0).astype(dtype)
    gyro = (imu_gyro.astype(dtype) - state.bg) * valid[:, None]
    acc = jnp.where(valid[:, None], imu_acc.astype(dtype) - state.ba, 0.0)

    # --- batched quaternion increments (full and half step) ---
    dq_full = jax.vmap(_quat_increment)(gyro, dt)          # (M, 4)
    dq_half = jax.vmap(_quat_increment)(gyro, dt * 0.5)
    ident_q = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)
    dq_full = jnp.where(valid[:, None], dq_full, ident_q)

    # Inclusive prefix products: pre_i = dq_i (x) ... (x) dq_1.
    def _combine(a, b):
        # b is the LATER block: apply after a.
        return jax.vmap(quat_mul)(b, a)

    pre = jax.lax.associative_scan(_combine, dq_full)       # (M, 4)
    q_next = jax.vmap(quat_mul, in_axes=(0, None))(pre, state.q)
    q_next = jax.vmap(quat_normalize)(q_next)               # q after step i
    q_prev = jnp.concatenate([state.q[None], q_next[:-1]], axis=0)
    q_half = jax.vmap(quat_mul)(dq_half, q_prev)            # q_i + dt/2

    R_prev_T = jnp.swapaxes(jax.vmap(quat_to_rot)(q_prev), -1, -2)
    R_half_T = jnp.swapaxes(jax.vmap(quat_to_rot)(q_half), -1, -2)
    R_next_T = jnp.swapaxes(jax.vmap(quat_to_rot)(q_next), -1, -2)

    # --- batched RK4 velocity/position increments (jit_utils.py:97-126) ---
    k1_v = jnp.einsum("mij,mj->mi", R_prev_T, acc) + g_w * valid[:, None]
    k23_v = jnp.einsum("mij,mj->mi", R_half_T, acc) + g_w * valid[:, None]
    k4_v = jnp.einsum("mij,mj->mi", R_next_T, acc) + g_w * valid[:, None]
    dv = (k1_v + 4.0 * k23_v + k4_v) * (dt / 6.0)[:, None]  # (M, 3)
    v_next = state.v + jnp.cumsum(dv, axis=0)
    v_prev = jnp.concatenate([state.v[None], v_next[:-1]], axis=0)
    # k1_p = v, k2_p = v + k1_v dt/2, k3_p = v + k2_v dt/2, k4_p = v + k3_v dt
    # => (k1_p + 2 k2_p + 2 k3_p + k4_p)/6 = v + dt (k1_v + 2 k23_v)/6.
    dp = (
        v_prev * dt[:, None]
        + (k1_v + 2.0 * k23_v) * (dt * dt / 6.0)[:, None]
    )
    p_next = state.p + jnp.cumsum(dp, axis=0)
    p_prev = jnp.concatenate([state.p[None], p_next[:-1]], axis=0)

    # --- batched error-state transition + OC fix ---
    def per_step(gy, ac, R_pT, dti, q_n, q_nl, v_n, v_nl, p_n, p_nl, ok):
        _, G, Phi = _error_state_jacobians(gy, ac, R_pT.T, dti, dtype)
        Phi = _oc_ekf_fix(Phi, q_n, q_nl, v_n, v_nl, p_n, p_nl, g_w, dti)
        Qi = (Phi @ G) @ Qc @ (Phi @ G).T * dti
        eye = jnp.eye(21, dtype=dtype)
        Phi = jnp.where(ok, Phi, eye)
        Qi = jnp.where(ok, Qi, 0.0)
        return Phi, Qi

    # OC null anchors for step i are the post-step state of step i-1
    # (msckf.py:366-368); the very first anchors come from the filter
    # state (set by the last update/augmentation).
    q_null_seq = jnp.concatenate([state.q_null[None], q_next[:-1]], axis=0)
    v_null_seq = jnp.concatenate([state.v_null[None], v_next[:-1]], axis=0)
    p_null_seq = jnp.concatenate([state.p_null[None], p_next[:-1]], axis=0)

    Phis, Qis = jax.vmap(per_step)(
        gyro, acc, R_prev_T, dt, q_next, q_null_seq, v_next, v_null_seq,
        p_next, p_null_seq, valid,
    )

    def _combine_pq(a, b):
        Pa, Qa = a
        Pb, Qb = b
        return (
            jnp.einsum("mij,mjk->mik", Pb, Pa),
            jnp.einsum("mij,mjk,mlk->mil", Pb, Qa, Pb) + Qb,
        )

    Phi_accs, Q_accs = jax.lax.associative_scan(_combine_pq, (Phis, Qis))
    Phi_acc = Phi_accs[-1]
    Q_acc = Q_accs[-1]

    any_valid = jnp.any(valid)
    q = jnp.where(any_valid, q_next[-1], state.q)
    v = jnp.where(any_valid, v_next[-1], state.v)
    p = jnp.where(any_valid, p_next[-1], state.p)

    # One application of the accumulated transition to the big covariance
    # (msckf.py:348-363), symmetrized once.
    P = state.P
    P11 = Phi_acc @ P[:21, :21] @ Phi_acc.T + Q_acc
    P_new = P.at[:21, :21].set(P11)
    P_new = P_new.at[:21, 21:].set(Phi_acc @ P[:21, 21:])
    P_new = P_new.at[21:, :21].set(P[21:, :21] @ Phi_acc.T)
    P_new = (P_new + P_new.T) / 2.0

    return state.replace(
        q=q, p=p, v=v,
        q_null=jnp.where(any_valid, q, state.q_null),
        p_null=jnp.where(any_valid, p, state.p_null),
        v_null=jnp.where(any_valid, v, state.v_null),
        P=P_new,
    )
