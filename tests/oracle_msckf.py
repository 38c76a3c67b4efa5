"""Numpy float64 oracle re-deriving the reference MSCKF equations.

The reference cannot run in this environment (numba/cv2 absent), so parity
is checked against this independent re-derivation of its math:
  * process model / Phi / covariance propagation (MSCKF/msckf.py:291-368,
    jit_utils.py:6-135) — with the corrected RK4 rotations (see
    vio_msckf_tpu/filter/propagation.py docstring);
  * state augmentation (msckf.py:385-407, jit_utils.py:137-167);
  * measurement Jacobian + OC correction (msckf.py:429-498);
  * the reference update path: SVD nullspace projection -> stack -> tall QR
    -> solve (msckf.py:500-604) — used to prove our information-form
    Cholesky path produces the identical posterior.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def jpl_to_rot(q):
    q = np.asarray(q, float)
    q = q / np.linalg.norm(q)
    return Rotation.from_quat(q).as_matrix().T


def skew(v):
    x, y, z = v
    return np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], float)


def process_model_np(q, p, v, bg, ba, P, gravity, Qc_diag, m_gyro, m_acc, dt,
                     q_null, p_null, v_null):
    """One IMU step of the reference process model (msckf.py:291-368)."""
    gyro = m_gyro - bg
    acc = m_acc - ba
    R_w_i = jpl_to_rot(q)

    F = np.zeros((21, 21))
    F[0:3, 0:3] = -skew(gyro)
    F[0:3, 3:6] = -np.eye(3)
    F[6:9, 0:3] = -R_w_i.T @ skew(acc)
    F[6:9, 9:12] = -R_w_i.T
    F[12:15, 6:9] = np.eye(3)
    G = np.zeros((21, 12))
    G[0:3, 0:3] = -np.eye(3)
    G[3:6, 3:6] = np.eye(3)
    G[6:9, 6:9] = -R_w_i.T
    G[9:12, 9:12] = np.eye(3)
    Fdt = F * dt
    Phi = np.eye(21) + Fdt + Fdt @ Fdt / 2.0 + Fdt @ Fdt @ Fdt / 6.0

    # RK4 nominal propagation (jit_utils.py:46-128, corrected rotations).
    q_new, v_new, p_new = rk4_np(q, v, p, gyro, acc, gravity, dt)

    # OC-EKF fix (msckf.py:328-344).
    R_kk_1 = jpl_to_rot(q_null)
    Phi[0:3, 0:3] = jpl_to_rot(q_new) @ R_kk_1.T
    u = R_kk_1 @ gravity
    s = u / (u @ u)
    A1 = Phi[6:9, 0:3]
    w1 = skew(v_null - v_new) @ gravity
    Phi[6:9, 0:3] = A1 - np.outer(A1 @ u - w1, s)
    A2 = Phi[12:15, 0:3]
    w2 = skew(dt * v_null + p_null - p_new) @ gravity
    Phi[12:15, 0:3] = A2 - np.outer(A2 @ u - w2, s)

    Qc = np.diag(Qc_diag)
    Q = Phi @ G @ Qc @ G.T @ Phi.T * dt
    P = P.copy()
    P[:21, :21] = Phi @ P[:21, :21] @ Phi.T + Q
    P[:21, 21:] = Phi @ P[:21, 21:]
    P[21:, :21] = P[21:, :21] @ Phi.T
    P = (P + P.T) / 2.0
    return q_new, p_new, v_new, P, q_new.copy(), p_new.copy(), v_new.copy()


def quat_integrate_np(q, gyro, h):
    norm = np.linalg.norm(gyro)
    Omega = np.zeros((4, 4))
    Omega[0:3, 0:3] = -skew(gyro)
    Omega[0:3, 3] = gyro
    Omega[3, 0:3] = -gyro
    if norm > 1e-5:
        M = np.cos(norm * h) * np.eye(4) + np.sin(norm * h) / norm * Omega
    else:
        M = np.cos(norm * h) * (np.eye(4) + Omega * h)
    qn = M @ q
    return qn / np.linalg.norm(qn)


def rk4_np(q, v, p, gyro, acc, gravity, dt):
    dq_dt = quat_integrate_np(q, gyro, dt * 0.5)
    dq_dt2 = quat_integrate_np(q, gyro, dt * 0.25)
    dR_dt_T = jpl_to_rot(dq_dt).T
    dR_dt2_T = jpl_to_rot(dq_dt2).T
    R_T = jpl_to_rot(q).T

    k1_v = R_T @ acc + gravity
    k1_p = v
    k2_v = dR_dt2_T @ acc + gravity
    k2_p = v + k1_v * dt / 2
    k3_v = dR_dt2_T @ acc + gravity
    k3_p = v + k2_v * dt / 2
    k4_v = dR_dt_T @ acc + gravity
    k4_p = v + k3_v * dt
    v_new = v + (k1_v + 2 * k2_v + 2 * k3_v + k4_v) * dt / 6.0
    p_new = p + (k1_p + 2 * k2_p + 2 * k3_p + k4_p) * dt / 6.0
    return dq_dt, v_new, p_new


def augment_np(q, p, R_i_c, t_c_i, P):
    """state_augmentation (msckf.py:385-407, jit_utils.py:137-167) on a
    dynamically-grown covariance (oracle keeps the reference's realloc)."""
    R_w_i = jpl_to_rot(q)
    R_w_c = R_i_c @ R_w_i
    t_c_w = p + R_w_i.T @ t_c_i

    J = np.zeros((6, 21))
    J[0:3, 0:3] = R_i_c
    J[0:3, 15:18] = np.eye(3)
    J[3:6, 0:3] = skew(R_w_i.T @ t_c_i)
    J[3:6, 12:15] = np.eye(3)
    J[3:6, 18:21] = np.eye(3)

    n = P.shape[0]
    Pn = np.zeros((n + 6, n + 6))
    Pn[:n, :n] = P
    Pn[n:, :n] = J @ Pn[:21, :n]
    Pn[:n, n:] = Pn[n:, :n].T
    Pn[n:, n:] = J @ Pn[:21, :21] @ J.T
    Pn = (Pn + Pn.T) / 2.0
    return R_w_c, t_c_w, Pn


def clone_jacobian_np(p_w, z, cq, cp, cqn, cpn, gravity, R_c0c1, t_c0c1):
    """measurement_jacobian (msckf.py:429-498)."""
    R_w_c0 = jpl_to_rot(cq)
    t_c0_w = cp
    R_w_c1 = R_c0c1 @ R_w_c0
    t_c1_w = t_c0_w - R_w_c1.T @ t_c0c1
    p_c0 = R_w_c0 @ (p_w - t_c0_w)
    p_c1 = R_w_c1 @ (p_w - t_c1_w)

    dz0 = np.zeros((4, 3))
    dz0[0, 0] = 1 / p_c0[2]
    dz0[1, 1] = 1 / p_c0[2]
    dz0[0, 2] = -p_c0[0] / p_c0[2] ** 2
    dz0[1, 2] = -p_c0[1] / p_c0[2] ** 2
    dz1 = np.zeros((4, 3))
    dz1[2, 0] = 1 / p_c1[2]
    dz1[3, 1] = 1 / p_c1[2]
    dz1[2, 2] = -p_c1[0] / p_c1[2] ** 2
    dz1[3, 2] = -p_c1[1] / p_c1[2] ** 2

    dpc0 = np.hstack([skew(p_c0), -R_w_c0])
    dpc1 = np.hstack([R_c0c1 @ skew(p_c0), -R_w_c1])
    H_x = dz0 @ dpc0 + dz1 @ dpc1

    u = np.zeros(6)
    u[:3] = jpl_to_rot(cqn) @ gravity
    u[3:] = skew(p_w - cpn) @ gravity
    H_x = H_x - np.outer(H_x @ u, u) / (u @ u)
    H_f = -H_x[:, 3:6]
    r = z - np.concatenate([p_c0[:2] / p_c0[2], p_c1[:2] / p_c1[2]])
    return H_x, H_f, r


def reference_update(P, H_list, Hf_list, r_list, obs_noise, chi2_table,
                     dofs):
    """The exact reference path: per-feature SVD nullspace projection
    (msckf.py:533-539), chi2 gate (msckf.py:606-614), stack, tall QR
    (msckf.py:549-553), solve-based gain and (I-KH)P (msckf.py:558-604).

    Returns (dx, P_new, gate_flags). H rows must be dense (no padding).
    """
    D = P.shape[0]
    stacked_H, stacked_r, gates = [], [], []
    for H, Hf, r, dof in zip(H_list, Hf_list, r_list, dofs):
        U, _, _ = np.linalg.svd(Hf)
        A = U[:, 3:]
        Ht = A.T @ H
        rt = A.T @ r
        S = Ht @ P @ Ht.T + obs_noise * np.eye(len(Ht))
        gamma = rt @ np.linalg.solve(S, rt)
        ok = gamma < chi2_table[dof]
        gates.append(ok)
        if ok:
            stacked_H.append(Ht)
            stacked_r.append(rt)
    if not stacked_H:
        return np.zeros(D), P.copy(), gates
    H = np.vstack(stacked_H)
    r = np.concatenate(stacked_r)
    if H.shape[0] > H.shape[1]:
        Q, R = np.linalg.qr(H)
        H_thin, r_thin = R, Q.T @ r
    else:
        H_thin, r_thin = H, r
    S = H_thin @ P @ H_thin.T + obs_noise * np.eye(len(H_thin))
    K = np.linalg.solve(S, H_thin @ P).T
    dx = K @ r_thin
    P_new = (np.eye(D) - K @ H_thin) @ P
    return dx, (P_new + P_new.T) / 2.0, gates
