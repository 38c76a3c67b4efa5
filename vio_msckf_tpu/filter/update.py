"""MSCKF measurement model + EKF update, redesigned for fixed shapes.

Reference semantics covered here:
  * per-(feature, clone) stereo measurement Jacobian with the
    observability-constrained correction (measurement_jacobian,
    MSCKF/msckf.py:429-498);
  * per-feature stacking + left-nullspace projection of H_f
    (feature_jacobian, msckf.py:500-541 — the reference uses an SVD,
    jit_utils.py:169-171);
  * chi-square gating (gating_test, msckf.py:606-614);
  * the batched EKF update with QR compression (measurement_update,
    msckf.py:543-604).

TPU-native redesign (SURVEY.md section 7): instead of materializing a tall
(<=1500 x D) stacked Jacobian and QR-factorizing it, we accumulate the
*information form* ``M = sum_j H~_j^T H~_j`` and ``m = sum_j H~_j^T r~_j``
over gated features and apply the update directly from (M, m) via the
push-through identity ``H^T (H P H^T + s I)^{-1} = (M P + s I)^{-1} H^T``
(one LU solve; see information_update for why neither QR nor Cholesky).
The nullspace projection never builds the complement basis either: with U
an orthonormal basis of col(H_f) (one small QR per feature),
``H~^T H~ = H^T (I - U U^T) H``.

Gating is computed exactly (same gamma as the reference's projected
system) via the block-inverse identity
``gamma = rp^T B^{-1} rp - (rp^T B^{-1} U)(U^T B^{-1} U)^{-1}(U^T B^{-1} rp)``
with ``B = H P H^T + s I`` and ``rp = (I - U U^T) r`` — masked padding rows
contribute exactly zero.
"""

import jax
import jax.numpy as jnp

from vio_msckf_tpu.math import (
    quat_mul,
    quat_to_rot,
    skew,
    small_angle_quat,
)
from vio_msckf_tpu.filter.state import FilterState, MsckfParams

_SAFE = 1e-12


# ---------------------------------------------------------------------------
# Per-clone measurement Jacobian (msckf.py:429-498)
# ---------------------------------------------------------------------------

def _clone_jacobian(p_w, z, clone_q, clone_p, clone_q_null, clone_p_null,
                    gravity, R_c0c1, t_c0c1):
    """H_x (4,6), H_f (4,3), r (4,) of one stereo observation."""
    dtype = z.dtype
    R_w_c0 = quat_to_rot(clone_q)
    t_c0_w = clone_p
    R_w_c1 = R_c0c1 @ R_w_c0
    t_c1_w = t_c0_w - R_w_c1.T @ t_c0c1

    p_c0 = R_w_c0 @ (p_w - t_c0_w)
    p_c1 = R_w_c1 @ (p_w - t_c1_w)
    z0 = jnp.where(jnp.abs(p_c0[2]) > _SAFE, p_c0[2], _SAFE)
    z1 = jnp.where(jnp.abs(p_c1[2]) > _SAFE, p_c1[2], _SAFE)

    dz_dpc0 = jnp.zeros((4, 3), dtype)
    dz_dpc0 = dz_dpc0.at[0, 0].set(1.0 / z0)
    dz_dpc0 = dz_dpc0.at[1, 1].set(1.0 / z0)
    dz_dpc0 = dz_dpc0.at[0, 2].set(-p_c0[0] / (z0 * z0))
    dz_dpc0 = dz_dpc0.at[1, 2].set(-p_c0[1] / (z0 * z0))

    dz_dpc1 = jnp.zeros((4, 3), dtype)
    dz_dpc1 = dz_dpc1.at[2, 0].set(1.0 / z1)
    dz_dpc1 = dz_dpc1.at[3, 1].set(1.0 / z1)
    dz_dpc1 = dz_dpc1.at[2, 2].set(-p_c1[0] / (z1 * z1))
    dz_dpc1 = dz_dpc1.at[3, 2].set(-p_c1[1] / (z1 * z1))

    dpc0_dxc = jnp.concatenate([skew(p_c0), -R_w_c0], axis=1)          # (3,6)
    dpc1_dxc = jnp.concatenate([R_c0c1 @ skew(p_c0), -R_w_c1], axis=1)

    H_x = dz_dpc0 @ dpc0_dxc + dz_dpc1 @ dpc1_dxc  # (4,6)

    # Observability constraint (msckf.py:483-490).
    u = jnp.concatenate(
        [
            quat_to_rot(clone_q_null) @ gravity,
            skew(p_w - clone_p_null) @ gravity,
        ]
    )
    H_x = H_x - jnp.outer(H_x @ u, u) / jnp.maximum(u @ u, _SAFE)

    r = z - jnp.concatenate([p_c0[0:2] / z0, p_c1[0:2] / z1])
    return H_x, r


def feature_system(p_w, obs, use_mask, state: FilterState,
                   params: MsckfParams):
    """Build one feature's stacked, nullspace-projected system.

    Returns (Hp (4N, D), rp (4N,), B-ingredients) where Hp / rp are already
    projected by (I - U U^T); rows for unused clones are exactly zero.
    The H_f used for the projection is the post-OC-correction
    ``H_f = -H_x[:, 3:6]`` (msckf.py:490).
    """
    N = state.clone_q.shape[0]
    D = state.P.shape[0]
    dtype = state.P.dtype

    Hx, r = jax.vmap(
        lambda cq, cp, cqn, cpn, z: _clone_jacobian(
            p_w, z, cq, cp, cqn, cpn, state.gravity,
            params.R_cam0_cam1, params.t_cam0_cam1,
        )
    )(state.clone_q, state.clone_p, state.clone_q_null,
      state.clone_p_null, obs)                       # (N,4,6), (N,4)

    mask = use_mask[:, None]
    Hx = jnp.where(mask[:, :, None], Hx, 0.0)
    r = jnp.where(mask, r, 0.0)
    Hf = -Hx[:, :, 3:6]                              # (N,4,3), msckf.py:490

    # Scatter the (4,6) blocks into block-diagonal clone columns:
    # H (4N, D) with block i at columns 21+6i (feature_jacobian,
    # msckf.py:526-531).
    idx = jnp.arange(N)
    Hblk = jnp.zeros((N, 4, N, 6), dtype).at[idx, :, idx, :].set(Hx)
    H = jnp.concatenate(
        [jnp.zeros((4 * N, 21), dtype), Hblk.reshape(4 * N, 6 * N)], axis=1
    )
    Hf_full = Hf.reshape(4 * N, 3)
    r_full = r.reshape(4 * N)

    # Orthonormal basis of col(H_f): one small reduced QR per feature,
    # replacing the reference's SVD nullspace (msckf.py:533-539).
    U, _ = jnp.linalg.qr(Hf_full)                    # (4N, 3)
    Hp = H - U @ (U.T @ H)
    rp = r_full - U @ (U.T @ r_full)
    return H, Hp, r_full, rp, U


def feature_gamma(H, rp, U, P, obs_noise):
    """Exact chi-square statistic of the projected system (msckf.py:606-609)
    without forming the nullspace complement."""
    m = H.shape[0]
    B = H @ P @ H.T + obs_noise * jnp.eye(m, dtype=H.dtype)
    X = jnp.linalg.solve(B, jnp.stack([rp], axis=1))  # B^-1 rp
    Binv_rp = X[:, 0]
    Binv_U = jnp.linalg.solve(B, U)
    G = U.T @ Binv_U                                  # (3,3)
    gu = U.T @ Binv_rp                                # (3,)
    correction = gu @ jnp.linalg.solve(G + 1e-12 * jnp.eye(3, dtype=H.dtype), gu)
    return rp @ Binv_rp - correction


# ---------------------------------------------------------------------------
# Information-form batched update (msckf.py:543-604 equivalent)
# ---------------------------------------------------------------------------

def information_update(state: FilterState, M, m, params: MsckfParams):
    """Apply the EKF update from accumulated information (M, m).

    Exactly equivalent to measurement_update (msckf.py:543-604) by the
    push-through identity ``H^T (H P H^T + s I)^{-1} = (M P + s I)^{-1} H^T``
    with M = H^T H, s = observation_noise:

        B     = (M P + s I)^{-1}
        dx    = K r         = P B m
        K H   =               P B M
        P_new = (I - K H) P (I - K H)^T + K (s I) K^T          [Joseph]
              = (I - P B M) P (.)^T + P (B M)(s B^T) P

    One LU solve of the always-well-posed (M P + s I) replaces the
    reference's tall QR. Two deliberate departures from a naive port:

      * NO positive-definite factorization of M. The MSCKF's M is
        structurally rank-deficient (global translation + yaw are
        unobservable), and any jitter large enough to make a float32
        Cholesky stable injects fake information along those directions —
        the filter then shrinks unobservable covariance every update and
        diverges (worst with noise-free measurements, where nothing
        counteracts the overconfidence).
      * Joseph-form covariance. The reference's (I - K H) P in float64
        (msckf.py:598-601) loses positive-definiteness in float32 once
        updates get strong (observed: sigma INCREASING through an update,
        then negative variances); the Joseph form is PSD by construction.
    """
    D = M.shape[0]
    dtype = M.dtype
    s = params.observation_noise
    M = (M + M.T) / 2.0
    P = state.P

    S = M @ P + s * jnp.eye(D, dtype=dtype)
    rhs = jnp.concatenate(
        [m[:, None], M, s * jnp.eye(D, dtype=dtype)], axis=1
    )
    X = jnp.linalg.solve(S, rhs)
    Bm = X[:, 0]            # B m
    BM = X[:, 1:D + 1]      # B M
    sB = X[:, D + 1:]       # s B

    dx = P @ Bm
    I_KH = jnp.eye(D, dtype=dtype) - P @ BM
    P_new = I_KH @ P @ I_KH.T + P @ BM @ sB.T @ P
    P_new = (P_new + P_new.T) / 2.0

    return apply_correction(state, dx).replace(P=P_new)


def apply_correction(state: FilterState, dx):
    """Inject the error-state correction (msckf.py:566-595)."""
    dq = small_angle_quat(dx[0:3])
    q = quat_mul(dq, state.q)
    bg = state.bg + dx[3:6]
    v = state.v + dx[6:9]
    ba = state.ba + dx[9:12]
    p = state.p + dx[12:15]

    dq_ext = small_angle_quat(dx[15:18])
    R_imu_cam0 = quat_to_rot(dq_ext) @ state.R_imu_cam0
    t_cam0_imu = state.t_cam0_imu + dx[18:21]

    N = state.clone_q.shape[0]
    dxc = dx[21:].reshape(N, 6)
    dq_c = small_angle_quat(dxc[:, 0:3])
    clone_q = jax.vmap(quat_mul)(dq_c, state.clone_q)
    clone_q = jnp.where(state.clone_valid[:, None], clone_q, state.clone_q)
    clone_p = jnp.where(
        state.clone_valid[:, None],
        state.clone_p + dxc[:, 3:6],
        state.clone_p,
    )
    return state.replace(
        q=q, p=p, v=v, bg=bg, ba=ba,
        R_imu_cam0=R_imu_cam0, t_cam0_imu=t_cam0_imu,
        clone_q=clone_q, clone_p=clone_p,
    )


def accumulate_update(
    state: FilterState,
    params: MsckfParams,
    positions,       # (F, 3) triangulated world positions
    obs,             # (F, N, 4)
    use_masks,       # (F, N) clones each feature contributes
    process_mask,    # (F,) features eligible for the update
    dofs,            # (F,) chi-square dof per feature
    axis_name=None,  # optional mesh axis to shard the feature dim over
):
    """Shared fan-in for remove_lost_features / prune_cam_state_buffer:
    per-feature systems -> gating -> row budget -> (M, m, include_mask).

    Budget rule mirrors msckf.py:676-679: feature j contributes iff the
    gated rows stacked before it total <= max_update_rows.

    With `axis_name` set (under shard_map over a device mesh), each shard
    builds the systems for its F/n_block slice of the feature table and the
    information accumulators are reduced with `lax.psum` over ICI — the
    distributed Schur/information reduction of SURVEY.md section 2.4. The
    row-budget prefix sum needs the *global* feature order, so the tiny
    per-feature (gamma, rows) vectors are all-gathered first; the result is
    bitwise-equivalent to the unsharded path up to float addition order.
    """
    P = state.P
    F = positions.shape[0]

    if axis_name is not None:
        nb = jax.lax.axis_size(axis_name)
        bi = jax.lax.axis_index(axis_name)
        Fl = F // nb
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bi * Fl, Fl, axis=0)
        positions_l, obs_l, use_l = sl(positions), sl(obs), sl(use_masks)
    else:
        positions_l, obs_l, use_l = positions, obs, use_masks

    def one(p_w, ob, um):
        H, Hp, r, rp, U = feature_system(p_w, ob, um, state, params)
        gamma = feature_gamma(H, rp, U, P, params.observation_noise)
        return Hp, rp, gamma

    Hps, rps, gammas_l = jax.vmap(one)(positions_l, obs_l, use_l)

    if axis_name is not None:
        gammas = jax.lax.all_gather(gammas_l, axis_name).reshape(F)
    else:
        gammas = gammas_l

    thresholds = params.chi2_table[jnp.clip(dofs, 1, 99)]
    gate = process_mask & (gammas < thresholds)

    n_used = jnp.sum(use_masks, axis=1)
    rows = (4 * n_used - 3) * gate
    cum_before = jnp.cumsum(rows) - rows
    include = gate & (cum_before <= params.config.filter.max_update_rows)

    if axis_name is not None:
        nb = jax.lax.axis_size(axis_name)
        bi = jax.lax.axis_index(axis_name)
        include_l = jax.lax.dynamic_slice_in_dim(
            include, bi * (F // nb), F // nb, axis=0
        )
    else:
        include_l = include

    # One big MXU contraction over all (feature, row) pairs; include-mask
    # weights are 0/1 so this is exactly sum_j H~_j^T H~_j over included j.
    w = include_l.astype(P.dtype)
    Hw = Hps * w[:, None, None]
    M = jnp.einsum("fri,frj->ij", Hw, Hps)
    m = jnp.einsum("fri,fr->i", Hw, rps)
    if axis_name is not None:
        M = jax.lax.psum(M, axis_name)
        m = jax.lax.psum(m, axis_name)
    return M, m, include
