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

TPU-native redesign (SURVEY.md section 7): the gated per-feature systems
are scatter-compacted into ONE fixed-size row buffer (the fixed-shape
analog of the reference's 1500-row stack, msckf.py:676-679) and compressed
with a single tall-skinny QR, exactly like the reference (msckf.py:549-553)
— backward-stable in float32. Round 2 used an information form
``M = sum H~^T H~`` instead; that squares the condition number, and the
float32 filter diverged at the first clone prune (its largest stacked
system) while the identical pipeline in float64 stayed at centimeter error
— measured in scripts/diag_divergence.py. QR it is.
The nullspace projection never builds the complement basis: with U an
orthonormal basis of col(H_f) (one small QR per feature),
``H~ = (I - U U^T) H`` spans the same row space as the reference's
A^T H (msckf.py:533-539).

Gating is computed exactly (same gamma as the reference's projected
system) via the block-inverse identity
``gamma = rp^T B^{-1} rp - (rp^T B^{-1} U)(U^T B^{-1} U)^{-1}(U^T B^{-1} rp)``
with ``B = H P H^T + s I`` and ``rp = (I - U U^T) r`` — masked padding rows
contribute exactly zero.
"""

import numpy as np
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


def feature_system(p_w, obs_k, use_k, slots_k, state: FilterState,
                   params: MsckfParams):
    """Build one feature's stacked, nullspace-projected system over a
    SUBSET of clone slots.

    obs_k (K, 4) / use_k (K,) / slots_k (K,) int32 name which clone slots
    this feature's rows come from; K is a compile-time row budget. The lost
    -feature path passes the full window (K = N, slots = arange); the prune
    path passes only the <= 2 involved clones (K = 2), shrinking its
    per-feature system from 80 rows to 8 — the gating solve goes from an
    (80, 80) to an (8, 8) factorization.

    Returns (H (4K, D), Hp, r (4K,), rp, U) where Hp / rp are already
    projected by (I - U U^T); rows for unused slots are exactly zero. The
    H_f used for the projection is the post-OC-correction
    ``H_f = -H_x[:, 3:6]`` (msckf.py:490).
    """
    N = state.clone_q.shape[0]
    D = state.P.shape[0]
    K = slots_k.shape[0]
    dtype = state.P.dtype

    Hx, r = jax.vmap(
        lambda cq, cp, cqn, cpn, z: _clone_jacobian(
            p_w, z, cq, cp, cqn, cpn, state.gravity,
            params.R_cam0_cam1, params.t_cam0_cam1,
        )
    )(state.clone_q[slots_k], state.clone_p[slots_k],
      state.clone_q_null[slots_k], state.clone_p_null[slots_k],
      obs_k)                                         # (K,4,6), (K,4)

    mask = use_k[:, None]
    Hx = jnp.where(mask[:, :, None], Hx, 0.0)
    r = jnp.where(mask, r, 0.0)
    Hf = -Hx[:, :, 3:6]                              # (K,4,3), msckf.py:490

    # Scatter the (4,6) blocks into their clone columns (21 + 6*slot):
    # one-hot contraction keeps it a single fused MXU op
    # (feature_jacobian, msckf.py:526-531).
    onehot = jax.nn.one_hot(slots_k, N, dtype=dtype) * mask  # (K, N)
    H6 = jnp.einsum("kn,kab->kanb", onehot, Hx).reshape(4 * K, 6 * N)
    H = jnp.concatenate(
        [jnp.zeros((4 * K, 21), dtype), H6], axis=1
    )
    Hf_full = Hf.reshape(4 * K, 3)
    r_full = r.reshape(4 * K)

    # Orthonormal basis of col(H_f): one small reduced QR per feature,
    # replacing the reference's SVD nullspace (msckf.py:533-539).
    U, _ = jnp.linalg.qr(Hf_full)                    # (4K, 3)
    # Unused-slot rows of H_f are exactly zero, so U's rows there are zero
    # too whenever H_f has full column rank; enforce it outright so the
    # projected rows of unused slots stay EXACTLY zero even for degenerate
    # geometry — the row compaction in stack_update relies on it.
    row_mask = jnp.repeat(use_k, 4)[:, None]
    U = jnp.where(row_mask, U, 0.0)
    Hp = H - U @ (U.T @ H)
    rp = r_full - U @ (U.T @ r_full)
    return H, Hp, r_full, rp, U


def _eigh3_jacobi(G, sweeps=4):
    """Eigendecomposition of a symmetric 3x3 via cyclic Jacobi rotations.

    Replaces `jnp.linalg.eigh` in the gating rank guard: under the
    feature vmap eigh lowers to a batched TPU "Eigh" custom call that the
    r5 profile measured at ~0.25 ms/frame for ~50 lines of arithmetic.
    Four cyclic sweeps (12 rotations) of closed-form 2x2 rotations are
    pure fused elementwise ops, converge quadratically, and vmap to
    nothing special. Returns (w (3,), V (3,3)) with G = V diag(w) V^T;
    eigenvalues are NOT sorted (callers use max(w), not w[-1]).
    """
    dtype = G.dtype
    A = (G + G.T) / 2.0
    V = jnp.eye(3, dtype=dtype)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            apq = A[p, q]
            tau = (A[q, q] - A[p, p]) / (2.0 * jnp.where(
                jnp.abs(apq) > _SAFE, apq, 1.0))
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(jnp.abs(apq) > _SAFE, t, 0.0)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            # Build the rotation from CONSTANT masks: J = (I - D) + c D
            # + s S with D = e_p e_p^T + e_q e_q^T, S = e_p e_q^T -
            # e_q e_p^T. The .at[].set() form this replaces lowered to 4
            # dynamic-update-slices per rotation under the feature vmap
            # — ~200 ms/run of tiny DUS ops, 5x the eigh custom call the
            # Jacobi path was supposed to beat (r5 final profile).
            D = np.zeros((3, 3), np.float32)
            D[p, p] = D[q, q] = 1.0
            S = np.zeros((3, 3), np.float32)
            S[p, q] = 1.0
            S[q, p] = -1.0
            J = (jnp.asarray(np.eye(3, dtype=np.float32) - D, dtype)
                 + c * jnp.asarray(D, dtype) + s * jnp.asarray(S, dtype))
            A = J.T @ A @ J
            V = V @ J
    return jnp.diagonal(A), V


def feature_gamma(H, rp, U, P, obs_noise, solver="cholesky"):
    """Exact chi-square statistic of the projected system (msckf.py:606-609)
    without forming the nullspace complement.

    B is symmetric positive definite (H P H^T + s I, s > 0). Solver
    "cholesky": one cho_solve serves every RHS — measured ~3x faster than
    the batched pivoted LU this replaced in round 3. Solver "pallas":
    the batched Gauss-Jordan VMEM kernel (ops/spd_pallas.py) — the r5
    on-chip profile measured the vmapped Cholesky+triangular-solve custom
    calls at ~0.85 ms/frame running ~20 GFLOP/s, the largest custom-call
    cluster left in the step. Same X up to f32 roundoff (GE without
    pivoting is backward stable on SPD systems). A non-finite gamma
    (pathological P) fails every `gamma < threshold` comparison, i.e. the
    feature is rejected — fail-safe.
    """
    m = H.shape[0]
    B = H @ P @ H.T + obs_noise * jnp.eye(m, dtype=H.dtype)
    rhs = jnp.concatenate([rp[:, None], U], axis=1)
    if solver == "pallas":
        from vio_msckf_tpu.ops.spd_pallas import spd_solve
        X = spd_solve((B + B.T) / 2.0, rhs)
    else:
        L = jnp.linalg.cholesky((B + B.T) / 2.0)
        X = jax.scipy.linalg.cho_solve((L, True), rhs)
    Binv_rp = X[:, 0]
    Binv_U = X[:, 1:]
    G = U.T @ Binv_U                                  # (3,3)
    gu = U.T @ Binv_rp                                # (3,)
    # Explicit rank guard (replacing an ad-hoc +1e-12 I regularizer): for
    # degenerate feature geometry (e.g. pure-rotation view sets) H_f loses
    # column rank, U picks up zero columns (feature_system masks them), and
    # G is singular along those directions. Solve in G's eigenbasis and
    # keep only well-conditioned modes; dropped modes contribute ZERO
    # correction, so their residual energy stays in gamma — the statistic
    # is conservatively too large and the feature is rejected rather than
    # silently leaning on a regularizer. G is PSD, so gamma >= 0 holds
    # mode-by-mode; clamp for f32 roundoff.
    w, V = _eigh3_jacobi(G)
    keep = w > 1e-6 * jnp.maximum(jnp.max(w), _SAFE)
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    c = V.T @ gu
    correction = c @ (winv * c)
    return jnp.maximum(rp @ Binv_rp - correction, 0.0)


# ---------------------------------------------------------------------------
# QR-compressed batched update (measurement_update, msckf.py:543-604)
# ---------------------------------------------------------------------------

def qr_update(state: FilterState, Hc, rc, params: MsckfParams):
    """Apply the EKF update from the compacted stacked system (Hc, rc).

    Mirrors the reference's measurement_update (msckf.py:543-604): QR-
    compress the tall stack to a (D, D) triangle Th with z = Q^T r — an
    EXACT reduction for any rank, since for H = Q Th (Q orthonormal
    columns)::

        K = P H^T (H P H^T + s I_m)^{-1} = P Th^T (Th P Th^T + s I_D)^{-1} Q^T

    — so the compressed update reproduces dx and (I - K H) verbatim. Unlike
    round 2's information form (M = H^T H, which squares the condition
    number and made the float32 filter diverge at the first clone prune),
    Householder QR is backward-stable: this path is f32-safe.

    Departure from the reference kept from round 2: Joseph-form covariance.
    The reference's (I - K H) P in float64 (msckf.py:598-601) loses
    positive-definiteness in float32 once updates get strong; the Joseph
    form is PSD by construction.
    """
    D = state.P.shape[0]
    dtype = state.P.dtype
    s = params.observation_noise
    P = state.P

    Q, Th = jnp.linalg.qr(Hc)            # reduced: Q (rows, D), Th (D, D)
    z = Q.T @ rc                         # (D,)

    S = Th @ P @ Th.T + s * jnp.eye(D, dtype=dtype)
    S = (S + S.T) / 2.0
    K = jnp.linalg.solve(S, Th @ P).T    # (D, D); S symmetric PD
    dx = K @ z
    I_KH = jnp.eye(D, dtype=dtype) - K @ Th
    P_new = I_KH @ P @ I_KH.T + s * (K @ K.T)
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


def budget_blocks(params: MsckfParams) -> int:
    """4-row blocks in the fixed stacking buffer.

    The include rule budgets PROJECTED rows (4n-3 per n-observation
    feature, mirroring the reference's 1500-row cap, msckf.py:676-679),
    but the buffer stores RAW 4-row blocks (n per feature), so blocks can
    exceed rows/4 by 3/4 per included feature. Bound: features admitted
    strictly under the cap satisfy sum(4n_i - 3) <= max_rows, hence
    sum(n_i) <= (max_rows + 3*n_feats)/4 with n_feats <= the candidate
    buffer size; the one feature that crosses the line adds up to N more
    blocks. Previous rounds omitted the 3*n_feats/4 term — at the exact
    worst case (64 candidates x full 20-clone windows) 5 gated blocks
    were silently dropped."""
    fc = params.config.filter
    return (
        (fc.max_update_rows + 3 * fc.max_lost_candidates + 3) // 4
        + fc.max_cam_state_size
    )


def stack_update(
    state: FilterState,
    params: MsckfParams,
    positions,       # (F, 3) triangulated world positions
    obs,             # (F, K, 4) observations at the selected clone slots
    use_masks,       # (F, K) which selected slots actually contribute
    clone_slots,     # (F, K) int32 clone-slot index per selected slot
    process_mask,    # (F,) features eligible for the update
    dofs,            # (F,) chi-square dof per feature
    axis_name=None,  # optional mesh axis to shard the feature dim over
    max_blocks=None,  # optional cap on the stacking buffer's 4-row blocks
):
    """Shared fan-in for remove_lost_features / prune_cam_state_buffer:
    per-feature systems -> gating -> row budget -> compacted (Hc, rc).

    K is the per-feature clone budget: N for the lost path (full window),
    2 for the prune path (only the removed clones contribute,
    msckf.py:778-795) — the prune systems are 8 rows, not 80.

    Budget rule mirrors msckf.py:676-679: feature j contributes iff the
    gated rows stacked before it total <= max_update_rows. The gated
    blocks (4 rows per used slot, feature-major order like the
    reference's stack) are scatter-compacted into a fixed
    (4 * budget_blocks, D) buffer — the fixed-shape analog of the
    reference's dynamically sized H_x stack. Projected rows of unused
    slots are exactly zero (feature_system masks U), so the compaction
    loses nothing.

    With `axis_name` set (under shard_map over a device mesh), each shard
    builds the systems for its F/n_block slice of the feature table and
    compacts its own buffer; `tsqr_reduce_update` then reduces the shard
    triangles over ICI. The row-budget prefix sum needs the *global*
    feature order, so the tiny per-feature gamma vector is all-gathered
    first.
    """
    P = state.P
    F = positions.shape[0]
    K = use_masks.shape[1]
    D = P.shape[0]
    dtype = P.dtype

    if axis_name is not None:
        nb = jax.lax.axis_size(axis_name)
        bi = jax.lax.axis_index(axis_name)
        Fl = F // nb
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bi * Fl, Fl, axis=0)
        positions_l, obs_l, use_l, slots_l = (
            sl(positions), sl(obs), sl(use_masks), sl(clone_slots))
    else:
        Fl = F
        positions_l, obs_l, use_l, slots_l = (
            positions, obs, use_masks, clone_slots)

    fc = params.config.filter
    solver = fc.gamma_solver
    if solver == "auto":
        solver = "pallas" if jax.default_backend() == "tpu" else "cholesky"

    def one(p_w, ob, um, sk):
        H, Hp, r, rp, U = feature_system(p_w, ob, um, sk, state, params)
        gamma = feature_gamma(H, rp, U, P, params.observation_noise,
                              solver=solver)
        return Hp, rp, gamma

    Hps, rps, gammas_l = jax.vmap(one)(positions_l, obs_l, use_l, slots_l)

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
            include, bi * Fl, Fl, axis=0
        )
    else:
        include_l = include

    # Scatter-compact the contributing (feature, slot) 4-row blocks into
    # the fixed buffer; excluded blocks get an out-of-range destination,
    # which XLA scatter drops. `max_blocks` lets callers whose stack is
    # structurally smaller than the reference's 1500-row cap shrink the
    # buffer: the prune path contributes at most K=2 blocks per feature,
    # so its stack is (8*F, D), not (1580, D) (VERDICT r4 item 4; the
    # reference prune likewise builds its own smaller stack,
    # msckf.py:778-795). The downstream QR cost scales with the row count.
    NB = budget_blocks(params)
    if max_blocks is not None:
        NB = min(NB, max_blocks)
    block_used = use_l & include_l[:, None]                  # (Fl, K)
    flat_used = block_used.reshape(Fl * K)
    dest = jnp.cumsum(flat_used) - 1                         # prefix index
    dest = jnp.where(flat_used, dest, NB)                    # drop excluded

    H_blocks = Hps.reshape(Fl, K, 4, D).reshape(Fl * K, 4, D)
    r_blocks = rps.reshape(Fl, K, 4).reshape(Fl * K, 4)
    Hc = jnp.zeros((NB, 4, D), dtype).at[dest].set(
        H_blocks, mode="drop"
    ).reshape(NB * 4, D)
    rc = jnp.zeros((NB, 4), dtype).at[dest].set(
        r_blocks, mode="drop"
    ).reshape(NB * 4)
    return Hc, rc, include


def tsqr_reduce_update(state: FilterState, Hc, rc, params: MsckfParams,
                       axis_name=None):
    """Apply the update, reducing shard-local stacks with a TSQR tree when
    `axis_name` is set (the distributed analog of the reference's single
    tall QR, msckf.py:549-553, over the ICI mesh; SURVEY.md section 2.4).

    Each shard QR-compresses its local (rows, D) buffer to a (D, D)
    triangle + rotated residual. For power-of-two shard counts the
    triangles reduce with a BUTTERFLY (recursive-doubling) TSQR: log2(nb)
    rounds of exchange-with-XOR-partner + (2D, D) re-QR, so per-shard
    work is O(D^3 log nb) and per-round traffic one triangle — instead of
    all-gathering nb triangles to every shard and re-QRing the (nb*D, D)
    stack everywhere (O(nb D^3), r4 behavior; VERDICT r4 item 9). The
    pairwise stack is ordered (lower shard index first) so every shard
    executes the identical Householder sequence and replicas stay
    bit-identical. Sign conventions cancel in the update: for any row
    resigning R -> S R, z -> S z, the gain path P R^T (R P R^T + sI)^{-1}
    is invariant, so the tree and the flat gather produce the same state
    up to f32 roundoff (tested in test_parallel.py).
    """
    if axis_name is None:
        return qr_update(state, Hc, rc, params)
    D = state.P.shape[0]
    Q1, R1 = jnp.linalg.qr(Hc)               # local compress
    z1 = Q1.T @ rc
    nb = jax.lax.axis_size(axis_name)
    if nb > 1 and (nb & (nb - 1)) == 0:
        idx = jax.lax.axis_index(axis_name)
        R, z = R1, z1
        for k in range(nb.bit_length() - 1):
            bit = 1 << k
            perm = [(i, i ^ bit) for i in range(nb)]
            Rp = jax.lax.ppermute(R, axis_name, perm)
            zp = jax.lax.ppermute(z, axis_name, perm)
            am_lo = (idx & bit) == 0
            stack_R = jnp.where(
                am_lo,
                jnp.concatenate([R, Rp], axis=0),
                jnp.concatenate([Rp, R], axis=0),
            )
            stack_z = jnp.where(
                am_lo,
                jnp.concatenate([z, zp], axis=0),
                jnp.concatenate([zp, z], axis=0),
            )
            Q2, R = jnp.linalg.qr(stack_R)
            z = Q2.T @ stack_z
        return qr_update(state, R, z, params)
    Rs = jax.lax.all_gather(R1, axis_name)   # (nb, D, D)
    zs = jax.lax.all_gather(z1, axis_name)   # (nb, D)
    return qr_update(
        state, Rs.reshape(-1, D), zs.reshape(-1), params
    )
