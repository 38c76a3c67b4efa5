"""Filter-core tests: propagation/augmentation vs the f64 oracle, and the
equivalence of the fixed-shape QR-compressed update (stack_update +
qr_update) with the reference's SVD-nullspace + tall-QR path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.filter.state import (
    init_filter_state, init_feature_map, make_params,
)
from vio_msckf_tpu.filter.propagation import propagate
from vio_msckf_tpu.filter.augmentation import augment
from vio_msckf_tpu.filter.update import (
    stack_update,
    qr_update,
    feature_system,
    feature_gamma,
)

import oracle_msckf as oracle


@pytest.fixture(scope="module")
def cfg():
    return euroc_config()


@pytest.fixture(scope="module")
def params(cfg):
    return make_params(cfg)


def random_psd(rng, d, scale=1e-2):
    A = rng.normal(size=(d, d)) * scale
    return A @ A.T + scale * np.eye(d)


def make_state(cfg, params, rng, n_clones=0):
    """A filter state with randomized IMU pose and n active clones."""
    state = init_filter_state(cfg, params)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    state = state.replace(
        q=jnp.asarray(q, jnp.float32),
        p=jnp.asarray(rng.normal(size=3), jnp.float32),
        v=jnp.asarray(rng.normal(size=3), jnp.float32),
        bg=jnp.asarray(rng.normal(size=3) * 1e-3, jnp.float32),
        ba=jnp.asarray(rng.normal(size=3) * 1e-2, jnp.float32),
    )
    state = state.replace(q_null=state.q, p_null=state.p, v_null=state.v)
    D = cfg.state_dim
    d_active = 21 + 6 * n_clones
    P = np.zeros((D, D))
    P[:d_active, :d_active] = random_psd(np.random.default_rng(7), d_active)
    N = cfg.filter.max_cam_state_size
    cq = np.tile([0.0, 0, 0, 1], (N, 1))
    cp = np.zeros((N, 3))
    for i in range(n_clones):
        qi = rng.normal(size=4)
        cq[i] = qi / np.linalg.norm(qi)
        cp[i] = rng.normal(size=3)
    state = state.replace(
        P=jnp.asarray(P, jnp.float32),
        clone_q=jnp.asarray(cq, jnp.float32),
        clone_p=jnp.asarray(cp, jnp.float32),
        clone_q_null=jnp.asarray(cq, jnp.float32),
        clone_p_null=jnp.asarray(cp, jnp.float32),
        clone_valid=jnp.arange(N) < n_clones,
        n_clones=jnp.asarray(n_clones, jnp.int32),
    )
    return state


def test_propagation_matches_oracle(cfg, params, rng):
    state = make_state(cfg, params, rng, n_clones=3)
    M = 8
    gyro = rng.normal(size=(M, 3)) * 0.3
    acc = rng.normal(size=(M, 3)) * 0.5 + np.array([0, 0, 9.81])
    dts = np.full(M, 0.005)
    valid = np.ones(M, bool)
    valid[-2:] = False  # padding must be identity

    new = propagate(
        state, params,
        jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.asarray(valid),
    )

    q = np.asarray(state.q, float)
    p = np.asarray(state.p, float)
    v = np.asarray(state.v, float)
    qn, pn, vn = q.copy(), p.copy(), v.copy()
    P = np.asarray(state.P, float)
    Qc = np.asarray(params.continuous_noise, float)
    g = np.asarray(state.gravity, float)
    bg = np.asarray(state.bg, float)
    ba = np.asarray(state.ba, float)
    for i in range(M):
        if not valid[i]:
            continue
        q, p, v, P, qn, pn, vn = oracle.process_model_np(
            q, p, v, bg, ba, P, g, Qc, gyro[i], acc[i], dts[i], qn, pn, vn
        )

    np.testing.assert_allclose(np.asarray(new.q, float), q, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new.p, float), p, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new.v, float), v, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new.P, float), P, atol=5e-4)
    # Covariance stays symmetric PSD-ish.
    Pn = np.asarray(new.P, float)
    np.testing.assert_allclose(Pn, Pn.T, atol=1e-6)
    assert np.linalg.eigvalsh(Pn[: 21 + 18, : 21 + 18]).min() > -1e-6


def test_augmentation_matches_oracle(cfg, params, rng):
    n0 = 2
    state = make_state(cfg, params, rng, n_clones=n0)
    new = augment(state)

    d_active = 21 + 6 * n0
    P_act = np.asarray(state.P, float)[:d_active, :d_active]
    R_w_c, t_c_w, Pn = oracle.augment_np(
        np.asarray(state.q, float), np.asarray(state.p, float),
        np.asarray(state.R_imu_cam0, float),
        np.asarray(state.t_cam0_imu, float), P_act,
    )
    d_new = d_active + 6
    np.testing.assert_allclose(
        np.asarray(new.P, float)[:d_new, :d_new], Pn, atol=1e-4
    )
    # The rest of the padded covariance stays zero.
    assert np.all(np.asarray(new.P)[d_new:, :] == 0)
    np.testing.assert_allclose(
        np.asarray(jnp.asarray(new.clone_p[n0])), t_c_w, atol=1e-5
    )
    assert int(new.n_clones) == n0 + 1
    R_back = np.asarray(
        jax.vmap(lambda q: q)(new.clone_q)[n0]
    )
    from vio_msckf_tpu.math import quat_to_rot
    np.testing.assert_allclose(
        np.asarray(quat_to_rot(jnp.asarray(R_back))), R_w_c, atol=1e-5
    )


def test_qr_form_equals_reference_update(rng):
    """Pure-linear-algebra f64 proof: projected-row stacking + one tall QR
    + Joseph covariance == the reference's SVD nullspace + tall QR + solve
    + (I-KH)P path (msckf.py:500-604). The two covariance forms agree
    exactly because K is the optimal gain."""
    D = 33  # 21 + 2 clones
    P = random_psd(rng, D, scale=0.1)
    obs_noise = 0.035 ** 2
    chi2_table = {k: 1e12 for k in range(1, 100)}  # gates open

    H_list, Hf_list, r_list, dofs = [], [], [], []
    for _ in range(6):
        k = rng.integers(2, 4)  # observing clones
        m = 4 * k
        H = np.zeros((m, D))
        H[:, 21:] = rng.normal(size=(m, D - 21))
        Hf = rng.normal(size=(m, 3))
        r = rng.normal(size=m) * 0.01
        H_list.append(H)
        Hf_list.append(Hf)
        r_list.append(r)
        dofs.append(k - 1)

    dx_ref, P_ref, _ = oracle.reference_update(
        P, H_list, Hf_list, r_list, obs_noise, chi2_table, dofs
    )

    # Our path (numpy mirror of filter/update.py): project each feature's
    # rows with (I - U U^T), stack ALL rows (rank 4k-3 but 4k rows), one
    # tall QR, Joseph update.
    rows_H, rows_r = [], []
    for H, Hf, r in zip(H_list, Hf_list, r_list):
        U, _ = np.linalg.qr(Hf)
        rows_H.append(H - U @ (U.T @ H))
        rows_r.append(r - U @ (U.T @ r))
    Hs = np.vstack(rows_H)
    rs = np.concatenate(rows_r)
    Q, T = np.linalg.qr(Hs)
    z = Q.T @ rs
    S = T @ P @ T.T + obs_noise * np.eye(D)
    K = np.linalg.solve(S, T @ P).T
    dx = K @ z
    I_KH = np.eye(D) - K @ T
    P_new = I_KH @ P @ I_KH.T + obs_noise * (K @ K.T)
    P_new = (P_new + P_new.T) / 2.0

    np.testing.assert_allclose(dx, dx_ref, atol=1e-8)
    np.testing.assert_allclose(P_new, P_ref, atol=1e-8)


def test_gamma_matches_reference(rng):
    """feature_gamma (block-inverse, no complement basis) equals the
    reference's projected chi-square statistic, including padded rows."""
    m, D = 16, 33
    P_small = random_psd(rng, D, scale=0.1)
    obs_noise = 0.035 ** 2
    H = rng.normal(size=(m, D))
    Hf = rng.normal(size=(m, 3))
    r = rng.normal(size=m)
    # Mask the last 4 rows like an unobserved clone slot.
    H[-4:] = 0.0
    Hf[-4:] = 0.0
    r[-4:] = 0.0

    # Reference gamma on the dense sub-block.
    Hd, Hfd, rd = H[:-4], Hf[:-4], r[:-4]
    U_svd, _, _ = np.linalg.svd(Hfd)
    A = U_svd[:, 3:]
    Ht, rt = A.T @ Hd, A.T @ rd
    S = Ht @ P_small @ Ht.T + obs_noise * np.eye(len(Ht))
    gamma_ref = rt @ np.linalg.solve(S, rt)

    U, _ = np.linalg.qr(Hf)
    rp = r - U @ (U.T @ r)
    gamma = float(
        feature_gamma(
            jnp.asarray(H, jnp.float64) if jax.config.jax_enable_x64
            else jnp.asarray(H, jnp.float32),
            jnp.asarray(rp, jnp.float32),
            jnp.asarray(U, jnp.float32),
            jnp.asarray(P_small, jnp.float32),
            obs_noise,
        )
    )
    np.testing.assert_allclose(gamma, gamma_ref, rtol=2e-3)


def test_gamma_rank_deficient_hf(rng):
    """Degenerate feature geometry: H_f with column rank 2 (the monocular
    pure-rotation failure mode). feature_gamma's eigenbasis rank guard must
    (a) stay finite and nonnegative with a dead U column instead of leaning
    on a regularized inverse, and (b) match a pseudo-inverse f64 oracle:
    dropped modes contribute zero correction, so their residual energy
    stays in gamma and the feature is rejected unless genuinely small."""
    m, D = 16, 33
    P_small = random_psd(rng, D, scale=0.1)
    obs_noise = 0.035 ** 2
    H = rng.normal(size=(m, D))
    r = rng.normal(size=m)
    # Rank-2 H_f; QR of an exactly rank-deficient matrix leaves a dangling
    # basis column — emulate the degenerate-U case by zeroing it outright.
    Hf = rng.normal(size=(m, 2)) @ rng.normal(size=(2, 3))
    U, _ = np.linalg.qr(Hf)
    U[:, 2] = 0.0
    rp = r - U @ (U.T @ r)

    gamma = float(
        feature_gamma(
            jnp.asarray(H, jnp.float32), jnp.asarray(rp, jnp.float32),
            jnp.asarray(U, jnp.float32), jnp.asarray(P_small, jnp.float32),
            obs_noise,
        )
    )
    assert np.isfinite(gamma)
    assert gamma >= 0.0

    # f64 oracle: same statistic with an explicit pseudo-inverse of G.
    B = H @ P_small @ H.T + obs_noise * np.eye(m)
    Binv = np.linalg.inv(B)
    G = U.T @ Binv @ U
    gu = U.T @ Binv @ rp
    gamma_ref = rp @ Binv @ rp - gu @ np.linalg.pinv(G, rcond=1e-5) @ gu
    np.testing.assert_allclose(gamma, gamma_ref, rtol=5e-3)

    # A residual component pushed along the projected-out (dead) direction
    # is NOT credited back: gamma grows, i.e. the degenerate feature is
    # rejected rather than silently accepted.
    rp_big = rp + 10.0 * (np.eye(m) - U @ U.T) @ rng.normal(size=m)
    gamma_big = float(
        feature_gamma(
            jnp.asarray(H, jnp.float32), jnp.asarray(rp_big, jnp.float32),
            jnp.asarray(U, jnp.float32), jnp.asarray(P_small, jnp.float32),
            obs_noise,
        )
    )
    assert gamma_big > gamma


def test_full_update_matches_oracle_geometric(cfg, params, rng):
    """End-to-end: geometric measurement Jacobians + gating + update in the
    jitted path vs the oracle running the reference algorithm in f64."""
    n_clones = 6
    state = make_state(cfg, params, rng, n_clones=n_clones)
    N = cfg.filter.max_cam_state_size
    F = 8

    R_c0c1 = np.asarray(params.R_cam0_cam1, float)
    t_c0c1 = np.asarray(params.t_cam0_cam1, float)
    g = np.asarray(state.gravity, float)
    cq = np.asarray(state.clone_q, float)
    cp = np.asarray(state.clone_p, float)

    # Landmarks in front of clone 0's camera.
    from oracle_msckf import jpl_to_rot, clone_jacobian_np
    obs = np.zeros((F, N, 4))
    obs_valid = np.zeros((F, N), bool)
    positions = np.zeros((F, 3))
    for f in range(F):
        R0 = jpl_to_rot(cq[0])
        p_w = cp[0] + R0.T @ (rng.normal(size=3) * 0.5 + np.array([0, 0, 5.0]))
        positions[f] = p_w
        for i in range(n_clones):
            Rw0 = jpl_to_rot(cq[i])
            pc0 = Rw0 @ (p_w - cp[i])
            Rw1 = R_c0c1 @ Rw0
            tc1 = cp[i] - Rw1.T @ t_c0c1
            pc1 = Rw1 @ (p_w - tc1)
            if pc0[2] > 0.1 and pc1[2] > 0.1:
                z = np.array([
                    pc0[0] / pc0[2], pc0[1] / pc0[2],
                    pc1[0] / pc1[2], pc1[1] / pc1[2],
                ]) + rng.normal(size=4) * 1e-3
                obs[f, i] = z
                obs_valid[f, i] = True

    n_obs = obs_valid.sum(axis=1)
    process = n_obs >= 3
    dofs = np.maximum(n_obs - 1, 1)

    slots = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None, :], (F, 1))
    Hc, rc, include = stack_update(
        state, params,
        positions=jnp.asarray(positions, jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        use_masks=jnp.asarray(obs_valid),
        clone_slots=slots,
        process_mask=jnp.asarray(process),
        dofs=jnp.asarray(dofs, jnp.int32),
    )
    new_state = qr_update(state, Hc, rc, params)

    # Oracle on the active sub-problem.
    d_act = 21 + 6 * n_clones
    P_act = np.asarray(state.P, float)[:d_act, :d_act]
    chi2 = {k: float(params.chi2_table[k]) for k in range(1, 100)}
    H_list, Hf_list, r_list, dof_list = [], [], [], []
    for f in range(F):
        if not process[f]:
            continue
        rows_H, rows_Hf, rows_r = [], [], []
        for i in range(n_clones):
            if not obs_valid[f, i]:
                continue
            Hx, Hf_, r_ = clone_jacobian_np(
                positions[f], obs[f, i], cq[i], cp[i], cq[i], cp[i],
                g, R_c0c1, t_c0c1,
            )
            Hrow = np.zeros((4, d_act))
            Hrow[:, 21 + 6 * i: 27 + 6 * i] = Hx
            rows_H.append(Hrow)
            rows_Hf.append(Hf_)
            rows_r.append(r_)
        H_list.append(np.vstack(rows_H))
        Hf_list.append(np.vstack(rows_Hf))
        r_list.append(np.concatenate(rows_r))
        dof_list.append(int(dofs[f]))

    dx_ref, P_ref, gates = oracle.reference_update(
        P_act, H_list, Hf_list, r_list,
        params.observation_noise, chi2, dof_list,
    )

    # Gate decisions must agree.
    inc = np.asarray(include)[np.asarray(process)]
    np.testing.assert_array_equal(inc, np.asarray(gates))

    # Posterior must match to f32 tolerances. (The f64 algebraic identity
    # is proven exactly in test_qr_form_equals_reference_update; the
    # residual here is float32 rounding through the QR + Joseph products.)
    P_new = np.asarray(new_state.P, float)[:d_act, :d_act]
    np.testing.assert_allclose(P_new, P_ref, atol=2e-3)
    dp = np.asarray(new_state.p, float) - np.asarray(state.p, float)
    np.testing.assert_allclose(dp, dx_ref[12:15], atol=1e-4)
    dv = np.asarray(new_state.v, float) - np.asarray(state.v, float)
    np.testing.assert_allclose(dv, dx_ref[6:9], atol=1e-4)

def test_stack_buffer_holds_worst_case_blocks(cfg, params, rng):
    """Regression (r5): the include rule budgets PROJECTED rows (4n-3) but
    the buffer stores RAW 4-row blocks (n per feature), so at the exact
    worst case (full candidate buffer x full clone windows) the admitted
    blocks exceed max_update_rows/4 by 3/4 per feature. With the old
    budget (rows//4 + N = 395 blocks) 5 of the 400 admitted blocks were
    silently scatter-dropped; the corrected budget must hold them all."""
    n_clones = cfg.filter.max_cam_state_size        # 20: full window
    state = make_state(cfg, params, rng, n_clones=n_clones)
    N = n_clones
    F = cfg.filter.max_lost_candidates              # 64: full buffer

    # All clones near-identity so every clone sees every landmark (the
    # worst case needs every observation to survive the chi-square gate).
    cq = np.tile([0.0, 0.0, 0.0, 1.0], (N, 1))
    cq[:, :3] += rng.normal(size=(N, 3)) * 0.01
    cq /= np.linalg.norm(cq, axis=1, keepdims=True)
    cp = rng.normal(size=(N, 3)) * 0.2
    state = state.replace(
        clone_q=jnp.asarray(cq, jnp.float32),
        clone_p=jnp.asarray(cp, jnp.float32),
        clone_q_null=jnp.asarray(cq, jnp.float32),
        clone_p_null=jnp.asarray(cp, jnp.float32),
    )

    R_c0c1 = np.asarray(params.R_cam0_cam1, float)
    t_c0c1 = np.asarray(params.t_cam0_cam1, float)

    from oracle_msckf import jpl_to_rot
    obs = np.zeros((F, N, 4))
    obs_valid = np.zeros((F, N), bool)
    positions = np.zeros((F, 3))
    for f in range(F):
        R0 = jpl_to_rot(cq[0])
        p_w = cp[0] + R0.T @ (
            rng.normal(size=3) * 0.3 + np.array([0, 0, 6.0]))
        positions[f] = p_w
        for i in range(n_clones):
            Rw0 = jpl_to_rot(cq[i])
            pc0 = Rw0 @ (p_w - cp[i])
            Rw1 = R_c0c1 @ Rw0
            tc1 = cp[i] - Rw1.T @ t_c0c1
            pc1 = Rw1 @ (p_w - tc1)
            z = np.array([
                pc0[0] / max(pc0[2], 0.1), pc0[1] / max(pc0[2], 0.1),
                pc1[0] / max(pc1[2], 0.1), pc1[1] / max(pc1[2], 0.1),
            ]) + rng.normal(size=4) * 1e-4
            obs[f, i] = z
            obs_valid[f, i] = True

    n_obs = obs_valid.sum(axis=1)
    slots = jnp.tile(jnp.arange(
        cfg.filter.max_cam_state_size, dtype=jnp.int32)[None, :], (F, 1))
    Hc, rc, include = stack_update(
        state, params,
        positions=jnp.asarray(positions, jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        use_masks=jnp.asarray(obs_valid),
        clone_slots=slots,
        process_mask=jnp.ones(F, bool),
        dofs=jnp.asarray(np.maximum(n_obs - 1, 1), jnp.int32),
    )
    include = np.asarray(include)
    expected_blocks = int((obs_valid.sum(axis=1) * include).sum())
    # We must actually be in the >395-block regime for this to regress.
    assert expected_blocks > cfg.filter.max_update_rows // 4 + n_clones, \
        f"worst case not reached: {expected_blocks} blocks, " \
        f"{int(include.sum())} features included"
    Hc_np = np.asarray(Hc).reshape(-1, 4, Hc.shape[1])
    nonzero_blocks = int((np.abs(Hc_np) > 0).any(axis=(1, 2)).sum())
    assert nonzero_blocks == expected_blocks, (
        f"{expected_blocks - nonzero_blocks} admitted blocks dropped "
        f"({nonzero_blocks}/{expected_blocks})")

def test_solve3_sym_matches_lapack(rng):
    """The closed-form adjugate 3x3 solve that replaced the batched LU
    custom call (r5 profile: 280 ms/run) must match LAPACK to f32 noise
    on LM-shaped (PSD + damping) systems across conditioning scales."""
    from vio_msckf_tpu.filter.triangulation import _solve3_sym

    for lam in (1e-10, 1e-3, 1.0, 1e6):
        for _ in range(20):
            J = rng.normal(size=(6, 3))
            A = J.T @ J + lam * np.eye(3)
            b = rng.normal(size=3)
            want = np.linalg.solve(A, b)
            got = np.asarray(_solve3_sym(
                jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
            np.testing.assert_allclose(
                got, want, rtol=2e-3,
                atol=2e-3 * max(1.0, np.abs(want).max()))

def test_eigh3_jacobi_matches_lapack(rng):
    """The cyclic-Jacobi 3x3 eigensolve (gating rank guard) must agree
    with LAPACK on PSD matrices, including rank-deficient ones."""
    from vio_msckf_tpu.filter.update import _eigh3_jacobi

    cases = []
    for r in (3, 2, 1):
        for _ in range(10):
            J = rng.normal(size=(6, r))
            B = np.zeros((6, 3))
            B[:, :r] = J
            cases.append(B.T @ B)
    cases.append(np.zeros((3, 3)))
    for G in cases:
        w, V = jax.jit(_eigh3_jacobi)(jnp.asarray(G, jnp.float32))
        w, V = np.asarray(w, float), np.asarray(V, float)
        # Reconstruction + orthogonality, scale-relative.
        scale = max(np.abs(G).max(), 1e-6)
        np.testing.assert_allclose(V @ np.diag(w) @ V.T, G,
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)
        w_ref = np.linalg.eigvalsh(G)
        np.testing.assert_allclose(np.sort(w), w_ref,
                                   atol=1e-5 * scale + 1e-7)
