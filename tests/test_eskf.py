"""ESKF filter core vs an independent numpy/scipy oracle, plus an
end-to-end synthetic run of the full secondary pipeline."""

import numpy as np
from scipy.spatial.transform import Rotation
import jax
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.eskf.filter import (
    EskfParams,
    EskfState,
    init_covariance,
    propagate,
    update_features,
)
from vio_msckf_tpu.eskf.pipeline import EskfVio, EskfConfig


# ------------------------------------------------------------------ #
# numpy oracle (independent re-derivation of the Sola ESKF equations,
# matching the reference semantics at ESKF/vio.py:11-162)
# ------------------------------------------------------------------ #

def oracle_nominal(p, v, R, ab, wb, g, w_m, a_m, dt):
    acc = R @ (a_m - ab) + g
    p2 = p + v * dt + 0.5 * dt * dt * acc
    v2 = v + acc * dt
    R2 = R @ Rotation.from_rotvec((w_m - wb) * dt).as_matrix()
    return p2, v2, R2


def oracle_cov(P, R, ab, wb, w_m, a_m, dt, an, gn, aw, gw):
    def hat(x):
        return np.array([
            [0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]
        ])
    F = np.eye(18)
    F[0:3, 3:6] = dt * np.eye(3)
    F[3:6, 6:9] = -(R @ hat(a_m - ab)) * dt
    F[3:6, 9:12] = -R * dt
    F[3:6, 15:18] = dt * np.eye(3)
    F[6:9, 6:9] = Rotation.from_rotvec((w_m - wb) * dt).as_matrix().T
    F[6:9, 12:15] = -dt * np.eye(3)
    P2 = F @ P @ F.T
    P2[3:6, 3:6] += an ** 2 * dt ** 2 * np.eye(3)
    P2[6:9, 6:9] += gn ** 2 * dt ** 2 * np.eye(3)
    P2[9:12, 9:12] += aw ** 2 * dt * np.eye(3)
    P2[12:15, 12:15] += gw ** 2 * dt * np.eye(3)
    return P2


def oracle_update(p, v, R, ab, wb, g, P, uv, Pw, thresh, Q):
    def hat(x):
        return np.array([
            [0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]
        ])
    Pc = R.T @ (Pw - p)
    pred = Pc[:2] / Pc[2]
    inno = uv - pred
    if np.linalg.norm(inno) >= thresh or Pc[2] <= 1e-6:
        return p, v, R, ab, wb, g, P, inno
    J = np.array([[1, 0, -pred[0]], [0, 1, -pred[1]]]) / Pc[2]
    H = np.zeros((2, 18))
    H[:, 0:3] = J @ (-R.T)
    H[:, 6:9] = J @ hat(Pc)
    K = P @ H.T @ np.linalg.inv(H @ P @ H.T + Q)
    dx = K @ inno
    IKH = np.eye(18) - K @ H
    P2 = IKH @ P @ IKH.T + K @ Q @ K.T
    p2 = p + dx[0:3]
    v2 = v + dx[3:6]
    R2 = R @ Rotation.from_rotvec(dx[6:9]).as_matrix()
    return p2, v2, R2, ab + dx[9:12], wb + dx[12:15], g + dx[15:18], P2, inno


def _params(dtype=jnp.float32):
    return EskfParams(
        gyro_noise=0.005, acc_noise=0.05, gyro_walk=0.001, acc_walk=0.01,
        meas_cov=jnp.eye(2, dtype=dtype) * (0.5 / 450.0) ** 2,
        error_threshold=10.0 / 450.0,
    )


def _random_state(rng):
    p = rng.normal(0, 1, 3)
    v = rng.normal(0, 0.5, 3)
    R = Rotation.from_rotvec(rng.normal(0, 0.3, 3)).as_matrix()
    ab = rng.normal(0, 0.05, 3)
    wb = rng.normal(0, 0.01, 3)
    g = np.array([0, 0, -9.8])
    return p, v, R, ab, wb, g


def test_propagation_matches_oracle(rng):
    params = _params()
    p, v, R, ab, wb, g = _random_state(rng)
    M = 7
    gyro = rng.normal(0, 0.3, (M, 3))
    acc = rng.normal(0, 1, (M, 3)) + np.array([0, 0, 9.8])
    dts = rng.uniform(0.004, 0.006, M)
    P = np.asarray(init_covariance(jnp.float64)) + np.eye(18) * 1e-4

    state = EskfState(
        p=jnp.asarray(p), v=jnp.asarray(v), R=jnp.asarray(R),
        a_b=jnp.asarray(ab), w_b=jnp.asarray(wb), g=jnp.asarray(g),
    )
    s2, P2 = jax.jit(propagate)(
        state, jnp.asarray(P),
        jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts),
        jnp.ones(M, bool), params,
    )

    Pn = P.copy()
    for i in range(M):
        Pn = oracle_cov(Pn, R, ab, wb, gyro[i], acc[i], dts[i],
                        0.05, 0.005, 0.01, 0.001)
        p, v, R = oracle_nominal(p, v, R, ab, wb, g, gyro[i], acc[i],
                                 dts[i])

    assert np.allclose(np.asarray(s2.p), p, atol=1e-5)
    assert np.allclose(np.asarray(s2.v), v, atol=1e-5)
    assert np.allclose(np.asarray(s2.R), R, atol=1e-5)
    assert np.allclose(np.asarray(P2), Pn, atol=1e-5)


def test_propagation_masks_padding(rng):
    params = _params()
    p, v, R, ab, wb, g = _random_state(rng)
    state = EskfState(
        p=jnp.asarray(p), v=jnp.asarray(v), R=jnp.asarray(R),
        a_b=jnp.asarray(ab), w_b=jnp.asarray(wb), g=jnp.asarray(g),
    )
    P = init_covariance() + jnp.eye(18) * 1e-4
    gyro = jnp.asarray(rng.normal(0, 1, (4, 3)), jnp.float32)
    acc = jnp.asarray(rng.normal(0, 1, (4, 3)), jnp.float32)
    dt = jnp.full((4,), 0.005)
    valid = jnp.asarray([True, True, False, False])
    s_a, P_a = propagate(state, P, gyro, acc, dt, valid, params)
    s_b, P_b = propagate(state, P, gyro[:2], acc[:2], dt[:2],
                         jnp.ones(2, bool), params)
    assert np.allclose(np.asarray(s_a.p), np.asarray(s_b.p), atol=1e-6)
    assert np.allclose(np.asarray(P_a), np.asarray(P_b), atol=1e-6)


def test_update_matches_oracle_sequential(rng):
    """Padded masked lax.scan == reference's sequential per-feature loop,
    including gate-rejected and invalid rows interleaved."""
    params = _params()
    p, v, R, ab, wb, g = _random_state(rng)
    P = np.asarray(init_covariance(jnp.float64)) + np.eye(18) * 1e-3

    last_R = Rotation.from_rotvec(rng.normal(0, 0.1, 3)).as_matrix()
    last_t = rng.normal(0, 0.5, 3)

    K = 12
    # world points in front of the last pose
    Pc1 = np.stack([
        rng.uniform(-1, 1, K), rng.uniform(-0.7, 0.7, K),
        rng.uniform(3, 8, K),
    ], -1)
    uvd1 = np.stack([
        Pc1[:, 0] / Pc1[:, 2], Pc1[:, 1] / Pc1[:, 2], 1.0 / Pc1[:, 2]
    ], -1)
    # current observations: true projection + noise; a few big outliers
    uv2 = np.zeros((K, 2))
    for i in range(K):
        P1 = np.array([uvd1[i, 0], uvd1[i, 1], 1.0]) / uvd1[i, 2]
        Pw = last_R @ P1 + last_t
        Pc = R.T @ (Pw - p)
        uv2[i] = Pc[:2] / Pc[2] + rng.normal(0, 0.002, 2)
    uv2[3] += 0.5   # gate-rejected outlier
    uvd2 = np.concatenate([uv2, np.ones((K, 1))], -1)
    valid = np.ones(K, bool)
    valid[[5, 9]] = False
    uvd1[7, 2] = -0.1  # d1 <= 0 row (skipped, eskf_vio.py:140)

    s = EskfState(
        p=jnp.asarray(p), v=jnp.asarray(v), R=jnp.asarray(R),
        a_b=jnp.asarray(ab), w_b=jnp.asarray(wb), g=jnp.asarray(g),
    )
    s2, P2, innos = jax.jit(update_features)(
        s, jnp.asarray(P), jnp.asarray(uvd1), jnp.asarray(uvd2),
        jnp.asarray(valid), jnp.asarray(last_R), jnp.asarray(last_t),
        params,
    )

    # oracle: sequential loop
    Q = np.asarray(params.meas_cov, np.float64)
    po, vo, Ro, abo, wbo, go, Po = p, v, R, ab, wb, g, P
    for i in range(K):
        if not valid[i] or uvd1[i, 2] <= 0:
            continue
        P1 = np.array([uvd1[i, 0] / uvd1[i, 2], uvd1[i, 1] / uvd1[i, 2],
                       1.0 / uvd1[i, 2]])
        Pw = last_R @ P1 + last_t
        po, vo, Ro, abo, wbo, go, Po, _ = oracle_update(
            po, vo, Ro, abo, wbo, go, Po, uv2[i], Pw,
            params.error_threshold, Q,
        )

    assert np.allclose(np.asarray(s2.p), po, atol=1e-4)
    assert np.allclose(np.asarray(s2.v), vo, atol=1e-4)
    assert np.allclose(np.asarray(s2.R), Ro, atol=1e-4)
    assert np.allclose(np.asarray(P2), Po, atol=1e-4)


def test_pipeline_end_to_end_synthetic():
    """Full ESKF pipeline (rectify + ORB + filter) on rendered frames:
    stereo matches are found, temporal inliers exist, state stays finite
    and near the (slow) ground-truth trajectory."""
    from vio_msckf_tpu.data.simulator import SimConfig, simulate_sequence, \
        bundle_frames
    from vio_msckf_tpu.data.render import render_sequence

    cfg = euroc_config()
    sim = SimConfig(duration=3.0, seed=11, amp=(0.4, 0.3, 0.15),
                    yaw_rate=0.05, wobble_amp=0.02)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = min(14, len(frames["timestamp"]))

    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=3)

    eskf_cfg = EskfConfig(grid_row=6, grid_col=6, per_cell=6,
                          fast_threshold=12.0)
    vio = EskfVio(cfg, eskf_cfg)
    # first frame carries no IMU slice (bundle semantics); seed gravity
    # from the first real sample like the reference (eskf_vio.py:77)
    acc0 = frames["imu_acc"][1][frames["imu_valid"][1]][0]
    carry = vio.init(acc0)
    step = jax.jit(vio.step)

    outs = []
    for i in range(n):
        frame = dict(
            cam0_img=cam0[i], cam1_img=cam1[i],
            imu_gyro=jnp.asarray(frames["imu_gyro"][i]),
            imu_acc=jnp.asarray(frames["imu_acc"][i]),
            imu_dt=jnp.asarray(frames["imu_dt"][i]),
            imu_valid=jnp.asarray(frames["imu_valid"][i]),
        )
        carry, out = step(carry, frame)
        outs.append(jax.tree_util.tree_map(np.asarray, out))

    n_matches = np.array([o["n_matches"] for o in outs[1:]])
    n_inliers = np.array([o["n_inliers"] for o in outs[1:]])
    assert (n_matches > 10).all(), n_matches
    assert n_inliers.sum() > 0.5 * n_matches.sum()

    p_est = np.stack([o["p"] for o in outs])
    assert np.isfinite(p_est).all()
    # the filter runs in the rectified cam frame; compare displacement
    # magnitudes only (loose sanity bound, motion is a few cm here)
    gt_disp = np.linalg.norm(p_stack - p_stack[0], axis=1)
    est_disp = np.linalg.norm(p_est, axis=1)
    assert est_disp[-1] < max(4 * gt_disp[-1], 0.5)
