"""End-to-end estimator validation on the synthetic simulator — the test
the reference never had (SURVEY.md section 4): perfect/noisy IMU + projected
stereo features with known ground truth, run through the full jitted
per-frame step under lax.scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.data.simulator import (
    SimConfig,
    simulate_sequence,
    bundle_frames,
)
from vio_msckf_tpu.filter.msckf import MSCKF
from vio_msckf_tpu.utils.metrics import ate_rmse


def run_sim(sim: SimConfig, cfg=None):
    cfg = cfg or euroc_config()
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    kf = MSCKF(cfg)
    state, fmap = kf.init(init["q0"], init["bg0"], init["gravity"])

    device_frames = {
        k: jnp.asarray(v) for k, v in frames.items() if k != "timestamp"
    }
    (state, fmap), outs = jax.jit(kf.run_sequence)(
        (state, fmap), device_frames
    )
    est_p = np.asarray(outs.p)
    gt_p = seq["gt_p"][first:]
    return est_p, gt_p, outs, state


def test_noise_free_tracking():
    sim = SimConfig(duration=12.0, seed=1)
    est_p, gt_p, outs, state = run_sim(sim)
    assert np.isfinite(est_p).all()
    assert not bool(np.asarray(outs.did_reset).any())
    err = np.linalg.norm(est_p - gt_p, axis=1)
    assert err.max() < 0.15, f"max drift {err.max():.3f} m"
    assert ate_rmse(est_p, gt_p, align=False) < 0.08
    # Covariance stays sane and symmetric.
    P = np.asarray(state.P)
    np.testing.assert_allclose(P, P.T, atol=1e-5)
    assert np.all(np.diag(P) > -1e-6)


def test_noisy_tracking_bounded():
    sim = SimConfig(
        duration=12.0,
        seed=2,
        gyro_noise_std=0.005,
        acc_noise_std=0.05,
        pixel_noise_std=0.5 / 458.0,  # half a pixel in normalized units
        gyro_bias=(0.002, -0.001, 0.0015),
        acc_bias=(0.01, -0.02, 0.015),
    )
    est_p, gt_p, outs, _ = run_sim(sim)
    assert np.isfinite(est_p).all()
    rmse = ate_rmse(est_p, gt_p, align=False)
    assert rmse < 0.5, f"noisy ATE RMSE {rmse:.3f} m"


def test_dropped_camera_frame_absorbed():
    """Delete one camera frame mid-sequence: the next frame has ~20 pending
    IMU samples (200 Hz IMU / 20 Hz camera). imu_per_frame=32 must absorb
    the double bundle with NO deferral warning (data/bundling.py:57-63) and
    the estimate must stay bounded through the gap."""
    import warnings

    cfg = euroc_config()
    sim = SimConfig(duration=8.0, seed=5)
    seq = simulate_sequence(cfg, sim)
    drop = int(0.7 * len(seq["frame_t"]))  # mid-motion, well past init
    for key in ("frame_t", "feat_ids", "feat_obs", "feat_valid",
                "gt_p", "gt_v", "gt_R_i_w"):
        seq[key] = np.delete(seq[key], drop, axis=0)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any deferral warning fails
        frames, init, first = bundle_frames(seq, cfg)

    counts = frames["imu_valid"].sum(axis=1)
    assert counts.max() >= 19, "the dropped frame should double one bundle"
    assert counts.max() <= cfg.filter.imu_per_frame

    kf = MSCKF(cfg)
    carry = kf.init(init["q0"], init["bg0"], init["gravity"])
    device_frames = {
        k: jnp.asarray(v) for k, v in frames.items() if k != "timestamp"
    }
    _, outs = jax.jit(kf.run_sequence)(carry, device_frames)
    est_p = np.asarray(outs.p)
    gt_p = seq["gt_p"][first:]
    assert np.isfinite(est_p).all()
    assert ate_rmse(est_p, gt_p, align=False) < 0.15


def test_scan_matches_python_loop():
    """lax.scan over frames must equal the per-frame jitted loop."""
    cfg = euroc_config()
    sim = SimConfig(duration=4.0, seed=3)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    kf = MSCKF(cfg)

    device_frames = {
        k: jnp.asarray(v) for k, v in frames.items() if k != "timestamp"
    }
    carry0 = kf.init(init["q0"], init["bg0"], init["gravity"])
    _, outs_scan = jax.jit(kf.run_sequence)(carry0, device_frames)

    step = jax.jit(kf.step)
    carry = carry0
    ps = []
    n = len(frames["timestamp"])
    for k in range(n):
        frame = {k2: v[k] for k2, v in device_frames.items()}
        carry, out = step(carry, frame)
        ps.append(np.asarray(out.p))
    np.testing.assert_allclose(
        np.asarray(outs_scan.p), np.stack(ps), atol=1e-5
    )
