"""Hostile-world validation (VERDICT r3 item 4): the rendered benchmark
world with per-frame exposure flicker, sensor noise, vignetting, and
independently moving textured occluders. The tracker's gates — fwd-bwd
consistency, stereo backward, disparity, epipolar (reference
MSCKF/image.py:585-636) — must kill the inconsistent tracks and the
estimator must stay inside the bench ATE bound.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.data.simulator import (
    SimConfig, simulate_sequence, bundle_frames,
)
from vio_msckf_tpu.data.render import RenderAugs, HOSTILE_AUGS, \
    render_sequence
from vio_msckf_tpu.engine import VIOEngine
from vio_msckf_tpu.frontend.tracker import StereoTracker
from vio_msckf_tpu.utils.metrics import ate_rmse

BENCH_SIM = dict(seed=4, amp=(1.5, 1.0, 0.5), yaw_rate=0.2, wobble_amp=0.1)


def _workload(cfg, duration, augs):
    sim = SimConfig(duration=duration, **BENCH_SIM)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0,
                                 seed=7, augs=augs)
    device_frames = dict(
        cam0_img=cam0, cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    )
    return device_frames, init, p_stack, n


def test_hostile_world_ate_bounded():
    """Full engine through 8 s of the hostile world: several clone prunes,
    occluders sweeping the view, flicker + noise every frame."""
    cfg = euroc_config()
    frames, init, gt, n = _workload(cfg, 8.0, HOSTILE_AUGS)
    eng = VIOEngine(cfg)
    carry = eng.init(init["q0"], init["bg0"], init["gravity"])
    _, outs = jax.jit(eng.run_sequence)(carry, frames)
    est = np.asarray(outs.p)
    assert np.isfinite(est).all()
    assert int(np.asarray(outs.did_reset).sum()) == 0
    # Even under occluder sweeps the per-frame lost-track burst must fit
    # the compaction budget — overflow means silently discarded update
    # information (VERDICT r4 item 5).
    assert int(np.asarray(outs.lost_overflow).sum()) == 0
    ate = ate_rmse(est, gt, align=False)
    assert ate < 0.5, f"hostile-world ATE {ate:.3f} m (bound 0.5)"


def test_gate_kill_attribution():
    """The tracker's diag counters must show the gates actually firing on
    the hostile world — and firing much more than on the ideal world."""
    cfg = euroc_config()

    def run_tracker(augs, n_frames=50):
        frames, _, _, n = _workload(cfg, 4.0, augs)
        tracker = StereoTracker(cfg)

        def step(ts, fr):
            ts, msg = tracker.step(
                ts, fr["cam0_img"], fr["cam1_img"],
                fr["imu_gyro"], fr["imu_dt"], fr["imu_valid"],
            )
            return ts, msg["diag"]

        sub = jax.tree_util.tree_map(lambda x: x[:n_frames], frames)
        _, diags = jax.jit(
            lambda ts, f: jax.lax.scan(step, ts, f)
        )(tracker.init(), sub)
        return {k: int(np.asarray(v).sum()) for k, v in diags.items()}

    ideal = run_tracker(None)
    hostile = run_tracker(HOSTILE_AUGS)

    # The front-end still works: tracks survive and births continue.
    assert hostile["n_survived"] > 0
    assert hostile["n_births"] > 0

    kills = ("kill_fwdbwd", "kill_lk", "kill_back", "kill_disparity",
             "kill_epipolar")
    total_h = sum(hostile[k] for k in kills)
    total_i = sum(ideal[k] for k in kills)
    assert total_h > 0, f"no gate fired on the hostile world: {hostile}"
    assert total_h > 2 * max(total_i, 1), (
        f"hostile kills {total_h} not >> ideal kills {total_i}: "
        f"{hostile} vs {ideal}"
    )
    # Record the attribution for the profile report.
    print("gate kills ideal  :", {k: ideal[k] for k in kills})
    print("gate kills hostile:", {k: hostile[k] for k in kills})
