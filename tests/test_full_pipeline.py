"""Full image->pose pipeline tests: rendered distorted stereo frames of a
textured world through the complete engine (front-end + filter).

Two layers of trust (VERDICT r2 tasks 1-2):
  * the BENCH-LENGTH workload (12 s, 220 frames — long enough to cross
    several clone prunes, where the round-2 filter diverged) under the
    suite's own environment, and
  * the same workload in a SUBPROCESS with a scrubbed environment — no
    --xla_force_host_platform_device_count, a cold compile cache — so a
    pass cannot depend on conftest-specific XLA fusion/rounding (the
    round-2 failure mode: identical code passed under pytest and diverged
    outside it).
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.data.simulator import (
    SimConfig, simulate_sequence, bundle_frames,
)
from vio_msckf_tpu.engine import VIOEngine
from vio_msckf_tpu.utils.metrics import ate_rmse

BENCH_SIM = dict(seed=4, amp=(1.5, 1.0, 0.5), yaw_rate=0.2, wobble_amp=0.1)


def test_image_to_pose_pipeline_bench_length():
    """The exact bench.py workload (12 s scan) with the bench's ATE
    bound. Round 2's 4 s version never reached the later clone prunes."""
    from vio_msckf_tpu.data.render import render_sequence

    cfg = euroc_config()
    sim = SimConfig(duration=12.0, **BENCH_SIM)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7)

    eng = VIOEngine(cfg)
    carry = eng.init(init["q0"], init["bg0"], init["gravity"])
    run = jax.jit(eng.run_sequence)
    device_frames = dict(
        cam0_img=cam0, cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    )
    carry, outs = run(carry, device_frames)

    est = np.asarray(outs.p)
    assert np.isfinite(est).all()
    # A correct filter never trips the online reset on this easy workload.
    assert int(np.asarray(outs.did_reset).sum()) == 0
    ate = ate_rmse(est, p_stack, align=False)
    assert ate < 0.5, f"full-pipeline ATE {ate:.3f} m (bench bound 0.5)"


def test_pipeline_survives_scrubbed_environment(tmp_path):
    """Run the bench workload via the CLI in a subprocess whose env has NO
    xla_force_host_platform_device_count and a COLD compile cache, so the
    result cannot depend on the suite's XLA configuration."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_COMPILATION_CACHE_DIR")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "vio_msckf_tpu", "--demo",
         "--demo-duration", "12", "--platform", "cpu",
         "--compile-cache", str(tmp_path / "cold_cache")],
        env=env, cwd=repo, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("ate_rmse_m")]
    assert line, proc.stdout
    ate = float(line[-1].split()[1])
    assert ate < 0.5, f"scrubbed-env ATE {ate:.3f} m (bound 0.5)"
