"""Headline benchmark: full image->pose VIO throughput on one TPU chip.

Workload: the complete per-frame pipeline (pyramids, FAST-9, triple
pyramidal-LK stereo tracking, IMU-scan propagation, vmapped triangulation,
gated information-form EKF update, clone pruning) on EuRoC-sized stereo
frames (752x480 x2, 20 Hz nominal, ~10 IMU samples/frame) rendered from the
synthetic textured world (no dataset on disk in this environment; the
renderer runs ahead of time and is excluded from timing).

Baseline (BASELINE.md): the reference ships at 0.4x real time on CPU ==
~8 stereo frames/s end-to-end. `vs_baseline` is our frames/s divided by 8.

Prints exactly one JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x}
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Compile time over the TPU tunnel is highly variable (measured 60 s ..
    # 365 s for the same render program); persist compiles across runs.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.data.render import render_sequence
    from vio_msckf_tpu.engine import VIOEngine
    from vio_msckf_tpu.utils.metrics import ate_rmse

    log("devices:", jax.devices())

    cfg = euroc_config()
    sim = SimConfig(
        duration=12.0, seed=4, amp=(1.5, 1.0, 0.5), yaw_rate=0.2,
        wobble_amp=0.1,
    )
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n_frames = len(frames["timestamp"])
    log(f"sequence: {n_frames} frames")

    # --- pre-render the stereo imagery on device (excluded from timing) ---
    t0 = time.time()
    R_stack = seq["gt_R_i_w"][first:first + n_frames].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n_frames]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7)
    jax.block_until_ready(cam1)
    log(f"rendered {n_frames} stereo frames in {time.time()-t0:.1f}s")

    device_frames = dict(
        cam0_img=cam0,
        cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    )

    eng = VIOEngine(cfg)
    carry0 = eng.init(init["q0"], init["bg0"], init["gravity"])
    run = jax.jit(eng.run_sequence, donate_argnums=(0,))

    # --- compile + correctness pass ---
    t0 = time.time()
    carry, outs = run(jax.tree_util.tree_map(jnp.array, carry0), device_frames)
    jax.block_until_ready(outs.p)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    est = np.asarray(outs.p)
    gt = seq["gt_p"][first:first + n_frames]
    ate = ate_rmse(est, gt, align=False)
    log(f"ATE RMSE (unaligned, synthetic): {ate:.4f} m")

    # A perf number over a broken trajectory is not a benchmark: refuse to
    # publish fps unless the correctness pass holds (VERDICT r2 task 1).
    ATE_BOUND_M = 0.5
    if not np.isfinite(ate) or ate > ATE_BOUND_M:
        log(f"FAIL: ATE {ate:.4f} m exceeds the {ATE_BOUND_M} m bound — "
            "filter diverged; not reporting throughput.")
        sys.exit(1)

    # --- timed passes ---
    reps = 3
    times = []
    for r in range(reps):
        carry = jax.tree_util.tree_map(jnp.array, carry0)
        t0 = time.time()
        carry, outs = run(carry, device_frames)
        jax.block_until_ready(outs.p)
        times.append(time.time() - t0)
        log(f"pass {r}: {times[-1]:.3f}s ({n_frames/times[-1]:.1f} fps)")

    best = min(times)
    fps = n_frames / best
    baseline_fps = 8.0  # reference: 0.4x real time at 20 Hz (vio.py:100)
    result = {
        "metric": "euroc-sized stereo VIO frames/s, 1 chip (full image->pose pipeline)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "ate_rmse_m": round(float(ate), 4),
    }
    log("ate_rmse_m:", round(ate, 4))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
