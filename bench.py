"""Headline benchmark: full image->pose VIO throughput on one TPU chip.

Workload: the complete per-frame pipeline (pyramids, FAST-9, pyramidal-LK
stereo tracking, IMU-scan propagation, vmapped triangulation, gated
QR-compressed EKF update, clone pruning) on EuRoC-sized stereo frames
(752x480 x2, 20 Hz nominal, ~10 IMU samples/frame) rendered from the
synthetic textured world (no dataset on disk in this environment; the
renderer runs ahead of time and is excluded from timing).

Baseline (BASELINE.md): the reference ships at 0.4x real time on CPU ==
~8 stereo frames/s end-to-end. `vs_baseline` is our frames/s divided by 8.

Default (driver) mode prints exactly one JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x,
   "ate_rmse_m": y}
and exits nonzero if the trajectory diverged.

`--suite` runs the BASELINE.md benchmark-config analogs (no EuRoC data in
this environment, zero egress): default window, V1_02-style fast motion,
MH_04/05-style enlarged clone window, and the vmapped multi-sequence
throughput mode — one JSON line each.

`--scaling` runs the replica-sharded engine over virtual CPU meshes of
1/2/4/8 devices and prints a scaling table (the multi-chip mode; only one
real TPU chip is reachable here, so efficiency is measured on the virtual
mesh where all devices share host cores — a lower bound on ICI scaling).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 8.0  # reference: 0.4x real time at 20 Hz (vio.py:100)
ATE_BOUND_M = 0.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _setup_jax(platform=None):
    import jax

    # Compile time over the TPU tunnel is highly variable (measured 60 s ..
    # 365 s for the same render program); persist compiles across runs.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if platform:
        jax.config.update("jax_platforms", platform)
    return jax


def build_workload(cfg, sim_overrides=None, duration=12.0,
                   render_augs=None):
    """Simulate + render one bench sequence; returns (device_frames,
    carry-init kwargs, gt positions, n_frames)."""
    import jax
    import jax.numpy as jnp
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.data.render import render_sequence

    base = dict(duration=duration, seed=4, amp=(1.5, 1.0, 0.5),
                yaw_rate=0.2, wobble_amp=0.1)
    base.update(sim_overrides or {})
    sim = SimConfig(**base)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])

    t0 = time.time()
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7,
                                 augs=render_augs)
    jax.block_until_ready(cam1)
    log(f"rendered {n} stereo frames in {time.time()-t0:.1f}s")

    device_frames = dict(
        cam0_img=cam0,
        cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    )
    return device_frames, init, p_stack, n


def run_single(cfg, name, sim_overrides=None, reps=3, check_ate=True,
               render_augs=None):
    """One sequence through the scanned engine; returns the result dict."""
    import jax
    import jax.numpy as jnp
    from vio_msckf_tpu.engine import VIOEngine
    from vio_msckf_tpu.utils.metrics import ate_rmse, rpe_rmse

    device_frames, init, gt, n = build_workload(
        cfg, sim_overrides, render_augs=render_augs)
    eng = VIOEngine(cfg)
    carry0 = eng.init(init["q0"], init["bg0"], init["gravity"])
    run = jax.jit(eng.run_sequence, donate_argnums=(0,))

    t0 = time.time()
    carry, outs = run(jax.tree_util.tree_map(jnp.array, carry0),
                      device_frames)
    jax.block_until_ready(outs.p)
    log(f"[{name}] compile+first run: {time.time()-t0:.1f}s")

    ate = ate_rmse(np.asarray(outs.p), gt, align=False)
    rpe = rpe_rmse(np.asarray(outs.p), gt)
    log(f"[{name}] ATE RMSE (unaligned, synthetic): {ate:.4f} m  "
        f"RPE RMSE (20-frame delta): {rpe:.4f} m")
    if check_ate and (not np.isfinite(ate) or ate > ATE_BOUND_M):
        log(f"FAIL: ATE {ate:.4f} m exceeds the {ATE_BOUND_M} m bound — "
            "filter diverged; not reporting throughput.")
        sys.exit(1)

    times = []
    for r in range(reps):
        carry = jax.tree_util.tree_map(jnp.array, carry0)
        t0 = time.time()
        carry, outs = run(carry, device_frames)
        jax.block_until_ready(outs.p)
        times.append(time.time() - t0)
        log(f"[{name}] pass {r}: {times[-1]:.3f}s "
            f"({n/times[-1]:.1f} fps)")

    fps = n / min(times)
    return {
        "metric": name,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "ate_rmse_m": round(float(ate), 4),
        "rpe_rmse_m": round(float(rpe), 4),
    }


def run_batched(cfg, name, batch, reps=3):
    """Vmapped multi-sequence throughput on one chip (the 11-sequence
    suite analog, BASELINE.md config 4): B independent sequences advance
    in lockstep; reported fps is aggregate frames/s."""
    import jax
    import jax.numpy as jnp
    from vio_msckf_tpu.engine import VIOEngine
    from vio_msckf_tpu.utils.metrics import ate_rmse, rpe_rmse

    eng = VIOEngine(cfg)
    frames_list, carries, gts = [], [], []
    for b in range(batch):
        device_frames, init, gt, n = build_workload(
            cfg, sim_overrides=dict(seed=4 + b))
        frames_list.append(device_frames)
        gts.append(gt)
        carries.append(eng.init(init["q0"], init["bg0"], init["gravity"]))
    frames_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *frames_list)
    carry_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)

    vrun = jax.jit(jax.vmap(eng.run_sequence), donate_argnums=(0,))
    t0 = time.time()
    _, outs = vrun(jax.tree_util.tree_map(jnp.array, carry_b), frames_b)
    jax.block_until_ready(outs.p)
    log(f"[{name}] compile+first run: {time.time()-t0:.1f}s")

    ates = [
        ate_rmse(np.asarray(outs.p[b]), gts[b], align=False)
        for b in range(batch)
    ]
    rpes = [
        rpe_rmse(np.asarray(outs.p[b]), gts[b]) for b in range(batch)
    ]
    log(f"[{name}] per-sequence ATE: "
        + ", ".join(f"{a:.3f}" for a in ates))
    if max(ates) > ATE_BOUND_M:
        log(f"FAIL: worst ATE {max(ates):.4f} m exceeds {ATE_BOUND_M} m")
        sys.exit(1)

    times = []
    for r in range(reps):
        carry = jax.tree_util.tree_map(jnp.array, carry_b)
        t0 = time.time()
        _, outs = vrun(carry, frames_b)
        jax.block_until_ready(outs.p)
        times.append(time.time() - t0)
        log(f"[{name}] pass {r}: {times[-1]:.3f}s "
            f"({batch*n/times[-1]:.1f} agg fps)")

    fps = batch * n / min(times)
    return {
        "metric": name,
        "value": round(fps, 2),
        "unit": "frames/s (aggregate)",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "ate_rmse_m": round(float(max(ates)), 4),
        "rpe_rmse_m": round(float(max(rpes)), 4),
    }


def run_scaling(reps=2, duration=12.0):
    """Replica-scaling table on virtual CPU meshes (1/2/4/8 devices),
    using the FILTER step at full EuRoC filter shapes (D=141 covariance,
    160-feature table, simulator feature tracks — no renderer, so the CPU
    compile stays tractable; the front-end has no cross-replica coupling
    anyway, so the estimator is where sharding overhead can appear).

    All virtual devices share the same host cores, so this measures the
    sharding/collective overhead floor, not real ICI speedup — the table's
    value is (a) the multichip path executing at full filter shapes and
    (b) the shard_map overhead staying small.
    """
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    jax = _setup_jax(platform="cpu")
    import jax.numpy as jnp
    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.parallel import make_mesh, \
        make_multichip_filter_step, shard_batch

    cfg = euroc_config()
    B = 8  # total sequences, fixed across mesh sizes (strong scaling)
    frames_list, carries = [], []
    from vio_msckf_tpu.filter.msckf import MSCKF
    kf0 = MSCKF(cfg)
    for b in range(B):
        sim = SimConfig(duration=duration, seed=4 + b,
                        amp=(1.5, 1.0, 0.5), yaw_rate=0.2, wobble_amp=0.1)
        seq = simulate_sequence(cfg, sim)
        frames, init, first = bundle_frames(seq, cfg)
        n = len(frames["timestamp"])
        frames_list.append({
            k: jnp.asarray(v) for k, v in frames.items()
            if k != "timestamp"
        })
        carries.append(kf0.init(init["q0"], init["bg0"], init["gravity"]))
    frames_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *frames_list)
    carry_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)

    from jax.sharding import NamedSharding, PartitionSpec as P

    # scan runs over the time axis: frames (T, B, ...), replica = axis 1.
    frames_scan_host = jax.tree_util.tree_map(
        lambda x: jnp.swapaxes(x, 0, 1), frames_b)

    rows = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_replica=n_dev, n_block=1)
        step, _ = make_multichip_filter_step(cfg, mesh, use_block=False)
        frames_scan = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(None, "replica"))),
            frames_scan_host,
        )

        run = jax.jit(lambda c, f: jax.lax.scan(
            lambda cc, ff: step(cc, ff), c, f))
        carry = shard_batch(mesh, jax.tree_util.tree_map(jnp.array, carry_b))
        t0 = time.time()
        _, outs = run(carry, frames_scan)
        jax.block_until_ready(outs.p)
        compile_s = time.time() - t0

        times = []
        for _ in range(reps):
            carry = shard_batch(
                mesh, jax.tree_util.tree_map(jnp.array, carry_b))
            t0 = time.time()
            _, outs = run(carry, frames_scan)
            jax.block_until_ready(outs.p)
            times.append(time.time() - t0)
        fps = B * n / min(times)
        rows.append((n_dev, fps, compile_s))
        log(f"[scaling] {n_dev} dev: {fps:.1f} agg fps "
            f"(compile {compile_s:.0f}s)")

    base = rows[0][1]
    table = [
        {
            "devices": d,
            "agg_fps": round(f, 2),
            "speedup": round(f / base, 2),
            "efficiency": round(f / (base * d), 3),
        }
        for d, f, _ in rows
    ]
    print(json.dumps({"metric": "virtual-mesh replica scaling",
                      "table": table}))
    return table


def main():
    ap = argparse.ArgumentParser("bench")
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        run_scaling()
        return

    jax = _setup_jax()
    from vio_msckf_tpu.config import euroc_config

    log("devices:", jax.devices())
    cfg = euroc_config()

    if not args.suite:
        result = run_single(
            cfg,
            "euroc-sized stereo VIO frames/s, 1 chip "
            "(full image->pose pipeline)",
        )
        log("ate_rmse_m:", result["ate_rmse_m"])
        print(json.dumps(result))
        return

    # --- suite mode (BASELINE.md configs, synthetic analogs) ---
    results = []
    results.append(run_single(cfg, "suite: MH_01-style default window"))
    results.append(run_single(
        cfg, "suite: V1_02-style fast motion",
        sim_overrides=dict(amp=(2.5, 1.8, 0.9), yaw_rate=0.6,
                           wobble_amp=0.25, seed=11),
    ))
    big = cfg.replace(
        filter=cfg.filter.__class__(max_cam_state_size=30)
    )
    results.append(run_single(
        big, "suite: MH_04/05-style enlarged window (30 clones)"))
    from vio_msckf_tpu.data.render import HOSTILE_AUGS
    results.append(run_single(
        cfg, "suite: hostile world (flicker+noise+vignette+occluders)",
        render_augs=HOSTILE_AUGS,
    ))
    results.append(run_batched(
        cfg, "suite: 4-sequence vmapped throughput, 1 chip", batch=4))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
