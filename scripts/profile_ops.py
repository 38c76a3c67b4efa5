"""Op-level device profile of the engine step on the real TPU chip.

VERDICT r4 item 1: produce a jax.profiler op breakdown of the scanned
engine at batch B, with per-op self time, FLOP rate, memory bandwidth and
the profiler's bound-by attribution, plus an aggregate MFU estimate and
the device-busy fraction of the wall clock. This is the measurement that
explains why batching does (or does not) add aggregate throughput.

Usage:
    python scripts/profile_ops.py [--batch 1] [--duration 12]
        [--top 25] [--json out.json] [--tracker-only|--filter-only]

The xplane trace is parsed with the xprof converter (hlo_stats tool);
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python is required because the
image's compiled protobufs predate the installed runtime.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# TPU v5e (v5 lite) single-chip peaks, for the MFU/roofline columns.
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def build(cfg, seed, duration):
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.data.render import render_sequence

    sim = SimConfig(duration=duration, seed=seed, amp=(1.5, 1.0, 0.5),
                    yaw_rate=0.2, wobble_amp=0.1)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7)
    dev = dict(
        cam0_img=cam0, cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
        feat_ids=jnp.asarray(frames["feat_ids"]),
        feat_obs=jnp.asarray(frames["feat_obs"]),
        feat_valid=jnp.asarray(frames["feat_valid"]),
    )
    return dev, init, n


def parse_hlo_stats(trace_dir):
    """xplane.pb -> list of per-op dicts (time in us)."""
    import glob
    from xprof.convert import raw_to_tool_data as rtd

    fs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                   recursive=True)
    assert fs, f"no xplane.pb under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data(fs, "hlo_stats", {})
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    rows = []
    for row in d["rows"]:
        vals = dict(zip(cols, [c["v"] if c else None for c in row["c"]]))
        rows.append(vals)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--duration", type=float, default=12.0)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None)
    ap.add_argument("--tracker-only", action="store_true")
    ap.add_argument("--filter-only", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.engine import VIOEngine
    from vio_msckf_tpu.filter.msckf import MSCKF
    from vio_msckf_tpu.frontend.tracker import StereoTracker

    cfg = euroc_config()
    print("devices:", jax.devices(), flush=True)

    B = args.batch
    devs, inits = [], []
    for b in range(B):
        dev, init, n = build(cfg, seed=4 + b, duration=args.duration)
        devs.append(dev)
        inits.append(init)
    frames_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *devs)
    print(f"{n} frames x B={B}", flush=True)

    eng_keys = ("cam0_img", "cam1_img", "imu_gyro", "imu_acc", "imu_dt",
                "imu_valid")
    kf_keys = ("imu_gyro", "imu_acc", "imu_dt", "imu_valid", "feat_ids",
               "feat_obs", "feat_valid")

    if args.filter_only:
        kf = MSCKF(cfg)
        frames_r = {k: v for k, v in frames_b.items() if k in kf_keys}
        carries = [kf.init(i["q0"], i["bg0"], i["gravity"]) for i in inits]
        run_one = kf.run_sequence
        label = "filter"
    elif args.tracker_only:
        tracker = StereoTracker(cfg)

        def run_one(ts, fr):
            def step(ts, f):
                ts, msg = tracker.step(
                    ts, f["cam0_img"], f["cam1_img"], f["imu_gyro"],
                    f["imu_dt"], f["imu_valid"])
                return ts, msg["feat_obs"].sum()
            return jax.lax.scan(step, ts, fr)

        frames_r = {k: v for k, v in frames_b.items() if k in eng_keys}
        carries = [StereoTracker(cfg).init() for _ in inits]
        label = "tracker"
    else:
        eng = VIOEngine(cfg)
        frames_r = {k: v for k, v in frames_b.items() if k in eng_keys}
        carries = [eng.init(i["q0"], i["bg0"], i["gravity"])
                   for i in inits]
        run_one = eng.run_sequence
        label = "engine"

    carry_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
    run = jax.jit(jax.vmap(run_one))

    # Compile + XLA's own cost model for the whole program.
    t0 = time.time()
    lowered = run.lower(carry_b, frames_r)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    print(f"compile: {time.time() - t0:.1f}s", flush=True)

    out = compiled(carry_b, frames_r)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(args.reps):
        t0 = time.time()
        out = compiled(carry_b, frames_r)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"warm pass: {best*1e3:.1f} ms "
          f"({best*1e3/n:.2f} ms/step, {B*n/best:.1f} agg fps)", flush=True)

    trace_dir = f"/tmp/vio_ops_trace_{label}_B{B}"
    import shutil
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = compiled(carry_b, frames_r)
        jax.block_until_ready(out)

    rows = parse_hlo_stats(trace_dir)
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0.0))
    busy_us = sum(r.get("total_self_time") or 0.0 for r in rows)

    flops = cost.get("flops", 0.0)
    bytes_acc = cost.get("bytes accessed", 0.0)
    wall_s = best
    mfu = flops / wall_s / (PEAK_BF16_TFLOPS * 1e12)
    hbm_frac = bytes_acc / wall_s / (PEAK_HBM_GBS * 1e9)

    print(f"\n=== {label} B={B}: {n} frames, wall {wall_s*1e3:.1f} ms ===")
    print(f"XLA cost model: {flops/1e9:.2f} GFLOP total, "
          f"{bytes_acc/1e6:.1f} MB accessed")
    print(f"MFU (vs {PEAK_BF16_TFLOPS:.0f} TF/s bf16 peak): {mfu*100:.2f}%")
    print(f"HBM roofline fraction (vs {PEAK_HBM_GBS:.0f} GB/s): "
          f"{hbm_frac*100:.2f}%")
    print(f"device busy (sum op self time): {busy_us/1e3:.1f} ms "
          f"= {busy_us/1e3/ (wall_s*1e3) *100:.1f}% of wall\n")

    hdr = (f"{'category':28s} {'op':40s} {'#':>6s} {'self ms':>9s} "
           f"{'%':>5s} {'GF/s':>8s} {'GiB/s':>7s}  bound_by")
    print(hdr)
    print("-" * len(hdr))
    for r in rows[: args.top]:
        print(f"{(r.get('category') or '')[:28]:28s} "
              f"{(r.get('hlo_op_name') or '')[:40]:40s} "
              f"{int(r.get('occurrences') or 0):6d} "
              f"{(r.get('total_self_time') or 0)/1e3:9.3f} "
              f"{(r.get('total_self_time') or 0)/max(busy_us,1e-9)*100:5.1f} "
              f"{(r.get('model_flop_rate') or 0):8.1f} "
              f"{(r.get('measured_memory_bw') or 0):7.1f}  "
              f"{r.get('bound_by') or ''}")

    # Category aggregation.
    cats = {}
    for r in rows:
        c = r.get("category") or "?"
        cats[c] = cats.get(c, 0.0) + (r.get("total_self_time") or 0.0)
    print("\nby category (ms):")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {c:32s} {t/1e3:9.3f}  ({t/max(busy_us,1e-9)*100:.1f}%)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "label": label, "batch": B, "frames": n,
                "wall_ms": wall_s * 1e3,
                "ms_per_step": wall_s * 1e3 / n,
                "agg_fps": B * n / wall_s,
                "flops_total": flops,
                "bytes_accessed": bytes_acc,
                "mfu_vs_bf16_peak": mfu,
                "hbm_roofline_fraction": hbm_frac,
                "device_busy_ms": busy_us / 1e3,
                "busy_fraction_of_wall": busy_us / 1e3 / (wall_s * 1e3),
                "top_ops": rows[: args.top],
                "by_category_ms": {
                    c: t / 1e3 for c, t in
                    sorted(cats.items(), key=lambda kv: -kv[1])
                },
            }, f, indent=1)
        print("json ->", args.json)


if __name__ == "__main__":
    main()
