"""Aggregate-throughput curve over batch (vmapped sequences per chip).

VERDICT r4 item 1 deliverable: B in {1, 2, 4, 8, 16} on the real chip,
full engine, with agg fps per row — the evidence for whether batching
pays after the r5 kernel work. Uses a 6 s workload per sequence to keep
render time and HBM footprint sane at B=16; the per-step times match the
220-frame bench within noise.

Run: python scripts/batch_sweep.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time

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

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.engine import VIOEngine

DURATION = 6.0


def build(cfg, seed):
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.data.render import render_sequence

    sim = SimConfig(duration=DURATION, seed=seed, amp=(1.5, 1.0, 0.5),
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
    )
    return dev, init, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cfg = euroc_config()
    eng = VIOEngine(cfg)
    print("devices:", jax.devices(), flush=True)

    batches = [int(b) for b in args.batches.split(",")]
    Bmax = max(batches)
    devs, inits = [], []
    for b in range(Bmax):
        dev, init, n = build(cfg, seed=4 + b)
        devs.append(dev)
        inits.append(init)
        print(f"built seq {b + 1}/{Bmax}", flush=True)

    rows = []
    for B in batches:
        frames_b = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *devs[:B])
        carries = [eng.init(i["q0"], i["bg0"], i["gravity"])
                   for i in inits[:B]]
        carry_b = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *carries)
        run = jax.jit(jax.vmap(eng.run_sequence))
        t0 = time.time()
        _, outs = run(carry_b, frames_b)
        jax.block_until_ready(outs.p)
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            _, outs = run(carry_b, frames_b)
            jax.block_until_ready(outs.p)
            best = min(best, time.time() - t0)
        row = {
            "batch": B,
            "frames": n,
            "ms_per_step": round(best / n * 1e3, 3),
            "agg_fps": round(B * n / best, 1),
            "per_seq_fps": round(n / best, 1),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(row, flush=True)

    base = rows[0]["agg_fps"]
    for r in rows:
        r["agg_vs_B1"] = round(r["agg_fps"] / base, 2)
    print(json.dumps(rows, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
