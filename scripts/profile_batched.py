"""Why is the vmapped multi-sequence engine slower per frame than batch 1?

bench --suite round 4 start: single sequence 106 fps, 4-seq vmapped only
75.9 AGGREGATE fps — the batched step costs ~5.6x a single step instead of
~1x. This script splits the engine under vmap into tracker-only and
filter-only scans at batch 1 vs 4 to locate the blowup.

Usage: python scripts/profile_batched.py [--cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.engine import VIOEngine
from vio_msckf_tpu.filter.msckf import MSCKF
from vio_msckf_tpu.frontend.tracker import StereoTracker


def build(cfg, seed):
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.data.render import render_sequence

    sim = SimConfig(duration=12.0, seed=seed, amp=(1.5, 1.0, 0.5),
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


def timed(run, carry, frames, n, B, name, reps=3):
    out = run(carry, frames)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = run(carry, frames)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name:42s} B={B}: {best*1e3:8.1f} ms "
          f"({best*1e3/n:6.2f} ms/step, {B*n/best:7.1f} agg fps)",
          flush=True)
    return best


def main():
    cfg = euroc_config()
    eng = VIOEngine(cfg)
    kf = MSCKF(cfg)
    tracker = StereoTracker(cfg)

    devs, inits = [], []
    for b in range(4):
        dev, init, n = build(cfg, seed=4 + b)
        devs.append(dev)
        inits.append(init)
    print(f"{n} frames per sequence", flush=True)

    def stack(bs):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[devs[i] for i in bs]
        )

    def eng_carry(bs):
        cs = [eng.init(inits[i]["q0"], inits[i]["bg0"],
                       inits[i]["gravity"]) for i in bs]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cs)

    def kf_carry(bs):
        cs = [kf.init(inits[i]["q0"], inits[i]["bg0"],
                      inits[i]["gravity"]) for i in bs]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cs)

    eng_keys = ("cam0_img", "cam1_img", "imu_gyro", "imu_acc", "imu_dt",
                "imu_valid")
    kf_keys = ("imu_gyro", "imu_acc", "imu_dt", "imu_valid", "feat_ids",
               "feat_obs", "feat_valid")

    def tracker_step(ts, fr):
        ts, msg = tracker.step(ts, fr["cam0_img"], fr["cam1_img"],
                               fr["imu_gyro"], fr["imu_dt"],
                               fr["imu_valid"])
        return ts, msg["feat_obs"].sum()

    for B in (1, 4):
        bs = list(range(B))
        frames_eng = {k: v for k, v in stack(bs).items() if k in eng_keys}
        # Always vmap (even at B=1) so the rows are apples-to-apples:
        # the vmap(B=1) penalty is measured separately by
        # scripts/profile_vmap_tracker.py.
        run = jax.jit(jax.vmap(eng.run_sequence))
        timed(run, eng_carry(bs), frames_eng, n, B, "full engine (vmap)")

        frames_kf = {k: v for k, v in stack(bs).items() if k in kf_keys}
        runk = jax.jit(jax.vmap(kf.run_sequence))
        timed(runk, kf_carry(bs), frames_kf, n, B, "filter only (vmap)")

        def tr_scan(ts, fr):
            return jax.lax.scan(tracker_step, ts, fr)
        runt = jax.jit(jax.vmap(tr_scan))
        ts0 = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[tracker.init() for _ in bs]
        )
        timed(runt, ts0, frames_eng, n, B, "tracker only (vmap)")


if __name__ == "__main__":
    main()
