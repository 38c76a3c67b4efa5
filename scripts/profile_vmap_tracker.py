"""Locate the vmap penalty inside the tracker.

profile_batched.py: the tracker costs ~5.5 ms/frame unvmapped but
14.6 ms/frame under vmap(B=1) and 32 ms at B=4. This script times
truncated tracker pipelines (scan over 220 real rendered frames) both
unvmapped and vmapped to attribute the penalty per stage.
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
from vio_msckf_tpu.frontend.tracker import StereoTracker, TrackerState
from vio_msckf_tpu.ops.fast import fast_score_map, detect_grid_features
from vio_msckf_tpu.ops.fast_pallas import fast_score_map_pallas
from vio_msckf_tpu.ops.klt import prepare_pyramid, pyramidal_lk, lk_verify
from vio_msckf_tpu.ops.pyramid import build_pyramid


def build(cfg, seed=4):
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
    return dict(
        cam0_img=cam0, cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    ), n


def timed(run, carry, frames, n, name, reps=3):
    out = run(carry, frames)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = run(carry, frames)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best*1e3:8.1f} ms ({best*1e3/n:6.2f} ms/frame)",
          flush=True)


def main():
    cfg = euroc_config()
    fe = cfg.frontend
    tracker = StereoTracker(cfg)
    frames, n = build(cfg)
    T = fe.max_tracks
    lv = fe.lk_pyramid_levels

    # Fixed point set rides in the carry so LK has realistic work.
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(
        rng.uniform((20, 20), (730, 460), size=(T, 2)), jnp.float32
    )

    def v_pyr(ts, fr):
        """pyramids only"""
        p0 = prepare_pyramid(build_pyramid(fr["cam0_img"], lv))
        p1 = prepare_pyramid(build_pyramid(fr["cam1_img"], lv))
        return ts, p0.flats[0][0, 0] + p1.flats[0][0, 0]

    def v_lk1(ts, fr):
        """pyramids + temporal LK (prev = same-frame cam0 proxy)"""
        p0 = prepare_pyramid(build_pyramid(fr["cam0_img"], lv))
        p1 = prepare_pyramid(build_pyramid(fr["cam1_img"], lv))
        pts, st, _ = pyramidal_lk(p0, p1, pts0, pts0,
                                  fe.lk_patch_size, fe.lk_max_iteration,
                                  fe.lk_track_precision)
        return ts, pts.sum() + st.sum()

    def v_lk2(ts, fr):
        """pyramids + 2 LK passes + merged verify"""
        p0 = prepare_pyramid(build_pyramid(fr["cam0_img"], lv))
        p1 = prepare_pyramid(build_pyramid(fr["cam1_img"], lv))
        pts, st, _ = pyramidal_lk(p0, p1, pts0, pts0,
                                  fe.lk_patch_size, fe.lk_max_iteration,
                                  fe.lk_track_precision)
        C = cfg.grid_num * fe.grid_max_feature_num
        sm_pts = jnp.concatenate(
            [pts, pts0[:C] if C <= T else jnp.tile(pts0, (2, 1))[:C]]
        )
        sm1, st2, _ = pyramidal_lk(p0, p1, sm_pts, sm_pts,
                                   fe.lk_patch_size, fe.lk_max_iteration,
                                   fe.lk_track_precision)
        (tb, tbs, _), (sb, sbs, _) = lk_verify(
            p0, p1, p1, p0, pts, pts0, sm1, sm_pts,
            fe.lk_patch_size, fe.lk_max_iteration, fe.lk_track_precision,
        )
        return ts, tb.sum() + sb.sum()

    def v_fast_pallas(ts, fr):
        score = fast_score_map_pallas(fr["cam0_img"], fe.fast_threshold)
        xy, resp, valid = detect_grid_features(
            score, score < 1e9, fe.grid_row, fe.grid_col,
            fe.grid_max_feature_num,
        )
        return ts, xy.sum() + resp.sum()

    def v_fast_xla(ts, fr):
        score = fast_score_map(fr["cam0_img"], fe.fast_threshold)
        xy, resp, valid = detect_grid_features(
            score, score < 1e9, fe.grid_row, fe.grid_col,
            fe.grid_max_feature_num,
        )
        return ts, xy.sum() + resp.sum()

    def v_full(ts, fr):
        ts, msg = tracker.step(ts, fr["cam0_img"], fr["cam1_img"],
                               fr["imu_gyro"], fr["imu_dt"],
                               fr["imu_valid"])
        return ts, msg["feat_obs"].sum()

    variants = [
        ("pyramids x2", v_pyr, 0.0),
        ("+ temporal LK", v_lk1, 0.0),
        ("+ stereo LK + verify", v_lk2, 0.0),
        ("fast(pallas)+detect", v_fast_pallas, 0.0),
        ("fast(xla)+detect", v_fast_xla, 0.0),
    ]

    for name, fn, carry0 in variants:
        scan = lambda c, f, fn=fn: jax.lax.scan(fn, c, f)
        run_u = jax.jit(scan)
        timed(run_u, jnp.float32(0), frames, n, f"unvmapped {name}")
        run_v = jax.jit(jax.vmap(scan))
        fr1 = jax.tree_util.tree_map(lambda x: x[None], frames)
        timed(run_v, jnp.zeros((1,), jnp.float32), fr1, n,
              f"vmap(B=1)  {name}")

    # Full tracker (real state carry).
    def scan_full(ts, f):
        return jax.lax.scan(v_full, ts, f)
    run_u = jax.jit(scan_full)
    timed(run_u, tracker.init(), frames, n, "unvmapped full tracker")
    run_v = jax.jit(jax.vmap(scan_full))
    ts_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[tracker.init()]
    )
    fr1 = jax.tree_util.tree_map(lambda x: x[None], frames)
    timed(run_v, ts_b, fr1, n, "vmap(B=1)  full tracker")


if __name__ == "__main__":
    main()
