"""Tracker stage ablation on the real 220-frame scanned workload."""

import sys
import os
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
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.frontend.tracker import StereoTracker
from vio_msckf_tpu.ops.fast import fast_score_map, detect_grid_features
from vio_msckf_tpu.ops.klt import prepare_pyramid, pyramidal_lk
from vio_msckf_tpu.ops.pyramid import build_pyramid
from diag_divergence import build_workload


def timed_scan(step, carry, frames, n, name, reps=3):
    run = jax.jit(lambda c, f: jax.lax.scan(step, c, f))
    out = run(carry, frames)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = run(carry, frames)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e3:8.1f} ms  ({best*1e3/n:6.2f} ms/frame)")
    return best


def main():
    cfg, data = build_workload()
    n = len(data["imu_dt"])
    print("device:", jax.devices()[0])
    fe = cfg.frontend
    tracker = StereoTracker(cfg)

    frames = dict(
        cam0_img=jnp.asarray(data["cam0"], jnp.float32),
        cam1_img=jnp.asarray(data["cam1"], jnp.float32),
    )
    T = fe.max_tracks
    pts0 = jnp.asarray(
        np.random.default_rng(0).uniform(60, 400, (T, 2)), jnp.float32)

    def mk(n_lk, with_detect, with_pyr=True):
        def step(carry, fr):
            pts = carry
            out = jnp.zeros((), jnp.float32)
            if with_pyr:
                pyr0_2d = build_pyramid(fr["cam0_img"], fe.lk_pyramid_levels)
                pyr0 = prepare_pyramid(pyr0_2d)
                pyr1 = prepare_pyramid(
                    build_pyramid(fr["cam1_img"], fe.lk_pyramid_levels))
                # touch every level so nothing is DCE'd
                out = out + sum(jnp.sum(f[::64, ::64]) for f in pyr0.flats) \
                    + sum(jnp.sum(f[::64, ::64]) for f in pyr1.flats)
            if with_detect:
                score = fast_score_map(pyr0_2d[0], fe.fast_threshold)
                xy, resp, v = detect_grid_features(
                    score, score > -1, tracker.grid_row, tracker.grid_col,
                    fe.grid_max_feature_num)
                out = out + jnp.sum(xy) + jnp.sum(resp) + jnp.sum(v)
            p = pts
            for i in range(n_lk):
                a, b = (pyr0, pyr1) if i % 2 == 0 else (pyr1, pyr0)
                p, st, err = pyramidal_lk(
                    a, b, p, p, fe.lk_patch_size, fe.lk_max_iteration,
                    fe.lk_track_precision)
                p = jnp.clip(p, 0, 400)
            out = out + jnp.sum(p)
            return pts, out
        return step

    timed_scan(mk(0, False), pts0, frames, n, "pyramids only (x2)")
    timed_scan(mk(0, True), pts0, frames, n, "pyramids+fast+detect")
    timed_scan(mk(1, True), pts0, frames, n, "pyr+fast+1 LK")
    timed_scan(mk(2, True), pts0, frames, n, "pyr+fast+2 LK")

    # --- the "other" pieces ---
    from vio_msckf_tpu.ops.distortion import undistort_points
    from vio_msckf_tpu.ops.klt import lk_verify
    cam0 = cfg.cam0
    C = tracker.grid_row * tracker.grid_col * fe.grid_max_feature_num
    big = jnp.asarray(
        np.random.default_rng(1).uniform(60, 400, (T + C, 2)), jnp.float32)

    def mk_extra(kind):
        def step(carry, fr):
            pts = carry
            out = jnp.zeros((), jnp.float32)
            if kind == "undistort4":
                for _ in range(4):
                    u = undistort_points(
                        big, cam0.intrinsics, cam0.distortion_model,
                        cam0.distortion_coeffs)
                    out = out + jnp.sum(u) + jnp.sum(fr["cam0_img"][0, :8])
            elif kind == "rank2":
                codes = tracker._cell_code(big)
                pr = big[:, 0]
                for _ in range(2):
                    r = tracker._rank_in_cell(
                        codes, pr, big[:, 1] > 0, 20)
                    out = out + jnp.sum(r) + jnp.sum(fr["cam0_img"][0, :8])
            elif kind == "verify":
                pyr0_2d = build_pyramid(fr["cam0_img"], fe.lk_pyramid_levels)
                pyr0 = prepare_pyramid(pyr0_2d)
                pyr1 = prepare_pyramid(
                    build_pyramid(fr["cam1_img"], fe.lk_pyramid_levels))
                (a, sa, _), (b, sb, _) = lk_verify(
                    pyr0, pyr1, pyr1, pyr0,
                    pts, pts, big, big,
                    fe.lk_patch_size, fe.lk_max_iteration,
                    fe.lk_track_precision)
                out = out + jnp.sum(a) + jnp.sum(b)
            return pts, out
        return step

    timed_scan(mk_extra("undistort4"), pts0, frames, n, "undistort x4 (356 pts)")
    timed_scan(mk_extra("rank2"), pts0, frames, n, "rank_in_cell x2 (356)")
    timed_scan(mk_extra("verify"), pts0, frames, n, "merged verify pass")

    # full tracker for reference
    def tstep(ts, fr):
        return tracker.step(
            ts, fr["cam0_img"], fr["cam1_img"],
            jnp.zeros((16, 3), jnp.float32), jnp.full((16,), 0.005,
                                                      jnp.float32),
            jnp.ones((16,), bool))
    timed_scan(tstep, tracker.init(), frames, n, "full tracker")


if __name__ == "__main__":
    main()
