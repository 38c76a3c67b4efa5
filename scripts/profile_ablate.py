"""Stage-level ablation timing on the real 220-frame scanned workload.

Each variant compiles a scan whose per-frame step runs only a subset of the
filter/tracker stages; the deltas between variants give trustworthy on-chip
per-stage costs (single dispatch per 220 frames — immune to the tunnel's
~25 ms per-dispatch noise that poisons micro-benchmarks here).
"""

import sys
import os
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

from vio_msckf_tpu.filter.msckf import MSCKF
from vio_msckf_tpu.filter.propagation import propagate
from vio_msckf_tpu.filter.augmentation import augment
from vio_msckf_tpu.filter.features import add_observations
from vio_msckf_tpu.filter import msckf as M
from vio_msckf_tpu.filter.pruning import maybe_prune
from vio_msckf_tpu.frontend.tracker import StereoTracker
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

    frames = dict(
        cam0_img=jnp.asarray(data["cam0"], jnp.float32),
        cam1_img=jnp.asarray(data["cam1"], jnp.float32),
        imu_gyro=jnp.asarray(data["imu_gyro"], jnp.float32),
        imu_acc=jnp.asarray(data["imu_acc"], jnp.float32),
        imu_dt=jnp.asarray(data["imu_dt"], jnp.float32),
        imu_valid=jnp.asarray(data["imu_valid"]),
    )

    # Tracker messages for the filter-side ablations.
    tracker = StereoTracker(cfg)

    def tstep(ts, fr):
        return tracker.step(ts, fr["cam0_img"], fr["cam1_img"],
                            fr["imu_gyro"], fr["imu_dt"], fr["imu_valid"])

    tf = {k: frames[k] for k in
          ("cam0_img", "cam1_img", "imu_gyro", "imu_dt", "imu_valid")}
    ts0 = tracker.init()
    _, msgs = jax.jit(lambda c, f: jax.lax.scan(tstep, c, f))(ts0, tf)
    jax.block_until_ready(msgs)

    kf = MSCKF(cfg)
    params = kf.params
    state0, fmap0 = kf.init(data["q0"], data["bg0"], data["gravity"])
    kfr = dict(
        imu_gyro=frames["imu_gyro"], imu_acc=frames["imu_acc"],
        imu_dt=frames["imu_dt"], imu_valid=frames["imu_valid"],
        feat_ids=msgs["feat_ids"], feat_obs=msgs["feat_obs"],
        feat_valid=msgs["feat_valid"],
    )

    def mk(stages):
        def step(carry, frame):
            state, fmap = carry
            with jax.default_matmul_precision("highest"):
                if "prop" in stages:
                    state = propagate(
                        state, params, frame["imu_gyro"], frame["imu_acc"],
                        frame["imu_dt"], frame["imu_valid"])
                if "aug" in stages:
                    state = augment(state)
                if "obs" in stages:
                    fmap, tr = add_observations(
                        fmap, frame["feat_ids"], frame["feat_obs"],
                        frame["feat_valid"], cur_slot=state.n_clones - 1)
                    state = state.replace(tracking_rate=tr)
                if "lost" in stages:
                    state, fmap, _ = M.remove_lost_features(state, fmap, params)
                if "prune" in stages:
                    state, fmap = maybe_prune(state, fmap, params)
            return (state, fmap), state.p
        return step

    variants = [
        ("prop only", {"prop"}),
        ("prop+aug+obs", {"prop", "aug", "obs"}),
        ("prop+aug+obs+lost", {"prop", "aug", "obs", "lost"}),
        ("full filter (+prune)", {"prop", "aug", "obs", "lost", "prune"}),
    ]
    for name, st in variants:
        timed_scan(mk(st), (state0, fmap0), kfr, n, name)

    # ---- inner split of the lost path ----
    from vio_msckf_tpu.filter.triangulation import (
        triangulate_all, check_motion_one,
    )
    from vio_msckf_tpu.filter.update import stack_update, qr_update

    def mk_lost(depth):
        def step(carry, frame):
            state, fmap = carry
            with jax.default_matmul_precision("highest"):
                state = propagate(
                    state, params, frame["imu_gyro"], frame["imu_acc"],
                    frame["imu_dt"], frame["imu_valid"])
                state = augment(state)
                fmap, tr = add_observations(
                    fmap, frame["feat_ids"], frame["feat_obs"],
                    frame["feat_valid"], cur_slot=state.n_clones - 1)
                state = state.replace(tracking_rate=tr)
                cfgf = params.config
                positions, tri_ok = triangulate_all(
                    fmap.obs, fmap.obs_valid, state.clone_q, state.clone_p,
                    params.R_cam0_cam1, params.t_cam0_cam1,
                    cfgf.triangulation)
                acc = jnp.sum(positions) + jnp.sum(tri_ok)
                if depth >= 2:
                    motion_ok = jax.vmap(
                        lambda o, ov: check_motion_one(
                            o, ov, state.clone_q, state.clone_p,
                            cfgf.triangulation.translation_threshold)
                    )(fmap.obs, fmap.obs_valid)
                    n_obs = jnp.sum(fmap.obs_valid, axis=1)
                    process = fmap.valid & (n_obs >= 3) & motion_ok & tri_ok
                    Fn, Nn = fmap.obs_valid.shape
                    slots = jnp.tile(
                        jnp.arange(Nn, dtype=jnp.int32)[None], (Fn, 1))
                    Hc, rc, inc = stack_update(
                        state, params, positions=positions, obs=fmap.obs,
                        use_masks=fmap.obs_valid, clone_slots=slots,
                        process_mask=process,
                        dofs=n_obs - 1)
                    acc = acc + jnp.sum(Hc) + jnp.sum(rc)
                if depth >= 3:
                    state = qr_update(state, Hc, rc, params)
            return (state, fmap), acc
        return step

    timed_scan(mk_lost(1), (state0, fmap0), kfr, n, "base+triangulate only")
    timed_scan(mk_lost(2), (state0, fmap0), kfr, n, "base+tri+stack(sys+gamma)")
    timed_scan(mk_lost(3), (state0, fmap0), kfr, n, "base+tri+stack+qr_update")

    # ---- inner split of stack_update: system build vs gamma solve ----
    from vio_msckf_tpu.filter.update import feature_system, feature_gamma

    def mk_sys(with_gamma):
        def step(carry, frame):
            state, fmap = carry
            with jax.default_matmul_precision("highest"):
                state = propagate(
                    state, params, frame["imu_gyro"], frame["imu_acc"],
                    frame["imu_dt"], frame["imu_valid"])
                state = augment(state)
                fmap, tr = add_observations(
                    fmap, frame["feat_ids"], frame["feat_obs"],
                    frame["feat_valid"], cur_slot=state.n_clones - 1)
                state = state.replace(tracking_rate=tr)
                positions = fmap.position + 1.0

                Nn = fmap.obs_valid.shape[1]
                slots1 = jnp.arange(Nn, dtype=jnp.int32)

                def one(p_w, ob, um):
                    H, Hp, r, rp, U = feature_system(
                        p_w, ob, um, slots1, state, params)
                    if with_gamma:
                        g = feature_gamma(H, rp, U, state.P,
                                          params.observation_noise)
                    else:
                        g = jnp.sum(Hp) + jnp.sum(U)
                    return g
                gs = jax.vmap(one)(positions, fmap.obs, fmap.obs_valid)
            return (state, fmap), jnp.sum(gs)
        return step

    timed_scan(mk_sys(False), (state0, fmap0), kfr, n,
               "base+feature_system only")
    timed_scan(mk_sys(True), (state0, fmap0), kfr, n,
               "base+feature_system+gamma")


if __name__ == "__main__":
    main()
