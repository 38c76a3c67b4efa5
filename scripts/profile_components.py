"""On-chip component timing for the bench workload: tracker vs filter vs
sub-stages, using the cached diag workload (scripts/diag_divergence.py).

Each component is timed as its own jit over the scanned sequence so the
numbers add up to (roughly) the full pipeline cost.
"""

import argparse
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best*1000:9.1f} ms total  "
          f"({best*1000/220:6.2f} ms/frame)")
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vio_msckf_tpu.frontend.tracker import StereoTracker
    from vio_msckf_tpu.filter.msckf import MSCKF
    from vio_msckf_tpu.engine import VIOEngine
    from diag_divergence import build_workload

    cfg, data = build_workload()
    n = len(data["imu_dt"])
    print(f"{n} frames, device={jax.devices()[0]}")

    frames = dict(
        cam0_img=jnp.asarray(data["cam0"], jnp.float32),
        cam1_img=jnp.asarray(data["cam1"], jnp.float32),
        imu_gyro=jnp.asarray(data["imu_gyro"], jnp.float32),
        imu_acc=jnp.asarray(data["imu_acc"], jnp.float32),
        imu_dt=jnp.asarray(data["imu_dt"], jnp.float32),
        imu_valid=jnp.asarray(data["imu_valid"]),
    )

    # --- full engine ---
    eng = VIOEngine(cfg)
    carry0 = eng.init(data["q0"], data["bg0"], data["gravity"])
    run = jax.jit(eng.run_sequence)
    carry0 = jax.tree_util.tree_map(jnp.asarray, carry0)
    (_, outs), t_full = timeit(run, carry0, frames, name="full engine")
    print(f"  -> {n/t_full:.1f} fps")

    # --- tracker only ---
    tracker = StereoTracker(cfg)

    def run_tracker(ts, frames):
        def step(ts, fr):
            ts, msg = tracker.step(
                ts, fr["cam0_img"], fr["cam1_img"],
                fr["imu_gyro"], fr["imu_dt"], fr["imu_valid"],
            )
            return ts, msg
        return jax.lax.scan(step, ts, frames)

    ts0 = tracker.init()
    tf = {k: frames[k] for k in
          ("cam0_img", "cam1_img", "imu_gyro", "imu_dt", "imu_valid")}
    (ts1, msgs), t_trk = timeit(
        jax.jit(run_tracker), ts0, tf, name="tracker only")

    # --- filter only (on the tracker's recorded messages) ---
    kf = MSCKF(cfg)
    state0, fmap0 = kf.init(data["q0"], data["bg0"], data["gravity"])

    kfr = dict(
        imu_gyro=frames["imu_gyro"], imu_acc=frames["imu_acc"],
        imu_dt=frames["imu_dt"], imu_valid=frames["imu_valid"],
        feat_ids=msgs["feat_ids"], feat_obs=msgs["feat_obs"],
        feat_valid=msgs["feat_valid"],
    )
    run_kf = jax.jit(lambda c, f: jax.lax.scan(kf.step, c, f))
    _, t_kf = timeit(run_kf, (state0, fmap0), kfr, name="filter only")

    print(f"\ntracker {t_trk*1000/n:.2f} + filter {t_kf*1000/n:.2f} = "
          f"{(t_trk+t_kf)*1000/n:.2f} ms/frame vs full "
          f"{t_full*1000/n:.2f} ms/frame")


if __name__ == "__main__":
    main()
