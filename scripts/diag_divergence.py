"""Divergence bisect harness (VERDICT r2 task 1).

Renders the 12 s demo workload once, caches it to /tmp, then replays the
pipeline frame by frame with configurable knobs so the first-prune
divergence (frame 20-21) can be localized:

  --filter-f64      run the MSCKF back-end in float64 (tracker stays f32)
  --gt-features     bypass the tracker: feed the filter noise-free
                    projected simulator features (isolates back-end)
  --frames N        stop after N frames

Per-frame log: position error, max position sigma, n_clones, did_reset.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/vio_diag_demo12.npz"


def build_workload():
    import jax
    import jax.numpy as jnp
    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.data.simulator import SimConfig, simulate_sequence, \
        bundle_frames
    from vio_msckf_tpu.data.render import render_sequence

    cfg = euroc_config()
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return cfg, {k: z[k] for k in z.files}

    sim = SimConfig(duration=12.0, seed=4, amp=(1.5, 1.0, 0.5),
                    yaw_rate=0.2, wobble_amp=0.1)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7)
    data = dict(
        cam0=np.asarray(cam0), cam1=np.asarray(cam1),
        imu_gyro=frames["imu_gyro"], imu_acc=frames["imu_acc"],
        imu_dt=frames["imu_dt"], imu_valid=frames["imu_valid"],
        gt_p=p_stack, gt_R_i_w=seq["gt_R_i_w"][first:first + n],
        q0=init["q0"], bg0=init["bg0"], gravity=init["gravity"],
        landmarks=seq.get("landmarks", np.zeros((0, 3))),
    )
    np.savez_compressed(CACHE, **data)
    return cfg, data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter-f64", action="store_true")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--dump-prune", action="store_true",
                    help="save the (M, m, P) of the first prune update")
    args = ap.parse_args()

    import jax
    # jax is pre-imported at interpreter startup in this image; env vars
    # (JAX_PLATFORMS) are too late — force CPU through the config object.
    jax.config.update("jax_platforms", "cpu")
    if args.filter_f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.frontend.tracker import StereoTracker
    from vio_msckf_tpu.filter.msckf import MSCKF

    cfg, data = build_workload()
    n = min(args.frames, len(data["imu_dt"]))
    dtype = jnp.float64 if args.filter_f64 else jnp.float32

    tracker = StereoTracker(cfg)
    kf = MSCKF(cfg, dtype=dtype)
    ts = tracker.init()
    state, fmap = kf.init(data["q0"], data["bg0"], data["gravity"])

    tstep = jax.jit(tracker.step)
    kstep = jax.jit(kf.step)

    for k in range(n):
        ts, msg = tstep(
            ts,
            jnp.asarray(data["cam0"][k], jnp.float32),
            jnp.asarray(data["cam1"][k], jnp.float32),
            jnp.asarray(data["imu_gyro"][k], jnp.float32),
            jnp.asarray(data["imu_dt"][k], jnp.float32),
            jnp.asarray(data["imu_valid"][k]),
        )
        kf_frame = dict(
            imu_gyro=jnp.asarray(data["imu_gyro"][k], dtype),
            imu_acc=jnp.asarray(data["imu_acc"][k], dtype),
            imu_dt=jnp.asarray(data["imu_dt"][k], dtype),
            imu_valid=jnp.asarray(data["imu_valid"][k]),
            feat_ids=msg["feat_ids"],
            feat_obs=msg["feat_obs"].astype(dtype),
            feat_valid=msg["feat_valid"],
        )
        (state, fmap), out = kstep((state, fmap), kf_frame)
        p = np.asarray(out.p)
        err = np.linalg.norm(p - data["gt_p"][k])
        sig = float(np.max(np.asarray(out.position_std)))
        print(f"frame {k:3d}  err {err:12.4f} m  max_pos_sigma {sig:10.4f} "
              f"n_clones {int(state.n_clones):2d}  reset {bool(out.did_reset)}  "
              f"n_feat {int(np.sum(np.asarray(fmap.valid)))}")


if __name__ == "__main__":
    main()
