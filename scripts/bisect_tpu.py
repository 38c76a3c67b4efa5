"""Bisect the round-1 TPU device fault: run each engine stage alone on the
real chip and find which one faults. Usage: python scripts/bisect_tpu.py STAGE
where STAGE in {fast, lk, tracker, filter, step, scan}.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_images(cfg, n=4, seed=0):
    rng = np.random.default_rng(seed)
    w, h = cfg.cam0.resolution
    imgs = rng.integers(0, 255, size=(n, h, w)).astype(np.float32)
    return jnp.asarray(imgs)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "scan"
    from vio_msckf_tpu.config import euroc_config
    cfg = euroc_config()
    log("devices:", jax.devices(), "stage:", stage)

    if stage == "fast":
        from vio_msckf_tpu.ops.fast import fast_score_map, detect_grid_features
        img = make_images(cfg, 1)[0]
        f = jax.jit(lambda im: detect_grid_features(
            fast_score_map(im, 10.0), jnp.ones_like(im, bool), 4, 5, 5))
        out = f(img)
        jax.block_until_ready(out)
        log("fast ok", [o.shape for o in out])

    elif stage == "lk":
        from vio_msckf_tpu.ops.klt import pyramidal_lk
        from vio_msckf_tpu.ops.pyramid import build_pyramid
        imgs = make_images(cfg, 2)
        pyr0 = tuple(build_pyramid(imgs[0], 3))
        pyr1 = tuple(build_pyramid(imgs[1], 3))
        pts = jnp.asarray(
            np.random.default_rng(1).uniform(30, 400, size=(128, 2)),
            jnp.float32)
        f = jax.jit(lambda a, b, p: pyramidal_lk(a, b, p, p, 15, 30, 0.01))
        out = f(pyr0, pyr1, pts)
        jax.block_until_ready(out)
        log("lk ok", out[1].sum())

    elif stage == "mask":
        # the occupancy-mask scan in isolation
        fe = cfg.frontend
        h, wdt = 480, 752
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(wdt)[None, :]
        pts = jnp.asarray(
            np.random.default_rng(1).uniform(0, 400, size=(128, 2)),
            jnp.float32)
        valid = jnp.ones(128, bool)

        def occupy(mask, pv):
            pt, v = pv
            near = (jnp.abs(yy - pt[1]) <= fe.mask_radius) & \
                   (jnp.abs(xx - pt[0]) <= fe.mask_radius)
            return jnp.where(v, mask & ~near, mask), None

        f = jax.jit(lambda p, v: jax.lax.scan(
            occupy, jnp.ones((h, wdt), bool), (p, v))[0])
        out = f(pts, valid)
        jax.block_until_ready(out)
        log("mask ok", out.sum())

    elif stage == "tracker":
        from vio_msckf_tpu.frontend.tracker import StereoTracker
        tr = StereoTracker(cfg)
        imgs = make_images(cfg, 4)
        M = cfg.filter.imu_per_frame
        gyro = jnp.zeros((M, 3)); acc = jnp.zeros((M, 3))
        dt = jnp.full((M,), 0.005); vd = jnp.ones((M,), bool)
        st = tr.init()
        f = jax.jit(tr.step)
        for i in range(3):
            st, msg = f(st, imgs[i], imgs[i + 1], gyro, dt, vd)
            jax.block_until_ready(msg["feat_obs"])
            log(f"tracker frame {i} ok, valid={int(msg['feat_valid'].sum())}")

    elif stage == "filter":
        from vio_msckf_tpu.filter.msckf import MSCKF
        kf = MSCKF(cfg)
        state, fmap = kf.init()
        M = cfg.filter.imu_per_frame
        T = cfg.frontend.max_tracks
        rng = np.random.default_rng(2)
        f = jax.jit(kf.step)
        for i in range(5):
            frame = dict(
                imu_gyro=jnp.asarray(rng.normal(0, 0.01, (M, 3)), jnp.float32),
                imu_acc=jnp.asarray(
                    rng.normal(0, 0.01, (M, 3)) + np.array([0, 0, 9.81]),
                    jnp.float32),
                imu_dt=jnp.full((M,), 0.005),
                imu_valid=jnp.ones((M,), bool),
                feat_ids=jnp.arange(T, dtype=jnp.int32),
                feat_obs=jnp.asarray(rng.normal(0, 0.2, (T, 4)), jnp.float32),
                feat_valid=jnp.ones((T,), bool),
            )
            (state, fmap), out = f((state, fmap), frame)
            jax.block_until_ready(out.p)
            log(f"filter frame {i} ok p={np.asarray(out.p)}")

    elif stage == "step":
        from vio_msckf_tpu.engine import VIOEngine
        eng = VIOEngine(cfg)
        carry = eng.init()
        imgs = make_images(cfg, 6)
        M = cfg.filter.imu_per_frame
        f = jax.jit(eng.step)
        for i in range(5):
            frame = dict(
                cam0_img=imgs[i], cam1_img=imgs[i + 1],
                imu_gyro=jnp.zeros((M, 3)),
                imu_acc=jnp.tile(jnp.asarray([0., 0., 9.81]), (M, 1)),
                imu_dt=jnp.full((M,), 0.005), imu_valid=jnp.ones((M,), bool),
            )
            t0 = time.time()
            carry, out = f(carry, frame)
            jax.block_until_ready(out.p)
            log(f"step {i} ok in {time.time()-t0:.2f}s")

    elif stage == "scan":
        from vio_msckf_tpu.engine import VIOEngine
        eng = VIOEngine(cfg)
        carry = eng.init()
        N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        M = cfg.filter.imu_per_frame
        rng = np.random.default_rng(3)
        w, h = cfg.cam0.resolution
        frames = dict(
            cam0_img=jnp.asarray(
                rng.integers(0, 255, (N, h, w)), jnp.float32),
            cam1_img=jnp.asarray(
                rng.integers(0, 255, (N, h, w)), jnp.float32),
            imu_gyro=jnp.zeros((N, M, 3)),
            imu_acc=jnp.tile(jnp.asarray([0., 0., 9.81]), (N, M, 1)),
            imu_dt=jnp.full((N, M), 0.005),
            imu_valid=jnp.ones((N, M), bool),
        )
        run = jax.jit(eng.run_sequence)
        t0 = time.time()
        carry, outs = run(carry, frames)
        jax.block_until_ready(outs.p)
        log(f"scan({N}) ok in {time.time()-t0:.2f}s")

    log("DONE", stage)


if __name__ == "__main__":
    main()
