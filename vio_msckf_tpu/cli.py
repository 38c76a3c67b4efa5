"""Command-line VIO driver (the reference's L5/L4 layer, MSCKF/vio.py:69-108,
rebuilt around the jitted engine).

    python -m vio_msckf_tpu --path /data/MH_01_easy            # EuRoC run
    python -m vio_msckf_tpu --demo                             # synthetic
    python -m vio_msckf_tpu --path ... --pipeline eskf         # 2nd pipeline
    python -m vio_msckf_tpu --path ... --view                  # live viewer

Differences from the reference by design: no publisher/consumer threads or
queues — frames stream through a native prefetch ring straight into one
compiled step; real-time pacing (`--ratio`, reference vio.py:100) is an
optional replay mode rather than the execution model. Adds what the
reference lacks: trajectory output (TUM format), ATE/RPE against ground
truth, checkpoints, per-stage timing, jax profiler traces.
"""

import argparse
import os
import sys
import time

import numpy as np


def _rot_to_hamilton_xyzw(R):
    """Rotation MATRIX (body->world) -> Hamilton xyzw quaternion (TUM)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def write_tum(path, times, positions, rotations_w_b):
    """TUM trajectory: t x y z qx qy qz qw (body->world)."""
    with open(path, "w") as f:
        for t, p, R in zip(times, positions, rotations_w_b):
            q = _rot_to_hamilton_xyzw(R)
            f.write(
                f"{t:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
            )


def build_parser():
    ap = argparse.ArgumentParser(
        "vio_msckf_tpu", description="TPU-native stereo MSCKF / ESKF VIO"
    )
    ap.add_argument("--path", help="EuRoC sequence dir (contains mav0/)")
    ap.add_argument("--demo", action="store_true",
                    help="run on the synthetic rendered world (no dataset)")
    ap.add_argument("--pipeline", choices=["msckf", "eskf"],
                    default="msckf")
    ap.add_argument("--offset", type=float, default=40.0,
                    help="start offset seconds (reference vio.py:88)")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--ratio", type=float, default=0.0,
                    help="real-time replay rate (0 = as fast as possible; "
                         "the reference ships 0.4, vio.py:100)")
    ap.add_argument("--chunk", type=int, default=32,
                    help="frames per scanned dispatch on the dataset path "
                         "(headless as-fast-as-possible mode only)")
    ap.add_argument("--preload", action="store_true",
                    help="stage the whole decoded sequence on device, then "
                         "run ONE scan dispatch (steady-state throughput; "
                         "reports load and compute separately)")
    ap.add_argument("--view", action="store_true",
                    help="live viewer process -> vio_live.png")
    ap.add_argument("--out", default=None,
                    help="write estimated trajectory (TUM format)")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint file to write")
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--resume", default=None,
                    help="checkpoint file to resume from")
    ap.add_argument("--profile", default=None,
                    help="jax profiler trace directory")
    ap.add_argument("--demo-duration", type=float, default=12.0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu). Note: the "
                    "JAX_PLATFORMS env var is ignored in images where jax "
                    "is pre-imported at interpreter startup; this flag "
                    "goes through jax.config and always works")
    ap.add_argument("--compile-cache", default=None,
                    help="persistent XLA compile-cache directory")
    return ap


def run_msckf_euroc(args, log):
    import jax
    import jax.numpy as jnp

    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.engine import VIOEngine
    from vio_msckf_tpu.data.euroc import EuRoCSequence, bundle_euroc_frames
    from vio_msckf_tpu.runtime import native_loader
    from vio_msckf_tpu.utils.metrics import ate_rmse, rpe_rmse
    from vio_msckf_tpu.utils.checkpoint import save_checkpoint, \
        load_checkpoint
    from vio_msckf_tpu.utils.logging import StageTimer, maybe_profile

    cfg = euroc_config()
    seq = EuRoCSequence(args.path, start_offset=args.offset)
    frames, init, first, frame_times = bundle_euroc_frames(
        seq, cfg, max_frames=args.max_frames
    )
    n = len(frame_times)
    log.info("sequence: %d frames after offset", n)

    eng = VIOEngine(cfg)
    carry = eng.init(init["q0"], init["bg0"], init["gravity"])
    start_k = 0
    if args.resume:
        carry, start_k, _ = load_checkpoint(args.resume, carry)
        log.info("resumed from %s at frame %d", args.resume, start_k)
    step = jax.jit(eng.step)

    cam0_paths = [seq.cam0_files[seq._cam_from + first + k]
                  for k in range(n)]
    cam1_paths = [seq.cam1_files[seq._cam_from + first + k]
                  for k in range(n)]
    W, H = cfg.cam0.resolution

    def make_loader(paths, skip):
        if native_loader.available():
            it = iter(native_loader.PrefetchingLoader(paths[skip:], W, H))
            return lambda k: next(it)[1]
        from vio_msckf_tpu.data.euroc import load_png_gray
        return lambda k: load_png_gray(paths[k])

    load0 = make_loader(cam0_paths, start_k)
    load1 = make_loader(cam1_paths, start_k)

    viewer = None
    if args.view:
        from vio_msckf_tpu.viewer import Viewer
        viewer = Viewer()

    # As-fast-as-possible headless runs take the CHUNKED path: the C++
    # prefetch ring feeds CHUNK-frame bundles that run as ONE lax.scan
    # dispatch, with the next chunk decoded + device_put while the current
    # chunk computes (double buffering). With ~25 ms of tunnel latency per
    # dispatch (PROFILE.md), per-frame stepping is dispatch-bound at
    # ~40 fps no matter how fast the chip is; chunking amortizes the
    # latency across CHUNK frames (SURVEY.md section 2.4(c) — this is the
    # device-feeding design the reference's publisher threads approximate,
    # MSCKF/dataset.py:226-271). Real-time replay (--ratio) and the live
    # viewer step per frame by their nature.
    chunked = args.ratio <= 0 and viewer is None
    if args.preload and not chunked:
        log.warning(
            "--preload is ignored with --ratio > 0 or --view (those modes "
            "step per frame by their nature)"
        )
    if chunked and args.preload:
        # Whole-sequence staging: decode everything, ONE H2D, ONE scan
        # dispatch, ONE fetch. On production hardware (PCIe/ICI host) the
        # staging is negligible and the chunked path matches this; over
        # the axon tunnel (~8-90 MB/s H2D) staging dominates wall clock,
        # so load and compute are reported separately.
        t0 = time.time()
        frames_np = dict(
            cam0_img=np.stack([load0(k) for k in range(start_k, n)]),
            cam1_img=np.stack([load1(k) for k in range(start_k, n)]),
            imu_gyro=frames["imu_gyro"][start_k:n],
            imu_acc=frames["imu_acc"][start_k:n],
            imu_dt=frames["imu_dt"][start_k:n],
            imu_valid=frames["imu_valid"][start_k:n],
        )
        dev = jax.device_put(frames_np)
        jax.block_until_ready(dev)
        t_load = time.time() - t0
        run_all = jax.jit(eng.run_sequence)
        carry0_pre = jax.tree_util.tree_map(jnp.array, carry)
        t0 = time.time()
        carry, couts = run_all(carry, dev)
        jax.block_until_ready(couts.p)
        log.info("preload compile+first run: %.1fs", time.time() - t0)
        # Warm pass isolates compile from compute.
        t0 = time.time()
        carry, couts = run_all(carry0_pre, dev)
        jax.block_until_ready(couts.p)
        t_compute = time.time() - t0
        p_c, q_c, v_c, ovf_c = jax.device_get(
            (couts.p, couts.q, couts.v, couts.lost_overflow))
        outs = [(p_c[j], q_c[j], v_c[j]) for j in range(n - start_k)]
        n_done = n - start_k
        if int(np.sum(ovf_c)):
            log.warning(
                "lost-candidate overflow: %d feature updates discarded "
                "(raise FilterConfig.max_lost_candidates)",
                int(np.sum(ovf_c)))
        log.info("preload: decode+H2D %.1fs, compute %.1fs (%.1f fps)",
                 t_load, t_compute, n_done / t_compute)
        print(f"dataset_fps_compute {n_done / t_compute:.2f}")
        print(f"dataset_fps "
              f"{n_done / max(t_load + t_compute, 1e-9):.2f}")
        if args.checkpoint:
            save_checkpoint(args.checkpoint, carry, step=n)
        positions = np.stack([o[0] for o in outs])
        times = frame_times[start_k:n]
        if args.out:
            from vio_msckf_tpu.math import quat_to_rot
            Rs = [np.asarray(quat_to_rot(jnp.asarray(o[1]))).T
                  for o in outs]
            write_tum(args.out, times, positions, Rs)
        gt = seq.gt_aligned_positions(times)
        if gt is not None:
            ate = ate_rmse(positions, gt, align=True)
            rpe = rpe_rmse(positions, gt)
            log.info("ATE RMSE (SE3-aligned): %.4f m  RPE RMSE (20-frame "
                     "delta): %.4f m", ate, rpe)
            print(f"ate_rmse_m {ate:.4f}")
            print(f"rpe_rmse_m {rpe:.4f}")
        return 0

    # Clamp: a --chunk of 0/negative would divide by zero below, and a
    # chunk larger than the remaining frames just wastes compile shapes.
    CHUNK = max(1, min(args.chunk, max(n - start_k, 1)))
    # No carry donation here: eng.init() carries may alias buffers (e.g.
    # zero-filled leaves), and donating the same buffer twice is a runtime
    # error; the carry is ~1 MB, donation buys nothing.
    run_chunk = jax.jit(eng.run_sequence)

    def host_chunk(k0, m):
        # uint8 on the wire: the tunnel's H2D bandwidth bounds this path
        # (measured ~30 MB/s effective); the tracker casts on device.
        c0 = np.empty((m, H, W), np.uint8)
        c1 = np.empty((m, H, W), np.uint8)
        for j in range(m):
            c0[j] = load0(k0 + j)
            c1[j] = load1(k0 + j)
        return dict(
            cam0_img=c0, cam1_img=c1,
            imu_gyro=frames["imu_gyro"][k0:k0 + m],
            imu_acc=frames["imu_acc"][k0:k0 + m],
            imu_dt=frames["imu_dt"][k0:k0 + m],
            imu_valid=frames["imu_valid"][k0:k0 + m],
        )

    timer = StageTimer()
    outs = []
    wall0 = time.time()
    t0 = frame_times[start_k] if n else 0.0
    with maybe_profile(args.profile):
        k = start_k
        device_outs = []  # (p, q, v) device arrays; ONE fetch at the end
        overflow_dev = []  # per-chunk lost-candidate overflow counters
        if chunked:
            n_chunks = (n - start_k) // CHUNK
            if n_chunks > 0:
                with timer.stage("load"):
                    dev = jax.device_put(host_chunk(start_k, CHUNK))
            for ci in range(n_chunks):
                with timer.stage("dispatch"):
                    carry, couts = run_chunk(carry, dev)  # async dispatch
                overflow_dev.append(couts.lost_overflow)
                # Decode + upload the NEXT chunk while this one computes;
                # outputs stay ON DEVICE (every device->host fetch is a
                # full tunnel round trip that would serialize the pipe).
                if ci + 1 < n_chunks:
                    with timer.stage("load"):
                        dev = jax.device_put(
                            host_chunk(start_k + (ci + 1) * CHUNK, CHUNK)
                        )
                device_outs.append((couts.p, couts.q, couts.v))
                k = start_k + (ci + 1) * CHUNK
                if args.checkpoint and (
                    (k - start_k) // CHUNK
                ) % max(args.checkpoint_every // CHUNK, 1) == 0:
                    save_checkpoint(args.checkpoint, carry, step=k)
                    log.info("checkpoint @ frame %d -> %s", k,
                             args.checkpoint)
                if ci % 8 == 0:
                    log.info("dispatched frames %d/%d", k, n)
            # Tail frames (< CHUNK) step individually, outputs still
            # deferred.
            for kt in range(k, n):
                with timer.stage("load"):
                    img0 = load0(kt)
                    img1 = load1(kt)
                with timer.stage("dispatch"):
                    frame = dict(
                        cam0_img=jnp.asarray(img0),
                        cam1_img=jnp.asarray(img1),
                        imu_gyro=jnp.asarray(frames["imu_gyro"][kt]),
                        imu_acc=jnp.asarray(frames["imu_acc"][kt]),
                        imu_dt=jnp.asarray(frames["imu_dt"][kt]),
                        imu_valid=jnp.asarray(frames["imu_valid"][kt]),
                    )
                    carry, out = step(carry, frame)
                device_outs.append((
                    out.p[None], out.q[None], out.v[None]
                ))
            k = n
            with timer.stage("fetch"):
                fetched = jax.device_get(device_outs)
                n_overflow = int(np.sum(jax.device_get(overflow_dev))) \
                    if overflow_dev else 0
            for p_c, q_c, v_c in fetched:
                for j in range(len(p_c)):
                    outs.append((p_c[j], q_c[j], v_c[j]))
            if n_overflow:
                log.warning(
                    "lost-candidate overflow: %d feature updates discarded "
                    "(raise FilterConfig.max_lost_candidates)", n_overflow)
        # Per-frame path: replay/viewer mode.
        for k in range(k, n):
            with timer.stage("load"):
                img0 = load0(k)
                img1 = load1(k)
            if args.ratio > 0:
                # DataPublisher pacing (dataset.py:262-263)
                lag = (frame_times[k] - t0) / args.ratio - (
                    time.time() - wall0
                )
                if lag > 0:
                    time.sleep(lag)
            with timer.stage("step"):
                frame = dict(
                    cam0_img=jnp.asarray(img0),
                    cam1_img=jnp.asarray(img1),
                    imu_gyro=jnp.asarray(frames["imu_gyro"][k]),
                    imu_acc=jnp.asarray(frames["imu_acc"][k]),
                    imu_dt=jnp.asarray(frames["imu_dt"][k]),
                    imu_valid=jnp.asarray(frames["imu_valid"][k]),
                )
                carry, out = step(carry, frame)
                p = np.asarray(out.p)
            outs.append((np.asarray(out.p), np.asarray(out.q),
                         np.asarray(out.v)))
            if viewer is not None:
                viewer.update_pose(p)
                if k % 5 == 0:
                    viewer.update_image(img0)
            if args.checkpoint and (k + 1) % args.checkpoint_every == 0:
                save_checkpoint(args.checkpoint, carry, step=k + 1)
                log.info("checkpoint @ frame %d -> %s", k + 1,
                         args.checkpoint)
            if k % 100 == 0:
                log.info("frame %d/%d p=%s", k, n, np.round(p, 3))

    wall = time.time() - wall0
    n_done = n - start_k
    log.info("done: %d frames in %.1fs (%.1f fps)", n_done, wall,
             n_done / max(wall, 1e-9))
    log.info("stage timing:\n%s", timer.report())
    print(f"dataset_fps {n_done / max(wall, 1e-9):.2f}")

    if viewer is not None:
        viewer.close()
    if args.checkpoint:
        save_checkpoint(args.checkpoint, carry, step=n)

    positions = np.stack([o[0] for o in outs])
    times = frame_times[start_k:n]
    if args.out:
        from vio_msckf_tpu.math import quat_to_rot
        import jax.numpy as jnp2
        Rs = [np.asarray(quat_to_rot(jnp2.asarray(o[1]))).T for o in outs]
        write_tum(args.out, times, positions, Rs)
        log.info("trajectory -> %s", args.out)

    gt = seq.gt_aligned_positions(times)
    if gt is not None:
        ate = ate_rmse(positions, gt, align=True)
        rpe = rpe_rmse(positions, gt)
        log.info("ATE RMSE (SE3-aligned): %.4f m  RPE RMSE (20-frame "
                 "delta): %.4f m", ate, rpe)
        print(f"ate_rmse_m {ate:.4f}")
        print(f"rpe_rmse_m {rpe:.4f}")
    return 0


def run_msckf_demo(args, log):
    import jax
    import jax.numpy as jnp

    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.data.simulator import SimConfig, simulate_sequence, \
        bundle_frames
    from vio_msckf_tpu.data.render import render_sequence
    from vio_msckf_tpu.engine import VIOEngine
    from vio_msckf_tpu.utils.metrics import ate_rmse

    cfg = euroc_config()
    sim = SimConfig(duration=args.demo_duration, seed=4,
                    amp=(1.5, 1.0, 0.5), yaw_rate=0.2, wobble_amp=0.1)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7)
    log.info("rendered %d synthetic frames", n)

    eng = VIOEngine(cfg)
    carry = eng.init(init["q0"], init["bg0"], init["gravity"])
    run = jax.jit(eng.run_sequence)
    device_frames = dict(
        cam0_img=cam0, cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    )
    t0 = time.time()
    carry, outs = run(carry, device_frames)
    jax.block_until_ready(outs.p)
    wall = time.time() - t0
    est = np.asarray(outs.p)
    ate = ate_rmse(est, p_stack, align=False)
    log.info("demo: %d frames in %.1fs (compile incl.), ATE %.4f m",
             n, wall, ate)
    print(f"ate_rmse_m {ate:.4f}")
    return 0


def write_eskf_plots(prefix, times, outs, log):
    """State/covariance trace plots matching the reference's ESKF output
    (ESKF/eskf_vio.py:187-259: position, velocity, biases, gravity traces
    + covariance trace)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.asarray(times) - times[0]
    panels = [
        ("position [m]", np.stack([np.asarray(o["p"]) for o in outs]),
         ("x", "y", "z")),
        ("velocity [m/s]", np.stack([np.asarray(o["v"]) for o in outs]),
         ("x", "y", "z")),
        ("acc bias", np.stack([np.asarray(o["a_b"]) for o in outs]),
         ("x", "y", "z")),
        ("gyro bias", np.stack([np.asarray(o["w_b"]) for o in outs]),
         ("x", "y", "z")),
        ("gravity [m/s^2]", np.stack([np.asarray(o["g"]) for o in outs]),
         ("x", "y", "z")),
    ]
    fig, axes = plt.subplots(len(panels), 1, figsize=(9, 3 * len(panels)),
                             sharex=True)
    for ax, (name, data, labels) in zip(axes, panels):
        for i, lab in enumerate(labels):
            ax.plot(t, data[:, i], label=lab)
        ax.set_ylabel(name)
        ax.legend(loc="upper right", fontsize=8)
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("time [s]")
    fig.tight_layout()
    state_png = f"{prefix}_states.png"
    fig.savefig(state_png, dpi=110)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(9, 3))
    ax.plot(t, [float(o["cov_trace"]) for o in outs])
    ax.set_ylabel("trace(P)")
    ax.set_xlabel("time [s]")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    cov_png = f"{prefix}_cov_trace.png"
    fig.savefig(cov_png, dpi=110)
    plt.close(fig)
    log.info("ESKF trace plots -> %s, %s", state_png, cov_png)


def run_eskf(args, log):
    import jax
    import jax.numpy as jnp

    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.eskf import EskfVio
    from vio_msckf_tpu.utils.metrics import ate_rmse

    cfg = euroc_config()
    vio = EskfVio(cfg)

    if args.demo:
        from vio_msckf_tpu.data.simulator import SimConfig, \
            simulate_sequence, bundle_frames
        from vio_msckf_tpu.data.render import render_sequence
        sim = SimConfig(duration=min(args.demo_duration, 6.0), seed=4,
                        amp=(0.5, 0.4, 0.2), yaw_rate=0.05,
                        wobble_amp=0.03)
        seq = simulate_sequence(cfg, sim)
        frames, init, first = bundle_frames(seq, cfg)
        n = len(frames["timestamp"])
        R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
        p_stack = seq["gt_p"][first:first + n]
        cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0,
                                     seed=7)
        acc0 = frames["imu_acc"][1][frames["imu_valid"][1]][0]
        carry = vio.init(acc0)
        step = jax.jit(vio.step)
        outs = []
        for k in range(n):
            frame = dict(
                cam0_img=cam0[k], cam1_img=cam1[k],
                imu_gyro=jnp.asarray(frames["imu_gyro"][k]),
                imu_acc=jnp.asarray(frames["imu_acc"][k]),
                imu_dt=jnp.asarray(frames["imu_dt"][k]),
                imu_valid=jnp.asarray(frames["imu_valid"][k]),
            )
            carry, out = step(carry, frame)
            outs.append(out)
            if k % 10 == 0:
                log.info(
                    "frame %d: inliers %d/%d |p|=%.3f", k,
                    int(out["n_inliers"]), int(out["n_matches"]),
                    float(np.linalg.norm(np.asarray(out["p"]))),
                )
        est = np.stack([np.asarray(o["p"]) for o in outs])
        # The ESKF estimates in the rectified-cam frame starting at the
        # first frame; compare SE3-aligned (Umeyama) like the reference's
        # qualitative plots (eskf_vio.py:187-216) but quantified.
        gt = seq["gt_p"][first:first + n]
        ate = ate_rmse(est, gt, align=True)
        log.info("ESKF ATE RMSE (SE3-aligned, synthetic): %.4f m", ate)
        print(f"eskf_ate_rmse_m {ate:.4f}")
        write_eskf_plots(args.out or "eskf", frames["timestamp"], outs, log)
        return 0

    from vio_msckf_tpu.data.euroc import EuRoCSequence, bundle_euroc_frames
    seq = EuRoCSequence(args.path, start_offset=args.offset)
    frames, init, first, frame_times = bundle_euroc_frames(
        seq, cfg, max_frames=args.max_frames
    )
    n = len(frame_times)
    acc_valid = frames["imu_valid"][1]
    acc0 = frames["imu_acc"][1][acc_valid][0]
    carry = vio.init(acc0)
    step = jax.jit(vio.step)
    outs = []
    for k in range(n):
        img0 = jnp.asarray(seq.load_image(first + k, cam=0), jnp.float32)
        img1 = jnp.asarray(seq.load_image(first + k, cam=1), jnp.float32)
        frame = dict(
            cam0_img=img0, cam1_img=img1,
            imu_gyro=jnp.asarray(frames["imu_gyro"][k]),
            imu_acc=jnp.asarray(frames["imu_acc"][k]),
            imu_dt=jnp.asarray(frames["imu_dt"][k]),
            imu_valid=jnp.asarray(frames["imu_valid"][k]),
        )
        carry, out = step(carry, frame)
        outs.append(out)
        # per-frame inlier line, mirroring eskf_vio.py:159-162
        log.info("%d/%d inliers, |v|=%.4f", int(out["n_inliers"]),
                 int(out["n_matches"]),
                 float(np.linalg.norm(np.asarray(out["v"]))))
    est = np.stack([np.asarray(o["p"]) for o in outs])
    gt = seq.gt_aligned_positions(frame_times)
    if gt is not None:
        ate = ate_rmse(est, gt, align=True)
        log.info("ESKF ATE RMSE (SE3-aligned): %.4f m", ate)
        print(f"eskf_ate_rmse_m {ate:.4f}")
    write_eskf_plots(args.out or "eskf", frame_times, outs, log)
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform or args.compile_cache:
        import jax
        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        if args.compile_cache:
            jax.config.update("jax_compilation_cache_dir",
                              args.compile_cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
    from vio_msckf_tpu.utils.logging import get_logger
    log = get_logger("vio.cli")
    if not args.demo and not args.path:
        print("need --path <euroc dir> or --demo", file=sys.stderr)
        return 2
    if args.pipeline == "eskf":
        return run_eskf(args, log)
    if args.demo:
        return run_msckf_demo(args, log)
    return run_msckf_euroc(args, log)


if __name__ == "__main__":
    raise SystemExit(main())
