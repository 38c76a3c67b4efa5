"""Dataset-path throughput: the on-disk --path flow vs the preloaded scan.

VERDICT r3 item 6: with ~25 ms tunnel latency per dispatch, per-frame
stepping caps the real-dataset path at ~40 fps regardless of chip speed.
This script measures the chunked double-buffered CLI path (PNG decode ring
-> CHUNK-frame lax.scan dispatches) against per-frame stepping (--chunk 1)
on the same on-disk synthetic EuRoC-layout sequence, and against the
preloaded-scan bench number.

Usage:  python scripts/bench_dataset_path.py [--dir /tmp/euroc_synth_bench]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/euroc_synth_bench")
    ap.add_argument("--duration", type=float, default=12.0)
    args = ap.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.data.simulator import SimConfig
    from vio_msckf_tpu.data.synth_euroc import write_synthetic_euroc
    from vio_msckf_tpu import cli
    from vio_msckf_tpu.utils.logging import get_logger

    cfg = euroc_config()
    marker = os.path.join(args.dir, "mav0", "imu0", "data.csv")
    if not os.path.exists(marker):
        print(f"writing synthetic EuRoC dataset to {args.dir} ...",
              flush=True)
        sim = SimConfig(duration=args.duration, seed=4, amp=(1.5, 1.0, 0.5),
                        yaw_rate=0.2, wobble_amp=0.1)
        n = write_synthetic_euroc(args.dir, cfg, sim, render_seed=7)
        print(f"wrote {n} stereo frames", flush=True)

    log = get_logger("bench.dataset")
    parser = cli.build_parser()
    for label, extra in (
        ("warmup (compiles)", []),
        ("chunked (32-frame scan dispatches)", []),
        ("per-frame dispatch (--chunk 1)", ["--chunk", "1"]),
    ):
        a = parser.parse_args(["--path", args.dir, "--offset", "0"] + extra)
        t0 = time.time()
        rc = cli.run_msckf_euroc(a, log)
        assert rc == 0
        print(f"[{label}] wall {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
