"""Micro-benchmarks of the filter/tracker inner ops on the current device."""

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


def timeit(fn, *args, reps=5, name=""):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best*1e3:8.3f} ms")
    return best


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    D, F, N = 141, 160, 20
    rows = 1580

    with jax.default_matmul_precision("highest"):
        H = jnp.asarray(rng.normal(size=(rows, D)), jnp.float32)
        timeit(lambda h: jnp.linalg.qr(h)[1], H, name=f"qr({rows},{D})")

        Hs = jnp.asarray(rng.normal(size=(F, 4 * N, D)), jnp.float32)
        timeit(lambda h: jnp.linalg.qr(h)[1], Hs,
               name=f"batched qr({F},{4*N},{D})")

        Hf = jnp.asarray(rng.normal(size=(F, 4 * N, 3)), jnp.float32)
        timeit(lambda h: jnp.linalg.qr(h)[0], Hf,
               name=f"batched qr({F},{4*N},3)  [nullspace U]")

        B = jnp.asarray(rng.normal(size=(F, 4 * N, 4 * N)), jnp.float32)
        B = B @ B.transpose(0, 2, 1) + 1e-2 * jnp.eye(4 * N)
        r = jnp.asarray(rng.normal(size=(F, 4 * N)), jnp.float32)
        timeit(lambda b, x: jnp.linalg.solve(b, x[..., None]), B, r,
               name=f"batched solve({F},{4*N},{4*N})  [gamma]")
        timeit(lambda b: jnp.linalg.cholesky(b), B,
               name=f"batched cholesky({F},{4*N})")
        # gamma via cholesky
        timeit(lambda b, x: jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(b), True), x[..., None]), B, r,
            name=f"batched cho_solve({F},{4*N})")

        P = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
        P = P @ P.T
        timeit(lambda a, b: a @ b @ a.T, P, P, name=f"matmul {D}x{D} x3")

        # big einsum like the old info form
        timeit(lambda h: jnp.einsum("fri,frj->ij", h, h), Hs,
               name=f"einsum ({F},{4*N},{D})^T x -> ({D},{D})")

        # propagation-scale: 16-step scan of 141x141 cov products
        Phi = jnp.asarray(rng.normal(size=(21, 21)), jnp.float32)

        def prop_scan(P):
            def step(P, _):
                P = P.at[:21, :21].set(Phi @ P[:21, :21] @ Phi.T)
                P = P.at[:21, 21:].set(Phi @ P[:21, 21:])
                P = P.at[21:, :21].set(P[:21, 21:].T)
                return (P + P.T) / 2, None
            return jax.lax.scan(step, P, None, length=16)[0]
        timeit(prop_scan, P, name="prop scan x16 (block cov update)")

    # tracker ops
    from vio_msckf_tpu.config import euroc_config
    from vio_msckf_tpu.ops.pyramid import build_pyramid
    from vio_msckf_tpu.ops import fast as fast_ops
    from vio_msckf_tpu.ops import klt

    cfg = euroc_config()
    W, Hh = cfg.cam0.resolution
    img = jnp.asarray(rng.uniform(0, 255, (Hh, W)), jnp.float32)
    levels = cfg.frontend.lk_pyramid_levels
    timeit(lambda im: build_pyramid(im, levels + 1),
           img, name=f"build_pyramid({levels+1})")
    pyr = build_pyramid(img, levels + 1)
    timeit(lambda im: fast_ops.fast_score_map(im, 10.0), img,
           name="fast_score_map(752x480)")

    K = cfg.frontend.max_tracks
    pts = jnp.asarray(
        rng.uniform(50, 400, size=(K, 2)), jnp.float32)
    valid = jnp.ones((K,), bool)

    lkp = cfg.frontend
    img2 = jnp.asarray(rng.uniform(0, 255, (Hh, W)), jnp.float32)
    pyr2 = build_pyramid(img2, levels + 1)

    def one_lk(pyr_a, pyr_b, pts):
        return klt.pyramidal_lk(
            pyr_a, pyr_b, pts, pts,
            win=lkp.lk_patch_size, iters=lkp.lk_max_iteration,
            eps=lkp.lk_track_precision,
        )
    timeit(one_lk, pyr, pyr2, pts, name=f"pyramidal_lk({K} pts)")


if __name__ == "__main__":
    main()
