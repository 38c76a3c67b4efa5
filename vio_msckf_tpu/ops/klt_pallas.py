"""Pallas TPU kernel for one pyramidal-LK level: the fused Newton loop.

TPU-native replacement for the hot interior of cv2.calcOpticalFlowPyrLK
(reference MSCKF/image.py:254,581,585; params config.py:31-44) — the last
kernel named by SURVEY.md section 2.2. The pyramid walk, the lane-row
patch gathers (which have a fast custom-vmap path) and the gate logic
stay in XLA (ops/klt.py); this kernel takes the gathered wide patches and
runs template resampling, gradients, and the entire iterative G^-1 b
refinement on-chip.

Why a kernel, given that ops/klt.py already beats the fps target — three
measured pathologies of the XLA level loop (r5 on-chip profile,
PROFILE_r05.md):

  1. LOCKSTEP WASTE. Under vmap-over-features a `lax.while_loop` runs
     until the LAST feature converges. Measured: every level executes
     ~29.5 of the 30-iteration cap per frame, because among ~230 windows
     there is almost always one oscillator — while the median feature
     converges in ~5 iterations. Here the grid blocks features (BP=8 per
     program) and each block carries its OWN while loop: blocks without a
     straggler exit after a handful of iterations. Per-feature results
     are identical under any blocking (converged features stop updating),
     so this changes time, not values.
  2. NARROWING CONTRACTIONS. XLA cannot slice a per-feature 48-lane
     window out of the 256-lane gather, so ops/klt.py narrows with a
     one-hot contraction — measured at 1.3 ms/frame across the level
     passes (ops like f32[232,48,256] -> [232,48,48]). The kernel narrows
     with a per-feature dynamic lane slice at load time, which is a copy,
     not 2.8 MFLOP of multiply-reduce.
  3. PER-ITERATION ROUND TRIPS. Each XLA Newton iteration is ~6 separate
     fused ops writing intermediates to (at best) VMEM spill buffers; the
     kernel keeps the patch, tents, and residuals resident and emits one
     fused body.

Numerics: identical formulas in the same f32 precision as ops/klt.py but
different reduction association (loop-over-rows vs fused 3D reduce), so
parity is asserted to ~1e-2 px rather than bit-exact
(tests/test_klt_pallas.py); the engine-level A/B and the divergence test
bound the end effect.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 16          # must match ops/klt.py
_MAX_MOVE = 12.0
_NY = 48           # moving-patch rows AND narrowed lane width
# Features per program = the per-block early-exit granularity: smaller
# blocks exit sooner (fewer features share a straggler) but run more,
# smaller grid programs, and must stay a multiple of 8 (sublane tiling
# of the (BP, 8) scalar blocks). On-chip A/B (PROFILE_r05.md): BP=16
# 178.1 fps vs BP=8 176.0 — the batched-MXU efficiency at 16 slightly
# outweighs the coarser early exit. Env knob for experiments.
import os as _os
_BP = int(_os.environ.get("VIO_LK_BP", "16"))
assert _BP % 8 == 0 and _BP > 0, "VIO_LK_BP must be a positive multiple of 8"


def _lk_level_kernel(
    nx0_ref,       # scalar-prefetch (P,) int32 moving-patch lane starts
    ntx_ref,       # scalar-prefetch (P,) int32 template lane starts
    scal_f_ref,    # (BP, 8) f32: g0_x, g0_y, offt_x, offt_y, base_x, base_y
    tpl_ref,       # (BP, TY, 256) template wide patches
    mov_ref,       # (BP, NY, 256) moving wide patches
    out_ref,       # (BP, 8) f32: gx, gy, ok, lost, err, iters
    tpl48,         # VMEM scratch (BP, TY, NY)
    mov48,         # VMEM scratch (BP, NY, NY)
    *,
    win, iters, eps, min_eig_threshold,
):
    BP = _BP
    TY = tpl_ref.shape[1]
    gwin = win + 2
    r = win // 2
    dt = jnp.float32
    pid = pl.program_id(0)

    sc = scal_f_ref[:]                      # (BP, 8)
    # g0 sits in columns 0:2 so the while-loop carry `g` keeps a zero
    # lane offset (a slice at 4:6 carries layout offset {0,4} into the
    # loop and Mosaic refuses to unify the yields).
    g0 = sc[:, 0:2]
    offt = sc[:, 2:4]
    base = sc[:, 4:6]

    # --- per-feature lane narrowing: one dynamic lane ROTATE + static
    #     slice instead of the XLA one-hot contraction (Mosaic only
    #     allows 128-aligned dynamic lane slices; tpu.dynamic_rotate has
    #     no such restriction, and the wrap region never reaches the
    #     first NY lanes because nx0/ntx <= 256 - NY). The lane starts
    #     ride as two 1-D scalar-prefetch arrays: SMEM pads each ROW of a
    #     2-D operand to a full 512 B lane line, so a (P, 2) layout blew
    #     SMEM at P = batch*360 under vmap folding. -------------------
    for j in range(BP):
        nx0 = nx0_ref[pid * BP + j]
        ntx = ntx_ref[pid * BP + j]
        mov48[j] = pltpu.roll(mov_ref[j], (256 - nx0) % 256, 1)[:, :_NY]
        tpl48[j] = pltpu.roll(tpl_ref[j], (256 - ntx) % 256, 1)[:, :_NY]

    mov = mov48[:]                          # (BP, NY, NY)
    tpl = tpl48[:]                          # (BP, TY, NY)

    def tents(off, n_out, size):
        """(BP, n_out, size) tent rows: bilinear weights at off + row.
        `off` is (BP, 1) — Mosaic wants every vector >= rank 2, and its
        iota is integer-only (cast after)."""
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (BP, n_out, size), 1).astype(dt)
        grid = jax.lax.broadcasted_iota(
            jnp.int32, (BP, n_out, size), 2).astype(dt)
        pos = off[:, :, None] + ii
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos - grid))

    # MXU pass count for the tent resamples: HIGHEST (6-pass f32, the
    # default — the Newton updates feed off sub-DN intensity differences
    # that single bf16 passes would flatten) vs HIGH (3-pass, ~f32-grade
    # for these magnitudes). Trace-time env knob for A/B experiments
    # (scripts/ab_lk.py runs per-process, so jit caching is moot).
    import os as _os
    _prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[_os.environ.get("VIO_LK_PRECISION", "highest")]

    def resample(patch, off_x, off_y, n_out):
        """Separable tent resample of (BP, Sy, Sx) at per-feature float
        offsets -> (BP, n_out, n_out), as two feature-batched MXU
        contractions (exactly bilinear interpolation)."""
        Sy, Sx = patch.shape[1], patch.shape[2]
        Ay = tents(off_y, n_out, Sy)        # off_* (BP, 1)
        Ax = tents(off_x, n_out, Sx)
        # tmp[b, i, x] = sum_y Ay[b, i, y] patch[b, y, x]
        tmp = jax.lax.dot_general(
            Ay, patch, (((2,), (1,)), ((0,), (0,))),
            precision=_prec,
            preferred_element_type=dt,
        )
        # J[b, i, j] = sum_x tmp[b, i, x] Ax[b, j, x]
        return jax.lax.dot_general(
            tmp, Ax, (((2,), (2,)), ((0,), (0,))),
            precision=_prec,
            preferred_element_type=dt,
        )

    def sum2(x):
        """Reduce (BP, A, B) over the last two axes -> (BP, 1)."""
        return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

    # --- template: resample once, gradients, normal matrix ------------
    # Template offsets are relative to the narrowed patch (ntx absorbed
    # by the wrapper), row offset unchanged. All per-feature scalars ride
    # as (BP, 1) vectors — Mosaic's layouts want rank >= 2.
    T = resample(tpl, offt[:, 0:1], offt[:, 1:2], gwin)  # (BP, gwin, gwin)
    I = T[:, 1:-1, 1:-1]
    Ix = (T[:, 1:-1, 2:] - T[:, 1:-1, :-2]) * 0.5
    Iy = (T[:, 2:, 1:-1] - T[:, :-2, 1:-1]) * 0.5

    Gxx = sum2(Ix * Ix)
    Gxy = sum2(Ix * Iy)
    Gyy = sum2(Iy * Iy)
    det = Gxx * Gyy - Gxy * Gxy
    half_tr = 0.5 * (Gxx + Gyy)
    disc = jnp.sqrt(jnp.maximum(half_tr * half_tr - det, 0.0))
    min_eig = (half_tr - disc) / (win * win)
    ok = min_eig > min_eig_threshold                     # (BP, 1)
    det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)

    def window_off(g):
        off = (g + _PAD) - base - r                      # (BP, 2)
        in_marg = jnp.all(jnp.abs(g - g0) <= _MAX_MOVE, axis=1,
                          keepdims=True)                 # (BP, 1)
        return off, in_marg

    def body(carry):
        # converged/lost ride as f32 0/1 masks: i1 vectors pick up
        # replicated layouts that fail to unify across loop yields.
        i, g, conv_f, lost_f = carry
        converged = conv_f > 0.5
        off, in_marg = window_off(g)
        J = resample(mov, off[:, 0:1], off[:, 1:2], win)
        dI = I - J
        bx = sum2(dI * Ix)
        by = sum2(dI * Iy)
        nu_x = (Gyy * bx - Gxy * by) / det_safe          # (BP, 1)
        nu_y = (Gxx * by - Gxy * bx) / det_safe
        nu = jnp.concatenate([nu_x, nu_y], axis=1)       # (BP, 2)
        active = ok & ~converged & in_marg
        lost = lost_f > 0.5
        lost = lost | (ok & ~converged & ~in_marg)
        g = g + jnp.where(active, nu, 0.0)
        converged = converged \
            | (jnp.sum(nu * nu, axis=1, keepdims=True) < eps * eps) \
            | ~ok | ~in_marg
        return (i + 1, g, converged.astype(dt), lost.astype(dt))

    def cond(carry):
        i, _, conv_f, _ = carry
        return (i < iters) & jnp.any(conv_f < 0.5)

    n_it, guess, _, lost_f = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), g0,
         jnp.zeros((BP, 1), dt), jnp.zeros((BP, 1), dt)),
    )
    lost = lost_f > 0.5

    off, _ = window_off(guess)
    J = resample(mov, off[:, 0:1], off[:, 1:2], win)
    err = sum2(jnp.abs(I - J)) / float(win * win)

    out = jnp.concatenate(
        [guess,
         ok.astype(dt), lost.astype(dt), err,
         jnp.full((BP, 1), n_it, jnp.int32).astype(dt),
         jnp.zeros((BP, 2), dt)],
        axis=1,
    )
    out_ref[:] = out


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _track_level_pallas_flat(
    tpl,          # (P, TY, 256) template wide patches
    mov,          # (P, NY, 256) moving wide patches
    scal_i,       # (P, 2) int32 [nx0, ntx]
    offt,         # (P, 2) template offsets (relative to narrowed patch)
    base,         # (P, 2) narrowed moving-patch origin (padded coords)
    g0,           # (P, 2) initial guesses
    win: int, iters: int, eps: float, min_eig_threshold: float,
    interpret: bool = False,
):
    P = tpl.shape[0]
    TY = tpl.shape[1]
    assert P % _BP == 0, f"P={P} must be a multiple of {_BP} (pad upstream)"
    dt = jnp.float32
    scal_f = jnp.concatenate(
        [g0.astype(dt), offt.astype(dt), base.astype(dt),
         jnp.zeros((P, 2), dt)], axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P // _BP,),
        in_specs=[
            pl.BlockSpec((_BP, 8), lambda i, s0, s1: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BP, TY, 256), lambda i, s0, s1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BP, _NY, 256), lambda i, s0, s1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BP, 8), lambda i, s0, s1: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_BP, TY, _NY), dt),
            pltpu.VMEM((_BP, _NY, _NY), dt),
        ],
    )
    out = pl.pallas_call(
        partial(_lk_level_kernel, win=win, iters=iters, eps=float(eps),
                min_eig_threshold=float(min_eig_threshold)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8), dt),
        interpret=interpret,
    )(scal_i[:, 0], scal_i[:, 1], scal_f, tpl, mov)

    guess = out[:, 0:2]
    ok = out[:, 2] > 0.5
    lost = out[:, 3] > 0.5
    err = out[:, 4]
    return guess, ok, lost, err


def track_level_pallas(tpl, mov, scal_i, offt, base, g0, win, iters, eps,
                       min_eig_threshold, interpret=None):
    """Batch-folding wrapper: under vmap the batch dim folds into the
    feature dim (the kernel is purely per-feature, so results are
    independent of blocking) — the same rule as ops/klt.py's row gather,
    so the vmapped engine pays zero batched-lowering penalty.

    `interpret=None` auto-selects the Pallas interpreter off-TPU so the
    CPU test suite exercises the kernel semantics directly."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_folding(win, iters, float(eps), float(min_eig_threshold),
                       bool(interpret))
    return fn(tpl, mov, scal_i, offt, base, g0)


from functools import lru_cache


@lru_cache(maxsize=None)
def _make_folding(win, iters, eps, min_eig_threshold, interpret):
    @jax.custom_batching.custom_vmap
    def fn(tpl, mov, scal_i, offt, base, g0):
        return _track_level_pallas_flat(
            tpl, mov, scal_i, offt, base, g0,
            win, iters, eps, min_eig_threshold, interpret,
        )

    @fn.def_vmap
    def _rule(axis_size, in_batched, tpl, mov, scal_i, offt, base, g0):
        B = axis_size

        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (B,) + x.shape)

        args = [bcast(a, b) for a, b in
                zip((tpl, mov, scal_i, offt, base, g0), in_batched)]
        flat = [a.reshape((-1,) + a.shape[2:]) for a in args]
        outs = fn(*flat)
        P = args[0].shape[1]
        outs_b = tuple(o.reshape((B, P) + o.shape[1:]) for o in outs)
        return outs_b, (True, True, True, True)

    return fn
