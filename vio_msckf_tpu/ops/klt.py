"""Pyramidal Lucas-Kanade feature tracking, batched over features.

TPU-native replacement for cv2.calcOpticalFlowPyrLK (reference
MSCKF/image.py:254,581,585 with the parameters at config.py:31-44: 15x15
window, 4 pyramid levels, 30 iterations, eps 0.01, USE_INITIAL_FLOW).

Design. Three facts about the v5e shaped this implementation (measured in
round 2 on the real chip):

  1. Arbitrary per-element gathers run on the scalar path at ~10 ns/elem
     (2.4 ms for one 228x32x32 patch gather); a naive port does four such
     gathers per Newton iteration. But gathers whose slices cover the full
     128-lane minor dimension hit a vectorized path ~200x faster.
     => Each pyramid level is edge-padded to a lane-aligned width and
     reshaped to (H * nb, 128) "lane rows"; a feature's local patch is ONE
     row-gather of (rows, 2) adjacent lane blocks -> a (rows, 256) patch.
     The sub-block x offset is absorbed into the interpolation offsets.
  2. Within one LK iteration every pixel of the window shares the same
     fractional offset: resampling the 15x15 window at a subpixel position
     is a separable linear map of the patch. The window is produced by two
     tent-matrix contractions (exactly bilinear interpolation) executed as
     fused broadcast-multiply-reduce VPU ops — einsum/dot forms lower to
     slow convolutions for these tiny shapes.
  3. Sequential depth, not FLOPs, is the cost: the lockstep iteration runs
     under `lax.while_loop` and exits when every feature has converged to
     cv2's eps criterion (typically ~5 Newton steps on textured frames).

Status semantics follow cv2: a track fails when the tracked point leaves
the image, when its window drifts outside the patch margin (~12 px from
the level's initial guess — cv2's "left the search window"), or when the
gradient matrix's smallest eigenvalue (normalized by window area) falls
below `min_eig_threshold` at the finest level. The per-feature mean
absolute residual over the final window is returned like cv2's `err`.
"""

from functools import partial

import jax
import jax.numpy as jnp

_PAD = 16          # edge padding on every side, in pixels
_NY = 48           # moving-patch rows: window 16 + 2*margin 12 + slack
_MAX_MOVE = 12.0   # per-level displacement margin (px)


@jax.tree_util.register_pytree_node_class
class FlatPyramid:
    """Lane-row pyramid representation: per level a (Hp*nb, 128) float32
    array plus static (H, W, nb) metadata. The metadata rides in the pytree
    aux_data so it stays a Python constant through jit/scan boundaries."""

    def __init__(self, flats, metas):
        self.flats = tuple(flats)     # traced arrays
        self.metas = tuple(metas)     # static (H, W, nb) int tuples

    def __len__(self):
        return len(self.flats)

    def tree_flatten(self):
        return self.flats, self.metas

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children, aux)


def prepare_pyramid(pyr):
    """Convert a tuple of (H, W) images into the FlatPyramid lane-row
    representation consumed by `pyramidal_lk`.

    Edge padding (cv2 clamps samples at borders; padding replicates the
    edge so border windows see the same values) plus lane alignment so
    patch extraction is a fast full-minor-dim row gather.
    """
    flats, metas = [], []
    for img in pyr:
        H, W = img.shape
        Hp = H + 2 * _PAD
        nb = max(2, -(-(W + 2 * _PAD) // 128))
        Wp = nb * 128
        padded = jnp.pad(
            img.astype(jnp.float32),
            ((_PAD, _PAD), (_PAD, Wp - W - _PAD)),
            mode="edge",
        )
        flats.append(padded.reshape(Hp * nb, 128))
        metas.append((H, W, nb))
    return FlatPyramid(flats, metas)


from functools import lru_cache


@lru_cache(maxsize=None)
def _make_row_gather(nb, ny):
    """Row-gather kernel for a fixed (nb, ny) with a CUSTOM VMAP RULE:
    batching folds the batch dimension into the ROW dimension (the
    lane-row layout already addresses stacked images by row offset, see
    lk_verify's y_base), so vmapped callers run the exact same
    full-minor-dim gather that is fast unbatched. XLA's generic batched
    gather lowering costs ~2.4x (measured in
    scripts/profile_vmap_tracker.py: the tracker's vmap(B=1) penalty was
    14.6 vs 5.9 ms/frame, most of it here and in top_k)."""

    @jax.custom_batching.custom_vmap
    def gather(flat, y0, b0):
        P = y0.shape[0]
        rows = (y0[:, None] + jnp.arange(ny))[:, :, None] * nb \
            + (b0[:, None, None] + jnp.arange(2))
        return flat[rows].reshape(P, ny, 256)

    @gather.def_vmap
    def _rule(axis_size, in_batched, flat, y0, b0):
        fb, yb, bb = in_batched
        B = axis_size
        y0b = y0 if yb else jnp.broadcast_to(y0, (B,) + y0.shape)
        b0b = b0 if bb else jnp.broadcast_to(b0, (B,) + b0.shape)
        if fb:
            RR = flat.shape[1]
            flat2 = flat.reshape(B * RR, flat.shape[2])
            y0b = y0b + (
                jnp.arange(B, dtype=y0b.dtype) * (RR // nb)
            )[:, None]
        else:
            flat2 = flat
        P = y0b.shape[1]
        out = gather(flat2, y0b.reshape(B * P), b0b.reshape(B * P))
        return out.reshape(B, P, ny, 256), True

    return gather


def _gather_rows(flat, nb, y0, b0, ny):
    """(P, ny, 256) patches: rows y0..y0+ny of lane blocks b0, b0+1.
    y0/b0 (P,) int32 in padded coordinates. One full-minor-dim gather
    (vmap folds the batch into rows — see _make_row_gather)."""
    return _make_row_gather(int(nb), int(ny))(flat, y0, b0)


def _interp_matrix(offset, n_out, size, dtype):
    """(P, n_out, size) tent-interpolation matrix: row r holds the bilinear
    weights for sampling patch position `offset + r` (offset float, in patch
    coordinates). Exactly bilinear interpolation, as a contraction operand."""
    pos = offset[:, None] + jnp.arange(n_out, dtype=dtype)[None]   # (P, n)
    grid = jnp.arange(size, dtype=dtype)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :])
    )


def _resample(patch, off_xy, n_out):
    """Sample an (n_out, n_out) window from each (Sy, Sx) patch with its
    top-left corner at float position off_xy (P, 2) [x, y] (patch coords).
    Broadcast-multiply-reduce: fuses on the VPU (einsum lowers to slow
    convolutions at these shapes)."""
    Sy, Sx = patch.shape[-2:]
    dt = patch.dtype
    Ay = _interp_matrix(off_xy[:, 1], n_out, Sy, dt)
    Ax = _interp_matrix(off_xy[:, 0], n_out, Sx, dt)
    tmp = jnp.sum(Ay[:, :, :, None] * patch[:, None, :, :], axis=2)
    return jnp.sum(tmp[:, :, None, :] * Ax[:, None, :, :], axis=3)


def _track_level(flat_prev, flat_next, meta, pts_prev, guess, win, iters,
                 eps, min_eig_threshold, y_base=0, backend="xla"):
    """One pyramid level for all features. pts_prev/guess: (P, 2) at this
    level's scale (image coordinates). flat_*: lane-row images, meta the
    static (H, W, nb). Returns (guess (P, 2), ok (P,), lost (P,), err).

    `y_base` (scalar or (P,) int32) is a per-point padded-ROW offset into
    `flat_*`, letting several same-shape images ride stacked in one buffer
    (row index = (y + y_base) * nb + b) — used by `lk_verify` to run two
    image pairs in one batched pass.

    `backend`: "xla" runs the narrowing + Newton loop as XLA ops below;
    "pallas" hands the gathered wide patches to the fused VMEM kernel
    (ops/klt_pallas.py) with per-block early exit. The patch gathers stay
    here either way — they have the fast custom-vmap lane-row path."""
    H, W, nb = meta
    Hp = H + 2 * _PAD
    r = win // 2
    # The moving patch is _NY x _NY; the window plus the movement margin
    # plus bilinear support must fit or out-of-range tent weights silently
    # produce zero samples (ADVICE r2).
    assert win + 2 * int(_MAX_MOVE) + 4 <= _NY, (
        f"lk window {win} too large for the fixed patch (_NY={_NY}); "
        "raise _NY in ops/klt.py"
    )
    gwin = win + 2                     # template support for central diffs
    dt = jnp.float32
    pts_prev = pts_prev.astype(dt)

    # -- template: one row-gather + one fixed-offset resample ---------------
    ptp = pts_prev + _PAD                     # padded coords
    ty = gwin + 1                             # rows incl. bilinear support
    y0t = jnp.clip(
        jnp.floor(ptp[:, 1]).astype(jnp.int32) - (gwin // 2), 0, Hp - ty
    )
    b0t = jnp.clip(
        (jnp.floor(ptp[:, 0]).astype(jnp.int32) - (gwin // 2)) // 128,
        0, nb - 2,
    )
    patch_t = _gather_rows(flat_prev, nb, y0t + y_base, b0t, ty)
    off_t = jnp.stack(
        [ptp[:, 0] - (128 * b0t).astype(dt) - (r + 1),
         ptp[:, 1] - y0t.astype(dt) - (r + 1)], axis=1,
    )

    if backend == "pallas":
        return _track_level_pallas_path(
            flat_next, meta, patch_t, off_t, guess, win, iters, eps,
            min_eig_threshold, y_base, r, Hp, nb,
        )

    T = _resample(patch_t, off_t, gwin)       # (P, win+2, win+2)
    I = T[:, 1:-1, 1:-1]
    Ix = (T[:, 1:-1, 2:] - T[:, 1:-1, :-2]) * 0.5
    Iy = (T[:, 2:, 1:-1] - T[:, :-2, 1:-1]) * 0.5

    Gxx = jnp.sum(Ix * Ix, axis=(1, 2))
    Gxy = jnp.sum(Ix * Iy, axis=(1, 2))
    Gyy = jnp.sum(Iy * Iy, axis=(1, 2))
    det = Gxx * Gyy - Gxy * Gxy
    # Smallest eigenvalue of G, normalized by window area (cv2's
    # minEigThreshold semantics — rejects flat/edge-only patches whose
    # normal equations are ill-conditioned).
    half_tr = 0.5 * (Gxx + Gyy)
    disc = jnp.sqrt(jnp.maximum(half_tr * half_tr - det, 0.0))
    min_eig = (half_tr - disc) / (win * win)
    ok = min_eig > min_eig_threshold
    det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)

    # -- moving patch: one row-gather + one-time column narrowing -----------
    g0 = guess.astype(dt)
    gp = g0 + _PAD
    y0n = jnp.clip(
        jnp.floor(gp[:, 1]).astype(jnp.int32) - (_NY // 2 - 1), 0, Hp - _NY
    )
    b0n = jnp.clip(
        (jnp.floor(gp[:, 0]).astype(jnp.int32) - (_NY // 2 - 5)) // 128,
        0, nb - 2,
    )
    wide = _gather_rows(flat_next, nb, y0n + y_base, b0n, _NY)  # (P,NY,256)
    # Narrow 256 -> NY columns around the window (integer shift, one-hot
    # contraction) so the per-iteration resample contracts over NY not 256.
    offx0 = gp[:, 0] - (128 * b0n).astype(dt) - r
    nx0 = jnp.clip(
        jnp.floor(offx0).astype(jnp.int32) - (_NY // 2 - 8), 0, 256 - _NY
    )
    cols = nx0[:, None] + jnp.arange(_NY)                    # (P, NY)
    sel = (cols[:, :, None] == jnp.arange(256)[None, None, :]).astype(dt)
    patch_n = jnp.sum(wide[:, :, None, :] * sel[:, None, :, :], axis=3)
    base = jnp.stack(
        [(128 * b0n + nx0).astype(dt), y0n.astype(dt)], axis=1
    )                                                    # patch origin, padded

    def window_off(g):
        off = (g + _PAD) - base - r
        in_marg = jnp.all(jnp.abs(g - g0) <= _MAX_MOVE, axis=1)
        return off, in_marg

    def body(carry):
        i, g, converged, lost = carry
        off, in_marg = window_off(g)
        J = _resample(patch_n, off, win)
        dI = I - J
        bx = jnp.sum(dI * Ix, axis=(1, 2))
        by = jnp.sum(dI * Iy, axis=(1, 2))
        nu_x = (Gyy * bx - Gxy * by) / det_safe
        nu_y = (Gxx * by - Gxy * bx) / det_safe
        nu = jnp.stack([nu_x, nu_y], axis=-1)
        active = ok & ~converged & in_marg
        # A still-iterating window that leaves the margin is a failed track
        # (cv2's "point left the search window") — freezing it silently
        # would let a backward-consistency pass initialized AT the reference
        # point report a perfect round trip for a slipped feature.
        lost = lost | (ok & ~converged & ~in_marg)
        g = g + jnp.where(active[:, None], nu, 0.0)
        converged = converged | (jnp.sum(nu * nu, axis=-1) < eps * eps) \
            | ~ok | ~in_marg
        return i + 1, g, converged, lost

    def cond(carry):
        i, _, converged, _ = carry
        return (i < iters) & jnp.any(~converged)

    _, guess, _, lost = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), g0,
         jnp.zeros(len(guess), bool), jnp.zeros(len(guess), bool)),
    )

    # Final photometric residual (cv2's `err`: mean |I - J| over the window).
    off, _ = window_off(guess)
    J = _resample(patch_n, off, win)
    err = jnp.mean(jnp.abs(I - J), axis=(1, 2))
    return guess, ok, lost, err


def _track_level_pallas_path(flat_next, meta, patch_t, off_t, guess, win,
                             iters, eps, min_eig_threshold, y_base, r, Hp,
                             nb):
    """Moving-patch gather (same indices as the XLA path) + the fused
    VMEM kernel for everything downstream (ops/klt_pallas.py)."""
    from vio_msckf_tpu.ops.klt_pallas import track_level_pallas, _BP

    dt = jnp.float32
    g0 = guess.astype(dt)
    gp = g0 + _PAD
    y0n = jnp.clip(
        jnp.floor(gp[:, 1]).astype(jnp.int32) - (_NY // 2 - 1), 0, Hp - _NY
    )
    b0n = jnp.clip(
        (jnp.floor(gp[:, 0]).astype(jnp.int32) - (_NY // 2 - 5)) // 128,
        0, nb - 2,
    )
    wide = _gather_rows(flat_next, nb, y0n + y_base, b0n, _NY)  # (P,NY,256)
    offx0 = gp[:, 0] - (128 * b0n).astype(dt) - r
    nx0 = jnp.clip(
        jnp.floor(offx0).astype(jnp.int32) - (_NY // 2 - 8), 0, 256 - _NY
    )
    base = jnp.stack(
        [(128 * b0n + nx0).astype(dt), y0n.astype(dt)], axis=1
    )

    # Template lane-narrowing indices: the kernel slices [ntx, ntx+NY) and
    # resamples at the residual offset. The clamp only bites for points
    # beyond the valid image (killed later by the bounds gate anyway).
    gwin = win + 2
    ntx = jnp.clip(
        jnp.floor(off_t[:, 0]).astype(jnp.int32), 0, 256 - _NY
    )
    offt = jnp.stack(
        [jnp.clip(off_t[:, 0] - ntx.astype(dt), 0.0,
                  float(_NY - gwin - 2)),
         off_t[:, 1]], axis=1,
    )
    scal_i = jnp.stack([nx0, ntx], axis=1)

    # Pad the feature dim to the kernel's block multiple by replicating
    # feature 0 (replicas converge identically — no straggler cost).
    P = g0.shape[0]
    P8 = -(-P // _BP) * _BP
    if P8 != P:
        def rep(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (P8 - P,) + a.shape[1:])], 0)
        patch_t, wide, scal_i, offt, base, g0p = map(
            rep, (patch_t, wide, scal_i, offt, base, g0))
    else:
        g0p = g0
    out = track_level_pallas(
        patch_t, wide, scal_i, offt, base, g0p, win, iters, eps,
        min_eig_threshold,
    )
    if P8 != P:
        out = tuple(o[:P] for o in out)
    return out


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def pyramidal_lk(
    pyr_prev,      # prepare_pyramid() output, or tuple of (H/2^l, W/2^l)
    pyr_next,      # images level 0 first (converted internally)
    pts_prev,      # (P, 2) pixel coords in the full-res previous image
    pts_init,      # (P, 2) initial guess in the full-res next image
    win: int = 15,
    iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    backend: str = "xla",
):
    """Track pts_prev from pyr_prev into pyr_next.

    Returns (pts_next (P, 2), status (P,) bool, err (P,) float). Status is
    False when the tracked point leaves the image or the gradient matrix is
    degenerate at the finest level (cv2's semantics, image.py:260-266);
    `err` is the final-window mean absolute intensity residual.
    """
    if not isinstance(pyr_prev, FlatPyramid):
        pyr_prev = prepare_pyramid(pyr_prev)
    if not isinstance(pyr_next, FlatPyramid):
        pyr_next = prepare_pyramid(pyr_next)

    levels = len(pyr_prev) - 1
    scale = 2.0 ** levels
    guess = pts_init / scale

    status = jnp.ones(pts_prev.shape[0], bool)
    err = jnp.zeros(pts_prev.shape[0], jnp.float32)
    for lvl in range(levels, -1, -1):
        # Skip levels too small to hold the window plus a useful margin
        # (cv2 likewise caps maxLevel by image size) — the finer levels
        # below still refine from the same initial guess.
        H, W, _ = pyr_prev.metas[lvl]
        if min(H, W) >= win + 8:
            s = 2.0 ** lvl
            p_lvl = pts_prev / s
            guess, ok, lost, err = _track_level(
                pyr_prev.flats[lvl], pyr_next.flats[lvl],
                pyr_prev.metas[lvl], p_lvl, guess, win, iters, eps,
                min_eig_threshold, backend=backend,
            )
            status = status & ~lost
            if lvl == 0:
                status = status & ok
        if lvl != 0:
            guess = guess * 2.0

    H, W, _ = pyr_next.metas[0]
    inb = (
        (guess[:, 0] >= 0) & (guess[:, 0] <= W - 1)
        & (guess[:, 1] >= 0) & (guess[:, 1] <= H - 1)
    )
    return guess, status & inb, err


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))
def lk_verify(
    pyr_prev_a, pyr_next_a,   # image pair A (FlatPyramid)
    pyr_prev_b, pyr_next_b,   # image pair B (same resolution)
    pts_a, init_a,            # (Pa, 2) points + guesses for pair A
    pts_b, init_b,            # (Pb, 2) points + guesses for pair B
    win: int = 15,
    iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    backend: str = "xla",
):
    """One finest-level LK pass over TWO image pairs batched together —
    the backward-consistency checks (temporal fwd-bwd, image.py:292-313
    replacement; stereo backward, image.py:585-588) both start AT an
    already-converged solution, so the coarse pyramid levels add nothing:
    a single level-0 refinement either lands back on the seed (pass) or
    drifts past the _MAX_MOVE margin / fails to converge (fail). Batching
    the two pairs into one pass halves the sequential-iteration bill —
    per-iteration cost is lane-parallel over points.

    Both pairs stack into one lane-row buffer; per-point padded-row bases
    select the image (see _track_level's y_base).

    Returns ((pts (Pa,2), status, err), (pts (Pb,2), status, err)).
    """
    meta = pyr_prev_a.metas[0]
    H, W, nb = meta
    Hp = H + 2 * _PAD
    Pa = pts_a.shape[0]
    Pb = pts_b.shape[0]

    flat_prev = jnp.concatenate(
        [pyr_prev_a.flats[0], pyr_prev_b.flats[0]], axis=0
    )
    flat_next = jnp.concatenate(
        [pyr_next_a.flats[0], pyr_next_b.flats[0]], axis=0
    )
    pts = jnp.concatenate([pts_a, pts_b], axis=0)
    init = jnp.concatenate([init_a, init_b], axis=0)
    y_base = jnp.concatenate(
        [jnp.zeros((Pa,), jnp.int32), jnp.full((Pb,), Hp, jnp.int32)]
    )

    guess, ok, lost, err = _track_level(
        flat_prev, flat_next, meta, pts, init, win, iters, eps,
        min_eig_threshold, y_base=y_base, backend=backend,
    )
    inb = (
        (guess[:, 0] >= 0) & (guess[:, 0] <= W - 1)
        & (guess[:, 1] >= 0) & (guess[:, 1] <= H - 1)
    )
    status = ok & ~lost & inb
    return (
        (guess[:Pa], status[:Pa], err[:Pa]),
        (guess[Pa:], status[Pa:], err[Pa:]),
    )
