"""Pyramidal Lucas-Kanade feature tracking, vmapped over features.

TPU-native replacement for cv2.calcOpticalFlowPyrLK (reference
MSCKF/image.py:254,581,585 with the parameters at config.py:31-44: 15x15
window, 4 pyramid levels, 30 iterations, eps 0.01, USE_INITIAL_FLOW).

Bouguet's algorithm: at each level from coarse to fine, the spatial
gradient matrix G is built once from the template patch in the previous
image; the flow is refined by fixed-count Newton iterations with per-feature
convergence masking (lockstep — no data-dependent control flow). All
features are processed as one batch of bilinear gathers; images live in
VMEM at these sizes.

Status semantics follow cv2: a track fails when the tracked point leaves
the image or the gradient matrix's smallest eigenvalue (normalized by the
window area) falls below `min_eig_threshold` at the finest level — cv2's
minEigThreshold check, which is what keeps textureless/degenerate patches
from reporting garbage as success. The per-feature mean absolute residual
over the final window is returned like cv2's `err` output so callers can
gate on photometric consistency.
"""

from functools import partial

import jax
import jax.numpy as jnp


def bilinear_sample(img, xy):
    """Bilinear sample img (H, W) at xy (..., 2) [x=col, y=row], clamped."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def _track_level(img_prev, img_next, pts_prev, guess, win, iters, eps,
                 min_eig_threshold):
    """One pyramid level for all features. pts_prev/guess: (P, 2) at this
    level's scale. Returns (refined guess (P, 2), ok (P,), err (P,))."""
    r = win // 2
    # 17x17 template patch -> central differences give the 15x15 gradients.
    off = jnp.arange(-r - 1, r + 2, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(off, off, indexing="ij")
    patch_off = jnp.stack([gx, gy], axis=-1)  # (win+2, win+2, 2)

    tmpl_xy = pts_prev[:, None, None, :] + patch_off[None]
    T = jax.vmap(lambda c: bilinear_sample(img_prev, c))(tmpl_xy)  # (P,w+2,w+2)
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

    woff = patch_off[1:-1, 1:-1]  # (win, win, 2)

    def body(_, carry):
        g, converged = carry
        cur_xy = g[:, None, None, :] + woff[None]
        J = jax.vmap(lambda c: bilinear_sample(img_next, c))(cur_xy)
        dI = I - J
        bx = jnp.sum(dI * Ix, axis=(1, 2))
        by = jnp.sum(dI * Iy, axis=(1, 2))
        nu_x = (Gyy * bx - Gxy * by) / det_safe
        nu_y = (Gxx * by - Gxy * bx) / det_safe
        nu = jnp.stack([nu_x, nu_y], axis=-1)
        step = jnp.where((ok & ~converged)[:, None], nu, 0.0)
        g = g + step
        converged = converged | (jnp.sum(nu * nu, axis=-1) < eps * eps) | ~ok
        return g, converged

    guess, _ = jax.lax.fori_loop(
        0, iters, body, (guess, jnp.zeros(len(guess), bool))
    )

    # Final photometric residual (cv2's `err`: mean |I - J| over the window).
    cur_xy = guess[:, None, None, :] + woff[None]
    J = jax.vmap(lambda c: bilinear_sample(img_next, c))(cur_xy)
    err = jnp.mean(jnp.abs(I - J), axis=(1, 2))
    return guess, ok, err


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def pyramidal_lk(
    pyr_prev,      # tuple of (H/2^l, W/2^l) float images, level 0 first
    pyr_next,
    pts_prev,      # (P, 2) pixel coords in the full-res previous image
    pts_init,      # (P, 2) initial guess in the full-res next image
    win: int = 15,
    iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
):
    """Track pts_prev from pyr_prev into pyr_next.

    Returns (pts_next (P, 2), status (P,) bool, err (P,) float). Status is
    False when the tracked point leaves the image or the gradient matrix is
    degenerate at the finest level (cv2's semantics, image.py:260-266);
    `err` is the final-window mean absolute intensity residual.
    """
    levels = len(pyr_prev) - 1
    scale = 2.0 ** levels
    guess = pts_init / scale

    status = jnp.ones(pts_prev.shape[0], bool)
    err = jnp.zeros(pts_prev.shape[0], jnp.float32)
    for lvl in range(levels, -1, -1):
        s = 2.0 ** lvl
        p_lvl = pts_prev / s
        guess, ok, err = _track_level(
            pyr_prev[lvl], pyr_next[lvl], p_lvl, guess, win, iters, eps,
            min_eig_threshold,
        )
        if lvl == 0:
            status = status & ok
        else:
            guess = guess * 2.0

    H, W = pyr_next[0].shape
    inb = (
        (guess[:, 0] >= 0) & (guess[:, 0] <= W - 1)
        & (guess[:, 1] >= 0) & (guess[:, 1] <= H - 1)
    )
    return guess, status & inb, err
