"""FAST-9 corner detection + grid-bucketed selection, in pure XLA.

TPU-native replacement for cv2.FastFeatureDetector (reference
MSCKF/image.py:50,175,333). The whole image is processed as dense
vectorized ops on the VPU:

  * 16-point Bresenham circle differences via jnp.roll;
  * the exact FAST corner score: the largest threshold at which a 9-long
    contiguous arc stays all-brighter (or all-darker) — computed as
    max over the 16 cyclic windows of the window-min (split 9 = 3+3+3 so
    the reduction is 4 min-ops per window instead of 8);
  * 3x3 non-maximum suppression on the score map (cv2's default);
  * per-grid-cell top-k selection by response, replacing the Python
    sort-per-cell at image.py:209-217 / 344-350.
"""

from functools import partial

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3: (row, col) offsets, clockwise from 12
# o'clock — the standard FAST-9/16 pattern.
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_BORDER = 3


def fast_score_map(img, threshold):
    """FAST-9 corner response map with 3x3 non-max suppression.

    img: (H, W) float; returns (H, W) float score, 0 where not a corner.
    """
    img = img.astype(jnp.float32)
    H, W = img.shape
    # d[i] = I(p + offset_i) - I(p); roll by -offset brings the neighbor to p.
    diffs = jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) - img for dy, dx in _CIRCLE]
    )  # (16, H, W)

    def arc_score(d):
        # min over 3 consecutive circle positions, then 9 = 3+3+3.
        m3 = jnp.minimum(
            jnp.minimum(d, jnp.roll(d, -1, axis=0)), jnp.roll(d, -2, axis=0)
        )
        m9 = jnp.minimum(
            jnp.minimum(m3, jnp.roll(m3, -3, axis=0)),
            jnp.roll(m3, -6, axis=0),
        )
        return jnp.max(m9, axis=0)  # best 9-window min per pixel

    score = jnp.maximum(arc_score(diffs), arc_score(-diffs))
    corner = score > threshold
    score = jnp.where(corner, score, 0.0)

    # Mask the border where the circle wraps around.
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    inside = (
        (row >= _BORDER) & (row < H - _BORDER)
        & (col >= _BORDER) & (col < W - _BORDER)
    )
    score = jnp.where(inside, score, 0.0)

    # 3x3 non-max suppression.
    neigh = [
        jnp.roll(score, (dy, dx), axis=(0, 1))
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if not (dy == 0 and dx == 0)
    ]
    is_max = score >= jnp.stack(neigh).max(axis=0)
    return jnp.where(is_max & corner & inside, score, 0.0)


def _topk_iterative(cells, k):
    """Top-k by k rounds of (max, argmax, erase) — no lax.top_k, no
    gathers. For small k this matches lax.top_k (first-index tie rule)
    and, unlike top_k, lowers to plain VPU reductions that stay fast
    under vmap (batched top_k cost ~7x the unbatched form on TPU,
    measured in scripts/profile_vmap_tracker.py)."""
    col = jnp.arange(cells.shape[-1])
    cur = cells
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)
        vals.append(jnp.max(cur, axis=-1))
        idxs.append(i)
        cur = jnp.where(col == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


@partial(jax.jit, static_argnums=(2, 3, 4))
def detect_grid_features(score, mask, grid_row, grid_col, per_cell):
    """Top-`per_cell` responses per grid cell.

    score: (H, W) from fast_score_map; mask: (H, W) bool, False suppresses
    (the 7x7 occupancy mask of image.py:326-330). Cell geometry matches the
    reference: cell_h = ceil(H/grid_row), cell_w = ceil(W/grid_col)
    (image.py:513-519).

    Returns (xy (G, per_cell, 2) float32 pixel coords, resp (G, per_cell),
    valid (G, per_cell)) with G = grid_row * grid_col.
    """
    H, W = score.shape
    cell_h = -(-H // grid_row)
    cell_w = -(-W // grid_col)
    score = jnp.where(mask, score, 0.0)
    padded = jnp.zeros((grid_row * cell_h, grid_col * cell_w), score.dtype)
    padded = padded.at[:H, :W].set(score)
    cells = padded.reshape(grid_row, cell_h, grid_col, cell_w)
    cells = cells.transpose(0, 2, 1, 3).reshape(
        grid_row * grid_col, cell_h * cell_w
    )
    resp, idx = _topk_iterative(cells, per_cell)
    iy = idx // cell_w
    ix = idx % cell_w
    gr = jnp.arange(grid_row * grid_col)
    base_y = (gr // grid_col) * cell_h
    base_x = (gr % grid_col) * cell_w
    x = (base_x[:, None] + ix).astype(jnp.float32)
    y = (base_y[:, None] + iy).astype(jnp.float32)
    valid = resp > 0.0
    return jnp.stack([x, y], axis=-1), resp, valid
