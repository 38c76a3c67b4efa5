"""Fused FAST-9 score + 3x3 non-max suppression as ONE Pallas TPU kernel.

TPU-native replacement for the hot half of cv2.FastFeatureDetector
(reference MSCKF/image.py:50,175,333). The XLA version (ops/fast.py)
materializes a (16, H, W) circle-difference stack plus 16 rolled copies in
HBM (~25 MB of intermediate traffic per frame at 752x480); the profile
names that FAST cluster as the tracker's largest remaining cost
(PROFILE.md round 3: ~2.8 ms/frame with top-k and occupancy). This kernel
streams row strips through VMEM instead: each grid step loads a
(STRIP+8, 768) slab once and computes circle diffs, the exact FAST-9 arc
score (max over the 16 cyclic 9-windows of the window min, split 9=3+3+3),
the corner threshold, the border mask, and 3x3 NMS entirely on-chip —
one HBM read and one HBM write per pixel.

Numerics are bit-identical to ops/fast.fast_score_map: identical op order
on identical f32 values; the only difference is where intermediates live.
Verified by tests/test_ops.py::test_fast_pallas_matches_xla (interpret
mode on CPU + compiled on TPU via the bench path).

Layout: the image is zero-padded to (H+8, 768) on the host-visible side
(rows +4/+4, cols +4 left / +12 right so the lane dimension is a multiple
of 128). Zero padding never creates corners: the FAST border mask excludes
every pixel whose Bresenham circle touches the pad.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vio_msckf_tpu.ops.fast import _CIRCLE, _BORDER

_STRIP = 48       # output rows per grid step
_PAD = 4          # top/left zero padding inside the canvas


def _canvas_lanes(W):
    """Lane width for a given image width: W plus the left pad plus at
    least _BORDER slack on the right, rounded up to a multiple of 128
    (752 -> 768; wider cameras get a wider canvas instead of crashing,
    ADVICE r4)."""
    return -(-(W + _PAD + _BORDER) // 128) * 128


def _shift_cols(x, dx, lanes):
    """Value at column m+dx placed at column m (cyclic; wrap only touches
    pad/border columns, which the border mask zeroes)."""
    if dx == 0:
        return x
    return pltpu.roll(x, (-dx) % lanes, 1)  # roll requires shift >= 0


def _min3(a, b, c):
    return jnp.minimum(jnp.minimum(a, b), c)


def _arc9(ds):
    """Exact FAST-9 response for one polarity: max over the 16 cyclic
    windows of the min over 9 consecutive circle diffs (9 = 3+3+3)."""
    m3 = [_min3(ds[i], ds[(i + 1) % 16], ds[(i + 2) % 16])
          for i in range(16)]
    best = None
    for i in range(16):
        m9 = _min3(m3[i], m3[(i + 3) % 16], m3[(i + 6) % 16])
        best = m9 if best is None else jnp.maximum(best, m9)
    return best


def _fast_nms_kernel(img_ref, out_ref, *, threshold, H, W, lanes):
    i = pl.program_id(0)
    r0 = i * _STRIP
    # Slab covering score rows [r0-1, r0+STRIP+1) plus the circle radius:
    # padded rows [r0, r0+STRIP+8). Score-extended row j (0..STRIP+1) maps
    # to original row r0-1+j == slab row j+3.
    slab = img_ref[pl.ds(r0, _STRIP + 8), :]
    E = _STRIP + 2
    center = slab[3:3 + E, :]

    ds = []
    for dy, dx in _CIRCLE:
        neigh = _shift_cols(slab[3 + dy:3 + dy + E, :], dx, lanes)
        ds.append(neigh - center)

    score = jnp.maximum(_arc9(ds), _arc9([-d for d in ds]))
    corner = score > threshold

    # Border mask in original coordinates: rows r in [B, H-B), cols c in
    # [B, W-B); canvas column m = c + _PAD.
    row = jax.lax.broadcasted_iota(jnp.int32, (E, lanes), 0) + (r0 - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (E, lanes), 1) - _PAD
    inside = (
        (row >= _BORDER) & (row < H - _BORDER)
        & (col >= _BORDER) & (col < W - _BORDER)
    )
    score = jnp.where(corner & inside, score, 0.0)

    # 3x3 NMS on the extended strip; output rows are j = 1..STRIP.
    mid = score[1:1 + _STRIP, :]
    neigh_max = None
    for dy in (-1, 0, 1):
        band = score[1 + dy:1 + dy + _STRIP, :]
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = _shift_cols(band, dx, lanes)
            neigh_max = n if neigh_max is None else jnp.maximum(neigh_max, n)
    out_ref[:, :] = jnp.where(mid >= neigh_max, mid, 0.0)


@partial(jax.jit, static_argnums=(1, 2))
def fast_score_map_pallas(img, threshold, interpret=False):
    """Drop-in for ops/fast.fast_score_map on TPU: (H, W) image ->
    (H, W) NMS'd FAST-9 score map."""
    img = img.astype(jnp.float32)
    H, W = img.shape
    lanes = _canvas_lanes(W)
    Hp = -(-H // _STRIP) * _STRIP  # strip-aligned; pad rows score 0 anyway
    canvas = jnp.zeros((Hp + 2 * _PAD, lanes), jnp.float32)
    canvas = canvas.at[_PAD:_PAD + H, _PAD:_PAD + W].set(img)

    out = pl.pallas_call(
        partial(_fast_nms_kernel, threshold=float(threshold), H=H, W=W,
                lanes=lanes),
        grid=(Hp // _STRIP,),
        in_specs=[
            pl.BlockSpec((Hp + 2 * _PAD, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_STRIP, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, lanes), jnp.float32),
        interpret=interpret,
    )(canvas)
    return out[:H, _PAD:_PAD + W]
