"""Oriented-FAST + steered-BRIEF descriptors and an MXU Hamming matcher.

TPU-native replacement for the reference ESKF front-end's cv2.ORB_create /
BFMatcher(NORM_HAMMING, crossCheck=True) (ESKF/stereo.py:269-284, 326-330).

Design notes (why this is not a translation):

  * Keypoints come from the existing dense FAST-9 score map + grid top-k
    (ops/fast.py) — fixed count K, mask for empties.
  * Orientation is the ORB intensity centroid over a circular patch,
    computed on gathered fixed-size patches (one vmapped dynamic_slice per
    keypoint — XLA turns this into a batched gather).
  * The descriptor is steered BRIEF-256: a fixed Gaussian test pattern
    (module-level, seeded) rotated by the keypoint angle and sampled
    bilinearly from the blurred patch. All K descriptors are produced by
    one vmap — no per-keypoint Python.
  * Matching: Hamming distance between bit vectors a, b equals
    (256 - s_a . s_b) / 2 with s = 1 - 2*bits in {-1, +1}. So the full
    K x K distance matrix is ONE (K, 256) @ (256, K) matmul — it runs on
    the MXU instead of a popcount loop. Cross-check = mutual argmin.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.ops.fast import fast_score_map, detect_grid_features
from vio_msckf_tpu.ops.pyramid import _blur_axis

PATCH = 33          # gathered patch edge (center +/- 16)
_R = PATCH // 2
N_BITS = 256

# Fixed BRIEF test pattern: 256 coordinate pairs ~ N(0, (patch/5)^2),
# clipped so bilinear sampling after any rotation stays inside the patch.
_rng = np.random.RandomState(20260818)
_PAIRS = np.clip(_rng.normal(0.0, PATCH / 5.0, (N_BITS, 4)), -_R + 2, _R - 2)

# Circular mask for the intensity centroid (ORB uses radius ~15).
_yy, _xx = np.mgrid[-_R:_R + 1, -_R:_R + 1]
_CIRC = ((_xx ** 2 + _yy ** 2) <= (_R - 1) ** 2).astype(np.float32)


def _gather_patches(img, xy):
    """(K, PATCH, PATCH) patches centered on integer-rounded keypoints."""
    H, W = img.shape
    pad = _R + 1
    padded = jnp.pad(img, pad)
    ij = jnp.round(xy).astype(jnp.int32)

    def one(c):
        # top-left corner in padded coords
        return jax.lax.dynamic_slice(
            padded, (c[1] + pad - _R, c[0] + pad - _R), (PATCH, PATCH)
        )

    return jax.vmap(one)(ij)


def _orientations(patches):
    """ORB intensity-centroid angle per patch: atan2(m01, m10)."""
    circ = jnp.asarray(_CIRC)
    xs = jnp.asarray(_xx, jnp.float32)
    ys = jnp.asarray(_yy, jnp.float32)
    w = patches * circ
    m10 = jnp.sum(w * xs, axis=(1, 2))
    m01 = jnp.sum(w * ys, axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _bilinear_patch(patch, x, y):
    """Sample one patch at continuous offsets (x, y) from its center."""
    px = x + _R
    py = y + _R
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, PATCH - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, PATCH - 2)
    fx = px - x0
    fy = py - y0
    v00 = patch[y0, x0]
    v01 = patch[y0, x0 + 1]
    v10 = patch[y0 + 1, x0]
    v11 = patch[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def describe(img, xy, valid):
    """Steered BRIEF-256 for K keypoints.

    img: (H, W) float; xy: (K, 2) pixel coords; valid: (K,) bool.
    Returns (bits (K, 256) bool, angle (K,)).
    """
    # BRIEF compares on a smoothed image (reference: ORB's internal blur).
    img = _blur_axis(_blur_axis(img.astype(jnp.float32), 0), 1)
    patches = _gather_patches(img, xy)
    angles = _orientations(patches)

    pairs = jnp.asarray(_PAIRS, jnp.float32)  # (256, 4) = x1 y1 x2 y2

    def one(patch, ang):
        c, s = jnp.cos(ang), jnp.sin(ang)
        x1 = c * pairs[:, 0] - s * pairs[:, 1]
        y1 = s * pairs[:, 0] + c * pairs[:, 1]
        x2 = c * pairs[:, 2] - s * pairs[:, 3]
        y2 = s * pairs[:, 2] + c * pairs[:, 3]
        i1 = _bilinear_patch(patch, x1, y1)
        i2 = _bilinear_patch(patch, x2, y2)
        return i1 < i2

    bits = jax.vmap(one)(patches, angles)
    bits = bits & valid[:, None]
    return bits, angles


def hamming_matrix(bits_a, bits_b):
    """(Ka, Kb) Hamming distances as ONE matmul on the MXU."""
    sa = (1.0 - 2.0 * bits_a.astype(jnp.float32))
    sb = (1.0 - 2.0 * bits_b.astype(jnp.float32))
    dots = jax.lax.dot_general(
        sa, sb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (N_BITS - dots) * 0.5


def match_crosscheck(bits_a, valid_a, bits_b, valid_b, max_distance=80.0):
    """Mutual-nearest-neighbour Hamming matching (BFMatcher crossCheck).

    Returns (idx_b (Ka,) int32, dist (Ka,), matched (Ka,) bool): for each
    valid a, its mutual best b within max_distance.
    """
    BIG = 1e9
    D = hamming_matrix(bits_a, bits_b)
    D = jnp.where(valid_a[:, None] & valid_b[None, :], D, BIG)
    best_b = jnp.argmin(D, axis=1)                  # (Ka,)
    best_a = jnp.argmin(D, axis=0)                  # (Kb,)
    dist = jnp.min(D, axis=1)
    mutual = best_a[best_b] == jnp.arange(D.shape[0])
    matched = mutual & (dist <= max_distance) & valid_a
    return best_b.astype(jnp.int32), dist, matched


def detect_and_describe(img, threshold, grid_row, grid_col, per_cell):
    """FAST keypoints (grid top-k) + steered BRIEF descriptors.

    Returns (xy (K, 2), resp (K,), bits (K, 256), angle (K,), valid (K,))
    with K = grid_row * grid_col * per_cell (fixed).
    """
    score = fast_score_map(img, threshold)
    # Keep descriptors' support inside the frame.
    H, W = img.shape
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    interior = ((row >= _R) & (row < H - _R)
                & (col >= _R) & (col < W - _R))
    xy, resp, valid = detect_grid_features(
        score, interior, grid_row, grid_col, per_cell
    )
    xy = xy.reshape(-1, 2)
    resp = resp.reshape(-1)
    valid = valid.reshape(-1)
    bits, angle = describe(img, xy, valid)
    return xy, resp, bits, angle, valid
