"""Gaussian image pyramid for pyramidal LK.

The reference hands raw images to cv2 and lets `calcOpticalFlowPyrLK` build
its pyramid internally (MSCKF/image.py:149-164 passes the image through;
maxLevel=3, config.py:33). This is the explicit equivalent: the classic
5-tap [1 4 6 4 1]/16 binomial filter + 2x decimation (what cv2.pyrDown
uses), built once per frame and shared by the temporal and stereo trackers.
"""

import jax.numpy as jnp

# Plain floats, converted inside the traced function: a module-level
# jnp.asarray would initialize the XLA backend at import time, which
# breaks jax.distributed.initialize (it must run before ANY backend use).
_KERNEL = tuple(v / 16.0 for v in (1.0, 4.0, 6.0, 4.0, 1.0))


def _blur_axis(img, axis):
    k = jnp.asarray(_KERNEL, img.dtype)
    pad = [(0, 0)] * img.ndim
    pad[axis] = (2, 2)
    x = jnp.pad(img, pad, mode="edge")
    out = jnp.zeros_like(img)
    for i in range(5):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + img.shape[axis])
        out = out + k[i] * x[tuple(sl)]
    return out


def pyr_down(img):
    """One pyramid level: binomial blur then 2x decimation.

    Decimation via reshape-and-slice rather than `[::2, ::2]` — XLA lowers
    the strided slice to a scalar-path gather on TPU (~0.9 ms per level on
    a v5e), while the reshape form stays a dense copy.
    """
    blurred = _blur_axis(_blur_axis(img, 0), 1)
    H, W = blurred.shape
    if H % 2 or W % 2:
        # The reshape decimation needs even dims; crop one row/col (the
        # old [::2, ::2] silently sampled the same pixels anyway).
        blurred = blurred[: H - H % 2, : W - W % 2]
        H, W = blurred.shape
    return blurred.reshape(H // 2, 2, W // 2, 2)[:, 0, :, 0]


def build_pyramid(img, levels):
    """Returns a list of `levels + 1` images, level 0 = full resolution.

    The input is converted to float32 once — all downstream sampling is
    float math on the VPU.
    """
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr
