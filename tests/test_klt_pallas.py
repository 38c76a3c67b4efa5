"""Parity of the Pallas LK level kernel (ops/klt_pallas.py) against the
XLA implementation (ops/klt.py) — same gathers, same formulas, different
execution. Reduction association differs (the kernel resamples row-at-a-
time), so positions agree to sub-1e-2 px rather than bit-exactly; status
flags must agree exactly except for features balanced on a gate edge.

Runs the kernel through the Pallas interpreter on CPU (the compiled TPU
path is exercised by bench.py / scripts/ab_lk.py on hardware).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.ops.klt import prepare_pyramid, pyramidal_lk, lk_verify
from vio_msckf_tpu.ops.pyramid import build_pyramid


def _textured(rng, H, W):
    """Smooth random texture with plenty of corners."""
    img = rng.uniform(0, 1, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    img = img + 0.3 * np.kron(
        rng.uniform(0, 1, (H // 2, W // 2)), np.ones((2, 2)))
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, 1.0)
    return (img * 200).astype(np.float32)


@pytest.fixture(scope="module")
def image_pair():
    rng = np.random.default_rng(5)
    H, W = 240, 376
    img0 = _textured(rng, H, W)
    # img1(p) = img0(p + d): features move by -d from img0 to img1.
    dx, dy = 3.4, -2.2
    yy, xx = np.mgrid[0:H, 0:W]
    from scipy.ndimage import map_coordinates
    img1 = map_coordinates(img0, [yy + dy, xx + dx], order=1, mode="nearest")
    return img0.astype(np.float32), img1.astype(np.float32), (-dx, -dy)


def _points(rng, H, W, n=64):
    pts = np.stack([
        rng.uniform(30, W - 30, n), rng.uniform(30, H - 30, n)
    ], axis=1).astype(np.float32)
    return pts


def test_level_kernel_matches_xla(image_pair):
    img0, img1, (dx, dy) = image_pair
    H, W = img0.shape
    rng = np.random.default_rng(7)
    pts = _points(rng, H, W)
    init = pts.copy()  # deliberately wrong by (dx, dy)

    pyr0 = prepare_pyramid(build_pyramid(jnp.asarray(img0), 2))
    pyr1 = prepare_pyramid(build_pyramid(jnp.asarray(img1), 2))

    g_x, s_x, e_x = pyramidal_lk(pyr0, pyr1, jnp.asarray(pts),
                                 jnp.asarray(init), 15, 30, 0.01,
                                 backend="xla")
    g_p, s_p, e_p = pyramidal_lk(pyr0, pyr1, jnp.asarray(pts),
                                 jnp.asarray(init), 15, 30, 0.01,
                                 backend="pallas")
    g_x, s_x, g_p, s_p = map(np.asarray, (g_x, s_x, g_p, s_p))

    # Both backends recover the true shift on good tracks.
    good = s_x & s_p
    assert good.sum() > 40
    flow_p = g_p[good] - pts[good]
    np.testing.assert_allclose(
        flow_p.mean(axis=0), [dx, dy], atol=0.1)

    # Positional parity on mutually-successful tracks.
    diff = np.linalg.norm(g_x[good] - g_p[good], axis=1)
    assert np.percentile(diff, 95) < 2e-2, diff.max()
    # Status parity: near-total agreement (gate-edge features may flip).
    assert (s_x == s_p).mean() > 0.95


def test_level_kernel_verify_path(image_pair):
    """lk_verify (the merged backward pass) through the Pallas backend."""
    img0, img1, (dx, dy) = image_pair
    H, W = img0.shape
    rng = np.random.default_rng(11)
    pts = _points(rng, H, W, n=32)
    fwd = pts + np.array([dx, dy], np.float32)  # true img1 positions

    pyr0 = prepare_pyramid(build_pyramid(jnp.asarray(img0), 2))
    pyr1 = prepare_pyramid(build_pyramid(jnp.asarray(img1), 2))

    outs = {}
    for be in ("xla", "pallas"):
        (pa, sa, _), (pb, sb, _) = lk_verify(
            pyr1, pyr0, pyr1, pyr0,
            jnp.asarray(fwd), jnp.asarray(pts),
            jnp.asarray(fwd), jnp.asarray(pts),
            15, 30, 0.01, backend=be,
        )
        outs[be] = (np.asarray(pa), np.asarray(sa))

    pa_x, sa_x = outs["xla"]
    pa_p, sa_p = outs["pallas"]
    good = sa_x & sa_p
    assert good.sum() > 20
    # The backward pass lands back on the seed for both backends.
    assert np.abs(pa_p[good] - pts[good]).max() < 0.5
    diff = np.linalg.norm(pa_x[good] - pa_p[good], axis=1)
    assert np.percentile(diff, 95) < 2e-2


def test_kernel_vmap_batch_folding(image_pair):
    """vmap over a batch dim must fold into the feature dim and give the
    same per-sequence results as unbatched calls."""
    img0, img1, _ = image_pair
    H, W = img0.shape
    rng = np.random.default_rng(3)
    pts = _points(rng, H, W, n=16)
    init = pts.copy()

    pyr0 = prepare_pyramid(build_pyramid(jnp.asarray(img0), 1))
    pyr1 = prepare_pyramid(build_pyramid(jnp.asarray(img1), 1))

    def run(p, i):
        return pyramidal_lk(pyr0, pyr1, p, i, 15, 30, 0.01,
                            backend="pallas")

    g1, s1, e1 = run(jnp.asarray(pts), jnp.asarray(init))
    pts_b = jnp.stack([jnp.asarray(pts), jnp.asarray(pts) + 0.0])
    init_b = jnp.stack([jnp.asarray(init), jnp.asarray(init)])
    gb, sb, eb = jax.vmap(run)(pts_b, init_b)

    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(g1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(g1),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sb[0]), np.asarray(s1))
