"""Parity of the batched Gauss-Jordan SPD solve kernel (ops/spd_pallas.py)
against LAPACK on gating-shaped systems, including the padded-row pattern
(B rows equal to s*e_i for unobserved clone slots) and vmap folding."""

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.ops.spd_pallas import spd_solve


def _gating_like_B(rng, m, n_active, s=0.035 ** 2):
    """H P H^T + s I with only the first n_active rows of H nonzero."""
    D = 141
    H = np.zeros((m, D))
    H[:n_active] = rng.normal(size=(n_active, D)) * 0.5
    A = rng.normal(size=(D, D)) * 0.05
    P = A @ A.T
    B = H @ P @ H.T + s * np.eye(m)
    return (B + B.T) / 2.0


def test_matches_lapack_m80():
    rng = np.random.default_rng(0)
    F, m, k = 12, 80, 4
    Bs = np.stack([
        _gating_like_B(rng, m, n_active=rng.integers(4, m + 1))
        for _ in range(F)
    ]).astype(np.float32)
    Rs = rng.normal(size=(F, m, k)).astype(np.float32)

    X = np.asarray(jax.vmap(spd_solve)(jnp.asarray(Bs), jnp.asarray(Rs)))
    want = np.stack([
        np.linalg.solve(Bs[i].astype(np.float64), Rs[i].astype(np.float64))
        for i in range(F)
    ])
    scale = np.abs(want).max()
    np.testing.assert_allclose(X, want, atol=2e-3 * max(scale, 1.0),
                               rtol=2e-3)


def test_matches_lapack_m8_and_unbatched():
    rng = np.random.default_rng(1)
    m, k = 8, 4
    B = _gating_like_B(rng, m, n_active=5).astype(np.float32)
    R = rng.normal(size=(m, k)).astype(np.float32)
    X = np.asarray(spd_solve(jnp.asarray(B), jnp.asarray(R)))
    want = np.linalg.solve(B.astype(np.float64), R.astype(np.float64))
    np.testing.assert_allclose(X, want, atol=1e-4 * max(np.abs(want).max(), 1.0), rtol=1e-3)


def test_nested_vmap_folds():
    """Engine-batch x feature-table double vmap must fold and agree."""
    rng = np.random.default_rng(2)
    Bt, F, m, k = 2, 6, 16, 4
    Bs = np.stack([
        [_gating_like_B(rng, m, n_active=m) for _ in range(F)]
        for _ in range(Bt)
    ]).astype(np.float32)
    Rs = rng.normal(size=(Bt, F, m, k)).astype(np.float32)
    X = np.asarray(jax.vmap(jax.vmap(spd_solve))(
        jnp.asarray(Bs), jnp.asarray(Rs)))
    for b in range(Bt):
        for f in range(F):
            want = np.linalg.solve(Bs[b, f].astype(np.float64),
                                   Rs[b, f].astype(np.float64))
            np.testing.assert_allclose(
                X[b, f], want, atol=2e-3 * max(np.abs(want).max(), 1.0),
                rtol=2e-3)
