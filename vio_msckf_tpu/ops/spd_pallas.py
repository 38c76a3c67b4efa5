"""Batched SPD solve as a Pallas TPU kernel (feature-gating hot path).

The chi-square gate (filter/update.py:feature_gamma, reference
msckf.py:606-614) solves one (m, m) symmetric positive definite system
with 4 right-hand sides per candidate feature: B = H P H^T + s I with
m = 4*K rows. Under the feature vmap XLA lowers this to batched
"Cholesky" + "InvertDiagBlocksLowerTriangular" TPU custom calls that the
r5 on-chip profile measured at ~0.85 ms/frame running at ~20 GFLOP/s —
the largest remaining custom-call cluster after the LU fix.

This kernel replaces the factorization with Gauss-Jordan elimination on
the augmented system [B | R], UNROLLED over the (static) m pivots and
vectorized across a block of features: every step is a rank-1 update of
the (BF, m, m+k) block, which is exactly the shape the VPU wants. No
pivoting is needed: Gaussian elimination without pivoting is backward
stable for symmetric positive definite matrices (Higham, Accuracy and
Stability of Numerical Algorithms, ch. 10), and every B here carries the
s I > 0 observation-noise diagonal (masked padding rows are exactly
s * e_i).

Parity: same X = B^{-1} R as the Cholesky path up to f32 roundoff
(tests/test_spd_pallas.py asserts ~1e-4 relative agreement against
LAPACK on gating-shaped systems).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bf(F, m, k):
    """Features per program: keep the augmented block under ~256 KB.
    The unrolled elimination holds O(10-20) live copies of the block
    through Mosaic's scoped stack (measured: a 1.5 MB block hit a ~30 MB
    scoped-vmem allocation at batch 16), so the block budget must stay
    well under VMEM/20."""
    budget = (256 * 2 ** 10) / (m * (m + k) * 4)
    bf = 1
    while bf * 2 <= min(F, budget):
        bf *= 2
    return max(1, bf)


def _gj_kernel(aug_ref, out_ref, *, m, k):
    """Gauss-Jordan on [B | R] -> out X = B^{-1} R. aug (BF, m, m+k)."""
    aug = aug_ref[:]
    # Row index grid for the one-hot pivot-row masks (capturing a numpy
    # eye as a kernel constant is not allowed; iota folds statically).
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    for i in range(m):
        piv = aug[:, i:i + 1, i:i + 1]                    # (BF, 1, 1)
        inv = 1.0 / piv
        row = aug[:, i:i + 1, :] * inv                    # (BF, 1, m+k)
        col = aug[:, :, i:i + 1]                          # (BF, m, 1)
        e_i = (rows_idx == i).astype(aug.dtype)           # (1, m, 1)
        # Eliminate column i from every row but i, then write row i
        # as the normalized pivot row.
        elim = aug - col * row
        aug = elim * (1.0 - e_i) + e_i * row
    out_ref[:] = aug[:, :, m:]


@partial(jax.jit, static_argnums=(2,))
def _spd_solve_flat(B, R, interpret=False):
    """B (F, m, m), R (F, m, k) -> X (F, m, k) = B^{-1} R."""
    F, m, _ = B.shape
    k = R.shape[2]
    BF = _pick_bf(F, m, k)
    Fp = -(-F // BF) * BF
    if Fp != F:
        # Pad with identity systems (zero RHS): exactly solvable, inert.
        eyep = jnp.broadcast_to(jnp.eye(m, dtype=B.dtype), (Fp - F, m, m))
        B = jnp.concatenate([B, eyep], axis=0)
        R = jnp.concatenate(
            [R, jnp.zeros((Fp - F, m, k), R.dtype)], axis=0)
    aug = jnp.concatenate([B, R], axis=2)                 # (Fp, m, m+k)

    out = pl.pallas_call(
        partial(_gj_kernel, m=m, k=k),
        grid=(Fp // BF,),
        in_specs=[
            pl.BlockSpec((BF, m, m + k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BF, m, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, m, k), B.dtype),
        interpret=interpret,
    )(aug)
    return out[:F]


@lru_cache(maxsize=None)
def _make_folding(interpret):
    @jax.custom_batching.custom_vmap
    def fn(B, R):
        return _spd_solve_flat(B, R, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, B, R):
        Bb, Rb = in_batched
        n = axis_size
        if not Bb:
            B = jnp.broadcast_to(B, (n,) + B.shape)
        if not Rb:
            R = jnp.broadcast_to(R, (n,) + R.shape)
        out = fn(B.reshape((-1,) + B.shape[2:]),
                 R.reshape((-1,) + R.shape[2:]))
        return out.reshape((n,) + (B.shape[1],) + out.shape[1:]), True

    return fn


def spd_solve(B, R, interpret=None):
    """Solve B X = R for SPD B, batched over any leading vmap axes.

    Unbatched call: B (m, m), R (m, k) -> (m, k); under vmap the batch
    folds into the kernel's feature-block grid (custom_vmap), so the
    feature table and the engine's sequence batch both reach the kernel
    as one flat batch.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_folding(bool(interpret))
    if B.ndim == 2:
        return fn(B[None], R[None])[0]
    return fn(B, R)
