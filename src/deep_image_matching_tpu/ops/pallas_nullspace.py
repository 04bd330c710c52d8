"""Lane-vectorized 8x9 null-space solve as a Pallas TPU kernel.

RANSAC's hypothesis stage needs the null vector of a minimal 8x9 epipolar
constraint system for every hypothesis (``ops/ransac.py`` — the TPU-native
replacement for the per-pair C++ estimators the reference calls at
``utils/geometric_verification.py:104-161``). ``jnp.linalg.qr`` on a
(B*iters, 9, 8) stack lowers to XLA's generic batched QR — measured 8.6 ms
for 16k solves on v5e, ~1/3 of total RANSAC time — because each tiny
matrix is handled as a unit of blocked Householder with batched-small-op
overhead.

This kernel flips the layout completely: the HYPOTHESIS axis is tiled over
sublanes x lanes as ordinary (S, TI) vector planes, and the 72 matrix
entries are PYTHON-level variables (leading array dims of the block). A
Householder QR of A^T — 8 fully-unrolled reflection steps plus the
back-accumulation of Q's last column (the null direction) — then compiles
to ~1k pure element-wise VPU ops shared by every hypothesis in the tile,
with zero sublane shuffles or relayouts. Same math as
``jnp.linalg.qr(A^T, mode="complete")[..., 8]``: robust on the degenerate
configurations where naive 8x8 elimination breaks (pure-translation F has
f_33 = 0, so fixing f_33 = 1 and solving is singular exactly there).

Layout notes learned the hard way (kept for future kernels):
- a (9, 8, TI) block with matrix rows in sublanes forces a sublane
  relayout on every column slice — 49 ms instead of 0.4 ms;
- ``jnp.transpose`` of a minormost-9 array on the XLA side costs >100 ms
  at (16384, 8, 9) — constraints must be BUILT in plane layout, not
  transposed into it (``ops/ransac.py:_prep_pair``);
- in-kernel ``.at[slice].set`` traces to scatter (no Mosaic lowering) and
  whole-array ``.at[0:].set`` / zeros-ones concats trip the captured-
  constant check — the full-matrix masked update with python-indexed
  planes avoids all of it (applying H_k to already-reduced columns is an
  exact no-op, so skipping them is purely an op-count optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nullspace_kernel(a_ref, f_ref):
    # a_ref: (9, 8, S, TI) — A^T entry planes; f_ref: (9, S, TI)
    X = [[a_ref[c, r].astype(jnp.float32) for r in range(8)]
         for c in range(9)]  # X[row][col] of A^T: rows 0..8, cols 0..7

    # Matrix scale for the rank-deficiency guard: when a column's remaining
    # norm is at f32-roundoff scale relative to the matrix (rank < 8 — e.g.
    # all 8 correspondences on a homography, common for pure-translation
    # minimal samples), the "reflector" would be built from elimination
    # noise; its direction is compilation-dependent and poisons the null
    # vector's orthogonality to the row space (observed 0.15 residuals).
    # Skipping the reflection (H = identity) is exact there: the column is
    # already eliminated to working precision.
    total2 = X[0][0] * X[0][0]
    for c in range(9):
        for r in range(8):
            if c or r:
                total2 = total2 + X[c][r] * X[c][r]
    neg_tol = total2 * 1e-11 + 1e-30

    vs = []      # vs[k][r]: reflector component, r in [k, 9)
    betas = []
    for k in range(8):
        x0 = X[k][k]
        tail2 = X[k + 1][k] * X[k + 1][k]   # sum of squares BELOW the pivot
        for r in range(k + 2, 9):
            tail2 = tail2 + X[r][k] * X[r][k]
        nrm2 = tail2 + x0 * x0
        alpha = -jnp.where(x0 >= 0, 1.0, -1.0) * jnp.sqrt(nrm2)
        v = {k: x0 - alpha}
        for r in range(k + 1, 9):
            v[r] = X[r][k]
        # vtv from the tail sum directly — the algebraically-equal
        # nrm2 - x0^2 + v0^2 cancels catastrophically when the pivot
        # dominates its column and breaks the reflector's orthogonality
        vtv = tail2 + v[k] * v[k]
        # Guard the denominator: for all-zero padded lanes vtv==0 and the
        # untaken where-branch would be inf (NaN gradients if this kernel is
        # ever differentiated). neg_tol keeps the taken branch unchanged.
        beta = jnp.where(nrm2 > neg_tol, 2.0 / jnp.maximum(vtv, neg_tol), 0.0)
        for j in range(k + 1, 8):
            w = v[k] * X[k][j]
            for r in range(k + 1, 9):
                w = w + v[r] * X[r][j]
            w = w * beta
            for r in range(k, 9):
                X[r][j] = X[r][j] - v[r] * w
        vs.append(v)
        betas.append(beta)

    # q = H_1 ... H_8 e_9: Q's last column spans null(A). Built from a
    # traced value (x*0, x*0+1) — literal zeros/ones arrays would be
    # captured constants, which Pallas kernels reject.
    zero = X[0][0] * 0.0
    q = [zero] * 8 + [zero + 1.0]
    for k in reversed(range(8)):
        v, beta = vs[k], betas[k]
        w = v[k] * q[k]
        for r in range(k + 1, 9):
            w = w + v[r] * q[r]
        w = w * beta
        for r in range(k, 9):
            q[r] = q[r] - v[r] * w
    for c in range(9):
        f_ref[c] = q[c].astype(f_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nullspace_planes(A9: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Null vectors from constraint systems in PLANE layout.

    A9: (9, 8, N) float — entry (c, r, n) is A[n][r, c], i.e. coefficient
    c of constraint row r for hypothesis n (this is A^T stored as planes
    over the hypothesis axis). Returns (9, N) unit null vectors with
    A[n] @ f[:, n] ~ 0 — exactly the last column of the complete QR of
    A^T (sign arbitrary). ``interpret=None`` auto-selects interpreter
    mode off-TPU so the same call works in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = A9.shape[-1]
    TI = 128
    S = 8
    tile = S * TI
    pad = (-N) % tile
    A2 = A9.astype(jnp.float32)
    if pad:
        A2 = jnp.concatenate(
            [A2, jnp.zeros((9, 8, pad), jnp.float32)], axis=-1
        )
    Np = A2.shape[-1]
    X = A2.reshape(9, 8, Np // TI, TI)

    grid = (Np // tile,)
    f = pl.pallas_call(
        _nullspace_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((9, 8, S, TI), lambda i: (0, 0, i, 0))],
        out_specs=pl.BlockSpec((9, S, TI), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((9, Np // TI, TI), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(X)
    return f.reshape(9, Np)[:, :N]


def nullspace_8x9(A: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Adapter for (..., 8, 9) constraint stacks -> (..., 9) null vectors.

    Convenience/test entry: transposes into plane layout first, which is
    slow on TPU for large stacks — hot paths should build planes directly
    and call :func:`nullspace_planes`.
    """
    batch = A.shape[:-2]
    A2 = A.reshape(-1, 8, 9)
    planes = jnp.transpose(A2, (2, 1, 0))  # (9, 8, N)
    f = nullspace_planes(planes, interpret=interpret)  # (9, N)
    return jnp.transpose(f, (1, 0)).reshape(*batch, 9)
