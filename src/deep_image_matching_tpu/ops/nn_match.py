"""Descriptor nearest-neighbor matching as batched MXU matmuls.

TPU-native replacement for the reference's kornia ``DescriptorMatcher``
(``matchers/kornia_matcher.py:9-80``; modes nn / mnn / snn / smnn with a
Lowe-ratio threshold). Distances are computed as one (N0, N1) matmul per pair
— on TPU this is exactly what the MXU wants — and the nn / ratio / mutual
logic is masked elementwise work on the VPU. Everything is fixed-capacity
padded: invalid rows/cols get +inf distance and the outputs are
(capacity,) index arrays with validity masks, trimmed on host.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _dist_matrix(d0, d1, m0, m1):
    """Squared L2 distances via the matmul identity; invalid entries = +inf.

    d0: (N0, D), d1: (N1, D) — rows L2-normalized or raw; works either way.
    """
    d0 = d0.astype(jnp.float32)
    d1 = d1.astype(jnp.float32)
    sq0 = (d0**2).sum(-1, keepdims=True)          # (N0, 1)
    sq1 = (d1**2).sum(-1, keepdims=True).T        # (1, N1)
    cross = jnp.dot(d0, d1.T, preferred_element_type=jnp.float32)
    dist = jnp.maximum(sq0 + sq1 - 2.0 * cross, 0.0)
    dist = jnp.where(m0[:, None] & m1[None, :], dist, _INF)
    return dist


@functools.partial(jax.jit, static_argnames=("mode",))
def nn_match(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    mode: str = "smnn",
    ratio_th: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match two padded descriptor sets.

    Args:
      desc0: (N0, D), desc1: (N1, D) padded descriptors (row-major).
      mask0/mask1: validity masks.
      mode: 'nn' | 'mnn' | 'snn' | 'smnn' (kornia-compatible semantics).
      ratio_th: Lowe ratio threshold for snn/smnn.

    Returns:
      matches0: (N0,) int32 — index into desc1 for each desc0 row, -1 if none.
      valid: (N0,) bool — which entries constitute matches.
    """
    dist = _dist_matrix(desc0, desc1, mask0.astype(bool), mask1.astype(bool))

    # nearest + second nearest along axis 1
    nn1_idx = jnp.argmin(dist, axis=1)
    nn1_val = jnp.take_along_axis(dist, nn1_idx[:, None], axis=1)[:, 0]
    dist2 = dist.at[jnp.arange(dist.shape[0]), nn1_idx].set(_INF)
    nn2_val = jnp.min(dist2, axis=1)

    valid = mask0.astype(bool) & jnp.isfinite(nn1_val)

    if mode in ("snn", "smnn"):
        # Lowe ratio test on (non-squared) distances
        ratio = jnp.sqrt(nn1_val) / jnp.sqrt(jnp.maximum(nn2_val, 1e-12))
        good = jnp.where(jnp.isfinite(nn2_val), ratio <= ratio_th, True)
        valid = valid & good
    if mode in ("mnn", "smnn"):
        back = jnp.argmin(dist, axis=0)  # (N1,)
        mutual = back[nn1_idx] == jnp.arange(dist.shape[0])
        valid = valid & mutual

    matches0 = jnp.where(valid, nn1_idx, -1).astype(jnp.int32)
    return matches0, valid


@functools.partial(jax.jit, static_argnames=("mode",))
def nn_match_batch(
    desc0: jnp.ndarray,  # (B, N0, D)
    desc1: jnp.ndarray,  # (B, N1, D)
    mask0: jnp.ndarray,  # (B, N0)
    mask1: jnp.ndarray,  # (B, N1)
    mode: str = "smnn",
    ratio_th: float = 0.95,
):
    """vmapped pair-batch matching — one XLA program per batch."""
    return jax.vmap(lambda a, b, c, d: nn_match(a, b, c, d, mode, ratio_th))(
        desc0, desc1, mask0, mask1
    )


def nn_match_auto(desc0, desc1, mask0, mask1, mode="smnn", ratio_th=0.95):
    """Dispatch: the fused Pallas kernel on TPU (3.6-3.9x measured at
    K=4096-8192, the dense matrix never touches HBM), dense XLA elsewhere."""
    if jax.default_backend() != "cpu":
        from .pallas_nn import nn_match_fused

        return nn_match_fused(desc0, desc1, mask0, mask1, mode=mode,
                              ratio_th=ratio_th)
    return nn_match_batch(desc0, desc1, mask0, mask1, mode=mode,
                          ratio_th=ratio_th)


@functools.partial(jax.jit, static_argnames=("mode",))
def nn_match_with_ratios(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    mode: str = "smnn",
    ratio_th: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """nn_match plus Lowe ratios and the mutual-NN mask (AdaLAM consumes
    ratios as seed scores and mutuality for seed selection).

    Returns (matches0, valid, ratios (N0,), mutual (N0,))."""
    dist = _dist_matrix(desc0, desc1, mask0.astype(bool), mask1.astype(bool))
    nn1_idx = jnp.argmin(dist, axis=1)
    nn1_val = jnp.take_along_axis(dist, nn1_idx[:, None], axis=1)[:, 0]
    dist2 = dist.at[jnp.arange(dist.shape[0]), nn1_idx].set(_INF)
    nn2_val = jnp.min(dist2, axis=1)
    valid = mask0.astype(bool) & jnp.isfinite(nn1_val)
    ratio = jnp.sqrt(nn1_val) / jnp.sqrt(jnp.maximum(nn2_val, 1e-12))
    ratio = jnp.where(jnp.isfinite(nn2_val), ratio, 1.0)
    back = jnp.argmin(dist, axis=0)
    mutual = valid & (back[nn1_idx] == jnp.arange(dist.shape[0]))
    if mode in ("snn", "smnn"):
        valid = valid & (ratio <= ratio_th)
    if mode in ("mnn", "smnn"):
        valid = valid & mutual
    matches0 = jnp.where(valid, nn1_idx, -1).astype(jnp.int32)
    return matches0, valid, ratio, mutual
