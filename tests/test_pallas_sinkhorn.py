"""Fused Pallas Sinkhorn sweeps vs the dense implementation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_fused_sinkhorn_matches_dense():
    from deep_image_matching_tpu.models.superglue import (
        masked_log_optimal_transport,
    )

    rng = np.random.default_rng(0)
    B, M, N = 2, 96, 128
    scores = rng.normal(size=(B, M, N)).astype(np.float32)
    mask0 = np.ones((B, M), bool)
    mask1 = np.ones((B, N), bool)
    mask0[:, 80:] = False
    mask1[:, 100:] = False
    ref = np.asarray(
        masked_log_optimal_transport(
            jnp.asarray(scores), jnp.asarray(mask0), jnp.asarray(mask1),
            jnp.asarray(0.7), 30, impl="xla",
        )
    )
    got = np.asarray(
        masked_log_optimal_transport(
            jnp.asarray(scores), jnp.asarray(mask0), jnp.asarray(mask1),
            jnp.asarray(0.7), 30, impl="pallas",
        )
    )
    # compare on valid entries (padding rows carry -inf sentinels)
    valid = mask0[:, :, None] & mask1[:, None, :]
    np.testing.assert_allclose(got[:, :M, :N][valid], ref[:, :M, :N][valid],
                               atol=1e-3)
    # dustbin row/col too
    np.testing.assert_allclose(got[:, -1, :100], ref[:, -1, :100], atol=1e-3)
    np.testing.assert_allclose(got[:, :80, -1], ref[:, :80, -1], atol=1e-3)


def test_fused_sinkhorn_unaligned_shapes():
    """Regression: (M+1, N+1) couplings are never block-aligned (4097 at
    K=4096); the fused path pads to block multiples with -1e30. Verified on
    TPU hardware at 4097 (garbage edge-block reads produced NaN before)."""
    from deep_image_matching_tpu.models.superglue import (
        masked_log_optimal_transport,
    )

    rng = np.random.default_rng(2)
    B, M, N = 1, 130, 258   # -> couplings (131, 259): every block ragged
    scores = rng.normal(size=(B, M, N)).astype(np.float32)
    mask0 = np.ones((B, M), bool)
    mask1 = np.ones((B, N), bool)
    mask0[:, 100:] = False
    mask1[:, 200:] = False
    ref = np.asarray(masked_log_optimal_transport(
        jnp.asarray(scores), jnp.asarray(mask0), jnp.asarray(mask1),
        jnp.asarray(0.7), 25, impl="xla"))
    got = np.asarray(masked_log_optimal_transport(
        jnp.asarray(scores), jnp.asarray(mask0), jnp.asarray(mask1),
        jnp.asarray(0.7), 25, impl="pallas"))
    valid = mask0[:, :, None] & mask1[:, None, :]
    np.testing.assert_allclose(got[:, :M, :N][valid], ref[:, :M, :N][valid],
                               atol=1e-3)
