"""Pallas refiner dw-stack kernel vs the plain XLA conv path (interpret
mode on CPU; the real Mosaic compile is exercised on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def _xla_ref(x, w1, b1, w2, b2):
    N = w1.shape[0]
    for k in range(N):
        C = x.shape[-1]
        h = jax.lax.conv_general_dilated(
            x, w1[k], (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ) + b1[k]
        h = jax.nn.relu(h)
        x = jax.lax.conv_general_dilated(
            h, w2[k], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b2[k]
    return x


def test_refiner_dw_stack_matches_xla():
    from deep_image_matching_tpu.ops.pallas_refiner import refiner_dw_stack

    rng = np.random.default_rng(0)
    B, H, W, C, N = 2, 21, 33, 6, 3
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.3, (N, 5, 5, 1, C)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (N, C)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (N, 1, 1, C, C)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (N, C)).astype(np.float32))

    ref = np.asarray(_xla_ref(x, w1, b1, w2, b2))
    got = np.asarray(refiner_dw_stack(x, w1, b1, w2, b2, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
