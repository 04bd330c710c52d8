"""Fused Pallas NN matcher vs the dense reference implementation.

Runs in Pallas interpret mode on CPU (the compiled kernel path is exercised
on TPU by the benchmark)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_fused_nn_matches_dense():
    from deep_image_matching_tpu.ops.nn_match import nn_match_batch
    from deep_image_matching_tpu.ops.pallas_nn import nn_match_fused

    rng = np.random.default_rng(0)
    B, K0, K1, D = 2, 128, 128, 32
    d0 = rng.normal(size=(B, K0, D)).astype(np.float32)
    d1 = rng.normal(size=(B, K1, D)).astype(np.float32)
    # plant exact matches + some padding
    d1[:, :40] = d0[:, :40] + rng.normal(scale=1e-3, size=(B, 40, D)).astype(np.float32)
    m0 = np.ones((B, K0), bool)
    m1 = np.ones((B, K1), bool)
    m0[:, 120:] = False
    m1[:, 100:] = False

    for mode in ("nn", "mnn", "snn", "smnn"):
        ref_m, ref_v = nn_match_batch(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), jnp.asarray(m1),
            mode=mode, ratio_th=0.9,
        )
        got_m, got_v = nn_match_fused(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), jnp.asarray(m1),
            mode=mode, ratio_th=0.9,
        )
        ref_m, ref_v = np.asarray(ref_m), np.asarray(ref_v)
        got_m, got_v = np.asarray(got_m), np.asarray(got_v)
        np.testing.assert_array_equal(got_v, ref_v, err_msg=mode)
        np.testing.assert_array_equal(got_m[got_v], ref_m[ref_v], err_msg=mode)


def test_nn_top2_statistics():
    from deep_image_matching_tpu.ops.pallas_nn import nn_top2

    rng = np.random.default_rng(1)
    B, K0, K1, D = 1, 64, 192, 16
    d0 = rng.normal(size=(B, K0, D)).astype(np.float32)
    d1 = rng.normal(size=(B, K1, D)).astype(np.float32)
    sq1 = (d1**2).sum(-1)
    min1, min2, arg = nn_top2(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(sq1),
        block_m=32, block_n=64,
    )
    # naive reference
    dist = sq1[:, None, :] - 2 * np.einsum("bkd,bjd->bkj", d0, d1)
    ref_arg = dist.argmin(-1)
    ref_min1 = dist.min(-1)
    dist2 = dist.copy()
    dist2[np.arange(B)[:, None], np.arange(K0)[None], ref_arg] = np.inf
    ref_min2 = dist2.min(-1)
    np.testing.assert_array_equal(np.asarray(arg), ref_arg)
    np.testing.assert_allclose(np.asarray(min1), ref_min1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(min2), ref_min2, atol=1e-4)


def test_fused_nn_non_multiple_capacity():
    """Capacities that are NOT multiples of 128 (e.g. ALIKED's default
    max_num_keypoints=4000 via the tiled device match) must pad instead of
    degrading to block=K — that staged a 64 MB VMEM distance tile and
    failed to compile on v5e (regression)."""
    from deep_image_matching_tpu.ops.nn_match import nn_match_batch
    from deep_image_matching_tpu.ops.pallas_nn import nn_match_fused

    rng = np.random.default_rng(2)
    B, K0, K1, D = 2, 200, 136, 32
    d0 = rng.normal(size=(B, K0, D)).astype(np.float32)
    d1 = rng.normal(size=(B, K1, D)).astype(np.float32)
    d1[:, :30] = d0[:, :30] + rng.normal(scale=1e-3, size=(B, 30, D)).astype(
        np.float32
    )
    m0 = np.ones((B, K0), bool)
    m1 = np.ones((B, K1), bool)
    m0[:, 190:] = False
    m1[:, 130:] = False

    for mode in ("nn", "mnn", "snn", "smnn"):
        ref_m, ref_v = nn_match_batch(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), jnp.asarray(m1),
            mode=mode, ratio_th=0.9,
        )
        got_m, got_v = nn_match_fused(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), jnp.asarray(m1),
            mode=mode, ratio_th=0.9,
        )
        np.testing.assert_array_equal(
            np.asarray(got_v), np.asarray(ref_v), err_msg=mode
        )
        np.testing.assert_array_equal(
            np.asarray(got_m)[np.asarray(got_v)],
            np.asarray(ref_m)[np.asarray(ref_v)], err_msg=mode,
        )
