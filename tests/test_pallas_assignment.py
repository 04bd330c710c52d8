"""Fused streaming LightGlue assignment vs the dense path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _dense(md0, md1, z0, z1, mask0, mask1):
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1)
    sim0 = jnp.where(mask1[:, None, :], sim, -1e30)
    sim1 = jnp.where(mask0[:, :, None], sim, -1e30)
    scores = (
        jax.nn.log_softmax(sim0, axis=2)
        + jax.nn.log_softmax(sim1, axis=1)
        + jax.nn.log_sigmoid(z0)[:, :, None]
        + jax.nn.log_sigmoid(z1)[:, None, :]
    )
    both = mask0[:, :, None] & mask1[:, None, :]
    return jnp.where(both, scores, -1e30)


def test_fused_assignment_matches_dense():
    from deep_image_matching_tpu.models.lightglue import filter_matches_static
    from deep_image_matching_tpu.ops.pallas_assignment import (
        assignment_fused,
        filter_matches_fused,
    )

    rng = np.random.default_rng(3)
    B, M, N, D = 2, 256, 384, 64
    md0 = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    md1 = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    z0 = jnp.asarray(rng.normal(size=(B, M)).astype(np.float32))
    z1 = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    mask0 = np.ones((B, M), bool)
    mask1 = np.ones((B, N), bool)
    mask0[:, 200:] = False
    mask1[:, 300:] = False
    mask0 = jnp.asarray(mask0)
    mask1 = jnp.asarray(mask1)

    scores = _dense(md0, md1, z0, z1, mask0, mask1)
    max0, arg0, max1, arg1 = assignment_fused(md0, md1, z0, z1, mask0, mask1)

    # valid rows: same argmax + same max score
    v0 = np.asarray(mask0)
    np.testing.assert_array_equal(
        np.asarray(arg0)[v0], np.asarray(jnp.argmax(scores, 2))[v0]
    )
    np.testing.assert_allclose(
        np.asarray(max0)[v0], np.asarray(jnp.max(scores, 2))[v0], atol=1e-3
    )
    v1 = np.asarray(mask1)
    np.testing.assert_array_equal(
        np.asarray(arg1)[v1], np.asarray(jnp.argmax(scores, 1))[v1]
    )
    np.testing.assert_allclose(
        np.asarray(max1)[v1], np.asarray(jnp.max(scores, 1))[v1], atol=1e-3
    )

    # full filtering equivalence
    m_ref, s_ref, ok_ref = filter_matches_static(scores, mask0, mask1, 0.1)
    m_got, s_got, ok_got = filter_matches_fused(
        md0, md1, z0, z1, mask0, mask1, 0.1
    )
    np.testing.assert_array_equal(np.asarray(ok_got), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(m_got), np.asarray(m_ref))
    ok = np.asarray(ok_ref)
    np.testing.assert_allclose(
        np.asarray(s_got)[ok], np.asarray(s_ref)[ok], atol=1e-3
    )
    assert ok.sum() > 0  # the test actually exercised confident matches


def test_forward_fused_assignment_option():
    """End-to-end LightGlue forward with assignment_impl='fused' agrees with
    the dense forward on matches."""
    from deep_image_matching_tpu.models import lightglue as lg

    key = jax.random.PRNGKey(0)
    params = lg.init_params(key, n_layers=2, dim=64, num_heads=4,
                            input_dim=64)
    rng = np.random.default_rng(7)
    B, K = 1, 256
    kpts = jnp.asarray(rng.uniform(0, 512, size=(B, K, 2)).astype(np.float32))
    desc = jnp.asarray(rng.normal(size=(B, K, 64)).astype(np.float32) * 0.3)
    mask = jnp.ones((B, K), bool)
    size = jnp.full((B, 2), 512.0)

    kw = dict(num_heads=4, filter_threshold=0.1, depth=None,
              compute_dtype="float32", attn_impl="xla")
    out_d = lg.forward_impl(params, kpts, kpts, desc, desc, mask, mask,
                            size, size, **kw)
    out_f = lg.forward_impl(params, kpts, kpts, desc, desc, mask, mask,
                            size, size, assignment_impl="fused", **kw)
    np.testing.assert_array_equal(
        np.asarray(out_f["matches0"]), np.asarray(out_d["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(out_f["matching_scores0"]),
        np.asarray(out_d["matching_scores0"]), atol=2e-3,
    )


def test_fused_assignment_unaligned_capacity():
    """Regression: capacities that are multiples of 128 but not of the sweep
    blocks (e.g. 1152) must still tile exactly (verified on TPU; fixed
    512/1024 blocks read garbage at the ragged edge before)."""
    from deep_image_matching_tpu.ops.pallas_assignment import assignment_fused

    rng = np.random.default_rng(5)
    B, M, N, D = 1, 1152, 384, 32
    md0 = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    md1 = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    z0 = jnp.asarray(rng.normal(size=(B, M)).astype(np.float32))
    z1 = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    m0 = jnp.ones((B, M), bool)
    m1 = jnp.ones((B, N), bool)
    scores = _dense(md0, md1, z0, z1, m0, m1)
    max0, arg0, _, _ = assignment_fused(md0, md1, z0, z1, m0, m1)
    np.testing.assert_array_equal(np.asarray(arg0),
                                  np.asarray(jnp.argmax(scores, 2)))
    np.testing.assert_allclose(np.asarray(max0),
                               np.asarray(jnp.max(scores, 2)), atol=1e-3)
