"""Bidirectional shared-score cross-attention kernel (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from deep_image_matching_tpu.ops.pallas_bidir_attention import (
    bidir_cross_attention, bidir_cross_attention_reference,
)

pytestmark = pytest.mark.slow


def test_bidir_matches_dense_reference_multi_tile():
    rng = np.random.default_rng(0)
    B, H, M, N, d = 2, 2, 384, 256, 64  # M=384 -> 3 row tiles (cross-i state)
    qk0 = jnp.asarray(rng.normal(size=(B, H, M, d)), jnp.float32)
    qk1 = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(B, H, M, d)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    m0 = jnp.asarray(rng.random((B, M)) > 0.2)
    m1 = jnp.asarray(rng.random((B, N)) > 0.3)
    a0, a1 = bidir_cross_attention(qk0, qk1, v0, v1, m0, m1, interpret=True)
    r0, r1 = bidir_cross_attention_reference(qk0, qk1, v0, v1, m0, m1)
    sel0 = np.asarray(m0)[:, None, :, None]
    sel1 = np.asarray(m1)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(a0) * sel0, np.asarray(r0) * sel0, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(a1) * sel1, np.asarray(r1) * sel1, atol=2e-6)


def test_lightglue_bidir_impl_equivalent_on_cpu(monkeypatch):
    """Exercise the real bidir wiring in _cross_block (interpret-mode
    kernel + flash->xla self-attention fallback on CPU) and compare the
    final matches against the plain xla path."""
    import deep_image_matching_tpu.ops.pallas_bidir_attention as pba
    from deep_image_matching_tpu.models import lightglue as lg
    from deep_image_matching_tpu.ops import attention as att

    orig_bidir = pba.bidir_cross_attention
    monkeypatch.setattr(
        pba, "bidir_cross_attention",
        lambda *a, **k: orig_bidir(*a, interpret=True, **k),
    )
    orig_fused = att.fused_attention
    monkeypatch.setattr(  # CPU has no flash kernel; route self-attn to xla
        att, "fused_attention",
        lambda q, k, v, qm, kvm, s, impl="xla": orig_fused(
            q, k, v, qm, kvm, s, impl="xla"
        ),
    )
    params = lg.init_params(jax.random.PRNGKey(0), n_layers=2)
    B, K, D = 1, 128, 256
    rng = np.random.default_rng(1)
    kpts = jnp.asarray(rng.uniform(0, 640, (B, K, 2)), jnp.float32)
    desc = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, K)) > 0.1)
    size = jnp.tile(jnp.asarray([[640.0, 480.0]]), (B, 1))
    args = (params, kpts, kpts, desc, desc, mask, mask, size, size)
    ref = lg.forward_impl(*args, attn_impl="xla", ffn_impl="xla")
    got = lg.forward_impl(*args, attn_impl="bidir", ffn_impl="xla")
    assert bool(jnp.all(ref["matches0"] == got["matches0"]))
    np.testing.assert_allclose(
        np.asarray(got["matching_scores0"]),
        np.asarray(ref["matching_scores0"]), atol=1e-4,
    )
