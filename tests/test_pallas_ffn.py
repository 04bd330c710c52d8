"""Fused FFN kernel: interpret-mode parity with the XLA LightGlue FFN."""

import numpy as np
import jax
import jax.numpy as jnp

from deep_image_matching_tpu.models import lightglue as lg
from deep_image_matching_tpu.ops.pallas_ffn import ffn_fused
import pytest

pytestmark = pytest.mark.slow


def _params(rng, D):
    return {
        "ffn1": {
            "w": jnp.asarray(rng.normal(size=(2 * D, 2 * D)), jnp.float32) * 0.05,
            "b": jnp.asarray(rng.normal(size=(2 * D,)), jnp.float32) * 0.1,
        },
        "ln": {
            "g": jnp.asarray(rng.random(2 * D), jnp.float32) + 0.5,
            "b": jnp.asarray(rng.normal(size=(2 * D,)), jnp.float32) * 0.1,
        },
        "ffn2": {
            "w": jnp.asarray(rng.normal(size=(2 * D, D)), jnp.float32) * 0.05,
            "b": jnp.asarray(rng.normal(size=(D,)), jnp.float32) * 0.1,
        },
    }


def test_ffn_fused_matches_xla_f32():
    rng = np.random.default_rng(0)
    B, K, D = 2, 256, 256
    x = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    p = _params(rng, D)
    ref = lg._ffn(x, m, p, "xla")
    got = ffn_fused(
        x, m, p["ffn1"]["w"], p["ffn1"]["b"], p["ln"]["g"], p["ln"]["b"],
        p["ffn2"]["w"], p["ffn2"]["b"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ffn_fused_bf16_close():
    rng = np.random.default_rng(1)
    B, K, D = 1, 128, 256
    x = jnp.asarray(rng.normal(size=(B, K, D)), jnp.bfloat16)
    m = jnp.asarray(rng.normal(size=(B, K, D)), jnp.bfloat16)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), _params(rng, D))
    ref = np.asarray(lg._ffn(x, m, p, "xla"), np.float32)
    got = np.asarray(
        ffn_fused(x, m, p["ffn1"]["w"], p["ffn1"]["b"], p["ln"]["g"],
                  p["ln"]["b"], p["ffn2"]["w"], p["ffn2"]["b"],
                  interpret=True),
        np.float32,
    )
    # bf16 rounding-order differences only
    assert np.abs(got - ref).max() < 0.12
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02


def test_forward_impl_accepts_ffn_impl(image_dir):
    """ffn_impl threads through forward (xla value on CPU)."""
    params = lg.init_params(jax.random.PRNGKey(0), n_layers=2)
    B, K, D = 1, 128, 256
    rng = np.random.default_rng(0)
    kpts = jnp.asarray(rng.uniform(0, 640, (B, K, 2)), jnp.float32)
    desc = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    mask = jnp.ones((B, K), bool)
    size = jnp.tile(jnp.asarray([[640.0, 480.0]]), (B, 1))
    out = lg.forward(params, kpts, kpts, desc, desc, mask, mask, size, size,
                     ffn_impl="xla")
    assert out["matches0"].shape == (B, K)


def test_ffn_fused_relu_mode_matches_superglue_mlp():
    from deep_image_matching_tpu.models import superglue as sg

    rng = np.random.default_rng(2)
    B, K, D = 1, 128, 256
    x = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    p = {
        "mlp1": {"w": jnp.asarray(rng.normal(size=(2 * D, 2 * D)), jnp.float32) * 0.05,
                 "b": jnp.asarray(rng.normal(size=(2 * D,)), jnp.float32) * 0.1},
        "mlp2": {"w": jnp.asarray(rng.normal(size=(2 * D, D)), jnp.float32) * 0.05,
                 "b": jnp.asarray(rng.normal(size=(D,)), jnp.float32) * 0.1},
    }
    ref = x + sg._linear(
        jax.nn.relu(sg._linear(jnp.concatenate([x, m], -1), p["mlp1"])),
        p["mlp2"],
    )
    zeros = jnp.zeros((2 * D,), jnp.float32)
    got = ffn_fused(x, m, p["mlp1"]["w"], p["mlp1"]["b"], zeros, zeros,
                    p["mlp2"]["w"], p["mlp2"]["b"], interpret=True,
                    mode="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lightglue_layouts_equivalent():
    """split and stacked scan layouts produce identical outputs."""
    params = lg.init_params(jax.random.PRNGKey(0), n_layers=3)
    B, K, D = 2, 128, 256
    rng = np.random.default_rng(3)
    kpts0 = jnp.asarray(rng.uniform(0, 640, (B, K, 2)), jnp.float32)
    kpts1 = jnp.asarray(rng.uniform(0, 640, (B, K, 2)), jnp.float32)
    d0 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    d1 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    m0 = jnp.asarray(rng.random((B, K)) > 0.2)
    m1 = jnp.asarray(rng.random((B, K)) > 0.3)
    size = jnp.tile(jnp.asarray([[640.0, 480.0]]), (B, 1))
    a = lg.forward(params, kpts0, kpts1, d0, d1, m0, m1, size, size,
                   layout="split")
    b = lg.forward(params, kpts0, kpts1, d0, d1, m0, m1, size, size,
                   layout="stacked")
    assert bool(jnp.all(a["matches0"] == b["matches0"]))
    np.testing.assert_allclose(np.asarray(a["matching_scores0"]),
                               np.asarray(b["matching_scores0"]), atol=1e-6)
