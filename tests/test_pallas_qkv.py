"""Fused attention-prologue kernel: interpret-mode parity with the XLA
self/cross block prologues of models/lightglue.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from deep_image_matching_tpu.models import lightglue as lg
from deep_image_matching_tpu.ops.pallas_qkv import (
    qk_v_fused,
    qkv_rotary_fused,
)

pytestmark = pytest.mark.slow


def _inputs(rng, B, N, D, dtype):
    x = jnp.asarray(rng.normal(size=(B, N, D)), dtype)
    hd = D // 4
    cos = jnp.asarray(rng.uniform(-1, 1, (B, N, hd)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, (B, N, hd)), jnp.float32)
    return x, cos, sin


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_qkv_rotary_fused_matches_xla(dtype):
    rng = np.random.default_rng(0)
    B, N, D, H = 2, 256, 256, 4
    hd = D // H
    x, cos, sin = _inputs(rng, B, N, D, dtype)
    p = {
        "w": jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, dtype),
        "b": jnp.asarray(rng.normal(size=3 * D) * 0.05, dtype),
    }
    # the XLA prologue exactly as _self_block computes it
    qkv = lg._linear(x, p).reshape(B, N, H, hd, 3).transpose(0, 2, 1, 3, 4)
    q_r, k_r, v_r = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    q_r = lg._apply_rotary(q_r, cos, sin)
    k_r = lg._apply_rotary(k_r, cos, sin)

    q, k, v = qkv_rotary_fused(x, p, cos, sin, H, interpret=True)
    q, k, v = (lg._heads(t, H) for t in (q, k, v))
    # bf16: the kernel holds the f32 accumulator through the bias add while
    # the XLA einsum truncates to bf16 first — a 1-ulp difference at the
    # |y|~4 magnitudes of this test (ulp 0.03125)
    tol = 1e-5 if dtype == jnp.float32 else 7e-2
    for got, ref, name in [(q, q_r, "q"), (k, k_r, "k"), (v, v_r, "v")]:
        err = float(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        assert err < tol, f"{name}: {err}"


def test_qkv_rotary_fused_no_bias():
    rng = np.random.default_rng(1)
    B, N, D, H = 1, 128, 256, 4
    x, cos, sin = _inputs(rng, B, N, D, jnp.float32)
    p = {"w": jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.float32)}
    qkv = lg._linear(x, p).reshape(B, N, H, D // H, 3).transpose(0, 2, 1, 3, 4)
    ref = lg._apply_rotary(qkv[..., 0], cos, sin)
    q, _, _ = qkv_rotary_fused(x, p, cos, sin, H, interpret=True)
    err = float(jnp.abs(lg._heads(q, H) - ref).max())
    assert err < 1e-5


def test_qk_v_fused_matches_xla():
    rng = np.random.default_rng(2)
    B, N, D = 2, 256, 256
    x, _, _ = _inputs(rng, B, N, D, jnp.float32)
    p_qk = {
        "w": jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.normal(size=D) * 0.05, jnp.float32),
    }
    p_v = {
        "w": jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.normal(size=D) * 0.05, jnp.float32),
    }
    qk, v = qk_v_fused(x, p_qk, p_v, interpret=True)
    assert float(jnp.abs(qk - lg._linear(x, p_qk)).max()) < 1e-5
    assert float(jnp.abs(v - lg._linear(x, p_v)).max()) < 1e-5
