"""Learned local-frame estimation: AffNet (affine shape) + OriNet (orientation).

Parity target: the AffNet/OriNet stages inside kornia's ``KeyNetAffNetHardNet``
used by the reference (``extractors/keynetaffnethardnet.py:9-58``). Both nets
are the AffNetFast / OriNetFast architectures from the upstream AffNet release
(Mishkin et al., ECCV'18): six 3x3 conv+BN(affine-free)+ReLU blocks (two with
stride 2), dropout, a final 8x8 conv head, tanh, global average pool. AffNet
emits 3 shape residuals that form a 2x2 affine rectified to a det-1 upright
ellipse; OriNet emits (sin-like, cos-like) components read as atan2.

TPU-native design: both nets run as one batched NHWC conv program over the
(K, 32, 32) patch stack — patches are gathered once on device and every stage
(shape -> re-sampling -> orientation -> re-sampling -> descriptor) stays in
the same jitted program (``models/hardnet.py:keynet_hardnet_extract``).

Converters consume the standard ``features.N.*`` torch state_dicts of the
released AffNet.pth / OriNet.pth checkpoints (same layout kornia loads), with
the affine-free BatchNorms folded into the convolutions.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

# (cin, cout, kernel, stride, pad) — shared trunk; the head differs:
# OriNet: Conv2d(64, 2, k=8, pad=1); AffNet: Conv2d(64, 3, k=8, pad=0).
_TRUNK = [
    (1, 16, 3, 1, 1),
    (16, 16, 3, 1, 1),
    (16, 32, 3, 2, 1),
    (32, 32, 3, 1, 1),
    (32, 64, 3, 2, 1),
    (64, 64, 3, 1, 1),
]
_ORINET_HEAD = (64, 2, 8, 1, 1)
_AFFNET_HEAD = (64, 3, 8, 1, 0)


def _params_from_torch(state_dict) -> Params:
    """Fold ``features.{0,3,6,9,12,15}`` convs' affine-free BNs (at +1) and
    append the ``features.19`` head conv (bias, no BN)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    layers = []
    for i in (0, 3, 6, 9, 12, 15):
        w = sd[f"features.{i}.weight"].transpose(2, 3, 1, 0)
        b = sd.get(f"features.{i}.bias", np.zeros(w.shape[-1]))
        mean = sd[f"features.{i + 1}.running_mean"]
        var = sd[f"features.{i + 1}.running_var"]
        s = 1.0 / np.sqrt(var + 1e-5)  # BN affine=False
        layers.append({
            "w": jnp.asarray(w * s[None, None, None, :], jnp.float32),
            "b": jnp.asarray((b - mean) * s, jnp.float32),
        })
    w = sd["features.19.weight"].transpose(2, 3, 1, 0)
    b = sd.get("features.19.bias", np.zeros(w.shape[-1]))
    layers.append({
        "w": jnp.asarray(w, jnp.float32),
        "b": jnp.asarray(b, jnp.float32),
    })
    return {"layers": layers}


def orinet_params_from_torch(state_dict) -> Params:
    return _params_from_torch(state_dict)


def affnet_params_from_torch(state_dict) -> Params:
    return _params_from_torch(state_dict)


def _init(key, head) -> Params:
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    layers = []
    for ci, co, k, _s, _p in _TRUNK + [head]:
        w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (k, k, ci, co))
        layers.append({
            "w": jnp.asarray(w, jnp.float32),
            "b": jnp.zeros((co,), jnp.float32),
        })
    return {"layers": layers}


def init_orinet_params(key) -> Params:
    return _init(key, _ORINET_HEAD)


def init_affnet_params(key) -> Params:
    return _init(key, _AFFNET_HEAD)


def _features(params: Params, patches: jnp.ndarray, head) -> jnp.ndarray:
    """patches (K, 32, 32) -> (K, head_out): per-patch mean/std input norm,
    conv trunk, tanh head, global average pool."""
    x = patches[..., None]
    flat = x.reshape(x.shape[0], -1)
    mu = flat.mean(1)[:, None, None, None]
    # torch.std default is Bessel-corrected (unbiased)
    n = flat.shape[1]
    sd = jnp.sqrt(
        ((flat - flat.mean(1, keepdims=True)) ** 2).sum(1) / (n - 1)
    )[:, None, None, None]
    x = (x - mu) / (sd + 1e-7)
    specs = _TRUNK + [head]
    for i, (p, (_ci, _co, _k, s, pad)) in enumerate(zip(params["layers"], specs)):
        x = jax.lax.conv_general_dilated(
            x, p["w"], (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]
        if i < len(specs) - 1:
            x = jax.nn.relu(x)
    x = jnp.tanh(x)
    return x.mean(axis=(1, 2))  # adaptive average pool to 1x1


def orinet_angles(params: Params, patches: jnp.ndarray) -> jnp.ndarray:
    """(K, 32, 32) patches -> (K,) orientation angle in radians
    (atan2 over the two tanh components, OriNetFast read-out)."""
    xy = _features(params, patches, _ORINET_HEAD)
    return jnp.arctan2(xy[:, 0] + 1e-8, xy[:, 1] + 1e-8)


def rectify_upright(A: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Rectify (K, 2, 2) affines to the det-1 lower-triangular form that
    maps the same ellipse A A^T (up to scale) — the upstream
    ``rectifyAffineTransformationUpToScale``. Orientation is then provided
    solely by OriNet (or identity for upright mode)."""
    a, b = A[:, 0, 0], A[:, 0, 1]
    c, d = A[:, 1, 0], A[:, 1, 1]
    det = jnp.sqrt(jnp.abs(a * d - b * c) + eps)
    b2a2 = jnp.sqrt(a * a + b * b) + eps
    r00 = b2a2 / det
    r10 = (d * b + c * a) / (b2a2 * det)
    r11 = det / b2a2
    zero = jnp.zeros_like(r00)
    return jnp.stack(
        [jnp.stack([r00, zero], -1), jnp.stack([r10, r11], -1)], -2
    )


def affnet_shapes(params: Params, patches: jnp.ndarray) -> jnp.ndarray:
    """(K, 32, 32) patches -> (K, 2, 2) det-1 upright affine shape
    (AffNetFast read-out: residuals to the identity, then rectification)."""
    xy = _features(params, patches, _AFFNET_HEAD)
    one = jnp.ones_like(xy[:, 0])
    zero = jnp.zeros_like(xy[:, 0])
    A = jnp.stack(
        [
            jnp.stack([one + xy[:, 0], zero], -1),
            jnp.stack([xy[:, 1], one + xy[:, 2]], -1),
        ],
        -2,
    )
    return rectify_upright(A)
