"""Shared VGG19-bn encoder + ConvRefiner multi-scale decoder.

This is the backbone family used by DeDoDe (detector-L / descriptor-B;
``thirdparty/DeDoDe/DeDoDe/model_zoo/dedode_models.py:65-175``,
``encoder.py``/``decoder.py``) and reused by RIPE
(``thirdparty/RIPE/ripe/models/backbones/vgg_utils.py``): VGG19-bn features
up to conv4 pooling, producing maps at scales 1/2/4/8 (64/128/256/512 ch),
decoded coarse-to-fine by per-scale ConvRefiners (1x1 block + N depthwise-5x5
blocks + residual/1.4 + 1x1 out) whose outputs split into
(prototype logits, context) with bilinear upsampling between scales.

TPU-native: depthwise convs use ``feature_group_count``; BatchNorms fold
into convs at conversion; everything is NHWC and batch-first.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

# vgg19_bn features[:40]: conv indices per stage (bn = idx+1)
VGG19_CONV_IDX = [[0, 3], [7, 10], [14, 17, 20, 23], [27, 30, 33, 36]]
VGG19_STAGE_DIMS = [64, 128, 256, 512]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _fold(w, b, g, beta, mean, var, eps=1e-5):
    s = g / np.sqrt(var + eps)
    return w * s[None, None, None, :], ((b if b is not None else 0.0) - mean) * s + beta


def vgg19_params_from_torch(sd: Dict[str, np.ndarray], prefix: str = "encoder.layers") -> Params:
    """Fold the BN-ed VGG19 features into plain convs."""
    stages = []
    for stage in VGG19_CONV_IDX:
        convs = []
        for i in stage:
            w = sd[f"{prefix}.{i}.weight"].transpose(2, 3, 1, 0)
            b = sd.get(f"{prefix}.{i}.bias")
            w, b = _fold(
                w, b,
                sd[f"{prefix}.{i + 1}.weight"], sd[f"{prefix}.{i + 1}.bias"],
                sd[f"{prefix}.{i + 1}.running_mean"], sd[f"{prefix}.{i + 1}.running_var"],
            )
            convs.append({"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)})
        stages.append(convs)
    return {"stages": stages}


def refiner_params_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    """ConvRefiner: block1 + hidden_blocks + out_conv, BNs folded."""

    def block(bprefix):
        w1 = sd[f"{bprefix}.0.weight"].transpose(2, 3, 1, 0)
        b1 = sd.get(f"{bprefix}.0.bias")
        w1, b1 = _fold(
            w1, b1,
            sd[f"{bprefix}.1.weight"], sd[f"{bprefix}.1.bias"],
            sd[f"{bprefix}.1.running_mean"], sd[f"{bprefix}.1.running_var"],
        )
        return {
            "conv1": {"w": jnp.asarray(w1, jnp.float32), "b": jnp.asarray(b1, jnp.float32)},
            "conv2": {
                "w": jnp.asarray(sd[f"{bprefix}.3.weight"].transpose(2, 3, 1, 0), jnp.float32),
                "b": jnp.asarray(sd[f"{bprefix}.3.bias"], jnp.float32),
            },
        }

    n_hidden = 1 + max(
        int(k[len(prefix) + 15 :].split(".")[0])
        for k in sd
        if k.startswith(f"{prefix}.hidden_blocks.")
    )
    return {
        "block1": block(f"{prefix}.block1"),
        "hidden": [block(f"{prefix}.hidden_blocks.{h}") for h in range(n_hidden)],
        "out": {
            "w": jnp.asarray(sd[f"{prefix}.out_conv.weight"].transpose(2, 3, 1, 0), jnp.float32),
            "b": jnp.asarray(sd[f"{prefix}.out_conv.bias"], jnp.float32),
        },
    }


def init_vgg19_params(key) -> Params:
    rng = np.random.default_rng(0)
    stages = []
    cin = 3
    for dims, idxs in zip(VGG19_STAGE_DIMS, VGG19_CONV_IDX):
        convs = []
        for _ in idxs:
            w = rng.normal(0, np.sqrt(2.0 / (cin * 9)), (3, 3, cin, dims)).astype(np.float32)
            convs.append({"w": jnp.asarray(w), "b": jnp.zeros((dims,), jnp.float32)})
            cin = dims
        stages.append(convs)
    return {"stages": stages}


def init_refiner_params(key, cin: int, hidden: int, cout: int, n_hidden: int) -> Params:
    rng = np.random.default_rng(abs(hash((cin, hidden, cout))) % 2**31)

    def conv(k, ci, co, groups=1):
        w = rng.normal(0, np.sqrt(2.0 / (ci // groups * k * k)), (k, k, ci // groups, co))
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.zeros((co,), jnp.float32)}

    return {
        "block1": {"conv1": conv(1, cin, hidden), "conv2": conv(1, hidden, hidden)},
        "hidden": [
            {"conv1": conv(5, hidden, hidden, groups=hidden), "conv2": conv(1, hidden, hidden)}
            for _ in range(n_hidden)
        ],
        "out": conv(1, hidden, cout),
    }


def _conv(x, p, groups=1):
    kh = p["w"].shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + p["b"]


def vgg19_features(params: Params, images: jnp.ndarray) -> List[jnp.ndarray]:
    """ImageNet-normalized (B, H, W, 3) -> feature maps at scales [1,2,4,8]
    (taken just before each pooling, post-ReLU)."""
    x = images
    feats = []
    for convs in params["stages"]:
        for p in convs:
            x = jax.nn.relu(_conv(x, p))
        feats.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return feats


def refiner_forward(x: jnp.ndarray, p: Params, residual: bool = True) -> jnp.ndarray:
    def block(x, bp, groups=1):
        h = jax.nn.relu(_conv(x, bp["conv1"], groups=groups))
        return _conv(h, bp["conv2"])

    x0 = block(x, p["block1"])
    h = x0
    for bp in p["hidden"]:
        h = block(h, bp, groups=h.shape[-1])
    if residual:
        h = (h + x0) / 1.4
    return _conv(h, p["out"])


def decode_multiscale(
    feats: List[jnp.ndarray],
    refiners: Dict[str, Params],
    num_prototypes: int,
    logits_interp: str = "bilinear",
    scales=("8", "4", "2", "1"),
) -> jnp.ndarray:
    """Coarse-to-fine decoding: refiner output splits into (prototypes,
    context); both are upsampled to the next finer scale (half-pixel
    convention, like torch align_corners=False). ``feats`` is ordered
    fine -> coarse and must have len(scales) entries."""
    out = None
    context = None
    scales = list(scales)
    for idx, (fmap, scale) in enumerate(zip(reversed(feats), scales)):
        inp = fmap if context is None else jnp.concatenate([fmap, context], axis=-1)
        stuff = refiner_forward(inp, refiners[scale])
        logits = stuff[..., :num_prototypes]
        context = stuff[..., num_prototypes:]
        out = logits if out is None else out + logits
        if idx < len(scales) - 1:
            tgt = feats[len(feats) - idx - 2].shape[1:3]
            method = "cubic" if logits_interp == "cubic" else "linear"
            out = jax.image.resize(
                out, (out.shape[0], *tgt, out.shape[-1]), method
            )
            context = jax.image.resize(
                context, (context.shape[0], *tgt, context.shape[-1]), "linear"
            )
    return out
