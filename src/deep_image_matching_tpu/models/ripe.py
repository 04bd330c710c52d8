"""RIPE extractor as a pure-functional JAX model.

Architecture parity with the reference's vendored RIPE
(``thirdparty/RIPE/ripe/models/ripe.py``, ``backbones/vgg.py``,
``upsampler/hypercolumn_features.py``, factory ``model_zoo/vgg_hyper.py``):
instance-normalized input, the DeDoDe-style VGG19-bn encoder + per-scale
ConvRefiner decoder in detection mode (1 prototype, 8 hidden blocks), 3x3
local-max NMS + threshold + top-k on the heatmap, and hypercolumn
descriptors: the four coarse encoder maps bilinearly sampled at each
keypoint, concatenated (960-d), optionally 1x1-reduced, L2-normalized.

Reuses ``models/vgg_refiner.py`` (shared with DeDoDe).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform import bilinear_sample_zeropad
from ..ops.detect import max_pool_same, select_topk
from .vgg_refiner import (
    decode_multiscale,
    init_refiner_params,
    init_vgg19_params,
    refiner_params_from_torch,
    vgg19_features,
    vgg19_params_from_torch,
)

Params = Dict

_REFINERS = {
    "8": (512, 512, 256 + 1), "4": (256 + 256, 256, 128 + 1),
    "2": (128 + 128, 128, 64 + 1), "1": (64 + 64, 64, 1 + 1),
}


def params_from_torch(state_dict) -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Params = {
        "encoder": vgg19_params_from_torch(sd, prefix="net.encoder.layers"),
        "refiners": {
            s: refiner_params_from_torch(sd, f"net.decoder.layers.{s}")
            for s in ("8", "4", "2", "1")
        },
    }
    # optional 1x1 descriptor dim reduction (Conv1d (out, in, 1))
    if "conv_dim_reduction_coarse_desc.weight" in sd:
        params["dim_reduction"] = {
            "w": jnp.asarray(
                sd["conv_dim_reduction_coarse_desc.weight"][:, :, 0].T, jnp.float32
            ),
            "b": jnp.asarray(
                sd.get(
                    "conv_dim_reduction_coarse_desc.bias",
                    np.zeros(sd["conv_dim_reduction_coarse_desc.weight"].shape[0]),
                ),
                jnp.float32,
            ),
        }
    return params


def init_params(key) -> Params:
    return {
        "encoder": init_vgg19_params(key),
        "refiners": {
            s: init_refiner_params(key, ci, h, co, n_hidden=8)
            for s, (ci, h, co) in _REFINERS.items()
        },
    }


def _instance_norm(images: jnp.ndarray) -> jnp.ndarray:
    mu = images.mean(axis=(1, 2), keepdims=True)
    var = images.var(axis=(1, 2), keepdims=True)
    return (images - mu) * jax.lax.rsqrt(var + 1e-5)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def extract(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 3) in [0,1], H/W multiples of 8
    valid_hw: jnp.ndarray, # (B, 2)
    max_keypoints: int = 4096,
    threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    x = _instance_norm(images)
    feats = vgg19_features(params["encoder"], x)
    heat = decode_multiscale(feats, params["refiners"], num_prototypes=1)[..., 0]

    nms = jnp.where(heat == max_pool_same(heat, 1), heat, 0.0)  # 3x3 local max
    kpts, scores, valid = select_topk(
        nms, max_keypoints, threshold=threshold, border=0,
        valid_hw=(valid_hw[:, 0], valid_hw[:, 1]),
    )
    max_per_img = jnp.maximum(heat.max(axis=(1, 2)), 1e-12)
    scores = scores / max_per_img[:, None]

    H, W = images.shape[1:3]

    def hypercolumn(feats_i, k):
        cols = []
        for fmap in feats_i:
            Hc, Wc = fmap.shape[:2]
            # normgrid over OUTPUT size (H, W) then align_corners=True on
            # the coarse map (hypercolumn_features.py:24-45)
            gx = k[:, 0] / (W - 1) * (Wc - 1)
            gy = k[:, 1] / (H - 1) * (Hc - 1)
            cols.append(bilinear_sample_zeropad(fmap, jnp.stack([gx, gy], -1)))
        d = jnp.concatenate(cols, axis=-1)
        if "dim_reduction" in params:
            d = d @ params["dim_reduction"]["w"] + params["dim_reduction"]["b"]
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    descs = jax.vmap(lambda f0, f1, f2, f3, k: hypercolumn((f0, f1, f2, f3), k))(
        *feats, kpts
    )
    descs = descs * valid[..., None]
    return {"keypoints": kpts, "scores": scores, "descriptors": descs, "mask": valid}
