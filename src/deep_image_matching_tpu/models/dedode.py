"""DeDoDe detector-L + descriptor-B as pure-functional JAX models.

Architecture parity with the reference's vendored DeDoDe (Edstedt et al.;
``thirdparty/DeDoDe/DeDoDe/model_zoo/dedode_models.py:65-175``,
``detectors/dedode_detector.py``, ``descriptors/dedode_descriptor.py``,
keypoint sampling in ``DeDoDe/utils.py:131-188``): shared VGG19-bn encoder +
per-scale ConvRefiner decoders (``models/vgg_refiner.py``); the detector
softmaxes logits over the whole image, reweights by local density
(coverage), and samples top-k; the descriptor grid-samples the 256-d map at
keypoints (half-pixel convention).

Notes: the descriptor-G variant replaces the encoder with a DINOv2 ViT-L —
its decoder converts with the same code; the ViT backbone is future work.
Detector logits upsample bilinearly here (torch uses bicubic; jax's cubic
kernel differs slightly — documented divergence, irrelevant at the argmax).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.detect import topk_flat
import numpy as np

from .vgg_refiner import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    decode_multiscale,
    init_refiner_params,
    init_vgg19_params,
    refiner_params_from_torch,
    vgg19_features,
    vgg19_params_from_torch,
)

Params = Dict

_DETECTOR_REFINERS = {  # scale: (cin, hidden, cout=context+1)
    "8": (512, 512, 256 + 1), "4": (256 + 256, 256, 128 + 1),
    "2": (128 + 128, 128, 64 + 1), "1": (64 + 64, 64, 1 + 1),
}
_DESCRIPTOR_REFINERS = {
    "8": (512, 512, 256 + 256), "4": (256 + 256, 256, 128 + 256),
    "2": (128 + 128, 64, 32 + 256), "1": (64 + 32, 32, 1 + 256),
}
# descriptor-G (``dedode_models.py:178-241``): DINOv2 tokens join at /14
_DESCRIPTOR_G_REFINERS = {
    "14": (1024, 768, 512 + 256), "8": (512 + 512, 512, 256 + 256),
    "4": (256 + 256, 256, 128 + 256), "2": (128 + 128, 64, 32 + 256),
    "1": (64 + 32, 32, 1 + 256),
}


def detector_params_from_torch(state_dict) -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {
        "encoder": vgg19_params_from_torch(sd),
        "refiners": {
            s: refiner_params_from_torch(sd, f"decoder.layers.{s}")
            for s in ("8", "4", "2", "1")
        },
    }


descriptor_params_from_torch = detector_params_from_torch


def descriptor_g_params_from_torch(state_dict, dinov2_state_dict=None) -> Params:
    """DeDoDe descriptor-G: VGG19 + frozen DINOv2 encoder, /14 refiner."""
    from . import dinov2 as dino

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {
        "encoder": vgg19_params_from_torch(sd, prefix="encoder.vgg.layers"),
        "refiners": {
            s: refiner_params_from_torch(sd, f"decoder.layers.{s}")
            for s in ("14", "8", "4", "2", "1")
        },
    }
    if dinov2_state_dict is not None:
        params["dinov2"] = dino.params_from_torch(dinov2_state_dict)
    return params


def init_descriptor_g_params(key, dinov2_depth: int = 2) -> Params:
    from . import dinov2 as dino

    return {
        "encoder": init_vgg19_params(key),
        "refiners": {
            s: init_refiner_params(key, ci, h, co, n_hidden=5)
            for s, (ci, h, co) in _DESCRIPTOR_G_REFINERS.items()
        },
        "dinov2": dino.init_params(key, depth=dinov2_depth),
    }


def describe_g(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 3) in [0,1], H/W multiples of 14 and 8
    kpts: jnp.ndarray,     # (B, K, 2) pixel coords
    dino_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Descriptor-G: VGG pyramid + DINOv2 /14 tokens decoded coarse-to-fine."""
    from . import dinov2 as dino

    x = _normalize(images)
    feats = vgg19_features(params["encoder"], x)  # [1, 2, 4, 8]
    B, H, W, _ = images.shape
    tokens = dino.forward_features(params["dinov2"], x, compute_dtype=dino_dtype)
    f14 = tokens.reshape(B, H // 14, W // 14, -1)
    grid = decode_multiscale(
        feats + [f14], params["refiners"], num_prototypes=256,
        scales=("14", "8", "4", "2", "1"),
    )
    _, Hg, Wg, _ = grid.shape

    from ..ops.deform import bilinear_sample_zeropad

    def per_image(g, k):
        gx = (2.0 * k[:, 0] / (W - 1) - 1.0 + 1.0) * Wg / 2.0 - 0.5
        gy = (2.0 * k[:, 1] / (H - 1) - 1.0 + 1.0) * Hg / 2.0 - 0.5
        d = bilinear_sample_zeropad(g, jnp.stack([gx, gy], -1))
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    return jax.vmap(per_image)(grid, kpts)


def init_detector_params(key) -> Params:
    return {
        "encoder": init_vgg19_params(key),
        "refiners": {
            s: init_refiner_params(key, ci, h, co, n_hidden=8)
            for s, (ci, h, co) in _DETECTOR_REFINERS.items()
        },
    }


def init_descriptor_params(key) -> Params:
    return {
        "encoder": init_vgg19_params(key),
        "refiners": {
            s: init_refiner_params(key, ci, h, co, n_hidden=5)
            for s, (ci, h, co) in _DESCRIPTOR_REFINERS.items()
        },
    }


def _normalize(images):
    return (images - IMAGENET_MEAN) / IMAGENET_STD


def detector_logits(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [0,1] -> keypoint logits (B, H, W)."""
    feats = vgg19_features(params["encoder"], _normalize(images))
    logits = decode_multiscale(feats, params["refiners"], num_prototypes=1)
    return logits[..., 0]


def _coverage_reweight(scoremap: jnp.ndarray) -> jnp.ndarray:
    """Local-density reweighting (separable 51-tap gaussian;
    ``DeDoDe/utils.py:152-165``)."""
    w = jnp.exp(-jnp.linspace(-2, 2, 51) ** 2).astype(scoremap.dtype)
    x = (scoremap + 1e-6) * 10000.0
    # separable conv along W then H with zero padding
    xw = jax.vmap(
        lambda img: jnp.apply_along_axis(
            lambda r: jnp.convolve(r, w, mode="same"), 1, img
        )
    )(x)
    dens = jax.vmap(
        lambda img: jnp.apply_along_axis(
            lambda c: jnp.convolve(c, w, mode="same"), 0, img
        )
    )(xw)
    return scoremap * (dens + 1e-8) ** -0.5


@functools.partial(jax.jit, static_argnames=("num_keypoints",))
def detect(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 3) in [0,1]
    num_keypoints: int = 4096,
):
    """Returns keypoints in pixel coordinates, confidences, mask."""
    B, H, W, _ = images.shape
    logits = detector_logits(params, images)
    p = jax.nn.softmax(logits.reshape(B, H * W), axis=-1).reshape(B, H, W)
    score = _coverage_reweight(p)
    vals, idx = topk_flat(score.reshape(B, H * W), num_keypoints)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    conf = jnp.take_along_axis(p.reshape(B, H * W), idx, axis=1)
    # reference semantics (DeDoDe/utils.py:179-185 with sample_topk=True):
    # exactly num_keypoints are kept, no score-based validity filtering
    valid = jnp.ones(vals.shape, bool)
    return jnp.stack([x, y], -1), conf, valid


def describe(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 3)
    kpts: jnp.ndarray,     # (B, K, 2) pixel coords
) -> jnp.ndarray:
    """256-d descriptors sampled at keypoints (half-pixel grid convention)."""
    feats = vgg19_features(params["encoder"], _normalize(images))
    grid = decode_multiscale(feats, params["refiners"], num_prototypes=256)
    B, H, W, C = grid.shape

    from ..ops.deform import bilinear_sample_zeropad

    def per_image(g, k):
        # torch grid_sample align_corners=False over normalized coords
        gx = (2.0 * k[:, 0] / (W - 1) - 1.0 + 1.0) * W / 2.0 - 0.5
        gy = (2.0 * k[:, 1] / (H - 1) - 1.0 + 1.0) * H / 2.0 - 0.5
        d = bilinear_sample_zeropad(g, jnp.stack([gx, gy], -1))
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    return jax.vmap(per_image)(grid, kpts)
