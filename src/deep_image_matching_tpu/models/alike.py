"""ALIKE extractor as a pure-functional JAX model (pretrained weights).

Architecture parity with the reference's vendored ALIKE
(``thirdparty/alike/alnet.py:87-190``, ``soft_detect.py``): ReLU/max-pool
backbone of ConvBlock + 3 ResBlocks, multi-scale aggregation with
align-corners upsampling, single 1x1 head emitting dim descriptor channels +
1 score channel, DKD detection with sub-pixel refinement (shared with
ALIKED: ``models/aliked.dkd_detect``), bilinear descriptor sampling.
BatchNorms fold into convs at conversion; all four bundled checkpoints
(alike-t/s/n/l) convert via ``params_from_torch``.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform import upsample_bilinear_align
from ..ops.detect import bilinear_sample
from .aliked import _avg_pool, _fold_bn, dkd_detect  # shared helpers

Params = Dict

CONFIGS = {
    "alike-t": {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64, "single_head": True},
    "alike-s": {"c1": 8, "c2": 16, "c3": 48, "c4": 96, "dim": 96, "single_head": True},
    "alike-n": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "single_head": True},
    "alike-l": {"c1": 32, "c2": 64, "c3": 128, "c4": 128, "dim": 128, "single_head": False},
}


def params_from_torch(state_dict, model_name: str = "alike-n") -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def cw(key):
        return sd[key].transpose(2, 3, 1, 0)

    def folded(conv_key, bn_prefix):
        w = cw(f"{conv_key}.weight")
        b = sd.get(f"{conv_key}.bias")
        w, b = _fold_bn(
            w, b,
            sd[f"{bn_prefix}.weight"], sd[f"{bn_prefix}.bias"],
            sd[f"{bn_prefix}.running_mean"], sd[f"{bn_prefix}.running_var"],
        )
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}

    def plain(conv_key, bias=True):
        out = {"w": jnp.asarray(cw(f"{conv_key}.weight"), jnp.float32)}
        if bias and f"{conv_key}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{conv_key}.bias"], jnp.float32)
        return out

    params: Params = {
        "block1": {
            "conv1": folded("block1.conv1", "block1.bn1"),
            "conv2": folded("block1.conv2", "block1.bn2"),
        },
    }
    for b in (2, 3, 4):
        params[f"block{b}"] = {
            "conv1": folded(f"block{b}.conv1", f"block{b}.bn1"),
            "conv2": folded(f"block{b}.conv2", f"block{b}.bn2"),
            "down": plain(f"block{b}.downsample"),
        }
    params["agg"] = {f"conv{i}": plain(f"conv{i}", bias=False) for i in range(1, 5)}
    if "convhead1.weight" in sd:
        params["head1"] = plain("convhead1", bias=False)
    params["head2"] = plain("convhead2", bias=False)
    return params


def _conv(x, p):
    pad = (p["w"].shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def _max_pool(x, k):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID"
    )


def _res(x, p):
    relu = jax.nn.relu
    out = relu(_conv(x, p["conv1"]))
    out = _conv(out, p["conv2"])
    return relu(out + _conv(x, p["down"]))


def dense_forward(params: Params, images: jnp.ndarray):
    """images (B, H, W, 3) in [0,1], H/W multiples of 32 ->
    (desc_map (B, H, W, dim) L2-normalized, score_map (B, H, W))."""
    relu = jax.nn.relu
    x1 = relu(_conv(images, params["block1"]["conv1"]))
    x1 = relu(_conv(x1, params["block1"]["conv2"]))
    x2 = _res(_max_pool(x1, 2), params["block2"])
    x3 = _res(_max_pool(x2, 4), params["block3"])
    x4 = _res(_max_pool(x3, 4), params["block4"])
    agg = params["agg"]
    x1a = relu(_conv(x1, agg["conv1"]))
    x2a = relu(_conv(x2, agg["conv2"]))
    x3a = relu(_conv(x3, agg["conv3"]))
    x4a = relu(_conv(x4, agg["conv4"]))
    x1234 = jnp.concatenate(
        [
            x1a,
            upsample_bilinear_align(x2a, 2),
            upsample_bilinear_align(x3a, 8),
            upsample_bilinear_align(x4a, 32),
        ],
        axis=-1,
    )
    if "head1" in params:
        x1234 = relu(_conv(x1234, params["head1"]))
    x = _conv(x1234, params["head2"])
    desc_map = x[..., :-1]
    score_map = jax.nn.sigmoid(x[..., -1])
    desc_map = desc_map / jnp.maximum(
        jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-12
    )
    return desc_map, score_map


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "scores_th", "nms_radius")
)
def extract(
    params: Params,
    images: jnp.ndarray,
    valid_hw: jnp.ndarray,
    max_keypoints: int = 4000,
    scores_th: float = 0.2,
    nms_radius: int = 2,
) -> Dict[str, jnp.ndarray]:
    desc_map, score_map = dense_forward(params, images)
    # Materialize the full-res maps before the sparse consumers — same XLA
    # fusion hazard as ALIKED (aliked.py:extract): the multi-scale
    # upsample/concat/head producer otherwise re-evaluates inside each
    # descriptor/score gather (2.2x measured there at 2x1216px).
    desc_map, score_map = jax.lax.optimization_barrier((desc_map, score_map))
    kpts, scores, _, valid = dkd_detect(
        score_map, valid_hw, max_keypoints, scores_th, nms_radius
    )

    def sample(dm, k):
        d = bilinear_sample(dm, k)
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    descs = jax.vmap(sample)(desc_map, kpts)
    descs = descs * valid[..., None]
    return {"keypoints": kpts, "scores": scores, "descriptors": descs, "mask": valid}
