"""DISK extractor as a pure-functional JAX model.

DISK (Tyszkiewicz et al., NeurIPS'20) as used by the reference via kornia
(``extractors/disk.py`` -> ``thirdparty/hloc/extractors/disk.py`` -> kornia
DISK): a thin U-Net (5 encoder stages 16/32/64/64/64, PReLU gates, trivial
avg-pool down / bilinear up) emitting a 128-d descriptor map + 1-ch keypoint
heatmap; detection = window-5 local-max NMS over the heatmap with threshold,
descriptors L2-normalized samples of the dense map.

NOTE: the kornia U-Net source is not available in this offline environment,
so the block topology here is reconstructed from the published architecture;
``params_from_torch`` maps kornia's state-dict naming on a best-effort basis
and is marked experimental until verified against a kornia checkpoint
(tracked for round 2). The detection/sampling semantics follow the
reference's config surface (nms_window_size, detection_threshold,
pad_if_not_divisible).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detect import bilinear_sample, max_pool_same, select_topk, topk_flat

Params = Dict

DOWN = [16, 32, 64, 64, 64]
UP = [64, 64, 129]  # final = 128 desc + 1 heatmap
DESC_DIM = 128


def init_params(key) -> Params:
    rng = np.random.default_rng(0)

    def conv(ci, co, k=5):
        w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (k, k, ci, co)).astype(np.float32)
        return {
            "w": jnp.asarray(w),
            "b": jnp.zeros((co,), jnp.float32),
            "prelu": jnp.full((co,), 0.25, jnp.float32),
        }

    params: Params = {"down": [], "up": []}
    cin = 3
    for co in DOWN:
        params["down"].append(conv(cin, co))
        cin = co
    # up path: concat skip from matching encoder stage
    skips = DOWN[-2::-1]  # [64, 64, 32, 16] -> we use 3 up stages
    cin = DOWN[-1]
    for i, co in enumerate(UP):
        params["up"].append(conv(cin + skips[i], co))
        cin = co
    return params


def params_from_torch(state_dict) -> Params:
    """EXPERIMENTAL: map a kornia DISK checkpoint; verified structurally
    (shape-checked) only — see module docstring.

    Conv weights are taken in checkpoint order; each conv's PReLU gate
    slope is recovered from the nearest following 1-d ``*.weight`` tensor
    whose length matches the conv's output channels (PReLU weights are the
    only 1-d weight tensors in DISK's U-Net: norms are affine-free
    InstanceNorm), falling back to the 0.25 PReLU init when absent.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    ordered = list(sd.keys())
    convs = [k for k in ordered if k.endswith(".weight") and sd[k].ndim == 4]
    prelus = [
        k for k in ordered
        if k.endswith(".weight") and sd[k].ndim == 1
        and not any(s in k for s in ("running_mean", "running_var"))
        and k.replace(".weight", ".running_mean") not in sd
    ]
    down_keys = convs[: len(DOWN)]
    up_keys = convs[len(DOWN) : len(DOWN) + len(UP)]

    def prelu_for(conv_key, co):
        ci = ordered.index(conv_key)
        for k in prelus:
            if ordered.index(k) > ci and sd[k].shape == (co,):
                prelus.remove(k)
                return jnp.asarray(sd[k], jnp.float32)
        return jnp.full((co,), 0.25, jnp.float32)

    params: Params = {"down": [], "up": []}
    for group, keys in (("down", down_keys), ("up", up_keys)):
        for k in keys:
            base = k[: -len(".weight")]
            w = sd[k].transpose(2, 3, 1, 0)
            co = w.shape[-1]
            params[group].append({
                "w": jnp.asarray(w, jnp.float32),
                "b": jnp.asarray(sd.get(f"{base}.bias", np.zeros(co)), jnp.float32),
                "prelu": prelu_for(k, co),
            })
    return params


def _conv(x, p):
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    return jnp.where(y >= 0, y, y * p["prelu"])  # PReLU


def dense_forward(params: Params, images: jnp.ndarray):
    """(B, H, W, 3), H/W multiples of 16 -> (desc (B,H,W,128), heat (B,H,W))."""
    x = images
    skips: List[jnp.ndarray] = []
    for i, p in enumerate(params["down"]):
        if i > 0:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        x = _conv(x, p)
        skips.append(x)
    for i, p in enumerate(params["up"]):
        skip = skips[len(DOWN) - 2 - i]
        x = jax.image.resize(
            x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[-1]), "linear"
        )
        x = _conv(jnp.concatenate([x, skip], axis=-1), p)
    desc = x[..., :DESC_DIM]
    heat = x[..., DESC_DIM]
    return desc, heat


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "nms_window_size", "detection_threshold")
)
def extract(
    params: Params,
    images: jnp.ndarray,
    valid_hw: jnp.ndarray,
    max_keypoints: int = 4096,
    nms_window_size: int = 5,
    detection_threshold: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    desc_map, heat = dense_forward(params, images)
    r = nms_window_size // 2
    nms = jnp.where(heat == max_pool_same(heat, r), heat, -jnp.inf)
    # DISK heatmap is a logit map; threshold applies to the raw value
    nms = jnp.where(nms > detection_threshold, nms, -jnp.inf)
    B, H, W = heat.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    in_img = (ys < valid_hw[:, 0, None, None]) & (xs < valid_hw[:, 1, None, None])
    masked = jnp.where(in_img, nms, -jnp.inf)
    vals, idx = topk_flat(masked.reshape(B, H * W), max_keypoints)
    valid = jnp.isfinite(vals)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    kpts = jnp.stack([x, y], -1)
    kpts = jnp.where(valid[..., None], kpts, 0.0)
    scores = jnp.where(valid, vals, 0.0)

    def sample(dm, k):
        d = bilinear_sample(dm, k)
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    descs = jax.vmap(sample)(desc_map, kpts) * valid[..., None]
    return {"keypoints": kpts, "scores": scores, "descriptors": descs, "mask": valid}
