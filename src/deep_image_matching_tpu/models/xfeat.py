"""XFeat extractor as a pure-functional JAX model.

Architecture parity with the reference's vendored XFeat (Potje et al.,
CVPR'24; ``thirdparty/accelerated_features/modules/model.py:27-170`` and the
sparse pipeline in ``modules/xfeat.py:50-104,219-290``): instance-normalized
grayscale input, BasicLayer (conv + affine-free BN + ReLU) backbone with a
skip branch, pyramid fusion at /8, 64-d dense features, a 65-channel
keypoint-logit head on the space-to-depth input, and a reliability heatmap;
detection = per-cell softmax depth-to-space -> 5x5 local-max NMS ->
reliability-weighted scores -> top-k; descriptors bilinearly sampled from
the /8 feature map (align_corners=False grid convention).

TPU-native: fixed-capacity masked top-k detection fused into the same jitted
program; BNs (affine-free) folded into convs at weight conversion.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detect import max_pool_same, topk_flat

Params = Dict

# (name, in, out, kernel, stride, padding) per BasicLayer; final convs plain
_BLOCKS = {
    "skip1": [("conv", 1, 24, 1, 1, 0)],
    "block1": [
        ("bl", 1, 4, 3, 1, 1), ("bl", 4, 8, 3, 2, 1),
        ("bl", 8, 8, 3, 1, 1), ("bl", 8, 24, 3, 2, 1),
    ],
    "block2": [("bl", 24, 24, 3, 1, 1), ("bl", 24, 24, 3, 1, 1)],
    "block3": [
        ("bl", 24, 64, 3, 2, 1), ("bl", 64, 64, 3, 1, 1),
        ("bl", 64, 64, 1, 1, 0),
    ],
    "block4": [
        ("bl", 64, 64, 3, 2, 1), ("bl", 64, 64, 3, 1, 1),
        ("bl", 64, 64, 3, 1, 1),
    ],
    "block5": [
        ("bl", 64, 128, 3, 2, 1), ("bl", 128, 128, 3, 1, 1),
        ("bl", 128, 128, 3, 1, 1), ("bl", 128, 64, 1, 1, 0),
    ],
    "block_fusion": [
        ("bl", 64, 64, 3, 1, 1), ("bl", 64, 64, 3, 1, 1),
        ("conv", 64, 64, 1, 1, 0),
    ],
    "heatmap_head": [
        ("bl", 64, 64, 1, 1, 0), ("bl", 64, 64, 1, 1, 0),
        ("conv", 64, 1, 1, 1, 0),
    ],
    "keypoint_head": [
        ("bl", 64, 64, 1, 1, 0), ("bl", 64, 64, 1, 1, 0),
        ("bl", 64, 64, 1, 1, 0), ("conv", 64, 65, 1, 1, 0),
    ],
}


def params_from_torch(state_dict) -> Params:
    """Convert an XFeatModel state_dict (keys like ``net.block1.0.layer.0.*``
    or ``block1.0.layer.0.*``), folding the affine-free BatchNorms."""
    sd = {}
    for k, v in state_dict.items():
        sd[k.replace("net.", "", 1) if k.startswith("net.") else k] = np.asarray(v)

    def fold(conv_w, conv_b, mean, var, eps=1e-5):
        s = 1.0 / np.sqrt(var + eps)
        w = conv_w * s[None, None, None, :]
        b = (conv_b - mean) * s if conv_b is not None else -mean * s
        return w, b

    params: Params = {}
    for block, layers in _BLOCKS.items():
        plist = []
        for i, (kind, *_rest) in enumerate(layers):
            if block == "skip1":
                i = 1  # Sequential(AvgPool2d, Conv2d): conv is index 1
            if kind == "bl":
                w = sd[f"{block}.{i}.layer.0.weight"].transpose(2, 3, 1, 0)
                b = sd.get(f"{block}.{i}.layer.0.bias")
                mean = sd[f"{block}.{i}.layer.1.running_mean"]
                var = sd[f"{block}.{i}.layer.1.running_var"]
                w, b = fold(w, b, mean, var)
            else:
                w = sd[f"{block}.{i}.weight"].transpose(2, 3, 1, 0)
                b = sd.get(f"{block}.{i}.bias")
                if b is None:
                    b = np.zeros(w.shape[-1], np.float32)
            plist.append({
                "w": jnp.asarray(w, jnp.float32),
                "b": jnp.asarray(b, jnp.float32),
            })
        params[block] = plist
    return params


def init_params(key: jax.Array) -> Params:
    params: Params = {}
    for block, layers in _BLOCKS.items():
        plist = []
        for kind, cin, cout, k, _s, _p in layers:
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (k, k, cin, cout), jnp.float32) * np.sqrt(
                2.0 / (cin * k * k)
            )
            plist.append({"w": w, "b": jnp.zeros((cout,), jnp.float32)})
        params[block] = plist
    return params


def _run_block(x, plist, spec, relu_last=False):
    for p, (kind, _ci, _co, k, s, pad) in zip(plist, spec):
        y = jax.lax.conv_general_dilated(
            x, p["w"], (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]
        x = jax.nn.relu(y) if kind == "bl" else y
    return x


def _space_to_depth(x, ws=8):
    """(B, H, W, 1) -> (B, H/ws, W/ws, ws*ws), torch unfold channel order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    # torch: unfold(2).unfold(3) -> (B, C, H/ws, W/ws, ws(h), ws(w)) then
    # permute channel = C*ws*ws with (h_off, w_off) row-major
    x = x.transpose(0, 5, 2, 4, 1, 3)  # (B, C, wsH, wsW, H/ws, W/ws)
    return x.reshape(B, C * ws * ws, H // ws, W // ws).transpose(0, 2, 3, 1)


def dense_forward(params: Params, images: jnp.ndarray):
    """images (B, H, W, 1) float; H, W multiples of 32.

    Returns (feats (B, H/8, W/8, 64) unnormalized, kpt_logits (B, H/8, W/8, 65),
    heatmap (B, H/8, W/8, 1))."""
    x = images
    if x.dtype == jnp.uint8:
        # uint8 upload (4x less transfer); the instance norm below makes
        # the 0-255 vs [0,1] scale irrelevant, matching the f32 path
        x = x.astype(jnp.float32)
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)  # InstanceNorm2d(1), no affine

    x1 = _run_block(x, params["block1"], _BLOCKS["block1"])
    skip = _run_block(
        jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID"
        ) / 16.0,
        params["skip1"], _BLOCKS["skip1"],
    )
    x2 = _run_block(x1 + skip, params["block2"], _BLOCKS["block2"])
    x3 = _run_block(x2, params["block3"], _BLOCKS["block3"])
    x4 = _run_block(x3, params["block4"], _BLOCKS["block4"])
    x5 = _run_block(x4, params["block5"], _BLOCKS["block5"])
    # pyramid fusion at /8 (bilinear, half-pixel convention)
    size = (x3.shape[1], x3.shape[2])
    x4u = jax.image.resize(x4, (x4.shape[0], *size, x4.shape[-1]), "bilinear")
    x5u = jax.image.resize(x5, (x5.shape[0], *size, x5.shape[-1]), "bilinear")
    feats = _run_block(x3 + x4u + x5u, params["block_fusion"], _BLOCKS["block_fusion"])
    heatmap = jax.nn.sigmoid(
        _run_block(feats, params["heatmap_head"], _BLOCKS["heatmap_head"])
    )
    kpt_logits = _run_block(
        _space_to_depth(x, 8), params["keypoint_head"], _BLOCKS["keypoint_head"]
    )
    return feats, kpt_logits, heatmap


def get_kpts_heatmap(kpt_logits: jnp.ndarray, temp: float = 1.0) -> jnp.ndarray:
    """65-ch logits -> per-cell softmax (drop dustbin) -> (B, H, W) heatmap."""
    scores = jax.nn.softmax(kpt_logits * temp, axis=-1)[..., :64]
    B, Hc, Wc, _ = scores.shape
    heat = scores.reshape(B, Hc, Wc, 8, 8)
    return heat.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)


def _sample_map_halfpix(fmap: jnp.ndarray, coords: jnp.ndarray, H: int, W: int):
    """Bilinear sample of a /8 map at full-res (x, y) coords using the
    grid_sample align_corners=False convention (InterpolateSparse2d)."""
    Hc, Wc, C = fmap.shape
    gx = 2.0 * coords[:, 0] / (W - 1) - 1.0
    gy = 2.0 * coords[:, 1] / (H - 1) - 1.0
    mx = ((gx + 1.0) * Wc - 1.0) / 2.0
    my = ((gy + 1.0) * Hc - 1.0) / 2.0
    from ..ops.deform import bilinear_sample_zeropad

    return bilinear_sample_zeropad(fmap, jnp.stack([mx, my], axis=-1))


@functools.partial(jax.jit, static_argnames=("top_k", "detection_threshold"))
def extract(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 1), H/W multiples of 32
    valid_hw: jnp.ndarray, # (B, 2)
    top_k: int = 4096,
    detection_threshold: float = 0.05,
) -> Dict[str, jnp.ndarray]:
    B, H, W, _ = images.shape
    feats, kpt_logits, heatmap = dense_forward(params, images)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    K1h = get_kpts_heatmap(kpt_logits)  # (B, H, W)

    # 5x5 local-max NMS + threshold (xfeat.py:249-268), masked to valid area
    local_max = max_pool_same(K1h, 2)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    in_img = (ys < valid_hw[:, 0, None, None]) & (xs < valid_hw[:, 1, None, None])
    pos = (K1h == local_max) & (K1h > detection_threshold) & in_img

    # reliability scores: nearest(K1h) * bilinear(heatmap) at kpts == for
    # integer NMS positions: K1h value * bilinear heatmap sample
    def per_image(k1h, hm, posm, fm):
        flat = jnp.where(posm, k1h, -1.0).reshape(-1)
        vals, idx = topk_flat(flat, top_k)
        valid = vals > 0
        y = (idx // W).astype(jnp.float32)
        x = (idx % W).astype(jnp.float32)
        kpts = jnp.stack([x, y], axis=-1)
        hm_s = _sample_map_halfpix(hm, kpts, H, W)[:, 0]
        scores = jnp.where(valid, vals * hm_s, -1.0)
        order = jnp.argsort(-scores)
        kpts = kpts[order]
        scores = jnp.maximum(scores[order], 0.0)
        valid = valid[order]
        descs = _sample_map_halfpix(fm, kpts, H, W)
        descs = descs / jnp.maximum(
            jnp.linalg.norm(descs, axis=-1, keepdims=True), 1e-12
        )
        return kpts, scores, descs, valid

    kpts, scores, descs, valid = jax.vmap(per_image)(K1h, heatmap, pos, feats)
    kpts = jnp.where(valid[..., None], kpts, 0.0)
    scores = jnp.where(valid, scores, 0.0)
    descs = descs * valid[..., None]
    return {"keypoints": kpts, "scores": scores, "descriptors": descs, "mask": valid}
