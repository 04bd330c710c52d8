"""LiftFeat extractor as a pure-functional JAX model.

Architecture parity with the reference's vendored LiftFeat
(``thirdparty/liftfeat/models/model.py:120-418``,
``utils/featurebooster.py``, ``utils/config.py``): instance-normalized
grayscale input, SuperPoint-style conv backbone (24/24/64/64/128 with
max-pools to /32), top-down fusion to a /8 map, 65-channel keypoint head
(affine-free BNs + a final affine BN), 64-d descriptor head, a depth-normal
head (upsample chain to full res, 3-channel unit normals), and the
FeatureBooster: residual descriptor MLP + normal-feature MLP (8x8
space-to-depth normals, 192-d) + 3 attention-free-transformer (AFT) layers
refining ALL /8 cells densely.

Detection follows the wrapper (``models/liftfeat_wrapper.py:112-141``):
per-cell softmax heatmap -> 5x5 NMS + threshold -> top-k; refined
descriptors bilinearly sampled at keypoints (half-pixel /8 convention).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detect import max_pool_same, topk_flat
from .xfeat import _sample_map_halfpix, _space_to_depth, get_kpts_heatmap

Params = Dict

C1, C2, C3, C4, C5 = 24, 24, 64, 64, 128
DESC_DIM = 64
N_AFT_LAYERS = 3


# ---------------------------------------------------------------------------
# Converters / init
# ---------------------------------------------------------------------------

def _fold_affine_free(w, mean, var, eps=1e-5):
    s = 1.0 / np.sqrt(var + eps)
    return w * s[None, None, None, :], -mean * s


def params_from_torch(state_dict) -> Params:
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("model.", "", 1) if k.startswith("model.") else k
        sd[k] = np.asarray(v)

    def cw(key):
        return sd[key].transpose(2, 3, 1, 0)

    def conv(key, bias=True):
        out = {"w": jnp.asarray(cw(f"{key}.weight"), jnp.float32)}
        if bias and f"{key}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{key}.bias"], jnp.float32)
        else:
            out["b"] = jnp.zeros((out["w"].shape[-1],), jnp.float32)
        return out

    def base_layer(prefix):
        """BaseLayer: conv(bias=False) + BN(affine=False) [+ ReLU]."""
        w = cw(f"{prefix}.layer.0.weight")
        w, b = _fold_affine_free(
            w, sd[f"{prefix}.layer.1.running_mean"], sd[f"{prefix}.layer.1.running_var"]
        )
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}

    def conv_bn(conv_key, bn_key):
        """Conv + affine BN folded."""
        w = cw(f"{conv_key}.weight")
        b = sd.get(f"{conv_key}.bias", np.zeros(w.shape[-1]))
        g, beta = sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"]
        mean, var = sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"]
        s = g / np.sqrt(var + 1e-5)
        return {
            "w": jnp.asarray(w * s[None, None, None, :], jnp.float32),
            "b": jnp.asarray((b - mean) * s + beta, jnp.float32),
        }

    def lin(key, bias=True):
        out = {"w": jnp.asarray(sd[f"{key}.weight"].T, jnp.float32)}
        out["b"] = jnp.asarray(
            sd.get(f"{key}.bias", np.zeros(out["w"].shape[-1])), jnp.float32
        )
        return out

    def upsample_layer(prefix):
        return conv_bn(f"{prefix}.conv", f"{prefix}.bn")

    params: Params = {
        "backbone": {
            name: conv(name) for name in (
                "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                "conv4a", "conv4b", "conv5a", "conv5b",
            )
        },
        "upsample5": upsample_layer("upsample5"),
        "upsample4": upsample_layer("upsample4"),
        "fusion45": conv("conv_fusion45"),
        "fusion34": conv("conv_fusion34"),
        "keypoint_head": {
            "layers": [base_layer(f"keypoint_head.layer{i}") for i in range(1, 6)],
            "out": conv_bn("keypoint_head.conv", "keypoint_head.bn"),
        },
        "descriptor_head": [
            base_layer(f"descriptor_head.layer.{i}") for i in range(4)
        ],
        "depth_head": {
            "upa": upsample_layer("depth_head.upsampleDa"),
            "upb": upsample_layer("depth_head.upsampleDb"),
            "upc": upsample_layer("depth_head.upsampleDc"),
            "da": conv_bn("depth_head.convDepa", "depth_head.bnDepa"),
            "db": conv_bn("depth_head.convDepb", "depth_head.bnDepb"),
            "dc": conv_bn("depth_head.convDepc", "depth_head.bnDepc"),
        },
        "booster": {
            "denc": [
                lin("feature_boost.denc.encoder.0"),
                lin("feature_boost.denc.encoder.2"),
                lin("feature_boost.denc.encoder.4"),
            ],
            "nenc": [
                lin(f"feature_boost.nenc.encoder.{i}") for i in (0, 1, 2, 3)
            ],
            "aft": [
                {
                    "q": lin(f"feature_boost.attn_proj.layers.{i}.attn.query"),
                    "k": lin(f"feature_boost.attn_proj.layers.{i}.attn.key"),
                    "v": lin(f"feature_boost.attn_proj.layers.{i}.attn.value"),
                    "proj": lin(f"feature_boost.attn_proj.layers.{i}.attn.proj"),
                    "ffn1": lin(f"feature_boost.attn_proj.layers.{i}.ffn.mlp.0"),
                    "ffn2": lin(f"feature_boost.attn_proj.layers.{i}.ffn.mlp.2"),
                }
                for i in range(N_AFT_LAYERS)
            ],
        },
    }
    return params


def init_params(key) -> Params:
    rng = np.random.default_rng(0)

    def conv(k, ci, co):
        w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (k, k, ci, co)).astype(np.float32)
        return {"w": jnp.asarray(w), "b": jnp.zeros((co,), jnp.float32)}

    def lin(ci, co):
        return {"w": jnp.asarray(rng.normal(0, 1 / np.sqrt(ci), (ci, co)), jnp.float32),
                "b": jnp.zeros((co,), jnp.float32)}

    kh_dims = [(C3, 32), (32, 32), (32, 64), (64, 64), (64, 128)]
    return {
        "backbone": {
            "conv1a": conv(3, 1, C1), "conv1b": conv(3, C1, C1),
            "conv2a": conv(3, C1, C2), "conv2b": conv(3, C2, C2),
            "conv3a": conv(3, C2, C3), "conv3b": conv(3, C3, C3),
            "conv4a": conv(3, C3, C4), "conv4b": conv(3, C4, C4),
            "conv5a": conv(3, C4, C5), "conv5b": conv(3, C5, C5),
        },
        "upsample5": conv(3, C5, C5 // 2),
        "upsample4": conv(3, C4, C4 // 2),
        "fusion45": conv(3, C5 // 2 + C4, C4),
        "fusion34": conv(3, C4 // 2 + C3, C3),
        "keypoint_head": {
            "layers": [conv(3, ci, co) for ci, co in kh_dims],
            "out": conv(3, 128, 65),
        },
        "descriptor_head": [
            conv(3, C3, 32), conv(3, 32, 32), conv(3, 32, 64), conv(3, 64, DESC_DIM)
        ],
        "depth_head": {
            "upa": conv(3, C3, 32), "upb": conv(3, 32, 16), "upc": conv(3, 16, 8),
            "da": conv(3, 32 + 64, 32), "db": conv(3, 16 + 32, 16),
            "dc": conv(3, 8 + 16, 3),
        },
        "booster": {
            "denc": [lin(64, 64), lin(64, 64), lin(64, 64)],
            "nenc": [lin(192, 128), lin(128, 64), lin(64, 64), lin(64, 64)],
            "aft": [
                {"q": lin(64, 64), "k": lin(64, 64), "v": lin(64, 64),
                 "proj": lin(64, 64), "ffn1": lin(64, 128), "ffn2": lin(128, 64)}
                for _ in range(N_AFT_LAYERS)
            ],
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1):
    kh = p["w"].shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def _pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _up2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "linear")


def _upsample_layer(x, p):
    return jax.nn.leaky_relu(_conv(_up2(x), p), 0.1)


def _lin(x, p):
    return x @ p["w"] + p["b"]


def dense_forward(params: Params, images: jnp.ndarray):
    """(B, H, W, 1), H/W multiples of 32 -> (desc_map (/8, 64ch),
    kpt_logits (/8, 65ch), normals (/1, 3ch))."""
    bb = params["backbone"]
    relu = jax.nn.relu
    x = images
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)

    x1 = _pool2(relu(_conv(relu(_conv(x, bb["conv1a"])), bb["conv1b"])))
    x2 = _pool2(relu(_conv(relu(_conv(x1, bb["conv2a"])), bb["conv2b"])))
    x3 = _pool2(relu(_conv(relu(_conv(x2, bb["conv3a"])), bb["conv3b"])))
    x4 = _pool2(relu(_conv(relu(_conv(x3, bb["conv4a"])), bb["conv4b"])))
    x5 = _pool2(relu(_conv(relu(_conv(x4, bb["conv5a"])), bb["conv5b"])))

    # top-down fusion to /8
    u5 = _upsample_layer(x5, params["upsample5"])
    f4 = _conv(jnp.concatenate([x4, u5], -1), params["fusion45"])
    u4 = _upsample_layer(f4, params["upsample4"])
    f3 = _conv(jnp.concatenate([x3, u4], -1), params["fusion34"])

    kh = params["keypoint_head"]
    k = f3
    for p in kh["layers"]:
        k = relu(_conv(k, p))
    kpt_logits = _conv(k, kh["out"])

    d = f3
    dh = params["descriptor_head"]
    d = relu(_conv(d, dh[0]))
    for p in dh[1:]:
        d = _conv(d, p)  # no activation (BaseLayer activation=False)
    desc_map = d

    # depth-normal head: three upsample+fuse steps back to full res
    dp = params["depth_head"]
    lrelu = lambda t: jax.nn.leaky_relu(t, 0.1)
    x0 = _up2(f3)
    h1 = jnp.concatenate([x0, _upsample_layer(f3, dp["upa"])], -1)
    h1 = lrelu(_conv(h1, dp["da"]))
    h2 = jnp.concatenate([_up2(h1), _upsample_layer(h1, dp["upb"])], -1)
    h2 = lrelu(_conv(h2, dp["db"]))
    h3 = jnp.concatenate([_up2(h2), _upsample_layer(h2, dp["upc"])], -1)
    normals = lrelu(_conv(h3, dp["dc"]))
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    return desc_map, kpt_logits, normals


def feature_boost(params: Params, descs: jnp.ndarray, normals192: jnp.ndarray):
    """FeatureBooster (use_kenc=False, use_normal=True, use_cross=True):
    residual descriptor MLP + normal MLP, then AFT layers. descs (N, 64),
    normals192 (N, 192) -> (N, 64)."""
    bp = params["booster"]
    # DescriptorEncoder: MLP([64,64,64,64]) residual (ReLU after first two)
    h = jax.nn.relu(_lin(descs, bp["denc"][0]))
    h = jax.nn.relu(_lin(h, bp["denc"][1]))
    descs = descs + _lin(h, bp["denc"][2])
    n = normals192
    for p in bp["nenc"][:-1]:
        n = _lin(n, p)  # MLP_no_ReLU: linears only
    n = _lin(n, bp["nenc"][-1])
    x = descs + n
    for lp in bp["aft"]:
        q = _lin(x, lp["q"])
        k = _lin(x, lp["k"])
        v = _lin(x, lp["v"])
        kk = jax.nn.softmax(k, axis=0)  # softmax over tokens per channel
        kv = (kk * v).sum(axis=0, keepdims=True)
        x = x + _lin(q * kv, lp["proj"])
        h = jax.nn.relu(_lin(x, lp["ffn1"]))
        x = x + _lin(h, lp["ffn2"])
    return x


@functools.partial(jax.jit, static_argnames=("top_k", "detection_threshold"))
def extract(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 1), H/W multiples of 32
    valid_hw: jnp.ndarray,
    top_k: int = 4096,
    detection_threshold: float = 0.05,
) -> Dict[str, jnp.ndarray]:
    B, H, W, _ = images.shape
    desc_map, kpt_logits, normals = dense_forward(params, images)
    # boost all /8 cells with the unfolded normal features:
    # torch unfolds (B, 3, H, W) with ws=8 -> 3*64 = 192 channel-major
    n192 = jnp.concatenate(
        [_space_to_depth(normals[..., c:c + 1], 8) for c in range(3)], axis=-1
    )
    Hc, Wc = desc_map.shape[1:3]

    def boost_one(dm, nm):
        return feature_boost(
            params, dm.reshape(Hc * Wc, DESC_DIM), nm.reshape(Hc * Wc, -1)
        ).reshape(Hc, Wc, DESC_DIM)

    refined = jax.vmap(boost_one)(desc_map, n192)

    heat = get_kpts_heatmap(kpt_logits)  # (B, H, W)
    local_max = max_pool_same(heat, 2)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    in_img = (ys < valid_hw[:, 0, None, None]) & (xs < valid_hw[:, 1, None, None])
    pos = (heat == local_max) & (heat > detection_threshold) & in_img

    def per_image(h_map, posm, rm):
        flat = jnp.where(posm, h_map, -1.0).reshape(-1)
        vals, idx = topk_flat(flat, top_k)
        valid = vals > 0
        x = (idx % W).astype(jnp.float32)
        y = (idx // W).astype(jnp.float32)
        kpts = jnp.stack([x, y], -1)
        descs = _sample_map_halfpix(rm, kpts, H, W)
        descs = descs / jnp.maximum(
            jnp.linalg.norm(descs, axis=-1, keepdims=True), 1e-12
        )
        return kpts, jnp.maximum(vals, 0.0), descs, valid

    kpts, scores, descs, valid = jax.vmap(per_image)(heat, pos, refined)
    kpts = jnp.where(valid[..., None], kpts, 0.0)
    descs = descs * valid[..., None]
    return {"keypoints": kpts, "scores": scores, "descriptors": descs, "mask": valid}
