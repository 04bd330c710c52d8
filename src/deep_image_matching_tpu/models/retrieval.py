"""Global image descriptors for retrieval-based pair selection.

Parity: reference ``image_retrieval.py:7-44`` + hloc retrieval nets
(NetVLAD / OpenIBL / CosPlace / DIR; SURVEY.md section 2.2). Implemented
TPU-native:

- ``netvlad``: VGG16 conv backbone + NetVLAD aggregation (64 clusters,
  intra-normalization + global L2, optional PCA whitening), converting the
  hloc/torchvision weight layouts.
- ``gem`` (backing cosplace/openibl/dir when their checkpoints are given):
  generalized-mean pooling over the same conv backbone + linear projection.
- ``tiny``: a weight-free classical descriptor (downsampled, contrast
  normalized thumbnail) so retrieval works with zero checkpoints — the
  offline default when no weights are available.

All descriptors are computed as one jitted program per image batch and
compared with a single (N, D) x (D, N) MXU matmul.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

# VGG16 conv config (through conv5_3, matching NetVLAD's cropped backbone)
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]


def vgg16_params_from_torch(state_dict) -> Params:
    """torchvision VGG16 ``features.*`` conv weights -> HWIO list."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    convs = []
    idx = 0
    for c in _VGG16_CFG:
        if c == "M":
            idx += 1
            continue
        convs.append({
            "w": jnp.asarray(sd[f"features.{idx}.weight"].transpose(2, 3, 1, 0), jnp.float32),
            "b": jnp.asarray(sd[f"features.{idx}.bias"], jnp.float32),
        })
        idx += 2  # conv + relu
    return {"convs": convs}


def init_vgg16_params(key: jax.Array) -> Params:
    convs = []
    cin = 3
    rng = np.random.default_rng(0)
    for c in _VGG16_CFG:
        if c == "M":
            continue
        w = rng.normal(0, np.sqrt(2.0 / (cin * 9)), (3, 3, cin, c)).astype(np.float32)
        convs.append({"w": jnp.asarray(w), "b": jnp.zeros((c,), jnp.float32)})
        cin = c
    return {"convs": convs}


def vgg16_features(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [0,1] -> (B, H/16, W/16, 512) conv5_3 activations
    (pre-ReLU per NetVLAD convention: hloc uses the backbone up to conv5_3
    without the final ReLU)."""
    x = images
    ci = 0
    n_convs = sum(1 for c in _VGG16_CFG if c != "M")
    for c in _VGG16_CFG:
        if c == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        p = params["convs"][ci]
        x = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]
        ci += 1
        if ci < n_convs:  # last conv has no ReLU
            x = jax.nn.relu(x)
    return x


def netvlad_aggregate(
    feats: jnp.ndarray,       # (B, H, W, D)
    centers: jnp.ndarray,     # (K, D) cluster centers
    assign_w: jnp.ndarray,    # (D, K) soft-assignment projection
    pca_w: Optional[jnp.ndarray] = None,  # (K*D, out)
    pca_b: Optional[jnp.ndarray] = None,
    assign_b: Optional[jnp.ndarray] = None,  # (K,) soft-assignment bias
) -> jnp.ndarray:
    """NetVLAD layer: soft-assigned residual aggregation with intra- and
    global L2 normalization (Arandjelovic et al.)."""
    B, H, W, D = feats.shape
    x = feats.reshape(B, H * W, D)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    logits = jnp.einsum("bnd,dk->bnk", x, assign_w, preferred_element_type=jnp.float32)
    if assign_b is not None:
        logits = logits + assign_b[None, None, :]
    soft = jax.nn.softmax(logits, axis=-1)  # (B, N, K)
    # residual aggregation: sum_n a_nk (x_n - c_k)
    agg = jnp.einsum("bnk,bnd->bkd", soft, x, preferred_element_type=jnp.float32)
    counts = soft.sum(axis=1)  # (B, K)
    vlad = agg - counts[..., None] * centers[None]
    # intra-normalize per cluster, then flatten + global L2
    vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
    v = vlad.reshape(B, -1)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    if pca_w is not None:
        v = v @ pca_w + (pca_b if pca_b is not None else 0.0)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v


# ---------------------------------------------------------------------------
# CosPlace: ResNet-18 backbone (BNs folded) + GeM pooling + linear projection
# (Berton et al., CVPR'22; hloc wraps the official torchhub model)
# ---------------------------------------------------------------------------

_R18_STAGES = [(2, 64, 1), (2, 128, 2), (2, 256, 2), (2, 512, 2)]


def cosplace_params_from_torch(state_dict) -> Params:
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("backbone.", "", 1) if k.startswith("backbone.") else k
        sd[k] = np.asarray(v)

    def folded(conv_key, bn_key):
        w = sd[f"{conv_key}.weight"].transpose(2, 3, 1, 0)
        g, beta = sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"]
        mean, var = sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"]
        s = g / np.sqrt(var + 1e-5)
        return {
            "w": jnp.asarray(w * s[None, None, None, :], jnp.float32),
            "b": jnp.asarray(beta - mean * s, jnp.float32),
        }

    params: Params = {
        "stem": folded("conv1", "bn1"),
        "stages": [],
    }
    for si, (n_blocks, _c, _s) in enumerate(_R18_STAGES):
        blocks = []
        for bi in range(n_blocks):
            p = f"layer{si + 1}.{bi}"
            blk = {
                "conv1": folded(f"{p}.conv1", f"{p}.bn1"),
                "conv2": folded(f"{p}.conv2", f"{p}.bn2"),
            }
            if f"{p}.downsample.0.weight" in sd:
                blk["down"] = folded(f"{p}.downsample.0", f"{p}.downsample.1")
            blocks.append(blk)
        params["stages"].append(blocks)
    # aggregation: GeM p + linear (official CosPlace: aggregation.1.p,
    # aggregation.2.weight/bias or fc.weight)
    for key in ("aggregation.3", "aggregation.2", "fc"):
        if f"{key}.weight" in sd:
            params["proj"] = {
                "w": jnp.asarray(sd[f"{key}.weight"].T, jnp.float32),
                "b": jnp.asarray(
                    sd.get(f"{key}.bias", np.zeros(sd[f"{key}.weight"].shape[0])),
                    jnp.float32,
                ),
            }
            break
    for key in ("aggregation.1.p", "aggregation.0.p", "gem.p"):
        if key in sd:
            params["gem_p"] = jnp.asarray(sd[key].reshape(()), jnp.float32)
            break
    params.setdefault("gem_p", jnp.asarray(3.0, jnp.float32))
    return params


def cosplace_descriptor(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) ImageNet-normalized -> L2-normalized global descriptor."""

    def conv(x, p, stride=1):
        kh = p["w"].shape[0]
        pad = (kh - 1) // 2
        return jax.lax.conv_general_dilated(
            x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]

    relu = jax.nn.relu
    x = relu(conv(images, params["stem"], stride=2))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for si, blocks in enumerate(params["stages"]):
        stride = _R18_STAGES[si][2]
        for bi, bp in enumerate(blocks):
            s = stride if bi == 0 else 1
            out = relu(conv(x, bp["conv1"], stride=s))
            out = conv(out, bp["conv2"])
            identity = conv(x, bp["down"], stride=s) if "down" in bp else x
            x = relu(out + identity)
    v = gem_pool(x, p=float(params["gem_p"]))
    if "proj" in params:
        v = v @ params["proj"]["w"] + params["proj"]["b"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v


def openibl_params_from_torch(state_dict) -> Params:
    """OpenIBL ``vgg16_netvlad`` (SFRS) hub checkpoint -> our VGG16+NetVLAD
    params (reference: hloc ``extractors/openibl.py`` loads
    ``yxgeee/OpenIBL vgg16_netvlad``). Layout: ``base_model.N.*`` VGG16
    features (torchvision Sequential indices) + ``net_vlad.centroids`` (K, D)
    and ``net_vlad.conv.weight`` (K, D, 1, 1)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    vgg_sd = {
        k.replace("base_model.", "features."): v
        for k, v in sd.items() if k.startswith("base_model.")
    }
    params = vgg16_params_from_torch(vgg_sd)
    params["centers"] = jnp.asarray(sd["net_vlad.centroids"], jnp.float32)
    conv_w = sd["net_vlad.conv.weight"].reshape(
        sd["net_vlad.conv.weight"].shape[0], -1
    )  # (K, D)
    params["assign_w"] = jnp.asarray(conv_w.T, jnp.float32)  # (D, K)
    if "net_vlad.conv.bias" in sd:
        params["assign_b"] = jnp.asarray(sd["net_vlad.conv.bias"], jnp.float32)
    return params


# ---------------------------------------------------------------------------
# DIR (Deep Image Retrieval, Revaud et al.): ResNet-101 backbone (BNs
# folded) + GeM pooling + whitening FC. Reference: hloc ``extractors/dir.py``
# wraps naver/deep-image-retrieval "Resnet101-AP-GeM-LM18".
# ---------------------------------------------------------------------------

_R101_STAGES = [(3, 256, 1), (4, 512, 2), (23, 1024, 2), (3, 2048, 2)]


def resnet_gem_params_from_torch(
    state_dict, stages=None, strip_prefixes=("module.", "backbone.", "net.")
) -> Params:
    """torchvision-style bottleneck ResNet (conv1/bn1, layerN.M.convK/bnK,
    downsample) + optional ``whiten``/``fc`` projection and learned GeM
    exponent -> folded-BN JAX params."""
    stages = stages if stages is not None else _R101_STAGES
    sd = {}
    for k, v in state_dict.items():
        for p in strip_prefixes:
            if k.startswith(p):
                k = k[len(p):]
        sd[k] = np.asarray(v)

    def folded(conv_key, bn_key):
        w = sd[f"{conv_key}.weight"].transpose(2, 3, 1, 0)
        g, beta = sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"]
        mean, var = sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"]
        s = g / np.sqrt(var + 1e-5)
        return {
            "w": jnp.asarray(w * s[None, None, None, :], jnp.float32),
            "b": jnp.asarray(beta - mean * s, jnp.float32),
        }

    params: Params = {"stem": folded("conv1", "bn1"), "stages": []}
    for si, (n_blocks, _c, _s) in enumerate(stages):
        blocks = []
        for bi in range(n_blocks):
            p = f"layer{si + 1}.{bi}"
            blk = {
                "conv1": folded(f"{p}.conv1", f"{p}.bn1"),
                "conv2": folded(f"{p}.conv2", f"{p}.bn2"),
                "conv3": folded(f"{p}.conv3", f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                blk["down"] = folded(f"{p}.downsample.0", f"{p}.downsample.1")
            blocks.append(blk)
        params["stages"].append(blocks)
    for key in ("whiten", "fc", "proj"):
        if f"{key}.weight" in sd:
            params["proj"] = {
                "w": jnp.asarray(sd[f"{key}.weight"].T, jnp.float32),
                "b": jnp.asarray(
                    sd.get(f"{key}.bias", np.zeros(sd[f"{key}.weight"].shape[0])),
                    jnp.float32,
                ),
            }
            break
    for key in ("adpool.p", "pool.p", "gem.p", "adpooling.p"):
        if key in sd:
            params["gem_p"] = jnp.asarray(sd[key].reshape(()), jnp.float32)
            break
    params.setdefault("gem_p", jnp.asarray(3.0, jnp.float32))
    return params


def resnet_gem_descriptor(
    params: Params, images: jnp.ndarray, stages=None
) -> jnp.ndarray:
    """(B, H, W, 3) ImageNet-normalized -> L2-normalized global descriptor
    through a bottleneck ResNet + GeM (+ whitening if present)."""
    stages = stages if stages is not None else _R101_STAGES

    def conv(x, p, stride=1):
        kh = p["w"].shape[0]
        pad = (kh - 1) // 2
        return jax.lax.conv_general_dilated(
            x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]

    relu = jax.nn.relu
    x = relu(conv(images, params["stem"], stride=2))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for si, blocks in enumerate(params["stages"]):
        stride = stages[si][2]
        for bi, bp in enumerate(blocks):
            s = stride if bi == 0 else 1
            out = relu(conv(x, bp["conv1"]))
            out = relu(conv(out, bp["conv2"], stride=s))
            out = conv(out, bp["conv3"])
            identity = conv(x, bp["down"], stride=s) if "down" in bp else x
            x = relu(out + identity)
    v = gem_pool(x, p=float(params["gem_p"]))
    if "proj" in params:
        v = v @ params["proj"]["w"] + params["proj"]["b"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v


def gem_pool(feats: jnp.ndarray, p: float = 3.0) -> jnp.ndarray:
    """Generalized-mean pooling (B, H, W, D) -> (B, D), L2-normalized."""
    x = jnp.maximum(feats, 1e-6) ** p
    v = x.mean(axis=(1, 2)) ** (1.0 / p)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


@jax.jit
def tiny_descriptor(images: jnp.ndarray) -> jnp.ndarray:
    """Weight-free global descriptor: 16x16 contrast-normalized grayscale
    thumbnail + color means, L2-normalized. Deterministic and surprisingly
    effective for near-duplicate / same-scene retrieval."""
    B = images.shape[0]
    gray = images.mean(axis=-1, keepdims=True)
    thumb = jax.image.resize(gray, (B, 16, 16, 1), "linear").reshape(B, -1)
    mu = thumb.mean(axis=1, keepdims=True)
    sd = thumb.std(axis=1, keepdims=True) + 1e-6
    thumb = (thumb - mu) / sd
    color = jax.image.resize(images, (B, 4, 4, images.shape[-1]), "linear").reshape(B, -1)
    v = jnp.concatenate([thumb, color], axis=1)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
