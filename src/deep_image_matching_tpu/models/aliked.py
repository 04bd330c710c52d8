"""ALIKED extractor as a pure-functional JAX model.

Architecture parity with the reference's vendored ALIKED (Zhao et al.;
``thirdparty/LightGlue/lightglue/aliked.py:560-693``): ConvBlock + ResBlocks
with deformable convs (blocks 3-4), multi-scale feature aggregation with
align-corners bilinear upsampling, sigmoid score head, DKD differentiable
keypoint detection with sub-pixel soft-argmax refinement
(``aliked.py:92-245``), and the SDDH deformable descriptor head
(``aliked.py:452-559``).

TPU-native design: the CUDA ``get_patches`` custom op and torchvision's
deformable conv (SURVEY.md section 2.4) become batched gather + matmul
programs (``ops/deform.py``); detection is fixed-capacity masked top-k; the
whole extract path is one jitted program per image batch. BatchNorms fold
into convs at weight-conversion time. Pretrained checkpoints
(aliked-t16/n16/n16rot/n32) convert via ``params_from_torch``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform import (
    bilinear_sample_zeropad,
    deform_conv2d,
    extract_patches,
    upsample_bilinear_align,
)
from ..ops.detect import simple_nms, select_topk

Params = Dict

# c1, c2, c3, c4, dim, K(sddh kernel), M(n_pos)
CFGS = {
    "aliked-t16": (8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": (16, 32, 64, 128, 128, 3, 32),
}


def _fold_bn(w, b, g, beta, mean, var, eps=1e-5):
    """Fold inference BatchNorm2d into conv weight (kh, kw, in, out)."""
    s = g / np.sqrt(var + eps)
    w = w * s[None, None, None, :]
    b = (b - mean) * s + beta if b is not None else -mean * s + beta
    return w, b


def params_from_torch(state_dict, model_name: str = "aliked-n16rot") -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def cw(key):  # conv weight OIHW -> HWIO
        return sd[key].transpose(2, 3, 1, 0)

    def folded(conv_key, bn_prefix, has_bias=False):
        w = cw(f"{conv_key}.weight")
        b = sd.get(f"{conv_key}.bias") if has_bias else None
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

    def dcn(prefix, bn_prefix):
        return {
            "offset": plain(f"{prefix}.offset_conv"),
            "regular": folded(f"{prefix}.regular_conv", bn_prefix),
        }

    params: Params = {
        "block1": {
            "conv1": folded("block1.conv1", "block1.bn1"),
            "conv2": folded("block1.conv2", "block1.bn2"),
        },
        "block2": {
            "conv1": folded("block2.conv1", "block2.bn1"),
            "conv2": folded("block2.conv2", "block2.bn2"),
            "down": plain("block2.downsample"),
        },
        "block3": {
            "conv1": dcn("block3.conv1", "block3.bn1"),
            "conv2": dcn("block3.conv2", "block3.bn2"),
            "down": plain("block3.downsample"),
        },
        "block4": {
            "conv1": dcn("block4.conv1", "block4.bn1"),
            "conv2": dcn("block4.conv2", "block4.bn2"),
            "down": plain("block4.downsample"),
        },
        "agg": {f"conv{i}": plain(f"conv{i}", bias=False) for i in range(1, 5)},
        "score_head": [
            plain(f"score_head.{i}", bias=False) for i in (0, 2, 4, 6)
        ],
        "sddh": {
            "offset1": plain("desc_head.offset_conv.0"),
            "offset2": plain("desc_head.offset_conv.2"),
            "sf": plain("desc_head.sf_conv", bias=False),
            "agg_weights": jnp.asarray(sd["desc_head.agg_weights"], jnp.float32),
        },
    }
    return params


def _conv(x, p, stride=1):
    pad = (p["w"].shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _dcn_layer(x, p, max_offset):
    """Per-image deformable conv (vmapped over batch by the caller)."""
    offset = _conv(x[None], p["offset"])[0]
    offset = jnp.clip(offset, -max_offset, max_offset)
    # deform_conv2d's f32 sampling grid promotes the result; keep the
    # backbone dtype (bf16 path) flowing
    return deform_conv2d(
        x, offset, p["regular"]["w"], p["regular"]["b"]
    ).astype(x.dtype)


def _res_block(x, p, dcn: bool, max_offset):
    selu = jax.nn.selu
    if dcn:
        out = jax.vmap(lambda xi: _dcn_layer(xi, p["conv1"], max_offset))(x)
        out = selu(out)
        out = jax.vmap(lambda xi: _dcn_layer(xi, p["conv2"], max_offset))(out)
    else:
        out = selu(_conv(x, p["conv1"]))
        out = _conv(out, p["conv2"])
    identity = _conv(x, p["down"])
    return selu(out + identity)


def dense_forward(
    params: Params, images: jnp.ndarray, compute_dtype: str = "float32"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images (B, H, W, 3) in [0,1], H and W multiples of 32.

    Returns (feature_map (B, H, W, dim) L2-normalized, score_map (B, H, W)).
    ``compute_dtype='bfloat16'`` runs the conv backbone (69% of extract time
    on v5e) in bf16; the score sigmoid / feature normalization and all
    downstream DKD/SDDH stay f32."""
    selu = jax.nn.selu
    cdt = jnp.dtype(compute_dtype)
    if images.dtype == jnp.uint8:
        # uint8 upload (4x less host->device traffic); f32 normalize on
        # device matches the old host-side f32/255 bitwise
        images = images.astype(jnp.float32) / 255.0
    if cdt != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params
        )
        images = images.astype(cdt)

    # block1: ConvBlock = selu(bn(conv)) x2
    x1 = selu(_conv(images, params["block1"]["conv1"]))
    x1 = selu(_conv(x1, params["block1"]["conv2"]))
    # block2: ResBlock (plain)
    x2 = _avg_pool(x1, 2)
    x2 = _res_block(x2, params["block2"], dcn=False, max_offset=None)
    # block3: ResBlock (dcn) at H/8
    x3 = _avg_pool(x2, 4)
    h3, w3 = x3.shape[1:3]
    x3 = _res_block(x3, params["block3"], dcn=True, max_offset=max(h3, w3) / 4.0)
    # block4: ResBlock (dcn) at H/32
    x4 = _avg_pool(x3, 4)
    h4, w4 = x4.shape[1:3]
    x4 = _res_block(x4, params["block4"], dcn=True, max_offset=max(h4, w4) / 4.0)

    agg = params["agg"]
    x1a = selu(_conv(x1, agg["conv1"]))
    x2a = selu(_conv(x2, agg["conv2"]))
    x3a = selu(_conv(x3, agg["conv3"]))
    x4a = selu(_conv(x4, agg["conv4"]))
    x2u = upsample_bilinear_align(x2a, 2)
    x3u = upsample_bilinear_align(x3a, 8)
    x4u = upsample_bilinear_align(x4a, 32)
    # bilinear upsampling's f32 weights promote; pin the backbone dtype
    x1234 = jnp.concatenate(
        [x1a] + [t.astype(x1a.dtype) for t in (x2u, x3u, x4u)], axis=-1
    )

    s = x1234
    for i, p in enumerate(params["score_head"]):
        s = _conv(s, p)
        if i < 3:
            s = selu(s)
    score_map = jax.nn.sigmoid(s[..., 0].astype(jnp.float32))
    x1234 = x1234.astype(jnp.float32)
    feature_map = x1234 / jnp.maximum(
        jnp.linalg.norm(x1234, axis=-1, keepdims=True), 1e-12
    )
    return feature_map, score_map


# ---------------------------------------------------------------------------
# DKD: keypoint detection with sub-pixel refinement
# ---------------------------------------------------------------------------

def _centered_patches_zeropad(smap: jnp.ndarray, centers: jnp.ndarray, radius: int):
    """(K, ks*ks) score patches centered at integer (x, y), zeros outside
    (torch Unfold padding semantics). smap: (H, W)."""
    H, W = smap.shape
    ks = 2 * radius + 1
    oy = jax.lax.broadcasted_iota(jnp.int32, (ks, ks), 0) - radius
    ox = jax.lax.broadcasted_iota(jnp.int32, (ks, ks), 1) - radius
    ys = centers[:, 1][:, None, None] + oy[None]
    xs = centers[:, 0][:, None, None] + ox[None]
    valid = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
    idx = jnp.clip(ys, 0, H - 1) * W + jnp.clip(xs, 0, W - 1)
    vals = smap.reshape(-1)[idx.reshape(-1)].reshape(idx.shape)
    return jnp.where(valid, vals, 0.0).reshape(len(centers), ks * ks)


def dkd_detect(
    score_map: jnp.ndarray,   # (B, H, W)
    valid_hw: jnp.ndarray,    # (B, 2) (h, w)
    max_keypoints: int,
    detection_threshold: float = 0.2,
    nms_radius: int = 2,
    temperature: float = 0.1,
):
    """Batched DKD (reference ``aliked.py:92-245``): NMS + border removal +
    masked top-k + soft-argmax sub-pixel refinement. Returns pixel-space
    keypoints, refined scores, and validity mask (all fixed capacity)."""
    B, H, W = score_map.shape
    nms = simple_nms(score_map, nms_radius)
    kpts_i, _, valid = select_topk(
        nms, max_keypoints,
        threshold=detection_threshold, border=nms_radius,
        valid_hw=(valid_hw[:, 0], valid_hw[:, 1]),
    )
    ks = 2 * nms_radius + 1
    # local grid, (x, y) offsets in row-major patch order
    gy = jax.lax.broadcasted_iota(jnp.float32, (ks, ks), 0) - nms_radius
    gx = jax.lax.broadcasted_iota(jnp.float32, (ks, ks), 1) - nms_radius
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)  # (ks*ks, 2)

    def per_image(smap, kpts_f, vh):
        centers = kpts_f.astype(jnp.int32)
        patch = _centered_patches_zeropad(smap, centers, nms_radius)  # (K, ks*ks)
        max_v = patch.max(axis=1, keepdims=True)
        x_exp = jnp.exp((patch - max_v) / temperature)
        denom = x_exp.sum(axis=1, keepdims=True)
        residual = (x_exp @ grid) / denom  # (K, 2)
        dist2 = ((grid[None] - residual[:, None]) / nms_radius) ** 2
        dispersity = (x_exp * dist2.sum(-1)).sum(1) / denom[:, 0]
        refined = kpts_f + residual
        # refined score: bilinear on the raw map, in-range clamp
        from ..ops.detect import bilinear_sample

        score = bilinear_sample(smap[..., None], refined)[:, 0]
        return refined, score, dispersity

    refined, scores, dispersity = jax.vmap(per_image)(score_map, kpts_i, valid_hw)
    refined = jnp.where(valid[..., None], refined, 0.0)
    scores = jnp.where(valid, scores, 0.0)
    return refined, scores, dispersity, valid


# ---------------------------------------------------------------------------
# SDDH descriptor head
# ---------------------------------------------------------------------------

def sddh_describe(
    params: Params,
    fmap: jnp.ndarray,     # (H, W, C)
    kpts: jnp.ndarray,     # (K, 2) pixel (x, y)
    kernel_size: int = 3,
    n_pos: int = 16,
) -> jnp.ndarray:
    """Deformable descriptor sampling (reference ``aliked.py:452-559``)."""
    H, W, C = fmap.shape
    max_offset = max(H, W) / 4.0
    ikpts = kpts.astype(jnp.int32)
    if kernel_size > 1:
        patch = extract_patches(fmap, ikpts, kernel_size)  # (K, ks, ks, C)
        w1 = params["offset1"]["w"]  # (ks, ks, C, 2*n_pos)
        h = jnp.einsum(
            "kijc,ijco->ko", patch, w1, preferred_element_type=jnp.float32
        ) + params["offset1"]["b"]
    else:
        idx = jnp.clip(ikpts[:, 1], 0, H - 1) * W + jnp.clip(ikpts[:, 0], 0, W - 1)
        v = fmap.reshape(-1, C)[idx]
        h = v @ params["offset1"]["w"][0, 0] + params["offset1"]["b"]
    h = jax.nn.selu(h)
    off = h @ params["offset2"]["w"][0, 0] + params["offset2"]["b"]
    off = jnp.clip(off, -max_offset, max_offset)
    # torch: view(K, 2, n_pos).permute(0, 2, 1)
    offsets = off.reshape(-1, 2, n_pos).transpose(0, 2, 1)  # (K, n_pos, 2)

    pos = kpts[:, None, :] + offsets  # (K, n_pos, 2) pixel
    feats = bilinear_sample_zeropad(fmap, pos)  # (K, n_pos, C)
    feats = jax.nn.selu(
        jnp.einsum(
            "kpc,co->kpo", feats, params["sf"]["w"][0, 0],
            preferred_element_type=jnp.float32,
        )
    )
    desc = jnp.einsum(
        "kpc,pcd->kd", feats, params["agg_weights"],
        preferred_element_type=jnp.float32,
    )
    return desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "detection_threshold", "nms_radius",
                     "model_name", "compute_dtype"),
)
def extract(
    params: Params,
    images: jnp.ndarray,   # (B, H, W, 3), H/W multiples of 32
    valid_hw: jnp.ndarray, # (B, 2) (h, w)
    max_keypoints: int = 4000,
    detection_threshold: float = 0.2,
    nms_radius: int = 2,
    model_name: str = "aliked-n16rot",
    compute_dtype: str = "float32",
) -> Dict[str, jnp.ndarray]:
    """Fused batched ALIKED extraction. Keypoints in pixel coordinates of the
    (padded) input; trim/rescale on host."""
    _, _, _, _, dim, K, M = CFGS[model_name]
    feature_map, score_map = dense_forward(params, images, compute_dtype)
    # Force materialization of the dense maps before the sparse consumers.
    # Without this barrier XLA fuses the full-resolution producer chain
    # (multi-scale upsample + concat + L2 normalize) into EACH of the
    # SDDH/DKD gather ops, re-evaluating it several times: measured
    # 201 -> 90 ms/batch at 2x1216px and 151 -> 117 ms at 4x1024px on
    # v5e (bitwise-identical outputs; scripts/profile_aliked_extract.py).
    feature_map, score_map = jax.lax.optimization_barrier(
        (feature_map, score_map)
    )
    kpts, scores, _, valid = dkd_detect(
        score_map, valid_hw, max_keypoints, detection_threshold, nms_radius
    )
    descs = jax.vmap(
        lambda f, k: sddh_describe(params["sddh"], f, k, kernel_size=K, n_pos=M)
    )(feature_map, kpts)
    descs = descs * valid[..., None]
    return {
        "keypoints": kpts,
        "scores": scores,
        "descriptors": descs,
        "mask": valid,
    }
