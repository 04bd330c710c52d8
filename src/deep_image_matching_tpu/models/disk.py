"""DISK extractor as a pure-functional JAX model.

DISK (Tyszkiewicz et al., NeurIPS'20) as used by the reference via kornia
(``extractors/disk.py`` -> ``thirdparty/hloc/extractors/disk.py`` -> kornia
``kornia.feature.DISK``, itself a re-packaging of the original
cvlab-epfl/disk model built on the jatentaki ``unets`` mini-library).

Architecture (thin U-Net, ~1.1M params):

- encoder ("path_down", 5 stages, channels 16/32/64/64/64): stage 0 is a
  plain 5x5 conv on the RGB image; stages 1-4 are 2x2 average-pool
  downsample followed by a *pre-activation* conv block
  ``InstanceNorm2d(in, affine=False) -> PReLU(in) -> Conv5x5(in->out)``.
- decoder ("path_up", 4 stages, channels 64/64/64/129): bilinear 2x
  upsample (align_corners=False) of the bottom feature, channel-concat
  with the skip from the matching encoder stage (bottom first), then the
  same pre-activation conv block. The final stage outputs
  ``desc_dim + 1 = 129`` channels at FULL input resolution:
  128-d dense descriptors + a 1-channel keypoint-logit heatmap.
- detection (kornia ``heatmap_to_keypoints``): window-5 local-max NMS on
  the heatmap, score threshold (default 0.0 on the raw logit), top-n
  selection; descriptors are the dense-map values at the integer keypoint
  locations, L2-normalized.

The kornia/torch source is not importable in this offline environment; the
topology above is reconstructed from the published architecture and
validated structurally: the parameter count (1,092,165 with all gates)
matches DISK's published ~1.1M, and ``params_from_torch`` does not rely on
checkpoint key names — it walks conv tensors in checkpoint order and
detects each block's PReLU gate (the only 1-d weight tensors in the model;
InstanceNorm here is affine-free and stat-free) by position + channel
count, so both "first block gated" and "first block bare" layouts load
correctly. Converter + forward are parity-tested against a torch
implementation of the same topology in ``tests/test_disk_parity.py``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detect import bilinear_sample, max_pool_same, topk_flat

Params = Dict

DOWN = [16, 32, 64, 64, 64]
UP = [64, 64, 64, 129]  # final = 128 desc + 1 heatmap, full resolution
DESC_DIM = 128
_EPS = 1e-5  # torch InstanceNorm2d default


def _skip_channels() -> List[int]:
    return DOWN[-2::-1]  # [64, 64, 32, 16]


def init_params(key, first_gate: bool = False) -> Params:
    """Random init with the reference topology (for tests / strict-policy
    fallback). ``first_gate``: whether encoder stage 0 has a norm+gate
    (both checkpoint layouts exist in the wild; see converter)."""
    rng = np.random.default_rng(0)

    def conv(ci, co, gated, k=5):
        w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (k, k, ci, co)).astype(np.float32)
        return {
            "w": jnp.asarray(w),
            "b": jnp.zeros((co,), jnp.float32),
            # pre-activation PReLU gate over the block's INPUT channels
            "prelu": jnp.full((ci,), 0.25, jnp.float32) if gated else None,
        }

    params: Params = {"down": [], "up": []}
    cin = 3
    for i, co in enumerate(DOWN):
        params["down"].append(conv(cin, co, gated=(i > 0 or first_gate)))
        cin = co
    for skip, co in zip(_skip_channels(), UP):
        params["up"].append(conv(cin + skip, co, gated=True))
        cin = co
    return params


def params_from_torch(state_dict) -> Params:
    """Map a kornia / original-repo DISK checkpoint.

    Key-name agnostic: takes the 4-d conv weights in checkpoint order
    (5 encoder + 4 decoder) and attaches to each conv the 1-d PReLU weight
    that appears between it and the previous conv with length equal to the
    conv's INPUT channel count (pre-activation blocks). PReLU weights are
    the only 1-d weight tensors in DISK's U-Net — the InstanceNorms are
    affine-free with no running stats — so this is unambiguous. A first
    conv without a preceding gate tensor loads as a bare conv.

    Strict full-manifest load: exactly 9 conv layers must be present, the
    channel plan must match the published topology, and EVERY tensor in the
    checkpoint must be consumed (conv weight, conv bias, or gate) — any
    residue aborts the conversion rather than silently shipping a partial
    load of an incompatible kornia/DISK variant.
    """
    sd = {
        k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    # tolerate one uniform wrapper prefix ("model.", "extractor.", ...)
    prefixes = {k.split(".", 1)[0] for k in sd if "." in k}
    if len(prefixes) == 1 and all("." in k for k in sd):
        pre = next(iter(prefixes))
        if not any(sd[k].ndim == 4 for k in sd if k == f"{pre}.weight"):
            stripped = {k.split(".", 1)[1]: v for k, v in sd.items()}
            if len(stripped) == len(sd):
                sd = stripped

    ordered = list(sd)
    conv_keys = [k for k in ordered if k.endswith(".weight") and sd[k].ndim == 4]
    n_need = len(DOWN) + len(UP)
    if len(conv_keys) != n_need:
        raise ValueError(
            f"DISK checkpoint has {len(conv_keys)} conv layers, expected "
            f"exactly {n_need} — refusing a partial/over-full load "
            f"(conv keys: {conv_keys})"
        )
    onedim = [k for k in ordered if k.endswith(".weight") and sd[k].ndim == 1]
    consumed = set()

    def gate_between(lo: int, hi: int, cin: int) -> Optional[jnp.ndarray]:
        for k in onedim:
            pos = ordered.index(k)
            if lo < pos < hi and sd[k].shape == (cin,) and k not in consumed:
                consumed.add(k)
                return jnp.asarray(sd[k], jnp.float32)
        return None

    params: Params = {"down": [], "up": []}
    prev_pos = -1
    for gi, (group, keys) in enumerate(
        (("down", conv_keys[: len(DOWN)]), ("up", conv_keys[len(DOWN):]))
    ):
        for k in keys:
            base = k[: -len(".weight")]
            w = sd[k].transpose(2, 3, 1, 0)  # OIHW -> HWIO
            cin, co = w.shape[2], w.shape[3]
            pos = ordered.index(k)
            consumed.add(k)
            if f"{base}.bias" in sd:
                consumed.add(f"{base}.bias")
            params[group].append({
                "w": jnp.asarray(w, jnp.float32),
                "b": jnp.asarray(sd.get(f"{base}.bias", np.zeros(co)), jnp.float32),
                "prelu": gate_between(prev_pos, pos, cin),
            })
            prev_pos = pos

    # shape validation against the fixed topology
    got_down = [p["w"].shape[3] for p in params["down"]]
    got_up = [p["w"].shape[3] for p in params["up"]]
    if got_down != DOWN or got_up != UP:
        raise ValueError(f"DISK channel plan mismatch: down={got_down} up={got_up}")

    # FULL-MANIFEST validation: every tensor in the checkpoint must have been
    # consumed. A residue tensor means the checkpoint carries weights this
    # topology does not represent (different kornia version, affine
    # InstanceNorms, extra heads) — loading it partially would silently ship
    # a wrong conversion, so abort instead.
    residue = [k for k in ordered if k not in consumed and sd[k].size > 0]
    if residue:
        raise ValueError(
            "DISK checkpoint has tensors this converter does not consume — "
            f"refusing a partial load. Residue: {sorted(residue)}"
        )
    return params


def _instance_norm(x: jnp.ndarray) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) over (H, W) per sample+channel, NHWC."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _EPS)


def _block(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Pre-activation conv block: [InstanceNorm -> PReLU ->] Conv5x5."""
    if p["prelu"] is not None:
        x = _instance_norm(x)
        x = jnp.where(x >= 0, x, x * p["prelu"])
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def dense_forward(params: Params, images: jnp.ndarray):
    """(B, H, W, 3), H/W multiples of 16 -> (desc (B,H,W,128), heat (B,H,W))."""
    x = images
    skips: List[jnp.ndarray] = []
    for i, p in enumerate(params["down"]):
        if i > 0:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        x = _block(x, p)
        skips.append(x)
    for i, p in enumerate(params["up"]):
        skip = skips[len(DOWN) - 2 - i]
        # TrivialUpsample: bilinear x2, align_corners=False == jax 'linear'
        x = jax.image.resize(
            x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[-1]), "linear"
        )
        x = _block(jnp.concatenate([x, skip], axis=-1), p)  # bottom first
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
