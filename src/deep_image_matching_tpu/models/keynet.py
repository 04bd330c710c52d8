"""KeyNet learned keypoint-response network (Barroso-Laguna et al., ICCV'19).

Parity target: the learned detector inside kornia's ``KeyNetAffNetHardNet``
used by the reference (``extractors/keynetaffnethardnet.py:9-58``). The
network is a handcrafted 10-channel derivative block followed by three
learned 5x5 conv blocks, evaluated over an internal 3-level pyramid with a
1.2 downscale factor; per-level features are upsampled back to full
resolution, concatenated, and reduced to a single score map by a final conv
(kornia ``feature/keynet.py`` ``KeyNet.forward``).

Everything runs as one batched jitted XLA program; the conv stack is tiny
(10->8->8->8, 24->1) so the cost is dominated by the elementwise derivative
block, which XLA fuses.

Weight loading: ``keynet_params_from_torch`` accepts both kornia's
state_dict naming (``feature_extractor.lb_block.N.0.*`` / ``last_conv.0.*``)
and the official Key.Net-Pytorch release, discovered defensively by conv
shape so either naming converts.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

NUM_FILTERS = 8
NUM_LEVELS = 3
KERNEL_SIZE = 5
FACTOR_SCALING = 1.2


def _sobel_kernels() -> tuple:
    # kornia spatial_gradient(mode="sobel", order=1, normalized=True):
    # kernel / sum(|kernel|) = /8, replicate padding
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
    return kx, kx.T.copy()


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, pad: str | list) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _spatial_gradient(x: jnp.ndarray) -> tuple:
    """(B, H, W, C) -> (dx, dy), replicate-padded normalized Sobel."""
    kx, ky = _sobel_kernels()
    C = x.shape[-1]
    # depthwise: apply the same 2-D kernel to each channel
    wx = jnp.tile(jnp.asarray(kx)[:, :, None, None], (1, 1, 1, 1))
    wy = jnp.tile(jnp.asarray(ky)[:, :, None, None], (1, 1, 1, 1))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    cols = []
    for c in range(C):
        xc = xp[..., c : c + 1]
        cols.append((_conv2d(xc, wx, "VALID"), _conv2d(xc, wy, "VALID")))
    dx = jnp.concatenate([c[0] for c in cols], -1)
    dy = jnp.concatenate([c[1] for c in cols], -1)
    return dx, dy


def handcrafted_block(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) -> (B, H, W, 10) kornia ``_KeyNetHandcraftedBlock``
    channel order: [dx, dy, dx^2, dy^2, dx*dy, dxy, dxy^2, dxx, dyy,
    dxx*dyy]."""
    dx, dy = _spatial_gradient(x)
    dxx, dxy = _spatial_gradient(dx)
    _, dyy = _spatial_gradient(dy)
    return jnp.concatenate(
        [dx, dy, dx**2, dy**2, dx * dy, dxy, dxy**2, dxx, dyy, dxx * dyy],
        axis=-1,
    )


_PYR_KERNEL = (
    np.outer(
        np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32),
        np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32),
    )
    / 256.0
)


def _pyrdown(x: jnp.ndarray, factor: float) -> jnp.ndarray:
    """kornia ``custom_pyrdown``: 5x5 pyramid blur (reflect pad) then
    bilinear resize by ``1/factor``."""
    B, H, W, C = x.shape
    w = jnp.asarray(_PYR_KERNEL)[:, :, None, None]
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    blurred = jnp.concatenate(
        [_conv2d(xp[..., c : c + 1], w, "VALID") for c in range(C)], -1
    )
    nh, nw = int(float(H) / factor), int(float(W) / factor)
    return jax.image.resize(blurred, (B, nh, nw, C), "bilinear", antialias=False)


def learnable_block(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Three conv5x5+BN+ReLU blocks, 10 -> 8 -> 8 -> 8 (BNs folded)."""
    for p in params["blocks"]:
        x = _conv2d(x, p["w"], [(2, 2), (2, 2)]) + p["b"]
        x = jax.nn.relu(x)
    return x


def keynet_response(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) grayscale [0,1] -> (B, H, W) keypoint score map
    (kornia ``KeyNet.forward``)."""
    x = images[..., None]
    B, H, W, _ = x.shape
    feats: List[jnp.ndarray] = []
    cur = x
    for lvl in range(NUM_LEVELS):
        if lvl > 0:
            cur = _pyrdown(cur, FACTOR_SCALING)
        f = learnable_block(params, handcrafted_block(cur))
        if lvl > 0:
            f = jax.image.resize(f, (B, H, W, f.shape[-1]), "bilinear", antialias=False)
        feats.append(f)
    cat = jnp.concatenate(feats, -1)
    score = _conv2d(cat, params["last"]["w"], [(2, 2), (2, 2)]) + params["last"]["b"]
    return jax.nn.relu(score)[..., 0]


def keynet_params_from_torch(state_dict) -> Params:
    """Convert a KeyNet torch checkpoint (kornia or official naming).

    Convs are discovered by weight shape: (8,10,5,5) first block,
    (8,8,5,5) middle blocks, (1,24,5,5) final conv. Each conv's
    BatchNorm (if present at a sibling key) is folded in.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    conv_keys = [
        k for k, v in sd.items()
        if k.endswith(".weight") and v.ndim == 4 and v.shape[2:] == (5, 5)
    ]

    def pick(shape):
        for k in sorted(conv_keys):
            if sd[k].shape == shape:
                conv_keys.remove(k)
                return k
        raise KeyError(f"no conv of shape {shape} in checkpoint")

    def fold(conv_key):
        w = sd[conv_key].transpose(2, 3, 1, 0).astype(np.float32)
        base = conv_key[: -len(".weight")]
        b = sd.get(f"{base}.bias", np.zeros(w.shape[-1], np.float32))
        # BN sibling: same parent Sequential, index + 1
        parts = base.split(".")
        bn = None
        if parts[-1].isdigit():
            bn_base = ".".join(parts[:-1] + [str(int(parts[-1]) + 1)])
            if f"{bn_base}.running_mean" in sd:
                bn = bn_base
        if bn is not None:
            mean = sd[f"{bn}.running_mean"]
            var = sd[f"{bn}.running_var"]
            gamma = sd.get(f"{bn}.weight", np.ones_like(mean))
            beta = sd.get(f"{bn}.bias", np.zeros_like(mean))
            s = gamma / np.sqrt(var + 1e-5)
            w = w * s[None, None, None, :]
            b = (b - mean) * s + beta
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}

    blocks = [fold(pick((NUM_FILTERS, 10, 5, 5)))]
    for _ in range(2):
        blocks.append(fold(pick((NUM_FILTERS, NUM_FILTERS, 5, 5))))
    last = fold(pick((1, NUM_FILTERS * NUM_LEVELS, 5, 5)))
    return {"blocks": blocks, "last": last}


def init_keynet_params(key=None) -> Params:
    rng = np.random.default_rng(7)

    def conv(ci, co):
        w = rng.normal(0, np.sqrt(2.0 / (ci * 25)), (5, 5, ci, co)).astype(np.float32)
        return {"w": jnp.asarray(w), "b": jnp.zeros((co,), jnp.float32)}

    return {
        "blocks": [conv(10, NUM_FILTERS), conv(NUM_FILTERS, NUM_FILTERS),
                   conv(NUM_FILTERS, NUM_FILTERS)],
        "last": conv(NUM_FILTERS * NUM_LEVELS, 1),
    }


def keynet_multiscale_detect(
    params: Params,
    images: jnp.ndarray,     # (B, H, W) grayscale [0,1]
    valid_hw: jnp.ndarray,   # (B, 2) valid rows/cols
    max_keypoints: int,
    n_levels: int = 4,
    scale_factor: float = 1.3,
    init_sigma: float = 1.6,
    nms_radius: int = 3,
    border: int = 16,
):
    """Multi-scale detection with the learned KeyNet response.

    Each level downscales the image by ``scale_factor**lvl``, evaluates the
    response, NMS + top-k at level resolution (static shapes), and maps
    coordinates back to full resolution; candidates from all levels compete
    in one final top-k. Mirrors kornia's MultiResolutionDetector pyramid
    around ``KeyNet`` while keeping every shape static for XLA.
    """
    from ..ops.detect import simple_nms, topk_flat

    B, H, W = images.shape
    k_lvl = max_keypoints  # per-level candidate cap
    all_vals, all_xy, all_sig = [], [], []
    x = images[..., None]
    for lvl in range(n_levels):
        s = float(scale_factor) ** lvl
        h, w = max(int(H / s), 16), max(int(W / s), 16)
        # actual per-axis resize ratios (int truncation and the 16-px floor
        # make them differ from the nominal s; mapping back with s would
        # bias coarse-level keypoint coordinates by up to ~s pixels)
        sy, sx = H / h, W / w
        xi = x if lvl == 0 else jax.image.resize(x, (B, h, w, 1), "bilinear")
        resp = keynet_response(params, xi[..., 0])
        nms = simple_nms(resp, nms_radius)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
        bh = valid_hw[:, 0, None, None] / sy
        bw = valid_hw[:, 1, None, None] / sx
        bb = max(1, int(border / max(sy, sx)))
        ok = (ys >= bb) & (ys < bh - bb) & (xs >= bb) & (xs < bw - bb)
        nms = jnp.where(ok, nms, -1.0)
        k_here = min(k_lvl, h * w)
        vals, idx = topk_flat(nms.reshape(B, h * w), k_here)
        yy = (idx // w).astype(jnp.float32) * sy
        xx = (idx % w).astype(jnp.float32) * sx
        pad = k_lvl - k_here
        if pad:
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-1.0)
            xx = jnp.pad(xx, ((0, 0), (0, pad)))
            yy = jnp.pad(yy, ((0, 0), (0, pad)))
        all_vals.append(vals)
        all_xy.append(jnp.stack([xx, yy], -1))
        all_sig.append(jnp.full_like(vals, init_sigma * s))
    vals = jnp.concatenate(all_vals, 1)           # (B, L*K)
    xy = jnp.concatenate(all_xy, 1)
    sig = jnp.concatenate(all_sig, 1)
    top, idx = jax.lax.top_k(vals, max_keypoints)
    gather = lambda a: jnp.take_along_axis(a, idx, axis=1)
    valid = top > 0
    kpts = jnp.take_along_axis(xy, idx[..., None].repeat(2, -1), axis=1)
    return (
        jnp.where(valid[..., None], kpts, 0.0),
        jnp.where(valid, top, 0.0),
        jnp.where(valid, gather(sig), init_sigma),
        valid,
    )
