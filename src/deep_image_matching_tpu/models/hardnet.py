"""HardNet patch descriptor + multi-scale keypoint detection + orientation.

Parity target: reference ``extractors/keynetaffnethardnet.py:9-58`` (kornia
``KeyNetAffNetHardNet``: KeyNet multi-scale detector -> AffNet/OriNet local
frame -> HardNet descriptors on 32x32 patches).

- ``hardnet_describe``: the published HardNet CNN (Mishchuk et al.,
  NeurIPS'17; 7 conv layers, affine-free BNs, per-patch input norm, 128-d
  L2 output) with a converter for the standard ``features.N.*`` torch
  state_dict (kornia/HardNet releases).
- ``multiscale_detect``: scale-space determinant-of-Hessian detection with
  per-level NMS — the handcrafted part of KeyNet's response (KeyNet's small
  learned filter bank needs kornia weights, unavailable offline; the
  handcrafted detector is deterministic and weight-free).
- ``dominant_orientation``: histogram-free gradient-moment orientation
  (OriNet's role), used to steer the patch sampling grid.

All stages are batched gathers + convs in one jitted program.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform import bilinear_sample_zeropad
from ..ops.detect import select_topk, simple_nms, topk_flat

Params = Dict

# (cin, cout, kernel, stride, pad)
_HARDNET_LAYERS = [
    (1, 32, 3, 1, 1),
    (32, 32, 3, 1, 1),
    (32, 64, 3, 2, 1),
    (64, 64, 3, 1, 1),
    (64, 128, 3, 2, 1),
    (128, 128, 3, 1, 1),
    (128, 128, 8, 1, 0),
]


def hardnet_params_from_torch(state_dict) -> Params:
    """Convert a HardNet state_dict (``features.{0,3,6,9,12,15,19}`` convs
    with affine-free BNs at +1) — BNs folded."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    conv_idx = [0, 3, 6, 9, 12, 15, 19]
    layers = []
    for i in conv_idx:
        w = sd[f"features.{i}.weight"].transpose(2, 3, 1, 0)
        b = sd.get(f"features.{i}.bias", np.zeros(w.shape[-1]))
        mean = sd[f"features.{i + 1}.running_mean"]
        var = sd[f"features.{i + 1}.running_var"]
        s = 1.0 / np.sqrt(var + 1e-5)  # BN affine=False
        layers.append({
            "w": jnp.asarray(w * s[None, None, None, :], jnp.float32),
            "b": jnp.asarray((b - mean) * s, jnp.float32),
        })
    return {"layers": layers}


def init_hardnet_params(key) -> Params:
    rng = np.random.default_rng(0)
    layers = []
    for ci, co, k, _s, _p in _HARDNET_LAYERS:
        w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (k, k, ci, co)).astype(np.float32)
        layers.append({"w": jnp.asarray(w), "b": jnp.zeros((co,), jnp.float32)})
    return {"layers": layers}


def hardnet_describe(params: Params, patches: jnp.ndarray) -> jnp.ndarray:
    """patches (K, 32, 32) -> (K, 128) L2-normalized descriptors."""
    x = patches[..., None]
    mu = x.mean(axis=(1, 2, 3), keepdims=True)
    sd = x.std(axis=(1, 2, 3), keepdims=True) + 1e-7
    x = (x - mu) / sd
    n = len(params["layers"])
    for i, (p, (_ci, _co, _k, s, pad)) in enumerate(
        zip(params["layers"], _HARDNET_LAYERS)
    ):
        x = jax.lax.conv_general_dilated(
            x, p["w"], (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    d = x.reshape(x.shape[0], -1)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def _gauss_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """(B, H, W) separable gaussian blur."""
    r = max(1, int(3 * sigma))
    g = _gauss_kernel(sigma, r)
    k = len(g)
    gx = g.reshape(1, k, 1, 1)
    gy = g.reshape(k, 1, 1, 1)
    x = img[..., None]
    x = jax.lax.conv_general_dilated(
        x, gx, (1, 1), [(0, 0), (r, r)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, gy, (1, 1), [(r, r), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return x[..., 0]


def _gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gx = (jnp.roll(img, -1, axis=2) - jnp.roll(img, 1, axis=2)) / 2.0
    gy = (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1)) / 2.0
    return gx, gy


def multiscale_detect(
    images: jnp.ndarray,    # (B, H, W) grayscale [0,1]
    valid_hw: jnp.ndarray,
    max_keypoints: int,
    n_levels: int = 4,
    init_sigma: float = 1.6,
    nms_radius: int = 3,
    threshold: float = 1e-5,
):
    """Determinant-of-Hessian scale-space detection; returns keypoints with
    per-keypoint scale (sigma)."""
    responses = []
    sigmas = []
    for lvl in range(n_levels):
        sigma = init_sigma * (1.6**lvl)
        smooth = _blur(images, sigma)
        gx, gy = _gradients(smooth)
        gxx, gxy = _gradients(gx)
        _, gyy = _gradients(gy)
        det = (gxx * gyy - gxy * gxy) * sigma**4  # scale-normalized
        responses.append(det)
        sigmas.append(sigma)
    resp = jnp.stack(responses, axis=1)  # (B, S, H, W)
    B, S, H, W = resp.shape
    # per-level NMS then global top-k over (S*H*W)
    nms = jax.vmap(lambda r: simple_nms(r, nms_radius), in_axes=1, out_axes=1)(resp)
    flat = nms.reshape(B, S, H, W)
    # mask borders / padding
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None, None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None, None]
    border = 16
    ok = (
        (ys >= border) & (ys < valid_hw[:, None, 0, None, None] - border)
        & (xs >= border) & (xs < valid_hw[:, None, 1, None, None] - border)
    )
    flat = jnp.where(ok & (flat > threshold), flat, -1.0)
    vals, idx = topk_flat(flat.reshape(B, S * H * W), max_keypoints)
    valid = vals > 0
    lvl = idx // (H * W)
    rem = idx % (H * W)
    y = (rem // W).astype(jnp.float32)
    x = (rem % W).astype(jnp.float32)
    sig = jnp.asarray(sigmas, jnp.float32)[lvl]
    kpts = jnp.stack([x, y], -1)
    return (
        jnp.where(valid[..., None], kpts, 0.0),
        jnp.where(valid, vals, 0.0),
        jnp.where(valid, sig, init_sigma),
        valid,
    )


def dominant_orientation(
    images: jnp.ndarray, kpts: jnp.ndarray, sigmas: jnp.ndarray, n_samples: int = 8
):
    """Gradient-moment orientation per keypoint: angle of the average
    gradient inside a sigma-scaled neighborhood (B, K) radians."""
    gx, gy = _gradients(images)

    def per_image(gxi, gyi, k, s):
        # sample gradients on a small grid around each keypoint
        lin = jnp.linspace(-1.0, 1.0, n_samples)
        oy, ox = jnp.meshgrid(lin, lin, indexing="ij")
        offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], -1)  # (n*n, 2)
        pos = k[:, None, :] + offs[None] * (3.0 * s[:, None, None])
        sgx = bilinear_sample_zeropad(gxi[..., None], pos)[..., 0]
        sgy = bilinear_sample_zeropad(gyi[..., None], pos)[..., 0]
        return jnp.arctan2(sgy.mean(1), sgx.mean(1))

    return jax.vmap(per_image)(gx, gy, kpts, sigmas)


def extract_oriented_patches(
    images: jnp.ndarray, kpts: jnp.ndarray, sigmas: jnp.ndarray,
    angles: jnp.ndarray, patch_size: int = 32, scale_mult: float = 6.0,
    shapes: jnp.ndarray | None = None,
):
    """(B, K, 32, 32) patches sampled on a rotated, sigma-scaled grid.

    ``shapes`` (B, K, 2, 2), when given, is a per-keypoint affine shape
    matrix (AffNet's det-1 upright ellipse) composed with the rotation:
    grid point g maps to ``kpt + span * (shape @ R) g``."""
    ps = patch_size
    lin = jnp.linspace(-0.5, 0.5, ps)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (ps*ps, 2)

    def per_image(img, k, s, a, shp):
        cos, sin = jnp.cos(a), jnp.sin(a)
        R = jnp.stack(
            [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2
        )  # (K, 2, 2)
        if shp is not None:
            # grid-row convention: offset = g^T (R^T shp^T) = ((shp @ R) g)^T
            R = jnp.einsum("kcd,kde->kce", R, jnp.swapaxes(shp, -1, -2))
        span = (scale_mult * s)[:, None, None]
        pos = k[:, None, :] + jnp.einsum("pc,kcd->kpd", grid, R) * span
        vals = bilinear_sample_zeropad(img[..., None], pos)[..., 0]
        return vals.reshape(-1, ps, ps)

    if shapes is None:
        return jax.vmap(lambda i, k, s, a: per_image(i, k, s, a, None))(
            images, kpts, sigmas, angles
        )
    return jax.vmap(per_image)(images, kpts, sigmas, angles, shapes)


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "upright", "detector")
)
def keynet_hardnet_extract(
    params: Params,
    images: jnp.ndarray,    # (B, H, W) grayscale
    valid_hw: jnp.ndarray,
    max_keypoints: int = 4000,
    upright: bool = False,
    detector: str = "doh",
    keynet_params: Params | None = None,
    affnet_params: Params | None = None,
    orinet_params: Params | None = None,
) -> Dict[str, jnp.ndarray]:
    """Full local-feature program: detect -> (AffNet shape) -> (OriNet /
    gradient-moment orientation) -> steered patch sampling -> HardNet.

    With ``affnet_params`` / ``orinet_params`` the learned AffNetFast /
    OriNetFast stages run (kornia ``KeyNetAffNetHardNet`` parity, reference
    ``extractors/keynetaffnethardnet.py:9-58``); without them the weight-free
    fallbacks (identity shape, gradient-moment orientation) apply."""
    if detector == "keynet":
        from .keynet import keynet_multiscale_detect

        kpts, scores, sigmas, valid = keynet_multiscale_detect(
            keynet_params, images, valid_hw, max_keypoints
        )
    else:
        kpts, scores, sigmas, valid = multiscale_detect(
            images, valid_hw, max_keypoints
        )

    shapes = None
    if affnet_params is not None:
        from .affnet import affnet_shapes

        zero = jnp.zeros(kpts.shape[:2], jnp.float32)
        probe = extract_oriented_patches(images, kpts, sigmas, zero)
        shapes = jax.vmap(lambda p: affnet_shapes(affnet_params, p))(probe)

    if upright:
        angles = jnp.zeros(kpts.shape[:2], jnp.float32)
    elif orinet_params is not None:
        from .affnet import orinet_angles

        zero = jnp.zeros(kpts.shape[:2], jnp.float32)
        # orientation is estimated on shape-normalized patches
        ori_patches = extract_oriented_patches(
            images, kpts, sigmas, zero, shapes=shapes
        )
        angles = jax.vmap(lambda p: orinet_angles(orinet_params, p))(ori_patches)
    else:
        angles = dominant_orientation(images, kpts, sigmas)
    patches = extract_oriented_patches(images, kpts, sigmas, angles, shapes=shapes)
    B, K = patches.shape[:2]
    descs = jax.vmap(lambda p: hardnet_describe(params, p))(patches)
    descs = descs * valid[..., None]
    return {
        "keypoints": kpts,
        "scores": scores,
        "descriptors": descs,
        "mask": valid,
        "scales": sigmas,
        "angles": angles,
    }
