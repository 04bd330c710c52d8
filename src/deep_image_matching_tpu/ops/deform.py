"""Deformable sampling ops: the TPU-native replacement for the reference's
CUDA custom kernels (SURVEY.md section 2.4).

- ``deform_conv2d``: deformable convolution (ALIKED dcn blocks; torchvision
  ``deform_conv2d`` semantics with zero padding). Expressed as
  offset-im2col — KK bilinear gathers followed by ONE (H*W, KK*C) x
  (KK*C, O) matmul, which is exactly what the MXU wants. Replaces
  ``thirdparty/ALIKED/custom_ops/get_patches_cuda.cu`` +
  torchvision's CUDA deform_conv2d.
- ``bilinear_sample_zeropad``: grid_sample(align_corners=True,
  padding_mode='zeros') equivalent — out-of-range contributions are zero.
- ``extract_patches``: K x ps x ps patch gather around integer keypoints with
  the reference's corner clamping (``aliked.py:49-65``) — the SDDH patch op.
- ``upsample_bilinear_align``: bilinear upsampling with align_corners=True
  (torch ``nn.Upsample`` semantics), separable gathers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample_zeropad(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """fmap (H, W, C); coords (..., 2) float (x, y) in pixel units.

    Bilinear interpolation where out-of-range corner samples contribute 0
    (torch grid_sample zeros padding with align_corners=True)."""
    H, W, C = fmap.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = None
    flat = fmap.reshape(H * W, C)
    for dy in (0.0, 1.0):
        for dx in (0.0, 1.0):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            idx = (
                jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
                + jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            )
            v = flat[idx.reshape(-1)].reshape(*idx.shape, C)
            term = v * (wgt * valid)[..., None]
            out = term if out is None else out + term
    return out


def deform_conv2d(
    x: jnp.ndarray,        # (H, W, Cin)
    offset: jnp.ndarray,   # (H, W, 2*KK) — torchvision layout: (dy, dx) per k
    weight: jnp.ndarray,   # (kh, kw, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,
    padding: int = 1,
) -> jnp.ndarray:
    """Deformable conv, stride 1, dilation 1 (ALIKED configuration).

    Sampling position for output pixel p and kernel tap (i, j):
    (y + i - pad + dy, x + j - pad + dx); out-of-range samples are zero
    (zero-padded convolution)."""
    H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    KK = kh * kw
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    offs = offset.reshape(H, W, KK, 2)
    taps = []
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            py = ys + (i - padding) + offs[..., k, 0]
            px = xs + (j - padding) + offs[..., k, 1]
            taps.append(
                bilinear_sample_zeropad(x, jnp.stack([px, py], axis=-1))
            )  # (H, W, Cin)
    col = jnp.stack(taps, axis=2)  # (H, W, KK, Cin)
    w = weight.reshape(KK, Cin, Cout)
    out = jnp.einsum(
        "hwkc,kco->hwo", col, w, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + bias
    return out


def extract_patches(
    fmap: jnp.ndarray,     # (H, W, C)
    centers: jnp.ndarray,  # (K, 2) int (x, y)
    ps: int,
) -> jnp.ndarray:
    """(K, ps, ps, C) patches with the reference's corner clamp:
    corner = center - ps/2 + 1, clamped to [0, dim-1-ps] (``aliked.py:49-65``)."""
    H, W, C = fmap.shape
    corner_x = jnp.clip((centers[:, 0] - ps // 2 + 1).astype(jnp.int32), 0, W - 1 - ps)
    corner_y = jnp.clip((centers[:, 1] - ps // 2 + 1).astype(jnp.int32), 0, H - 1 - ps)
    oy = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1)
    ys = corner_y[:, None, None] + oy[None]
    xs = corner_x[:, None, None] + ox[None]
    idx = ys * W + xs  # (K, ps, ps)
    flat = fmap.reshape(H * W, C)
    return flat[idx.reshape(-1)].reshape(*idx.shape, C)


def resize_bilinear_align(x: jnp.ndarray, size) -> jnp.ndarray:
    """(B, H, W, C) -> (B, size[0], size[1], C) bilinear, align_corners=True."""

    def axis_weights(n_in: int, n_out: int):
        if n_in == 1:
            lo = jnp.zeros(n_out, jnp.int32)
            return lo, lo, jnp.ones(n_out, jnp.float32)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w_hi = pos - lo
        return lo, hi, 1.0 - w_hi

    B, H, W, C = x.shape
    Ho, Wo = size
    lo, hi, w_lo = axis_weights(H, Ho)
    x = x[:, lo] * w_lo[None, :, None, None] + x[:, hi] * (1 - w_lo)[None, :, None, None]
    lo, hi, w_lo = axis_weights(W, Wo)
    x = x[:, :, lo] * w_lo[None, None, :, None] + x[:, :, hi] * (1 - w_lo)[None, None, :, None]
    return x


def upsample_bilinear_align(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*f, W*f, C) bilinear with align_corners=True."""

    def axis_weights(n_in: int, n_out: int):
        if n_in == 1:
            lo = jnp.zeros(n_out, jnp.int32)
            return lo, lo, jnp.ones(n_out, jnp.float32)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w_hi = pos - lo
        return lo, hi, 1.0 - w_hi

    B, H, W, C = x.shape
    Ho, Wo = H * factor, W * factor
    lo, hi, w_lo = axis_weights(H, Ho)
    x = x[:, lo] * w_lo[None, :, None, None] + x[:, hi] * (1 - w_lo)[None, :, None, None]
    lo, hi, w_lo = axis_weights(W, Wo)
    x = x[:, :, lo] * w_lo[None, None, :, None] + x[:, :, hi] * (1 - w_lo)[None, None, :, None]
    return x
