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


def bilinear_sample_zeropad_wide(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Same result as :func:`bilinear_sample_zeropad`, ONE gather instead of 4.

    TPU gathers are row-descriptor-bound at small C (a C=9 f32 row is 36 B
    against a >=512 B useful granularity), so the 4 corner gathers dominate
    dense-warp time. This variant concatenates the 4 bilinear taps
    (identity, x+1, y+1, xy+1 shifts of a zero-padded map) channel-wise and
    gathers a single 4C-wide row per position. Worth it when the number of
    sampled positions is on the order of H*W (dense warps); for sparse
    keypoint sampling prefer the plain version (the 4x map build dominates).
    """
    H, W, C = fmap.shape
    # one leading zero row/col so a floor==-1 base lands on zeros while its
    # +1 tap reads the true border texel
    fp = jnp.pad(fmap, ((1, 0), (1, 0), (0, 0)))            # (H+1, W+1, C)
    fx = jnp.pad(fp[:, 1:], ((0, 0), (0, 1), (0, 0)))
    fy = jnp.pad(fp[1:], ((0, 1), (0, 0), (0, 0)))
    fxy = jnp.pad(fp[1:, 1:], ((0, 1), (0, 1), (0, 0)))
    cat = jnp.concatenate([fp, fx, fy, fxy], axis=-1)
    cat = cat.reshape((H + 1) * (W + 1), 4 * C)
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    v = cat[(by * (W + 1) + bx).reshape(-1)].reshape(*x.shape, 4, C)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    vx0 = (x0 >= 0) & (x0 <= W - 1)
    vx1 = (x0 >= -1) & (x0 <= W - 2)
    vy0 = (y0 >= 0) & (y0 <= H - 1)
    vy1 = (y0 >= -1) & (y0 <= H - 2)
    wts = jnp.stack(
        [
            wy0 * wx0 * (vy0 & vx0),
            wy0 * wx1 * (vy0 & vx1),
            wy1 * wx0 * (vy1 & vx0),
            wy1 * wx1 * (vy1 & vx1),
        ],
        axis=-1,
    )
    return jnp.einsum("...tc,...t->...c", v, wts.astype(v.dtype))


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
    dy = jnp.arange(kh, dtype=jnp.float32).repeat(kw) - padding  # (KK,)
    dx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh) - padding
    py = ys[..., None] + dy + offs[..., 0]  # (H, W, KK)
    px = xs[..., None] + dx + offs[..., 1]
    # all KK taps through ONE wide gather: the 4 bilinear corners ride in a
    # single 4*Cin-wide row each, and the 4x concat-map build amortizes
    # across the taps. The per-tap 4-corner form issued KK*4 row gathers of
    # Cin floats (832k x 128 B rows for ALIKED block3 at 2x1216 = 26.6 ms
    # measured); this is KK gathers of 4*Cin (4x fewer, 4x wider).
    col = bilinear_sample_zeropad_wide(
        x, jnp.stack([px, py], axis=-1)
    )  # (H, W, KK, Cin)
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


def _interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation matrix.

    Two nonzeros per row (lo/hi taps); a clipped hi==lo row sums its two
    weights to 1, so applying the matrix is EXACTLY the gather formula
    ``w_lo * x[lo] + (1 - w_lo) * x[hi]`` (the extra terms multiply 0).
    Expressed as a dense matmul so interpolation runs on the MXU: the
    former advanced-indexing form gathered one C-row per *output texel*
    along the W axis (64 B rows at C=32 bf16, ~3M gathers for a 2x1216
    batch) and measured 40 ms of ALIKED's dense stage; two matmuls move
    the same data at matrix-unit speed."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_in - 1)
    w_hi = pos - lo
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    return m.at[rows, lo].add(1.0 - w_hi).at[rows, hi].add(w_hi)


def _interp_apply(x: jnp.ndarray, Ho: int, Wo: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, Ho, Wo, C) f32 via per-axis interpolation
    matmuls (numerically identical to the gather form in f32)."""
    B, H, W, C = x.shape
    y = x
    if Ho != H:
        y = jnp.einsum(
            "oh,bhwc->bowc", _interp_matrix(H, Ho), y,
            preferred_element_type=jnp.float32,
        )
    if Wo != W:
        y = jnp.einsum(
            "ow,bhwc->bhoc", _interp_matrix(W, Wo), y,
            preferred_element_type=jnp.float32,
        )
    return y.astype(jnp.float32) if (Ho == H and Wo == W) else y


def resize_bilinear_align(x: jnp.ndarray, size) -> jnp.ndarray:
    """(B, H, W, C) -> (B, size[0], size[1], C) bilinear, align_corners=True."""
    return _interp_apply(x, int(size[0]), int(size[1]))


def upsample_bilinear_align(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*f, W*f, C) bilinear with align_corners=True."""
    B, H, W, C = x.shape
    return _interp_apply(x, H * factor, W * factor)
