"""Fused depthwise-5x5 + ReLU + 1x1 refiner block as a Pallas TPU kernel.

RoMa's ConvRefiner hidden blocks (reference ``RoMa/roma/models/matcher.py``
ConvRefiner: dw 5x5 conv -> ReLU -> 1x1 conv, 9 uniform blocks per scale) are
the dominant non-gather cost of dense matching at the fine scales. XLA's
depthwise convolution at small channel counts (C=24 at scale 1, C=144 at
scale 2) runs far off bandwidth-optimal on TPU: channels sit in the lane
dimension, so C=24 uses 24/128 lanes and the conv emitter can't tile it
well.

This kernel uses a (H, C, W) band layout: W occupies the lanes at full
utilization, C sits in sublanes. The depthwise conv is 25 shifted
multiply-accumulates on the VPU over a VMEM-resident row band (per-channel
weights broadcast natively from a sublane vector across lanes), and the 1x1
channel mix is R small (C, C) x (C, W) MXU matmuls with free leading-dim row
slicing. One ``pallas_call`` per block; activation traffic is one read + one
write per block.

Numerics: float32 throughout, matches the XLA path up to fp reordering of
the 25-tap sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _block_kernel(xa_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
                  scratch, *, R: int):
    """One refiner block over a row band.

    xa (R, C, L): band rows; xb (4, C, L): the 4 halo rows below the band
    (the source array is padded so these always exist). Valid output lanes
    are a W-slice of L; lanes beyond it hold garbage the caller drops.
    """
    R4, C, L = scratch.shape
    scratch[:R] = xa_ref[...]
    scratch[R:] = xb_ref[...]
    x = scratch[...]
    w1 = w1_ref[...]                     # (C, 25)
    b1 = b1_ref[...]                     # (C, 1)
    acc = jnp.broadcast_to(b1[None], (R, C, L))
    # dx outer so each lane roll happens once (5 rolls, not 25)
    for dx in range(5):
        # out[l] = in[l + dx]  (pltpu.roll takes non-negative shifts)
        sh = x if dx == 0 else pltpu.roll(x, L - dx, 2)
        for dy in range(5):
            acc = acc + w1[:, dy * 5 + dx][None, :, None] * sh[dy:dy + R]
    h = jnp.maximum(acc, 0.0)
    w2 = w2_ref[...]                     # (C, C) = (out, in)
    b2 = b2_ref[...]                     # (C, 1)
    for r in range(R):
        y_ref[r] = (
            jax.lax.dot_general(
                w2, h[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2
        )


def _stack_impl(x, w1, b1, w2, b2, interpret: bool):
    """x (B, H, C, W) f32; w1 (N, C, 25); b1 (N, C, 1); w2 (N, C, C) as
    (out, in); b2 (N, C, 1). Applies the N blocks sequentially."""
    B, H, C, W = x.shape
    N = w1.shape[0]
    L = _align(W + 4, 128)
    # keep in + out + scratch (+double buffering) inside the VMEM budget
    row_bytes = C * L * 4
    R = max(4, min(96, (int(24e6) // row_bytes - 12) // 5 // 4 * 4))
    Hp = _align(H, R)
    n_bands = Hp // R
    # rows: 2 zero (conv top pad) + H data + zeros to n_bands*R + 4 tail
    # lanes: 2 zero + W data + zeros
    def repack(src):
        buf = jnp.zeros((B, Hp + 4, C, L), jnp.float32)
        return jax.lax.dynamic_update_slice(buf, src, (0, 2, 0, 2))

    xp = repack(x)
    grid = (B, n_bands)
    call = pl.pallas_call(
        functools.partial(_block_kernel, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, R, C, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(
                (None, 4, C, L),
                lambda b, i, _R=R: (b, i * (_R // 4) + _R // 4, 0, 0),
            ),
            pl.BlockSpec((C, 25), lambda b, i: (0, 0)),
            pl.BlockSpec((C, 1), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, 1), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, R, C, L), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, C, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 4, C, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    for k in range(N):
        # xp twice: band rows + the 4-row halo below, two views of one array
        y = call(xp, xp, w1[k], b1[k], w2[k], b2[k])
        if k < N - 1:
            xp = repack(y[:, :H, :, :W])
    return y[:, :H, :, :W]


def refiner_dw_stack(x, w1, b1, w2, b2, *, interpret: bool = False):
    """Apply N fused (dw5x5 -> ReLU -> 1x1) blocks to NHWC input.

    x (B, H, W, C) f32; w1 (N, 5, 5, 1, C) depthwise HWIO weights;
    b1 (N, C); w2 (N, 1, 1, C, C) 1x1 HWIO weights; b2 (N, C).
    Matches N iterations of::

        h = relu(conv_dw5x5_same(x, w1[k]) + b1[k])
        x = conv1x1(h, w2[k]) + b2[k]
    """
    N = w1.shape[0]
    C = w1.shape[-1]
    xt = x.transpose(0, 1, 3, 2)                      # (B, H, C, W)
    w1f = w1.reshape(N, 25, C).transpose(0, 2, 1)     # (N, C, 25)
    w2f = w2.reshape(N, C, C).transpose(0, 2, 1)      # (N, out, in)
    y = _stack_impl(
        xt, w1f, b1[..., None], w2f, b2[..., None], interpret
    )
    return y.transpose(0, 1, 3, 2)
