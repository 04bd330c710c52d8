"""Fused nearest-neighbor matching as a Pallas TPU kernel.

The dense matcher (``ops/nn_match.py``) materializes the (K0, K1) distance
matrix in HBM — 256 MB per pair at K=8192 f32, with several HBM passes for
argmin / second-min / mutual checks. This kernel streams distance *tiles*
through VMEM flash-attention-style: one MXU matmul per tile plus a running
(min1, min2, argmin) reduction carried in VMEM scratch, so the distance
matrix never exists in memory. The mutual check runs the same kernel in the
reverse direction.

Grid layout: (batch, row-tile, col-tile) with the col-tile dimension
innermost ("arbitrary" semantics) so the scratch carries across col tiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # python float: jnp constants would be captured tracers


def _nn_kernel(d0_ref, sq1_ref, d1_ref, min1_ref, min2_ref, arg_ref,
               acc_min1, acc_min2, acc_arg):
    """One (row-tile x col-tile) step of the running top-2 minimum.

    Distances omit the per-row ||d0||^2 constant (argmin-invariant; added
    back by the caller when true distances are needed).
    """
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_min1[...] = jnp.full_like(acc_min1, _INF)
        acc_min2[...] = jnp.full_like(acc_min2, _INF)
        acc_arg[...] = jnp.zeros_like(acc_arg)

    d0 = d0_ref[0]           # (bm, D)
    d1 = d1_ref[0]           # (bn, D)
    sq1 = sq1_ref[0, 0, :]   # (bn,)
    cross = jnp.dot(d0, d1.T, preferred_element_type=jnp.float32)
    dist = sq1[None, :] - 2.0 * cross  # (bm, bn)

    bn = d1.shape[0]
    col_base = j * bn
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)

    t_min1 = jnp.min(dist, axis=1)
    t_arg_local = jnp.argmin(dist, axis=1).astype(jnp.int32)
    masked = jnp.where(col_ids == t_arg_local[:, None], _INF, dist)
    t_min2 = jnp.min(masked, axis=1)
    t_arg = t_arg_local + col_base

    m1 = acc_min1[...][:, 0]
    m2 = acc_min2[...][:, 0]
    a1 = acc_arg[...][:, 0]
    new_m1 = jnp.minimum(m1, t_min1)
    new_a1 = jnp.where(t_min1 < m1, t_arg, a1)
    new_m2 = jnp.minimum(jnp.maximum(m1, t_min1), jnp.minimum(m2, t_min2))
    acc_min1[...] = new_m1[:, None]
    acc_min2[...] = new_m2[:, None]
    acc_arg[...] = new_a1[:, None]

    @pl.when(j == nj - 1)
    def _write():
        min1_ref[0] = acc_min1[...]
        min2_ref[0] = acc_min2[...]
        arg_ref[0] = acc_arg[...]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def nn_top2(
    d0: jnp.ndarray,    # (B, K0, D)
    d1: jnp.ndarray,    # (B, K1, D)
    sq1: jnp.ndarray,   # (B, K1) reference squared norms (+ masking offsets)
    block_m: int = 256,
    block_n: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-query running top-2 of ``sq1[j] - 2 d0.d1[j]`` over all j.

    Returns (min1, min2, argmin), each (B, K0)."""
    B, K0, D = d0.shape
    K1 = d1.shape[1]
    # Pallas edge blocks read out-of-bounds garbage: blocks must tile the
    # arrays exactly. Keypoint capacities are usually multiples of 128
    # (kpt_pad_multiple), but not always — e.g. ALIKED's default
    # max_num_keypoints=4000 reaches here through the tiled device match,
    # and falling back to block=K would stage a (4000, 4000) f32 distance
    # tile = 64 MB against the 16 MB VMEM scoped limit (compile OOM,
    # caught on v5e). Pad to the next 128-multiple instead: padded query
    # rows are trimmed from the outputs; padded reference columns get the
    # same +1e12 squared-norm offset the callers use for invalid rows, so
    # they can never win an argmin.
    pad_m = (-K0) % 128
    pad_n = (-K1) % 128
    if pad_m:
        d0 = jnp.pad(d0, ((0, 0), (0, pad_m), (0, 0)))
    if pad_n:
        d1 = jnp.pad(d1, ((0, 0), (0, pad_n), (0, 0)))
        sq1 = jnp.pad(sq1, ((0, 0), (0, pad_n)), constant_values=1.0e12)
    Km, Kn = K0 + pad_m, K1 + pad_n
    block_m = next(
        (b for b in (block_m, 256, 128) if Km % b == 0 and Km >= b), Km
    )
    block_n = next(
        (b for b in (block_n, 512, 256, 128) if Kn % b == 0 and Kn >= b), Kn
    )
    sq1 = sq1[:, None, :]  # (B, 1, Kn)

    grid = (B, pl.cdiv(Km, block_m), pl.cdiv(Kn, block_n))
    out_shape = [
        jax.ShapeDtypeStruct((B, Km, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Km, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Km, 1), jnp.int32),
    ]
    min1, min2, arg = pl.pallas_call(
        _nn_kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_m, D), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, 1, block_n), lambda b, i, j: (b, 0, j)),
                pl.BlockSpec((1, block_n, D), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_m, 1), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_m, 1), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_m, 1), lambda b, i, j: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_m, 1), jnp.float32),
                pltpu.VMEM((block_m, 1), jnp.float32),
                pltpu.VMEM((block_m, 1), jnp.int32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(d0, sq1, d1)
    return min1[:, :K0, 0], min2[:, :K0, 0], arg[:, :K0, 0]


@functools.partial(jax.jit, static_argnames=("mode",))
def nn_match_fused(
    desc0: jnp.ndarray,  # (B, K0, D)
    desc1: jnp.ndarray,  # (B, K1, D)
    mask0: jnp.ndarray,  # (B, K0)
    mask1: jnp.ndarray,  # (B, K1)
    mode: str = "smnn",
    ratio_th: float = 0.95,
):
    """Drop-in fused equivalent of ``ops.nn_match.nn_match_batch``.

    Invalid reference rows are excluded by adding a huge offset to their
    squared norms (they can never win an argmin)."""
    B, K0, _ = desc0.shape
    K1 = desc1.shape[1]
    big = jnp.float32(1e12)
    d0 = jnp.where(mask0[..., None], desc0, 0.0).astype(jnp.float32)
    d1 = jnp.where(mask1[..., None], desc1, 0.0).astype(jnp.float32)
    sq1 = (d1**2).sum(-1) + jnp.where(mask1, 0.0, big)
    sq0 = (d0**2).sum(-1) + jnp.where(mask0, 0.0, big)

    min1_f, min2_f, arg_f = nn_top2(d0, d1, sq1)
    row_sq = (d0**2).sum(-1)
    dist1 = jnp.maximum(min1_f + row_sq, 0.0)
    dist2 = jnp.maximum(min2_f + row_sq, 0.0)

    valid = mask0 & (min1_f < big / 2)
    if mode in ("snn", "smnn"):
        ratio = jnp.sqrt(dist1) / jnp.maximum(jnp.sqrt(dist2), 1e-12)
        # if only one finite neighbor exists, keep (reference behavior)
        ratio_ok = jnp.where(min2_f < big / 2, ratio <= ratio_th, True)
        valid = valid & ratio_ok
    if mode in ("mnn", "smnn"):
        _, _, arg_b = nn_top2(d1, d0, sq0)
        back = jnp.take_along_axis(arg_b, jnp.clip(arg_f, 0, K1 - 1), axis=1)
        valid = valid & (back == jnp.arange(K0)[None])
    matches0 = jnp.where(valid, arg_f, -1).astype(jnp.int32)
    return matches0, valid
