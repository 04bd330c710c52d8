"""Bidirectional shared-score cross-attention as a Pallas TPU kernel.

LightGlue's cross-attention shares one similarity matrix between the two
directions (reference ``lightglue.py:186-211``): ``S = qk0 @ qk1^T``,
``m0 = softmax_rows(S) @ v1``, ``m1 = softmax_rows(S^T) @ v0``. Two
separate flash-attention calls compute S twice (4 MXU matmuls per tile
pair: S, S@v1, S^T, S^T@v0). This kernel computes each S tile once and
feeds BOTH online-softmax accumulators from it — 3 matmuls per tile
(S, A0@v1, A1^T@v0) plus one kernel launch instead of two.

Grid: ``(B*H, i, j)`` with the kv tile ``j`` innermost. Direction 0 is a
standard flash accumulation over ``j`` (row tiles of S). Direction 1
accumulates into a full-length (N, d) VMEM scratch indexed by ``j`` whose
online-softmax state persists across the outer ``i`` loop; it finalizes at
``i == ni - 1``.

Padding masks enter as additive -inf biases on the S tile before either
direction reads it. Fully-masked rows produce zero outputs (l clamped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(q_ref, k_ref, v0_ref, v1_ref, m0q_ref, m1k_ref, o0_ref, o1_ref,
            acc0, m0s, l0, acc1, m1s, l1, *, scale: float):
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init0():
        acc0[...] = jnp.zeros_like(acc0)
        m0s[...] = jnp.full_like(m0s, _NEG)
        l0[...] = jnp.zeros_like(l0)

    bn_init = k_ref.shape[1]
    sl_init = pl.ds(j * bn_init, bn_init)

    @pl.when(i == 0)
    def _init1():
        # init ONLY this j's slice: at i==0 each j is visited once, and a
        # whole-array init here would wipe earlier slices' running state
        acc1[sl_init, :] = jnp.zeros((bn_init, acc1.shape[1]), acc1.dtype)
        m1s[sl_init, :] = jnp.full((bn_init, 1), _NEG, m1s.dtype)
        l1[sl_init, :] = jnp.zeros((bn_init, 1), l1.dtype)

    q = q_ref[0]          # (bm, d) side-0 qk tile (queries for dir 0)
    k = k_ref[0]          # (bn, d) side-1 qk tile
    v0 = v0_ref[0]        # (bm, d) side-0 values (dir-1 aggregation)
    v1 = v1_ref[0]        # (bn, d) side-1 values (dir-0 aggregation)
    mask_q = m0q_ref[0, 0, :]   # (bm,) side-0 validity
    mask_k = m1k_ref[0, 0, :]   # (bn,) side-1 validity

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                        # (bm, bn) — computed ONCE
    bias = jnp.where(mask_k[None, :] > 0, 0.0, _NEG)
    bias0 = jnp.where(mask_q[:, None] > 0, 0.0, _NEG)
    s = s + bias + bias0

    # ---- direction 0: rows of S, state across j -------------------------
    m_prev = m0s[...][:, 0]
    l_prev = l0[...][:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_cur = l_prev * alpha + jnp.sum(p, axis=1)
    acc0[...] = acc0[...] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v1.dtype), v1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m0s[...] = m_cur[:, None]
    l0[...] = l_cur[:, None]

    @pl.when(j == nj - 1)
    def _fin0():
        o0_ref[0] = (
            acc0[...] / jnp.maximum(l0[...], 1e-30)
        ).astype(o0_ref.dtype)

    # ---- direction 1: columns of S, state across i (scratch slice j).
    # No S transpose is materialized: column stats reduce over axis 0 and
    # the aggregation contracts p's row axis against v0 directly.
    bn = s.shape[1]
    sl = pl.ds(j * bn, bn)
    m_prev1 = m1s[sl, :][:, 0]
    l_prev1 = l1[sl, :][:, 0]
    m_cur1 = jnp.maximum(m_prev1, jnp.max(s, axis=0))
    alpha1 = jnp.exp(m_prev1 - m_cur1)
    p1 = jnp.exp(s - m_cur1[None, :])                   # (bm, bn)
    l_cur1 = l_prev1 * alpha1 + jnp.sum(p1, axis=0)
    acc1[sl, :] = acc1[sl, :] * alpha1[:, None] + jax.lax.dot_general(
        p1.astype(v0.dtype), v0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m1s[sl, :] = m_cur1[:, None]
    l1[sl, :] = l_cur1[:, None]

    @pl.when(i == ni - 1)
    def _fin1():
        o1_ref[0] = (
            acc1[sl, :] / jnp.maximum(l1[sl, :], 1e-30)
        ).astype(o1_ref.dtype)


def _pick(n: int) -> int:
    for b in (1024, 512, 256, 128):
        if n % b == 0 and n >= b:
            return b
    return n


@functools.partial(jax.jit, static_argnames=("interpret",))
def bidir_cross_attention(qk0, qk1, v0, v1, mask0, mask1,
                          interpret: bool = False):
    """(B, H, M, d) x (B, H, N, d) -> (m0 (B, H, M, d), m1 (B, H, N, d)).

    Shared-score cross attention: ``S = qk0 @ qk1^T / sqrt(d)``;
    ``m0 = softmax_rows(S) @ v1``; ``m1 = softmax_rows(S^T) @ v0``.
    mask0 (B, M) / mask1 (B, N) mark valid tokens.
    """
    B, H, M, d = qk0.shape
    N = qk1.shape[2]
    scale = d ** -0.5
    bm, bn = _pick(M), _pick(N)
    BH = B * H

    fold = lambda x: x.reshape(BH, x.shape[2], x.shape[3])
    q = fold(qk0)
    k = fold(qk1)
    w0 = fold(v0)
    w1 = fold(v1)
    m0q = jnp.repeat(mask0.astype(jnp.int32)[:, None, :], H, 1).reshape(
        BH, 1, M
    )
    m1k = jnp.repeat(mask1.astype(jnp.int32)[:, None, :], H, 1).reshape(
        BH, 1, N
    )

    grid = (BH, M // bm, N // bn)
    o0, o1 = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bn, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bm, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bn, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bm), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bn), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bn, d), lambda b, i, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, M, d), qk0.dtype),
            jax.ShapeDtypeStruct((BH, N, d), qk0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((N, d), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, w0, w1, m0q, m1k)
    return o0.reshape(B, H, M, d), o1.reshape(B, H, N, d)


def bidir_cross_attention_reference(qk0, qk1, v0, v1, mask0, mask1):
    """Dense XLA reference with identical semantics."""
    d = qk0.shape[-1]
    s = jnp.einsum("bhid,bhjd->bhij", qk0, qk1,
                   preferred_element_type=jnp.float32) * d ** -0.5
    s01 = jnp.where(mask1[:, None, None, :], s, _NEG)
    s01 = jnp.where(mask0[:, None, :, None], s01, _NEG)
    a01 = jax.nn.softmax(s01, -1)
    m0 = jnp.einsum("bhij,bhjd->bhid", a01.astype(v1.dtype), v1,
                    preferred_element_type=jnp.float32)
    s10 = s01.transpose(0, 1, 3, 2)        # (B, H, N, M)
    a10 = jax.nn.softmax(s10, -1)
    m1 = jnp.einsum("bhnm,bhmd->bhnd", a10.astype(v0.dtype), v0,
                    preferred_element_type=jnp.float32)
    return m0.astype(qk0.dtype), m1.astype(qk0.dtype)
