"""Fused attention-prologue projections as a Pallas TPU kernel.

LightGlue's self-block prologue (reference
``LightGlue/lightglue/lightglue.py:129-243`` SelfBlock.forward) is a QKV
projection followed by a head split and rotary application to q and k. As
separate XLA ops the chain costs several full HBM passes over (B, K, 3D)
bf16 intermediates: the qkv tensor is written and re-read for the
(heads, hd, 3) unpack, and each rotary application reads/writes its operand
twice more (the ``rotate_half`` stack is a relayout XLA does not fuse into
the matmul). This kernel streams row tiles: the projection matmul, the
q/k/v unpack, and both rotary applications happen per-tile in VMEM — one
read of x, one write each of q, k, v.

Layout trick: the projection weight's output columns are pre-permuted from
the torch interleave ``lane = (h*hd + d)*3 + c`` to three contiguous
sections ``[q | k | v]``, each ordered (head, hd) — so the in-kernel unpack
is three 128-aligned lane slices instead of a stride-3 gather the VPU can't
do. The rotate-half pair swap runs on the VPU as two lane rolls + a parity
select (zero extra MXU FLOPs; an alternative ±1 permutation matmul would
add 66% to the kernel's FLOPs).

The cross-block prologue (qk/v projections, no rotary) reuses the same
kernel with two sections and an empty rotary set.

Measured result (v5e, B=4, K=2048, bf16, full 9-layer forward): 16.80 ms
fused vs 16.53 ms XLA — a ~1.6% LOSS. XLA keeps the qkv intermediate fused
into its consumers well enough that the hand pass only adds the f32
rotate-half detour (``tpu.dynamic_rotate`` has no 16-bit lowering, so the
roll must run on the f32 accumulator). The kernel stays opt-in via
``DIM_TPU_FUSED_PROLOGUE=1`` (see ``models/lightglue.py``), with
interpret-mode parity tests kept green.

Numerics match the XLA path: f32 matmul accumulation, cast to the compute
dtype, rotary multiply-add in the compute dtype with f32 cos/sin cast down
— the same order of operations as ``models/lightglue.py::_apply_rotary``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rotate_half_tile(t):
    """rotate_half on a (TM, C) tile: out[2k] = -t[2k+1], out[2k+1] = t[2k].
    Two lane rolls + parity select — stays on the VPU.

    MUST be called on a 32-bit tile: Mosaic's ``tpu.dynamic_rotate`` has no
    16-bit lowering ("Rotate with non-32-bit data" abort on v5e libtpu), so
    the caller rolls the f32 accumulator *before* casting to the compute
    dtype (roll/negate commute with the downcast — numerics unchanged)."""
    c = t.shape[1]
    rl = pltpu.roll(t, shift=c - 1, axis=1)  # t[j+1] (left roll by 1)
    rr = pltpu.roll(t, shift=1, axis=1)      # t[j-1]
    even = (jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) % 2) == 0
    return jnp.where(even, -rl, rr)


def _proj_rot_kernel(x_ref, w_ref, b_ref, cos_ref, sin_ref, *refs,
                     n_sections: int, rot: tuple, d: int):
    out_refs = refs
    x = x_ref[...]                               # (TM, D) compute dtype
    y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    y += b_ref[...].astype(jnp.float32)          # (TM, nS*D) f32
    t = y.astype(x.dtype)
    if rot:
        # cos/sin are per-head (TM, hd); all heads share them, so the
        # (head, hd) section layout tiles them across the section's lanes.
        # repeat + rotate run on 32-bit vectors (16-bit rotate/relayout has
        # no Mosaic lowering); the downcast after is exact for both.
        reps = d // cos_ref.shape[-1]
        cos = pltpu.repeat(cos_ref[...], reps, axis=1).astype(x.dtype)
        sin = pltpu.repeat(sin_ref[...], reps, axis=1).astype(x.dtype)
    for s in range(n_sections):
        sec = t[:, s * d:(s + 1) * d]
        if s in rot:
            rh = _rotate_half_tile(y[:, s * d:(s + 1) * d]).astype(x.dtype)
            sec = sec * cos + rh * sin
        out_refs[s][...] = sec


@functools.partial(
    jax.jit,
    static_argnames=("n_sections", "rot", "interpret"),
)
def proj_rotary_fused(x, w, b, cos, sin, n_sections: int = 3,
                      rot: tuple = (0, 1), interpret: bool = False):
    """Fused ``x @ w + b`` -> split into ``n_sections`` D-wide sections ->
    rotary on the sections in ``rot``.

    x: (B, N, D); w: (D, n_sections*D) with section-contiguous output
    columns, each section ordered (head, hd); b: (n_sections*D,);
    cos/sin: (B, N, hd) (ignored when ``rot`` is empty — pass any
    correctly-shaped array). Returns a tuple of ``n_sections`` (B, N, D)
    arrays in x.dtype.

    Requires D % 128 == 0 and (B*N) % 128 == 0 — the padded feature
    stores guarantee both; callers fall back to the XLA path otherwise.
    """
    B, N, D = x.shape
    R = B * N
    TM = 512 if R % 512 == 0 else (256 if R % 256 == 0 else 128)
    xr = x.reshape(R, D)
    hd = cos.shape[-1]
    cosr = cos.reshape(R, hd)
    sinr = sin.reshape(R, hd)
    br = b.reshape(1, -1)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    outs = pl.pallas_call(
        functools.partial(
            _proj_rot_kernel, n_sections=n_sections, rot=tuple(rot), d=D
        ),
        grid=(R // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0)),
            full(w), full(br),
            pl.BlockSpec((TM, hd), lambda i: (i, 0)),
            pl.BlockSpec((TM, hd), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0))
            for _ in range(n_sections)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, D), x.dtype) for _ in range(n_sections)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr, w, br, cosr, sinr)
    return tuple(o.reshape(B, N, D) for o in outs)


@functools.lru_cache(maxsize=8)
def _qkv_perm(D: int, num_heads: int) -> np.ndarray:
    """Column permutation torch-interleaved -> section-contiguous:
    new lane ``c*D + h*hd + d`` takes old lane ``(h*hd + d)*3 + c``."""
    hd = D // num_heads
    perm = np.empty(3 * D, np.int64)
    i = 0
    for c in range(3):
        for h in range(num_heads):
            for d in range(hd):
                perm[i] = (h * hd + d) * 3 + c
                i += 1
    return perm


def qkv_rotary_fused(x, p_qkv, cos, sin, num_heads: int,
                     interpret: bool = False):
    """Self-block prologue: returns (q, k, v) each (B, N, D), rotary applied
    to q and k. ``p_qkv`` is the torch-layout param dict {"w", optional
    "b"} from ``models/lightglue.py`` (output lanes (head, hd, 3))."""
    D = x.shape[-1]
    perm = jnp.asarray(_qkv_perm(D, num_heads))
    w = jnp.take(p_qkv["w"], perm, axis=1)
    b = (jnp.take(p_qkv["b"], perm) if "b" in p_qkv
         else jnp.zeros((3 * D,), x.dtype))
    return proj_rotary_fused(x, w, b, cos, sin, n_sections=3, rot=(0, 1),
                             interpret=interpret)


def qk_v_fused(x, p_qk, p_v, interpret: bool = False):
    """Cross-block prologue: returns (qk, v) each (B, N, D) from the two
    separate D->D projections, fused into one matmul (no rotary)."""
    D = x.shape[-1]
    w = jnp.concatenate([p_qk["w"], p_v["w"]], axis=1)
    zero = jnp.zeros((D,), x.dtype)
    b = jnp.concatenate([p_qk.get("b", zero), p_v.get("b", zero)])
    dummy = jnp.zeros(x.shape[:2] + (128,), jnp.float32)
    return proj_rotary_fused(x, w, b, dummy, dummy, n_sections=2, rot=(),
                             interpret=interpret)
