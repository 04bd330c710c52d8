"""LightGlue matcher as a batched, fixed-shape JAX program.

Architecture parity with the reference's vendored LightGlue
(``thirdparty/LightGlue/lightglue/lightglue.py:300-610``): learnable Fourier
rotary positional encoding, L transformer layers of masked self+cross
attention (4 heads), per-layer match-assignment heads (dual log-softmax +
matchability sigmoid), mutual-nearest filtering with a score threshold.

TPU-native design decisions (vs. the reference's per-pair dynamic control
flow):
- The 9 layers are *stacked* and executed with ``lax.scan`` — one compiled
  layer body regardless of depth; pair batches (B, K, D) map the attention
  matmuls straight onto the MXU in bf16.
- Early exit (``depth_confidence``, reference ``lightglue.py:593-604``) is a
  per-pair data-dependent break; here it is a *batch-level* exit: a
  ``lax.while_loop`` over stacked layers stops as soon as every pair in the
  batch clears the confidence threshold (see ``forward``'s adaptive path and
  ``tests/test_adaptive_depth.py``). This is the default; a fixed-depth
  ``lax.scan`` path remains for fidelity runs (``depth_confidence<=0``).
- Width pruning (``width_confidence``, ``lightglue.py:501-516``) is a gather
  that saves FLOPs on GPU but breaks static shapes; here pruning is expressed
  as attention masking (matchability-based, applied when
  ``width_confidence>0``), which preserves semantics but not FLOPs.
- All shapes static: (B, K) keypoint capacity with validity masks; invalid
  slots are masked out of attention, softmax normalizations, and the final
  assignment.

Weights load from the reference's torch checkpoints via
``params_from_torch`` (tested against the torch module with random weights).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


# ---------------------------------------------------------------------------
# Parameter init / conversion
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("n_layers", "dim", "num_heads", "input_dim")
)
def init_params(
    key: jax.Array,
    n_layers: int = 9,
    dim: int = 256,
    num_heads: int = 4,
    input_dim: int = 256,
) -> Params:
    """Random init with the reference's shapes (tests / training). Jitted so
    initialization is one device program (not hundreds of tiny dispatches)."""
    head_dim = dim // num_heads

    def lin(key, cin, cout, bias=True):
        k1, _ = jax.random.split(key)
        w = jax.random.normal(k1, (cin, cout), jnp.float32) / np.sqrt(cin)
        out = {"w": w}
        if bias:
            out["b"] = jnp.zeros((cout,), jnp.float32)
        return out

    keys = jax.random.split(key, 16 + n_layers * 16)
    ki = iter(range(len(keys)))
    params: Params = {
        "posenc": {
            "wr": jax.random.normal(keys[next(ki)], (2, head_dim // 2), jnp.float32)
        },
    }
    if input_dim != dim:
        params["input_proj"] = lin(keys[next(ki)], input_dim, dim)

    def layer(key4):
        k = jax.random.split(key4, 12)
        return {
            "self": {
                "qkv": lin(k[0], dim, 3 * dim),
                "out": lin(k[1], dim, dim),
                "ffn1": lin(k[2], 2 * dim, 2 * dim),
                "ln": {"g": jnp.ones((2 * dim,)), "b": jnp.zeros((2 * dim,))},
                "ffn2": lin(k[3], 2 * dim, dim),
            },
            "cross": {
                "qk": lin(k[4], dim, dim),
                "v": lin(k[5], dim, dim),
                "out": lin(k[6], dim, dim),
                "ffn1": lin(k[7], 2 * dim, 2 * dim),
                "ln": {"g": jnp.ones((2 * dim,)), "b": jnp.zeros((2 * dim,))},
                "ffn2": lin(k[8], 2 * dim, dim),
            },
            "assign": {
                "final": lin(k[9], dim, dim),
                "match": lin(k[10], dim, 1),
            },
            "token": lin(k[11], dim, 1),
        }

    layers = [layer(keys[next(ki)]) for _ in range(n_layers)]
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


def params_from_torch(state_dict, n_layers: int = 9, num_heads: int = 4) -> Params:
    """Convert a torch LightGlue state_dict (linear weights (out, in) ->
    stored transposed for x @ W)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        out = {"w": jnp.asarray(sd[f"{prefix}.weight"].T, jnp.float32)}
        if f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return out

    params: Params = {
        "posenc": {"wr": jnp.asarray(sd["posenc.Wr.weight"].T, jnp.float32)},
    }
    if "input_proj.weight" in sd:
        params["input_proj"] = lin("input_proj")

    layers = []
    for i in range(n_layers):
        t = f"transformers.{i}"
        layer = {
            "self": {
                "qkv": lin(f"{t}.self_attn.Wqkv"),
                "out": lin(f"{t}.self_attn.out_proj"),
                "ffn1": lin(f"{t}.self_attn.ffn.0"),
                "ln": {
                    "g": jnp.asarray(sd[f"{t}.self_attn.ffn.1.weight"], jnp.float32),
                    "b": jnp.asarray(sd[f"{t}.self_attn.ffn.1.bias"], jnp.float32),
                },
                "ffn2": lin(f"{t}.self_attn.ffn.3"),
            },
            "cross": {
                "qk": lin(f"{t}.cross_attn.to_qk"),
                "v": lin(f"{t}.cross_attn.to_v"),
                "out": lin(f"{t}.cross_attn.to_out"),
                "ffn1": lin(f"{t}.cross_attn.ffn.0"),
                "ln": {
                    "g": jnp.asarray(sd[f"{t}.cross_attn.ffn.1.weight"], jnp.float32),
                    "b": jnp.asarray(sd[f"{t}.cross_attn.ffn.1.bias"], jnp.float32),
                },
                "ffn2": lin(f"{t}.cross_attn.ffn.3"),
            },
            "assign": {
                "final": lin(f"log_assignment.{i}.final_proj"),
                "match": lin(f"log_assignment.{i}.matchability"),
            },
        }
        if i < n_layers - 1:
            layer["token"] = lin(f"token_confidence.{i}.token.0")
        else:  # pad so leaves stack uniformly
            layer["token"] = {
                "w": jnp.zeros_like(layer["assign"]["match"]["w"]),
                "b": jnp.zeros_like(layer["assign"]["match"]["b"]),
            }
        layers.append(layer)
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def normalize_keypoints(kpts: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """kpts (B, N, 2) pixels; size (B, 2) as (w, h) -> roughly [-1, 1]
    (reference ``lightglue.py:25-34``)."""
    size = size.astype(jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
    return (kpts - shift[:, None, :]) / scale[:, None, :]


def rotary_encoding(kpts_n: jnp.ndarray, wr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Learnable Fourier features -> per-position rotary (cos, sin), each
    (B, N, head_dim) with frequencies repeated in adjacent pairs. Positions
    are trigonometric — always computed in f32."""
    proj = jnp.einsum(
        "bnm,md->bnd", kpts_n.astype(jnp.float32), wr.astype(jnp.float32)
    )
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
    return cos, sin


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x1.shape[:-1], -1)


def _apply_rotary(t: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """t: (B, H, N, hd); cos/sin: (B, N, hd)."""
    cos = cos.astype(t.dtype)
    sin = sin.astype(t.dtype)
    return t * cos[:, None] + _rotate_half(t) * sin[:, None]


def _linear(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


def _ffn(x, msg, p, impl: str = "xla"):
    """x + FFN(concat(x, msg)): Linear -> LayerNorm -> GELU -> Linear.
    LayerNorm statistics and GELU run in f32 regardless of compute dtype.

    impl='fused' streams row tiles through the Pallas kernel
    (``ops/pallas_ffn.py``) so the (B, K, 2D) f32 intermediate never hits
    HBM — measured 0.73 -> ~0.2 ms per call on v5e at B=16, K=2048."""
    B, K, D = x.shape
    if impl == "fused" and D % 128 == 0 and (B * K) % 128 == 0:
        from ..ops.pallas_ffn import ffn_fused

        b1 = p["ffn1"].get("b", jnp.zeros(p["ffn1"]["w"].shape[1], x.dtype))
        b2 = p["ffn2"].get("b", jnp.zeros(p["ffn2"]["w"].shape[1], x.dtype))
        return ffn_fused(
            x, msg, p["ffn1"]["w"], b1,
            p["ln"]["g"], p["ln"]["b"], p["ffn2"]["w"], b2,
        )
    h = _linear(jnp.concatenate([x, msg.astype(x.dtype)], axis=-1), p["ffn1"])
    h32 = h.astype(jnp.float32)
    mu = h32.mean(-1, keepdims=True)
    var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
    h32 = (h32 - mu) * jax.lax.rsqrt(var + 1e-5)
    h32 = h32 * p["ln"]["g"].astype(jnp.float32) + p["ln"]["b"].astype(jnp.float32)
    h = jax.nn.gelu(h32, approximate=False).astype(x.dtype)
    return x + _linear(h, p["ffn2"])


def _attention(q, k, v, key_mask, q_mask=None, impl: str = "xla"):
    """q,k,v: (B, H, N, hd); key_mask: (B, Nk) -> (B, H, Nq, hd).
    impl='flash' uses the fused Pallas TPU kernel (ops/attention.py);
    'xla' is the dense fallback with f32 accumulation + softmax."""
    from ..ops.attention import fused_attention

    scale = q.shape[-1] ** -0.5
    return fused_attention(q, k, v, q_mask, key_mask, scale, impl=impl)


def _heads(x, num_heads):
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge(x):
    B, H, N, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * hd)


def _prologue_fused_ok(x, ffn_impl: str) -> bool:
    """The fused Pallas prologue (ops/pallas_qkv.py) is parity, not a win:
    measured 16.80 vs 16.53 ms/batch (B=4, K=2048, bf16, v5e) against the
    plain XLA prologue — XLA already keeps the qkv intermediate fused with
    its consumers well enough that the hand-written tile pass only adds the
    f32 rotate-half detour (32-bit-only `tpu.dynamic_rotate`). Kept opt-in
    (`DIM_TPU_FUSED_PROLOGUE=1`) with parity tests; gate otherwise matches
    the fused FFN (TPU flash path, padded shapes)."""
    import os

    if os.environ.get("DIM_TPU_FUSED_PROLOGUE", "0") != "1":
        return False
    B, N, D = x.shape
    return ffn_impl == "fused" and D % 128 == 0 and (B * N) % 128 == 0


def _self_block(x, enc, mask, p, num_heads, attn_impl="xla", ffn_impl="xla",
                full=False):
    cos, sin = enc
    if _prologue_fused_ok(x, ffn_impl):
        # one Pallas kernel: QKV matmul + unpack + rotary per row tile
        # (ops/pallas_qkv.py) — the (B, N, 3D) intermediate and the rotary
        # relayout passes never hit HBM
        from ..ops.pallas_qkv import qkv_rotary_fused

        q, k, v = qkv_rotary_fused(x, p["qkv"], cos, sin, num_heads)
        q, k, v = _heads(q, num_heads), _heads(k, num_heads), _heads(v, num_heads)
    else:
        qkv = _linear(x, p["qkv"])  # (B, N, 3D)
        B, N, _ = qkv.shape
        D = x.shape[-1]
        # torch layout: last dim = (heads, head_dim, 3)
        qkv = qkv.reshape(B, N, num_heads, D // num_heads, 3).transpose(0, 2, 1, 3, 4)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)
    # "bidir" only changes the cross block; self attention stays flash
    self_impl = "flash" if attn_impl == "bidir" else attn_impl
    # full=True: caller statically guarantees all-ones masks — skip the
    # segment-id machinery (and its runtime all-reduce cond) entirely
    am = None if full else mask
    ctx = _attention(q, k, v, am, q_mask=am, impl=self_impl)
    msg = _linear(_merge(ctx), p["out"])
    return _ffn(x, msg, p, ffn_impl)


def _cross_block(x0, x1, mask0, mask1, p, num_heads, attn_impl="xla", ffn_impl="xla",
                 full=False):
    if _prologue_fused_ok(x0, ffn_impl) and x0.shape == x1.shape:
        from ..ops.pallas_qkv import qk_v_fused

        qk0f, v0f = qk_v_fused(x0, p["qk"], p["v"])
        qk1f, v1f = qk_v_fused(x1, p["qk"], p["v"])
        qk0, v0 = _heads(qk0f, num_heads), _heads(v0f, num_heads)
        qk1, v1 = _heads(qk1f, num_heads), _heads(v1f, num_heads)
    else:
        qk0 = _heads(_linear(x0, p["qk"]), num_heads)
        qk1 = _heads(_linear(x1, p["qk"]), num_heads)
        v0 = _heads(_linear(x0, p["v"]), num_heads)
        v1 = _heads(_linear(x1, p["v"]), num_heads)
    scale = qk0.shape[-1] ** -0.5
    if attn_impl == "bidir":
        # one Pallas kernel computes each S tile once and feeds both
        # directions' online softmaxes (ops/pallas_bidir_attention.py):
        # 3 MXU matmuls per tile pair instead of 4, one launch instead of 2
        from ..ops.pallas_bidir_attention import bidir_cross_attention

        m0, m1 = bidir_cross_attention(qk0, qk1, v0, v1, mask0, mask1)
    elif attn_impl == "flash":
        # the fused kernel never materializes the similarity matrix;
        # the shared QK^T is recomputed per direction (FLOPs for HBM)
        am0 = None if full else mask0
        am1 = None if full else mask1
        m0 = _attention(qk0, qk1, v1, am1, q_mask=am0, impl=attn_impl)
        m1 = _attention(qk1, qk0, v0, am0, q_mask=am1, impl=attn_impl)
    else:
        # one similarity matrix, softmaxed both ways (shared-score cross
        # attention, exact reference semantics)
        sim = jnp.einsum(
            "bhid,bhjd->bhij", qk0, qk1, preferred_element_type=jnp.float32
        ) * scale
        if full:
            sim01 = sim
            sim10 = sim.transpose(0, 1, 3, 2)
        else:
            sim01 = jnp.where(mask1[:, None, None, :], sim, -1e30)
            sim10 = jnp.where(
                mask0[:, None, None, :], sim.transpose(0, 1, 3, 2), -1e30
            )
        a01 = jax.nn.softmax(sim01, -1).astype(v1.dtype)
        a10 = jax.nn.softmax(sim10, -1).astype(v0.dtype)
        m0 = jnp.einsum("bhij,bhjd->bhid", a01, v1, preferred_element_type=jnp.float32)
        m1 = jnp.einsum("bhij,bhjd->bhid", a10, v0, preferred_element_type=jnp.float32)
    m0 = _linear(_merge(m0.astype(v1.dtype)), p["out"])
    m1 = _linear(_merge(m1.astype(v0.dtype)), p["out"])
    return _ffn(x0, m0, p, ffn_impl), _ffn(x1, m1, p, ffn_impl)


def _log_assignment(desc0, desc1, mask0, mask1, p):
    """Dual-softmax log assignment over valid entries
    (reference ``lightglue.py:246-278``). Returns (B, M, N) log-P plus the
    matchability log-sigmoids (dustbins handled implicitly by filtering)."""
    d = desc0.shape[-1]
    md0 = _linear(desc0, p["final"]) / d**0.25
    md1 = _linear(desc1, p["final"]) / d**0.25
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1, preferred_element_type=jnp.float32)
    z0 = _linear(desc0, p["match"])[..., 0].astype(jnp.float32)  # (B, M)
    z1 = _linear(desc1, p["match"])[..., 0].astype(jnp.float32)  # (B, N)
    sim0 = jnp.where(mask1[:, None, :], sim, -1e30)
    sim1 = jnp.where(mask0[:, :, None], sim, -1e30)
    scores0 = jax.nn.log_softmax(sim0, axis=2)
    scores1 = jax.nn.log_softmax(sim1, axis=1)
    certainties = jax.nn.log_sigmoid(z0)[:, :, None] + jax.nn.log_sigmoid(z1)[:, None, :]
    scores = scores0 + scores1 + certainties
    both = mask0[:, :, None] & mask1[:, None, :]
    return jnp.where(both, scores, -1e30)


def filter_matches_static(scores, mask0, mask1, threshold: float):
    """Mutual-argmax + threshold filtering with static shapes
    (reference ``filter_matches`` ``lightglue.py:281-297``).

    Returns matches0 (B, M) int32 (-1 = no match), mscores0 (B, M),
    valid0 (B, M)."""
    m0 = jnp.argmax(scores, axis=2)  # (B, M)
    m1 = jnp.argmax(scores, axis=1)  # (B, N)
    max0 = jnp.max(scores, axis=2)
    B, M = m0.shape
    N = m1.shape[1]
    idx_m = jnp.arange(M)[None]
    mutual0 = idx_m == jnp.take_along_axis(m1, m0, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    valid0 = mutual0 & (mscores0 > threshold) & mask0
    matches0 = jnp.where(valid0, m0, -1).astype(jnp.int32)
    return matches0, mscores0, valid0


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _token_confidences(d0, d1, token_p):
    """TokenConfidence head (reference ``lightglue.py:593-604``). Module-level
    so tests can monkeypatch per-pair confidences for mixed-batch exit tests."""
    c0 = jax.nn.sigmoid(_linear(d0, token_p)[..., 0].astype(jnp.float32))
    c1 = jax.nn.sigmoid(_linear(d1, token_p)[..., 0].astype(jnp.float32))
    return c0, c1


def forward_impl(
    params: Params,
    kpts0: jnp.ndarray,        # (B, M, 2) pixels
    kpts1: jnp.ndarray,        # (B, N, 2)
    desc0: jnp.ndarray,        # (B, M, D_in)
    desc1: jnp.ndarray,        # (B, N, D_in)
    mask0: jnp.ndarray,        # (B, M) bool
    mask1: jnp.ndarray,        # (B, N) bool
    size0: jnp.ndarray,        # (B, 2) (w, h)
    size1: jnp.ndarray,
    num_heads: int = 4,
    filter_threshold: float = 0.1,
    depth: Optional[int] = None,
    depth_confidence: float = -1.0,
    width_confidence: float = -1.0,
    pruning_min_kpts: int = 1536,
    compute_dtype: str = "float32",
    attn_impl: str = "xla",
    assignment_impl: str = "dense",
    ffn_impl: str = "auto",
    layout: str = "split",
    assume_full_masks: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched LightGlue matching. ``depth`` truncates the scan (compiled
    shallow variants replace per-pair early exit). ``depth_confidence > 0``
    enables the reference's adaptive-depth early exit
    (``lightglue.py:497-499,593-604``) at batch granularity: after each layer
    the TokenConfidence heads score both point sets and the layer loop — a
    ``lax.while_loop`` — stops once EVERY pair in the batch has a confident
    ratio above the threshold; the assignment then uses the exited layer's
    head, exactly as the reference does per pair. Batch-level exit is the
    conservative batched reading of the per-pair rule (a batch runs as deep
    as its hardest pair), so match quality is never below the reference's.
    ``compute_dtype``
    'bfloat16' runs the transformer in bf16 with f32 accumulation/softmax —
    the MXU-native mode on TPU; assignment scores stay f32.

    ``assignment_impl='fused'`` computes the dual-softmax match filtering
    via streaming Pallas kernels (``ops/pallas_assignment.py``) that never
    materialize the (B, M, N) score matrix — required headroom for
    K >= 8192 where the dense scores alone are multi-GB.

    ``assume_full_masks=True`` is a static promise by the caller that both
    masks are all-ones (every slot holds a real keypoint — the common case
    when detection fills the top-k capacity). Attention then skips segment-id
    masking AND the runtime all-full cond (which costs a per-call all-reduce
    and, with width pruning, rarely fires after early layers). A false
    promise lets padded slots leak into attention and corrupts descriptors —
    callers must only set it when the masks really are all-ones. Ignored on
    the width-pruning path, whose masks change during the layer loop."""
    mask0 = mask0.astype(bool)
    mask1 = mask1.astype(bool)
    cdt = jnp.dtype(compute_dtype)
    if cdt != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params
        )
        desc0 = desc0.astype(cdt)
        desc1 = desc1.astype(cdt)
    if "input_proj" in params:
        desc0 = _linear(desc0, params["input_proj"])
        desc1 = _linear(desc1, params["input_proj"])

    kn0 = normalize_keypoints(kpts0, size0)
    kn1 = normalize_keypoints(kpts1, size1)
    enc0 = rotary_encoding(kn0, params["posenc"]["wr"])
    enc1 = rotary_encoding(kn1, params["posenc"]["wr"])

    layers = params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if depth is not None and depth < n_layers:
        layers = jax.tree.map(lambda x: x[:depth], layers)
        n_layers = depth

    # NOTE: running both images' self-attention as one concatenated 2B batch
    # was measured SLOWER on v5e (concat/split HBM copies outweigh the larger
    # kernel): 191 ms vs 177 ms per 32-pair batch. Keep separate calls.
    if ffn_impl == "auto":
        # fused Pallas FFN wherever the flash attention kernel is in use
        ffn_impl = "fused" if attn_impl in ("flash", "bidir") else "xla"

    if layout == "stacked":
        if attn_impl == "bidir":
            import logging

            logging.getLogger("dim_tpu").warning(
                "attn_impl='bidir' is not implemented for layout='stacked'; "
                "cross attention falls back to two flash calls"
            )
        # Both images live in one (2B, K, D) tensor for the whole scan:
        # self-attention runs once at batch 2B; cross-attention takes the
        # partner's keys/values by rolling the batch halves. One attention
        # launch per direction-pair, all matmuls at 2B rows, no per-layer
        # concat/split (stack once, unstack once). Measured SLOWER on v5e
        # (B=4: 248.9 vs 254.0 pairs/s; B=8: 222.8 vs 251.6 - the batch
        # gather relayout and larger VMEM working sets outweigh the saved
        # launches), so 'split' stays the default; kept as an option for
        # other hardware generations. Outputs are bitwise identical.
        B = desc0.shape[0]
        X = jnp.concatenate([desc0, desc1], 0)
        ENC = (jnp.concatenate([enc0[0], enc1[0]], 0),
               jnp.concatenate([enc0[1], enc1[1]], 0))
        MASK = jnp.concatenate([mask0, mask1], 0)
        perm = jnp.concatenate([jnp.arange(B, 2 * B), jnp.arange(B)])
        PMASK = MASK[perm]

        def body(carry, layer):
            X = _self_block(carry, ENC, MASK, layer["self"], num_heads,
                            attn_impl, ffn_impl, full=assume_full_masks)
            p = layer["cross"]
            qk = _heads(_linear(X, p["qk"]), num_heads)
            v = _heads(_linear(X, p["v"]), num_heads)
            am_k = None if assume_full_masks else PMASK
            am_q = None if assume_full_masks else MASK
            m = _attention(qk, qk[perm], v[perm], am_k, q_mask=am_q,
                           impl="flash" if attn_impl == "bidir" else attn_impl)
            msg = _linear(_merge(m.astype(v.dtype)), p["out"])
            return _ffn(X, msg, p, ffn_impl), None

        X, _ = jax.lax.scan(body, X, layers)
        desc0, desc1 = X[:B], X[B:]
        last = jax.tree.map(lambda x: x[-1], layers)
        layers_run = jnp.asarray(n_layers, jnp.int32)
    elif (depth_confidence is not None and depth_confidence > 0) or (
        width_confidence is not None and width_confidence > 0
    ):
        # Adaptive depth (reference lightglue.py:593-604): sigmoid token
        # confidences vs the layer-indexed threshold
        # clip(0.8 + 0.1 * exp(-4 i / n), 0, 1); stop when the confident
        # ratio over valid points of BOTH images exceeds depth_confidence
        # for every pair in the batch.
        #
        # Width pruning (reference :501-516) rides the same loop when
        # width_confidence > 0: points that are token-confident AND have
        # matchability <= (1 - width_confidence) are masked out of later
        # layers and the assignment. The reference physically gathers the
        # survivors (a speed device on GPUs); with static TPU shapes the
        # masked form is the same math — pruned points can't attend, be
        # attended to, or match — without any dynamic-shape recompile.
        # Reference gates pruning on > pruning_min_kpts current points
        # (lightglue.py:608-612, 1536 for flash); applied per pair here.
        do_prune = width_confidence is not None and width_confidence > 0
        do_stop = depth_confidence is not None and depth_confidence > 0
        # pruning mutates the masks inside the loop — the full-mask promise
        # only holds on the depth-only adaptive path
        full_adaptive = assume_full_masks and not do_prune
        # reference check_if_stop divides by the ORIGINAL m+n (not the
        # post-pruning count) — pruned points implicitly count as confident
        n_pts_orig = (jnp.sum(mask0, 1) + jnp.sum(mask1, 1)).astype(jnp.float32)

        def _conf_threshold(i):
            return jnp.clip(
                0.8 + 0.1 * jnp.exp(-4.0 * i.astype(jnp.float32) / n_layers),
                0.0, 1.0,
            )

        def cond(carry):
            i, _, _, _, _, stop = carry
            return (i < n_layers) & ~stop

        def body(carry):
            i, d0, d1, m0_, m1_, _ = carry
            layer = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
                layers,
            )
            d0 = _self_block(d0, enc0, m0_, layer["self"], num_heads,
                             attn_impl, ffn_impl, full=full_adaptive)
            d1 = _self_block(d1, enc1, m1_, layer["self"], num_heads,
                             attn_impl, ffn_impl, full=full_adaptive)
            d0, d1 = _cross_block(
                d0, d1, m0_, m1_, layer["cross"], num_heads, attn_impl,
                ffn_impl, full=full_adaptive
            )
            # the last layer has no (real) confidence head — loop bound exits
            th = _conf_threshold(i)
            if do_stop:
                # token-confidence head runs only when depth adaptivity is on
                # (reference: confidences are None when depth_confidence <= 0)
                c0, c1 = _token_confidences(d0, d1, layer["token"])
                n_unconf = (
                    jnp.sum((c0 < th) & m0_, 1) + jnp.sum((c1 < th) & m1_, 1)
                ).astype(jnp.float32)
                ratio = 1.0 - n_unconf / jnp.maximum(n_pts_orig, 1.0)
                stop = (i < n_layers - 1) & jnp.all(ratio > depth_confidence)
            else:
                stop = jnp.asarray(False)
            if do_prune:
                # keep = matchable OR not-yet-confident; prune only while the
                # loop continues and the pair still has > min_kpts points
                mp = layer["assign"]["match"]
                s0 = jax.nn.sigmoid(
                    _linear(d0, mp)[..., 0].astype(jnp.float32))
                s1 = jax.nn.sigmoid(
                    _linear(d1, mp)[..., 0].astype(jnp.float32))
                keep0 = s0 > (1.0 - width_confidence)
                keep1 = s1 > (1.0 - width_confidence)
                if do_stop:
                    # low-token-confidence points are never pruned — but only
                    # when the confidence head actually runs (reference
                    # get_pruning_mask: confidences are None when
                    # depth_confidence <= 0, so pruning is matchability-only
                    # in that configuration)
                    keep0 = keep0 | (c0 <= th)
                    keep1 = keep1 | (c1 <= th)
                live = (i < n_layers - 1) & ~stop
                allow0 = live & (jnp.sum(m0_, 1, keepdims=True) > pruning_min_kpts)
                allow1 = live & (jnp.sum(m1_, 1, keepdims=True) > pruning_min_kpts)
                m0_ = m0_ & (keep0 | ~allow0)
                m1_ = m1_ & (keep1 | ~allow1)
            return (i + 1, d0, d1, m0_, m1_, stop)

        layers_run, desc0, desc1, mask0, mask1, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), desc0, desc1, mask0, mask1,
             jnp.asarray(False)),
        )
        # assignment head of the layer we exited at (reference :541 uses
        # log_assignment[i] of the break layer); pruned points stay masked
        # out of the assignment, matching the reference's scatter-back of -1
        last = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(
                x, layers_run - 1, 0, keepdims=False),
            layers,
        )
    else:
        def body(carry, layer):
            d0, d1 = carry
            d0 = _self_block(d0, enc0, mask0, layer["self"], num_heads,
                             attn_impl, ffn_impl, full=assume_full_masks)
            d1 = _self_block(d1, enc1, mask1, layer["self"], num_heads,
                             attn_impl, ffn_impl, full=assume_full_masks)
            d0, d1 = _cross_block(
                d0, d1, mask0, mask1, layer["cross"], num_heads, attn_impl,
                ffn_impl, full=assume_full_masks
            )
            return (d0, d1), None

        if layout == "unrolled":
            # python-unrolled layer loop: same math as the scan, but XLA
            # sees 9 inlined layers (longer compile, no per-iteration
            # carry/weight-slice choreography) — used to measure scan
            # overhead on the bench path
            carry = (desc0, desc1)
            for i in range(n_layers):
                layer = jax.tree.map(lambda x: x[i], layers)
                carry, _ = body(carry, layer)
            desc0, desc1 = carry
        else:
            (desc0, desc1), _ = jax.lax.scan(body, (desc0, desc1), layers)
        last = jax.tree.map(lambda x: x[-1], layers)
        layers_run = jnp.asarray(n_layers, jnp.int32)

    if assignment_impl == "fused":
        from ..ops.pallas_assignment import filter_matches_fused

        p = last["assign"]
        d = desc0.shape[-1]
        md0 = _linear(desc0, p["final"]) / d**0.25
        md1 = _linear(desc1, p["final"]) / d**0.25
        z0 = _linear(desc0, p["match"])[..., 0].astype(jnp.float32)
        z1 = _linear(desc1, p["match"])[..., 0].astype(jnp.float32)
        matches0, mscores0, valid0 = filter_matches_fused(
            md0, md1, z0, z1, mask0, mask1, filter_threshold
        )
    else:
        scores = _log_assignment(desc0, desc1, mask0, mask1, last["assign"])
        matches0, mscores0, valid0 = filter_matches_static(
            scores, mask0, mask1, filter_threshold
        )
    return {
        "matches0": matches0,
        "matching_scores0": mscores0,
        "valid0": valid0,
        "layers_run": layers_run,
    }


forward = jax.jit(
    forward_impl,
    static_argnames=(
        "num_heads", "filter_threshold", "depth", "depth_confidence",
        "width_confidence", "pruning_min_kpts",
        "compute_dtype", "attn_impl", "assignment_impl", "ffn_impl", "layout",
        "assume_full_masks",
    ),
)


def default_attn_impl() -> str:
    """'flash' on TPU backends, 'xla' elsewhere (CPU tests, interpret)."""
    try:
        return "flash" if jax.default_backend() not in ("cpu",) else "xla"
    except Exception:
        return "xla"


def default_assignment_impl() -> str:
    """'fused' (streaming Pallas assignment) on TPU, 'dense' elsewhere.

    Measured v5e: 1.3x at K=2048/B=32, 2x at K=4096, 23x at K=8192 where
    the dense (B, K, K) score temporaries saturate HBM."""
    try:
        return "fused" if jax.default_backend() not in ("cpu",) else "dense"
    except Exception:
        return "dense"


# ---------------------------------------------------------------------------
# Host runner
# ---------------------------------------------------------------------------

_DEFAULT_PARAMS: Dict[str, Params] = {}
_DEFAULT_PARAMS_RANDOM: set = set()


def load_default_params(features: str = "superpoint", n_layers: int = 9) -> Params:
    """Pretrained weights if available (DIM_TPU_WEIGHTS_DIR /
    <features>_lightglue.pth), else deterministic random init.

    Cached RANDOM params re-consult the weights policy each call so a
    strict() probe never silently receives random params another caller
    cached under allow-random (see models/superpoint.py for the failure
    this prevents)."""
    key = f"{features}:{n_layers}"
    if key in _DEFAULT_PARAMS:
        if key in _DEFAULT_PARAMS_RANDOM:
            from ..utils.weights import reject_cached_random

            reject_cached_random(
                f"LightGlue ({features})",
                [f"{features}_lightglue.pth",
                 f"{features}_lightglue_v0-1_arxiv.pth"],
            )
        return _DEFAULT_PARAMS[key]
    import logging
    import os
    from pathlib import Path

    logger = logging.getLogger("dim_tpu")
    input_dims = {"superpoint": 256, "disk": 128, "aliked": 128, "sift": 128, "rdd_sparse": 256}
    input_dim = input_dims.get(features, 256)
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    candidates = []
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        candidates += [base / f"{features}_lightglue.pth",
                       base / f"{features}_lightglue_v0-1_arxiv.pth"]
    for cand in candidates:
        if cand.exists():
            import torch

            sd = torch.load(str(cand), map_location="cpu")
            sd = {k.replace(f"self_attn.", "self_attn."): v for k, v in sd.items()}
            params = params_from_torch(sd, n_layers=n_layers)
            logger.info(f"Loaded LightGlue weights from {cand}")
            _DEFAULT_PARAMS[key] = params
            return params
    from ..utils.weights import missing_weights

    missing_weights(
        f"LightGlue ({features})",
        [f"{features}_lightglue.pth", f"{features}_lightglue_v0-1_arxiv.pth"],
    )
    params = init_params(
        jax.random.PRNGKey(42), n_layers=n_layers, input_dim=input_dim
    )
    _DEFAULT_PARAMS[key] = params
    _DEFAULT_PARAMS_RANDOM.add(key)
    return params


class LightGlueRunner:
    """Host-side batched matching over padded feature dicts."""

    def __init__(
        self,
        params: Params | None = None,
        features: str = "superpoint",
        n_layers: int = 9,
        filter_threshold: float = 0.1,
        batch_size: int = 16,
        depth: Optional[int] = None,
        compute_dtype: Optional[str] = None,
        depth_confidence: float = -1.0,
        width_confidence: float = -1.0,
    ):
        self.params = params if params is not None else load_default_params(
            features, n_layers
        )
        self.filter_threshold = filter_threshold
        self.batch_size = batch_size
        self.depth = depth
        self.depth_confidence = depth_confidence
        self.width_confidence = width_confidence
        # None = auto (bf16 on accelerators, f32 on CPU); pass the matcher's
        # configured tpu.dtype to override
        self.compute_dtype = compute_dtype

    def count_matches_pairs(self, feats: list, pairs: list) -> list:
        """Number of raw matches per (i, j) pair — used by the low-res
        pair-selection probe."""
        counts = []
        store = self._device_store(feats)
        for start in range(0, len(pairs), self.batch_size):
            chunk = pairs[start : start + self.batch_size]
            out, _ = self._run_chunk(feats, chunk, store)
            counts.extend(int(v.sum()) for v in np.asarray(out["valid0"]))
        return counts

    def match_pairs(self, feats: list, pairs: list) -> list:
        """(M, 2) index arrays per pair."""
        all_matches = []
        store = self._device_store(feats)
        for start in range(0, len(pairs), self.batch_size):
            chunk = pairs[start : start + self.batch_size]
            out, _ = self._run_chunk(feats, chunk, store)
            matches0 = np.asarray(out["matches0"])
            valid0 = np.asarray(out["valid0"])
            for b in range(len(chunk)):
                rows = np.nonzero(valid0[b])[0]
                all_matches.append(
                    np.stack([rows, matches0[b][rows]], 1).astype(np.int32)
                )
        return all_matches

    def _device_store(self, feats: list):
        """Stack all images' padded features once as device arrays.

        Pair chunks then assemble on device with take() — each image's
        descriptors cross host->device once, not once per pair (the O(N^2)
        low-res probe otherwise re-uploads every image ~N times)."""
        cap = max(
            (len(f["keypoints"]) for f in feats), default=1
        )
        cap = max(128, ((cap + 127) // 128) * 128)
        dims = [f["descriptors"].shape[-1] for f in feats
                if len(f["keypoints"])]
        D = dims[0] if dims else 256
        n = len(feats)
        kpts = np.zeros((n, cap, 2), np.float32)
        desc = np.zeros((n, cap, D), np.float32)
        mask = np.zeros((n, cap), bool)
        size = np.zeros((n, 2), np.float32)
        for i, f in enumerate(feats):
            c = len(f["keypoints"])
            kpts[i, :c] = f["keypoints"]
            if c:
                desc[i, :c] = f["descriptors"]
            mask[i, :c] = True
            size[i] = f["image_size"]
        return {
            "kpts": jnp.asarray(kpts), "desc": jnp.asarray(desc),
            "mask": jnp.asarray(mask), "size": jnp.asarray(size),
            "cap": cap,
        }

    def _run_chunk(self, feats: list, chunk: list, store=None):
        if store is None:
            store = self._device_store(feats)
        i0 = jnp.asarray(np.array([i for i, _ in chunk], np.int32))
        i1 = jnp.asarray(np.array([j for _, j in chunk], np.int32))
        take = lambda a, ind: jnp.take(a, ind, axis=0)
        out = forward(
            self.params,
            take(store["kpts"], i0), take(store["kpts"], i1),
            take(store["desc"], i0), take(store["desc"], i1),
            take(store["mask"], i0), take(store["mask"], i1),
            take(store["size"], i0), take(store["size"], i1),
            filter_threshold=self.filter_threshold,
            depth=self.depth,
            depth_confidence=self.depth_confidence,
            width_confidence=self.width_confidence,
            compute_dtype=self.compute_dtype or (
                "bfloat16" if jax.default_backend() != "cpu" else "float32"
            ),
            attn_impl=default_attn_impl(),
            assignment_impl=default_assignment_impl(),
        )
        return out, store["cap"]
