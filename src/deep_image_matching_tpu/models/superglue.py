"""SuperGlue matcher as a batched, fixed-shape JAX program.

Architecture parity with the reference's vendored SuperGlue (Sarlin et al.,
CVPR'20; ``thirdparty/SuperGluePretrainedNetwork/models/superglue.py:193-305``):
keypoint-encoder MLP, 18-layer attentional GNN (alternating self/cross,
4 heads), final projection, and entropic optimal transport via 100
log-space Sinkhorn iterations with a learned dustbin score.

TPU-native design:
- the 9 (self, cross) layer pairs are stacked and run under ``lax.scan``;
- BatchNorm (inference) is folded into the preceding 1x1 convolutions at
  weight-conversion time — one matmul per MLP layer on the MXU;
- Sinkhorn runs as a ``lax.scan`` of masked logsumexp sweeps. Padding uses
  *masked marginals*: invalid rows/columns carry zero transport mass and the
  a-priori marginals use the true keypoint counts, so the padded batched
  program computes exactly the unpadded per-pair result (golden-tested
  against the torch module).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

_NEG = -1e30


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

_KENC_CHANNELS = [3, 32, 64, 128, 256]


@functools.partial(jax.jit, static_argnames=("n_blocks", "dim", "num_heads"))
def init_params(key: jax.Array, n_blocks: int = 9, dim: int = 256, num_heads: int = 4) -> Params:
    """Random init (BN folded representation: every MLP layer is w/b only)."""

    def lin(key, cin, cout):
        return {
            "w": jax.random.normal(key, (cin, cout), jnp.float32) / np.sqrt(cin),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    keys = jax.random.split(key, 8 + n_blocks * 16)
    ki = iter(range(len(keys)))
    kenc = [
        lin(keys[next(ki)], _KENC_CHANNELS[i], _KENC_CHANNELS[i + 1])
        for i in range(len(_KENC_CHANNELS) - 1)
    ]

    def attn_layer():
        return {
            "q": lin(keys[next(ki)], dim, dim),
            "k": lin(keys[next(ki)], dim, dim),
            "v": lin(keys[next(ki)], dim, dim),
            "merge": lin(keys[next(ki)], dim, dim),
            "mlp1": lin(keys[next(ki)], 2 * dim, 2 * dim),
            "mlp2": lin(keys[next(ki)], 2 * dim, dim),
        }

    blocks = [
        {"self": attn_layer(), "cross": attn_layer()} for _ in range(n_blocks)
    ]
    return {
        "kenc": kenc,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final": lin(keys[next(ki)], dim, dim),
        "bin_score": jnp.asarray(1.0, jnp.float32),
    }


def _fold_bn(w, b, bn_g, bn_b, bn_m, bn_v, eps=1e-5):
    """Fold an inference BatchNorm1d into the preceding 1x1 conv."""
    s = bn_g / np.sqrt(bn_v + eps)
    return w * s[None, :], (b - bn_m) * s + bn_b


def params_from_torch(state_dict) -> Params:
    """Convert the torch SuperGlue state_dict; Conv1d (out,in,1) weights are
    transposed to (in,out) and BatchNorms folded."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        w = sd[f"{prefix}.weight"][:, :, 0].T  # (in, out)
        b = sd[f"{prefix}.bias"]
        return w, b

    def folded(conv_prefix, bn_prefix):
        w, b = conv(conv_prefix)
        w, b = _fold_bn(
            w, b,
            sd[f"{bn_prefix}.weight"], sd[f"{bn_prefix}.bias"],
            sd[f"{bn_prefix}.running_mean"], sd[f"{bn_prefix}.running_var"],
        )
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}

    def plain(prefix):
        w, b = conv(prefix)
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}

    # keypoint encoder: convs at indices 0,3,6,9 with BN at 1,4,7 (last conv bare)
    kenc = [
        folded("kenc.encoder.0", "kenc.encoder.1"),
        folded("kenc.encoder.3", "kenc.encoder.4"),
        folded("kenc.encoder.6", "kenc.encoder.7"),
        plain("kenc.encoder.9"),
    ]

    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("gnn.layers.")
    )
    assert n_layers % 2 == 0
    blocks = []
    for blk in range(n_layers // 2):
        layers = {}
        for name, li in (("self", 2 * blk), ("cross", 2 * blk + 1)):
            g = f"gnn.layers.{li}"
            layers[name] = {
                "q": plain(f"{g}.attn.proj.0"),
                "k": plain(f"{g}.attn.proj.1"),
                "v": plain(f"{g}.attn.proj.2"),
                "merge": plain(f"{g}.attn.merge"),
                "mlp1": folded(f"{g}.mlp.0", f"{g}.mlp.1"),
                "mlp2": plain(f"{g}.mlp.3"),
            }
        blocks.append(layers)
    return {
        "kenc": kenc,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final": plain("final_proj"),
        "bin_score": jnp.asarray(sd["bin_score"], jnp.float32),
    }


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _linear(x, p):
    return jnp.einsum("...i,io->...o", x, p["w"]) + p["b"]


def normalize_keypoints(kpts, size):
    """kpts (B, N, 2); size (B, 2) (w, h): center at size/2, scale by
    0.7*max(size) (reference ``superglue.py:64-71``)."""
    size = size.astype(jnp.float32)
    center = size / 2.0
    scaling = jnp.max(size, axis=-1, keepdims=True) * 0.7
    return (kpts - center[:, None, :]) / scaling[:, None, :]


def _kenc(params, kpts_n, scores):
    """Keypoint encoder MLP over (x, y, score)."""
    x = jnp.concatenate([kpts_n, scores[..., None]], axis=-1)
    for i, p in enumerate(params):
        x = _linear(x, p)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def _mha(x, source, q_mask, key_mask, p, num_heads, attn_impl="xla"):
    """Multi-head attention: x queries attend to source (B, N, D)."""
    B, Nq, D = x.shape
    hd = D // num_heads

    def heads(t):
        # torch views the channel dim as (head_dim, num_heads) — i.e. heads
        # are interleaved across channels (superglue.py:106-110)
        return t.reshape(B, -1, hd, num_heads).transpose(0, 3, 1, 2)

    q = heads(_linear(x, p["q"]))
    k = heads(_linear(source, p["k"]))
    v = heads(_linear(source, p["v"]))
    from ..ops.attention import fused_attention

    out = fused_attention(q, k, v, q_mask, key_mask, hd**-0.5, impl=attn_impl)
    # back to interleaved channel layout: (B, N, head_dim, heads) -> (B, N, D)
    out = out.astype(x.dtype).transpose(0, 2, 3, 1).reshape(B, Nq, D)
    return _linear(out, p["merge"])


def _prop(x, source, q_mask, key_mask, p, num_heads, attn_impl="xla"):
    """x + MLP([x, attn_message]) (AttentionalPropagation)."""
    msg = _mha(x, source, q_mask, key_mask, p, num_heads, attn_impl)
    B, K, D = x.shape
    if attn_impl == "flash" and D % 128 == 0 and (B * K) % 128 == 0:
        # same streaming-row-tile kernel as the LightGlue FFN, relu mode
        from ..ops.pallas_ffn import ffn_fused

        zeros = jnp.zeros((2 * D,), x.dtype)
        return ffn_fused(
            x, msg, p["mlp1"]["w"], p["mlp1"]["b"], zeros, zeros,
            p["mlp2"]["w"], p["mlp2"]["b"], mode="relu",
        )
    h = _linear(jnp.concatenate([x, msg], axis=-1), p["mlp1"])
    h = jax.nn.relu(h)
    return x + _linear(h, p["mlp2"])


def masked_log_optimal_transport(
    scores, mask0, mask1, alpha, iters: int, impl: str = "xla"
):
    """Entropic OT in log space with dustbins and *masked marginals*.

    Exact unpadded semantics under padding: invalid rows/cols receive zero
    transport mass and the marginals are built from the true counts
    (reference ``log_optimal_transport`` ``superglue.py:152-191`` computes the
    unpadded case; this generalizes it to fixed-shape batches).
    scores: (B, M, N); returns (B, M+1, N+1) log-coupling.
    """
    B, M, N = scores.shape
    ms = mask0.sum(-1).astype(jnp.float32)  # true m per pair
    ns = mask1.sum(-1).astype(jnp.float32)
    both = mask0[:, :, None] & mask1[:, None, :]

    bins0 = jnp.where(mask0, alpha, _NEG)[:, :, None]          # (B, M, 1)
    bins1 = jnp.where(mask1, alpha, _NEG)[:, None, :]          # (B, 1, N)
    z = jnp.where(both, scores, _NEG)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([z, bins0], axis=2),
            jnp.concatenate([bins1, jnp.full((B, 1, 1), alpha)], axis=2),
        ],
        axis=1,
    )  # (B, M+1, N+1)

    norm = -jnp.log(ms + ns)  # (B,)
    log_mu = jnp.concatenate(
        [jnp.where(mask0, norm[:, None], _NEG), (jnp.log(ns) + norm)[:, None]],
        axis=1,
    )  # (B, M+1)
    log_nu = jnp.concatenate(
        [jnp.where(mask1, norm[:, None], _NEG), (jnp.log(ms) + norm)[:, None]],
        axis=1,
    )  # (B, N+1)

    if impl == "pallas":
        from ..ops.pallas_sinkhorn import sinkhorn_fused

        u, v = sinkhorn_fused(couplings, log_mu, log_nu, iters)
    else:
        def body(carry, _):
            u, v = carry
            u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
            u = jnp.maximum(u, _NEG)  # keep -inf arithmetic finite
            v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
            v = jnp.maximum(v, _NEG)
            return (u, v), None

        u0 = jnp.zeros_like(log_mu)
        v0 = jnp.zeros_like(log_nu)
        (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    Z = couplings + u[:, :, None] + v[:, None, :]
    return Z - norm[:, None, None]


def _filter(scores, mask0, mask1, threshold):
    """Mutual-argmax + threshold over the OT matrix (minus dustbins)."""
    inner = scores[:, :-1, :-1]
    inner = jnp.where(mask0[:, :, None] & mask1[:, None, :], inner, _NEG)
    m0 = jnp.argmax(inner, axis=2)
    m1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)
    idx = jnp.arange(m0.shape[1])[None]
    mutual0 = idx == jnp.take_along_axis(m1, m0, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    valid0 = mutual0 & (mscores0 > threshold) & mask0
    matches0 = jnp.where(valid0, m0, -1).astype(jnp.int32)
    return matches0, mscores0, valid0


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def forward_impl(
    params: Params,
    kpts0, kpts1,            # (B, M/N, 2) pixels
    scores0, scores1,        # (B, M/N) detection scores
    desc0, desc1,            # (B, M/N, 256)
    mask0, mask1,            # (B, M/N) bool
    size0, size1,            # (B, 2) (w, h)
    num_heads: int = 4,
    sinkhorn_iterations: int = 100,
    match_threshold: float = 0.2,
    compute_dtype: str = "float32",
    attn_impl: str = "xla",
):
    mask0 = mask0.astype(bool)
    mask1 = mask1.astype(bool)
    cdt = jnp.dtype(compute_dtype)
    if cdt != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params
        )
        desc0 = desc0.astype(cdt)
        desc1 = desc1.astype(cdt)

    kn0 = normalize_keypoints(kpts0, size0).astype(desc0.dtype)
    kn1 = normalize_keypoints(kpts1, size1).astype(desc1.dtype)
    desc0 = desc0 + _kenc(params["kenc"], kn0, scores0.astype(desc0.dtype))
    desc1 = desc1 + _kenc(params["kenc"], kn1, scores1.astype(desc1.dtype))

    def body(carry, block):
        d0, d1 = carry
        d0 = _prop(d0, d0, mask0, mask0, block["self"], num_heads, attn_impl)
        d1 = _prop(d1, d1, mask1, mask1, block["self"], num_heads, attn_impl)
        d0n = _prop(d0, d1, mask0, mask1, block["cross"], num_heads, attn_impl)
        d1n = _prop(d1, d0, mask1, mask0, block["cross"], num_heads, attn_impl)
        return (d0n, d1n), None

    (desc0, desc1), _ = jax.lax.scan(body, (desc0, desc1), params["blocks"])

    md0 = _linear(desc0, params["final"])
    md1 = _linear(desc1, params["final"])
    sim = jnp.einsum(
        "bmd,bnd->bmn", md0, md1, preferred_element_type=jnp.float32
    ) / md0.shape[-1] ** 0.5
    ot = masked_log_optimal_transport(
        sim, mask0, mask1, params["bin_score"].astype(jnp.float32),
        sinkhorn_iterations,
        impl="pallas" if attn_impl == "flash" else "xla",
    )
    matches0, mscores0, valid0 = _filter(ot, mask0, mask1, match_threshold)
    return {
        "matches0": matches0,
        "matching_scores0": mscores0,
        "valid0": valid0,
    }


forward = jax.jit(
    forward_impl,
    static_argnames=(
        "num_heads", "sinkhorn_iterations", "match_threshold", "compute_dtype",
        "attn_impl",
    ),
)
