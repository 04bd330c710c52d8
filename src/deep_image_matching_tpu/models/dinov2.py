"""DINOv2 ViT backbone as a pure-functional JAX model.

Used by RoMa's coarse encoder (``thirdparty/RoMa/roma/models/transformer/
dinov2.py``: vit_large, patch 14, LayerScale init 1.0, MLP FFN) and by
DeDoDe-G. Standard DINOv2 topology: conv patch embed, cls token, learned
position embedding with bicubic interpolation to the input grid, pre-norm
blocks (MHA with qkv bias + LayerScale, MLP 4x + LayerScale), final
LayerNorm; ``forward_features`` returns the normalized patch tokens.

Converter accepts the official ``dinov2_vitl14_pretrain.pth`` naming.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

VIT_L = {"dim": 1024, "depth": 24, "heads": 16, "mlp_ratio": 4, "patch": 14}


def params_from_torch(state_dict, cfg=VIT_L) -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        out = {"w": jnp.asarray(sd[f"{prefix}.weight"].T, jnp.float32)}
        if f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return out

    def ln(prefix):
        return {
            "g": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
            "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    blocks = []
    for i in range(cfg["depth"]):
        p = f"blocks.{i}"
        blocks.append({
            "ln1": ln(f"{p}.norm1"),
            "qkv": lin(f"{p}.attn.qkv"),
            "proj": lin(f"{p}.attn.proj"),
            "ls1": jnp.asarray(sd[f"{p}.ls1.gamma"], jnp.float32),
            "ln2": ln(f"{p}.norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
            "ls2": jnp.asarray(sd[f"{p}.ls2.gamma"], jnp.float32),
        })
    return {
        "patch_embed": {
            "w": jnp.asarray(
                sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0), jnp.float32
            ),
            "b": jnp.asarray(sd["patch_embed.proj.bias"], jnp.float32),
        },
        "cls_token": jnp.asarray(sd["cls_token"], jnp.float32),
        "pos_embed": jnp.asarray(sd["pos_embed"], jnp.float32),
        # stacked for the forward scan — stacking per call would concat
        # ~1.2 GB of ViT-L weights in HBM on every forward
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": ln("norm"),
    }


def init_params(key, cfg=VIT_L, depth: int = 2) -> Params:
    """Small random init (tests use a shallow stack)."""
    rng = np.random.default_rng(0)
    d = cfg["dim"]
    p = cfg["patch"]

    def lin(ci, co):
        return {
            "w": jnp.asarray(rng.normal(0, 1 / np.sqrt(ci), (ci, co)), jnp.float32),
            "b": jnp.zeros((co,), jnp.float32),
        }

    blocks = [
        {
            "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "qkv": lin(d, 3 * d),
            "proj": lin(d, d),
            "ls1": jnp.full((d,), 1.0, jnp.float32),
            "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "fc1": lin(d, cfg["mlp_ratio"] * d),
            "fc2": lin(cfg["mlp_ratio"] * d, d),
            "ls2": jnp.full((d,), 1.0, jnp.float32),
        }
        for _ in range(depth)
    ]
    n_pos = (518 // p) ** 2 + 1
    return {
        "patch_embed": {
            "w": jnp.asarray(
                rng.normal(0, 0.02, (p, p, 3, d)), jnp.float32
            ),
            "b": jnp.zeros((d,), jnp.float32),
        },
        "cls_token": jnp.zeros((1, 1, d), jnp.float32),
        "pos_embed": jnp.asarray(rng.normal(0, 0.02, (1, n_pos, d)), jnp.float32),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }


def _ln(x, p):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"] + p["b"]).astype(x.dtype)


def _lin(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """Dense (n_out, n_in) interpolation matrix reproducing
    ``F.interpolate(mode='bicubic', align_corners=False)`` exactly:
    cubic convolution with A=-0.75, source coordinate
    ``(dst + 0.5) / scale - 0.5`` using the CALLER's scale factor (DINOv2
    passes ``(w0 + 0.1) / sqrt(N)`` — the +0.1 anti-fp-error trick from
    facebookresearch/dino#8), and edge-replicated taps."""
    A = -0.75

    def k0(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k1(x):  # 1 < |x| < 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        w = (k1(1.0 + t), k0(t), k0(1.0 - t), k1(2.0 - t))
        for tap, wt in zip(range(i0 - 1, i0 + 3), w):
            W[i, min(max(tap, 0), n_in - 1)] += wt
    return W.astype(np.float32)


def _interp_pos_embed(pos_embed: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """Bicubic-interpolate the patch position embeddings to (hp, wp),
    bit-matching the reference's torch path (``thirdparty/RoMa/roma/models/
    transformer/dinov2.py:166-190``). Static shapes: the tiny (hp, side)
    weight matrices are baked at trace time."""
    n = pos_embed.shape[1] - 1
    side = int(round(float(np.sqrt(n))))
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, side, side, -1)
    if (hp, wp) != (side, side):
        # NOTE the reference swaps w/h in its scale_factor tuple; for the
        # square grids used here they coincide.
        Wy = jnp.asarray(_torch_bicubic_matrix(side, hp, (hp + 0.1) / side))
        Wx = jnp.asarray(_torch_bicubic_matrix(side, wp, (wp + 0.1) / side))
        patch_pe = jnp.einsum("oy,byxd->boxd", Wy, patch_pe)
        patch_pe = jnp.einsum("ox,byxd->byod", Wx, patch_pe)
    return cls_pe, patch_pe.reshape(1, hp * wp, -1)


def default_attn_impl() -> str:
    """'flash' (Pallas fused attention) on TPU, dense 'xla' elsewhere."""
    try:
        return "flash" if jax.default_backend() not in ("cpu",) else "xla"
    except Exception:
        return "xla"


def forward_features(
    params: Params, images: jnp.ndarray, num_heads: int = 16,
    compute_dtype: str = "bfloat16", attn_impl: str = "auto",
) -> jnp.ndarray:
    """images (B, H, W, 3), ImageNet-normalized, H/W multiples of the patch
    size -> normalized patch tokens (B, H/p*W/p, dim).

    ``attn_impl='flash'`` routes every block through the Pallas fused
    attention kernel (``ops/attention.py``): at RoMa's coarse resolution
    (1601 tokens, ViT-L) the dense path streams a 164 MB f32 score tensor
    per block through HBM, which the streaming kernel eliminates. Tokens
    are padded once for the whole stack and masked via segment ids; padding
    rounds up to a 1024 multiple where the waste stays under 35% because
    the kernel's 1024-wide tiles dominate 128-wide ones (measured v5e,
    560 px ViT-L: pad-to-1664/128-tiles 0.91x vs dense, pad-to-2048/
    1024-tiles **1.83x** — 70.0 -> 38.2 ms per 2-image pyramid)."""
    if attn_impl == "auto":
        attn_impl = default_attn_impl()
    cdt = jnp.dtype(compute_dtype)
    p = params["patch_embed"]["w"].shape[0]
    B, H, W, _ = images.shape
    hp, wp = H // p, W // p
    x = jax.lax.conv_general_dilated(
        images.astype(cdt), params["patch_embed"]["w"].astype(cdt),
        (p, p), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["b"].astype(cdt)
    x = x.reshape(B, hp * wp, -1)
    cls_pe, patch_pe = _interp_pos_embed(params["pos_embed"], hp, wp)
    cls_tok = (params["cls_token"] + cls_pe).astype(cdt)
    x = x + patch_pe.astype(cdt)
    x = jnp.concatenate([jnp.tile(cls_tok, (B, 1, 1)), x], axis=1)

    S = x.shape[1]
    mask = None
    if attn_impl == "flash" and S % 128 != 0:
        S_pad = ((S + 127) // 128) * 128
        # round up to a 1024 multiple when the waste is small: the flash
        # kernel's 1024-wide tiles are markedly faster than 128-wide ones
        S_1024 = ((S + 1023) // 1024) * 1024
        if S_1024 <= 1.35 * S:
            S_pad = S_1024
        x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0)))
        mask = jnp.arange(S_pad)[None, :] < S  # (1, S_pad)
        mask = jnp.broadcast_to(mask, (B, S_pad))

    D = x.shape[-1]
    hd = D // num_heads

    def block(x, bp):
        bp = jax.tree.map(
            lambda v: v.astype(cdt) if v.dtype == jnp.float32 else v, bp
        )
        h = _ln(x, bp["ln1"])
        qkv = _lin(h, bp["qkv"]).reshape(B, -1, 3, num_heads, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        if attn_impl == "flash":
            from ..ops.attention import fused_attention

            out = fused_attention(
                q, k, v, mask, mask, 1.0 / np.sqrt(hd), impl="flash"
            ).astype(cdt)
        else:
            sim = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) / np.sqrt(hd)
            attn = jax.nn.softmax(sim, axis=-1).astype(cdt)
            out = jnp.einsum(
                "bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32
            ).astype(cdt)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, D)
        x = x + _lin(out, bp["proj"]) * bp["ls1"]
        h = _ln(x, bp["ln2"])
        h = _lin(h, bp["fc1"])
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(cdt)
        return x + _lin(h, bp["fc2"]) * bp["ls2"]

    # one compiled block body via scan (24 unrolled ViT-L blocks take
    # minutes to compile); params store the blocks pre-stacked — legacy
    # list-form params are stacked here as a fallback
    stacked = params["blocks"]
    if isinstance(stacked, (list, tuple)):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked)
    x = jax.lax.scan(lambda c, bp: (block(c, bp), None), x, stacked)[0]

    x = _ln(x, params["norm"])
    return x[:, 1 : S].astype(jnp.float32)  # patch tokens only, padding off
