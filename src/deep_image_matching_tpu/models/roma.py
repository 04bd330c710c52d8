"""RoMa dense matcher as a batched, fixed-shape JAX program.

Architecture parity with the reference's vendored RoMa (Edstedt et al.,
CVPR'24; ``thirdparty/RoMa/roma/models/matcher.py:19-896``,
``model_zoo/roma_models.py:10-179``, ``models/encoders.py``,
``utils/local_correlation.py``, ``utils/utils.py:328-357``):

- coarse encoder: DINOv2 ViT-L/14 patch tokens (``models/dinov2.py``);
  fine encoder: VGG19-bn pyramid (shared ``models/vgg_refiner.py``);
- per-scale 1x1 projections (BN folded);
- GP match encoder at scale 16: cosine kernel K, fourier coordinate basis
  cos(8*pi*W p), posterior mean K_xy (K_yy + sigma I)^-1 f (no_cov);
- transformer coordinate decoder: 5 ViT blocks (dim 1024, 8 heads) over
  [gp_posterior, projected features] tokens -> 64^2+1 anchor-classifier;
  ``cls_to_flow_refine`` converts class probabilities to a flow estimate;
- ConvRefiners at scales 16/8/4/2/1 with displacement embedding and
  (2r+1)^2 local correlation gathered around the current warp;
- symmetric matching (A->B and B->A decoded in one batch), certainty
  attenuation, and threshold-balanced sampling (gumbel top-k multinomial +
  KDE density balancing) in ``sample_matches``.

TPU-native: all sampling (grid_sample warps, local correlation) is the
shared zero-pad bilinear gather; the GP solve is one batched 1600x1600
``jnp.linalg.solve``; everything is NHWC, fixed-shape, jit-compiled.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform import bilinear_sample_zeropad_wide
from . import dinov2
from .vgg_refiner import vgg19_features, vgg19_params_from_torch, init_vgg19_params

Params = Dict

SCALES = ["16", "8", "4", "2", "1"]
CLS_RES = 64
GP_DIM = 512
# ConvRefiner configs: (in_dim, hidden_dim, disp_dim, local_corr_radius)
_REFINERS = {
    "16": (2 * 512 + 128 + 225, 2 * 512 + 128 + 225, 128, 7),
    "8": (2 * 512 + 64 + 49, 2 * 512 + 64 + 49, 64, 3),
    "4": (2 * 256 + 32 + 25, 2 * 256 + 32 + 25, 32, 2),
    "2": (2 * 64 + 16, 128 + 16, 16, None),
    "1": (2 * 9 + 6, 24, 6, None),
}
_PROJ = {"16": (1024, 512), "8": (512, 512), "4": (256, 256), "2": (128, 64), "1": (64, 9)}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def params_from_torch(state_dict, dinov2_state_dict=None) -> Params:
    """Convert a roma_outdoor/indoor checkpoint (+ separate dinov2 weights)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        out = {"w": jnp.asarray(sd[f"{prefix}.weight"].T, jnp.float32)}
        if f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return out

    def conv1x1_bn(prefix):
        w = sd[f"{prefix}.0.weight"][:, :, 0, 0].T  # (in, out)
        b = sd.get(f"{prefix}.0.bias", np.zeros(w.shape[1]))
        g, beta = sd[f"{prefix}.1.weight"], sd[f"{prefix}.1.bias"]
        mean, var = sd[f"{prefix}.1.running_mean"], sd[f"{prefix}.1.running_var"]
        s = g / np.sqrt(var + 1e-5)
        return {
            "w": jnp.asarray(w * s[None, :], jnp.float32),
            "b": jnp.asarray((b - mean) * s + beta, jnp.float32),
        }

    def refiner_block(prefix, dw_groups):
        w1 = sd[f"{prefix}.0.weight"].transpose(2, 3, 1, 0)
        b1 = sd.get(f"{prefix}.0.bias")
        g, beta = sd[f"{prefix}.1.weight"], sd[f"{prefix}.1.bias"]
        mean, var = sd[f"{prefix}.1.running_mean"], sd[f"{prefix}.1.running_var"]
        s = g / np.sqrt(var + 1e-5)
        return {
            "conv1": {
                "w": jnp.asarray(w1 * s[None, None, None, :], jnp.float32),
                "b": jnp.asarray(((b1 if b1 is not None else 0.0) - mean) * s + beta, jnp.float32),
            },
            "conv2": {
                "w": jnp.asarray(sd[f"{prefix}.3.weight"].transpose(2, 3, 1, 0), jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.3.bias"], jnp.float32),
            },
        }

    def refiner(prefix):
        n_hidden = 1 + max(
            int(k[len(prefix) + 15:].split(".")[0])
            for k in sd if k.startswith(f"{prefix}.hidden_blocks.")
        )
        out = {
            "block1": refiner_block(f"{prefix}.block1", 1),
            "hidden": [
                refiner_block(f"{prefix}.hidden_blocks.{h}", None)
                for h in range(n_hidden)
            ],
            "out": {
                "w": jnp.asarray(sd[f"{prefix}.out_conv.weight"].transpose(2, 3, 1, 0), jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.out_conv.bias"], jnp.float32),
            },
        }
        if f"{prefix}.disp_emb.weight" in sd:
            out["disp_emb"] = {
                "w": jnp.asarray(sd[f"{prefix}.disp_emb.weight"][:, :, 0, 0].T, jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.disp_emb.bias"], jnp.float32),
            }
        return out

    def vit_block(prefix):
        blk = {
            "ln1": {"g": jnp.asarray(sd[f"{prefix}.norm1.weight"], jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.norm1.bias"], jnp.float32)},
            "qkv": lin(f"{prefix}.attn.qkv"),
            "proj": lin(f"{prefix}.attn.proj"),
            "ln2": {"g": jnp.asarray(sd[f"{prefix}.norm2.weight"], jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.norm2.bias"], jnp.float32)},
            "fc1": lin(f"{prefix}.mlp.fc1"),
            "fc2": lin(f"{prefix}.mlp.fc2"),
        }
        if f"{prefix}.ls1.gamma" in sd:
            blk["ls1"] = jnp.asarray(sd[f"{prefix}.ls1.gamma"], jnp.float32)
            blk["ls2"] = jnp.asarray(sd[f"{prefix}.ls2.gamma"], jnp.float32)
        return blk

    params: Params = {
        "vgg": vgg19_params_from_torch(sd, prefix="encoder.cnn.layers"),
        "proj": {s: conv1x1_bn(f"decoder.proj.{s}") for s in SCALES},
        "gp_pos_conv": {
            "w": jnp.asarray(sd["decoder.gps.16.pos_conv.weight"][:, :, 0, 0].T, jnp.float32),
            "b": jnp.asarray(sd["decoder.gps.16.pos_conv.bias"], jnp.float32),
        },
        "embed_blocks": [
            vit_block(f"decoder.embedding_decoder.blocks.{i}") for i in range(5)
        ],
        "embed_out": lin("decoder.embedding_decoder.to_out"),
        "refiners": {s: refiner(f"decoder.conv_refiner.{s}") for s in SCALES},
    }
    if dinov2_state_dict is not None:
        params["dinov2"] = dinov2.params_from_torch(dinov2_state_dict)
    return params


def init_params(key, dinov2_depth: int = 2) -> Params:
    """Random init at the published shapes (tests; shallow ViT)."""
    rng = np.random.default_rng(0)

    def lin(ci, co):
        return {"w": jnp.asarray(rng.normal(0, 1 / np.sqrt(ci), (ci, co)), jnp.float32),
                "b": jnp.zeros((co,), jnp.float32)}

    def conv(k, ci, co, groups=1):
        w = rng.normal(0, np.sqrt(2.0 / (ci // groups * k * k)), (k, k, ci // groups, co))
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.zeros((co,), jnp.float32)}

    def refiner(cin, hidden, disp, n_hidden=8):
        return {
            "block1": {"conv1": conv(5, cin, hidden, groups=cin), "conv2": conv(1, hidden, hidden)},
            "hidden": [
                {"conv1": conv(5, hidden, hidden, groups=hidden), "conv2": conv(1, hidden, hidden)}
                for _ in range(n_hidden)
            ],
            "out": conv(1, hidden, 3),
            "disp_emb": lin(2, disp),
        }

    d = 1024
    vit_blocks = []
    for _ in range(5):
        vit_blocks.append({
            "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "qkv": lin(d, 3 * d), "proj": lin(d, d),
            "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "fc1": lin(d, 4 * d), "fc2": lin(4 * d, d),
        })
    return {
        "vgg": init_vgg19_params(key),
        "proj": {s: lin(ci, co) for s, (ci, co) in _PROJ.items()},
        "gp_pos_conv": lin(2, GP_DIM),
        "embed_blocks": vit_blocks,
        "embed_out": lin(d, CLS_RES**2 + 1),
        "refiners": {
            s: refiner(ci, h, disp)
            for s, (ci, h, disp, _r) in _REFINERS.items()
        },
        "dinov2": dinov2.init_params(key, depth=dinov2_depth),
    }


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _grid(h, w, dtype=jnp.float32):
    """Half-pixel normalized coordinate grid (h, w, 2) in (x, y) order."""
    ys = (jnp.arange(h, dtype=dtype) + 0.5) / h * 2.0 - 1.0
    xs = (jnp.arange(w, dtype=dtype) + 0.5) / w * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def _grid_sample(fmap, coords):
    """torch grid_sample(align_corners=False, zeros) equivalent.
    fmap (H, W, C); coords (..., 2) normalized. Dense use (the refiners
    sample every output position), so the 4-tap-concat wide-row gather wins."""
    H, W = fmap.shape[:2]
    px = (coords[..., 0] + 1.0) * W / 2.0 - 0.5
    py = (coords[..., 1] + 1.0) * H / 2.0 - 0.5
    return bilinear_sample_zeropad_wide(fmap, jnp.stack([px, py], axis=-1))


def cos_kernel(x, y, T=0.2, eps=1e-6):
    """K(x,y) = exp((cos(x,y) - 1)/T); x (B,N,D), y (B,M,D) -> (B,N,M)."""
    c = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32)
    nx = jnp.linalg.norm(x, axis=-1)[..., None]
    ny = jnp.linalg.norm(y, axis=-1)[:, None, :]
    c = c / (nx * ny + eps)
    return jnp.exp((c - 1.0) / T)


def gp_posterior(params, f1, f2, T=0.2, sigma_noise=0.1):
    """GP match encoder at the coarse scale (no_cov): posterior mean of the
    fourier-embedded image-2 coordinates given feature similarity.
    f1, f2: (B, H, W, C) -> (B, H, W, GP_DIM)."""
    B, H, W, C = f1.shape
    coords = _grid(H, W)  # same grid both images at equal res
    f = jnp.cos(
        8.0 * jnp.pi * (coords @ params["gp_pos_conv"]["w"] + params["gp_pos_conv"]["b"])
    )
    f = jnp.tile(f.reshape(1, H * W, -1), (B, 1, 1))
    x = f1.reshape(B, H * W, C).astype(jnp.float32)
    y = f2.reshape(B, H * W, C).astype(jnp.float32)
    K_xy = cos_kernel(x, y, T)
    K_yy = cos_kernel(y, y, T)
    eye = jnp.eye(H * W, dtype=jnp.float32) * sigma_noise
    # K_yy + sigma*I is SPD: Cholesky halves the factorization cost vs LU
    # and avoids pivoting (sequential and TPU-hostile at this size).
    chol = jax.scipy.linalg.cho_factor(K_yy + eye[None], lower=True)
    sol = jax.scipy.linalg.cho_solve(chol, f)
    mu = jnp.einsum("bnm,bmd->bnd", K_xy, sol, preferred_element_type=jnp.float32)
    return mu.reshape(B, H, W, -1)


def _vit_block_fwd(x, blk, num_heads=8):
    from .dinov2 import _lin, _ln

    B, N, D = x.shape
    hd = D // num_heads
    h = _ln(x, blk["ln1"])
    qkv = _lin(h, blk["qkv"]).reshape(B, N, 3, num_heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) / np.sqrt(hd)
    attn = jax.nn.softmax(sim, -1).astype(x.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, N, D)
    out = _lin(out, blk["proj"])
    if "ls1" in blk:
        out = out * blk["ls1"]
    x = x + out
    h = _ln(x, blk["ln2"])
    h = jax.nn.gelu(_lin(h, blk["fc1"]).astype(jnp.float32), approximate=False)
    h = _lin(h.astype(x.dtype), blk["fc2"])
    if "ls2" in blk:
        h = h * blk["ls2"]
    return x + h


def cls_to_flow_refine(cls_logits):
    """(B, H, W, R*R) anchor logits -> (B, H, W, 2) flow via the local
    5-anchor refinement (reference ``utils.py:328-357``)."""
    B, H, W, C = cls_logits.shape
    res = int(round(np.sqrt(C)))
    lin = jnp.linspace(-1 + 1 / res, 1 - 1 / res, res)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    G = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (C, 2)
    p = jax.nn.softmax(cls_logits, axis=-1)
    mode = jnp.argmax(p, axis=-1)
    idx = jnp.stack(
        [mode - 1, mode, mode + 1, mode - res, mode + res], axis=-1
    ).clip(0, C - 1)
    nb = jnp.take_along_axis(p, idx.reshape(B, H, W, 5), axis=-1)  # (B,H,W,5)
    anchors = G[idx]  # (B, H, W, 5, 2)
    flow = (nb[..., None] * anchors).sum(-2) / nb.sum(-1, keepdims=True)
    return flow


def local_correlation(f1, f2, flow, radius, with_warp=False, gather_dtype=None,
                      impl="auto"):
    """(2r+1)^2 correlation of f1 with f2 sampled around flow targets.
    f1, f2 (H, W, C); flow (H, W, 2) normalized -> (H, W, (2r+1)^2).

    The window taps (reference: ``local_corr`` in RoMa's ConvRefiner) are
    spaced exactly one pixel apart (2r/H over r taps in half-normalized
    coords), so every tap shares the same bilinear fractional weights: we
    gather the (2r+2)^2 integer window once, correlate, and bilinearly
    blend the *scalar* maps. TPU gathers are row-descriptor-bound, so the
    window is fetched as M=2r+2 rows of an x-tap-CONCATENATED map (M*C-wide
    rows) rather than M^2 rows of C — M-fold fewer descriptors for the same
    bytes. Out-of-range taps read zeros from an M-wide zero border (same
    contributions as grid_sample zeros padding; no masks needed).

    ``with_warp=True`` additionally returns the bilinear warp
    ``grid_sample(f2, flow)``, reconstructed from the gathered feature
    window when available (saves the refiner's separate x_hat gather).

    Two implementations, chosen by a static cost model (v5e measured:
    gathers cap at ~84 GB/s; MXU matmul ~25/90 TMAC/s f32/bf16):

    - **feature-window gather**: fetch the M x M x C window per position
      (as M rows of an x-tap-concatenated map) and contract on the VPU.
      Gathered bytes: N * M^2 * C * itemsize.
    - **dense-correlate-then-slice**: compute ALL correlations
      ``f1 @ f2p^T`` on the MXU (flops are cheap), then gather one
      M*Wp-long *scalar* slice per position — a C-fold cut in gathered
      bytes. Wins when the position count is small relative to C
      (the coarse scales).
    """
    H, W, C = f1.shape
    r = radius
    M = 2 * r + 2
    K = 2 * r + 1
    px = (flow[..., 0] + 1.0) * W / 2.0 - 0.5
    py = (flow[..., 1] + 1.0) * H / 2.0 - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[..., None, None]
    fy = (py - y0)[..., None, None]
    offs = np.arange(-r, r + 2)
    N = H * W
    Hp, Wp = H + 2 * M, W + 2 * M
    # v5e measured (profile_roma decode prefixes): dense wins only at the
    # coarsest scale (N~1.2k: 23.6 -> 15.4 ms marginal); at N>=4.9k the
    # chunked dense+slice path measured SLOWER than the window gather
    # despite a favorable FLOP model (s8: 27 vs 12 ms, s4: 84 vs 24 ms).
    v = None
    if impl == "dense" or (impl == "auto" and N <= 1500):
        g = _local_corr_dense(
            f1, f2, x0, y0, r, M, Hp, Wp, gather_dtype
        )
    else:
        # opt-in bf16 gather payload: halving the bytes nearly halves the
        # stage at the gather ceiling; correlation still accumulates f32.
        f2g = f2 if gather_dtype is None else f2.astype(gather_dtype)
        # M-wide zero border: every clipped/rolled access lands on zeros
        f2p = jnp.pad(f2g, ((M, M), (M, M), (0, 0)))
        # cat[y, m, j*C:(j+1)*C] = f2p[y, m + offs[j]] (wraps hit the border)
        cat = jnp.concatenate(
            [jnp.roll(f2p, -int(o), axis=1) for o in offs], axis=-1
        ).reshape(Hp * Wp, M * C)
        bx = jnp.clip(x0 + M, 0, Wp - 1).astype(jnp.int32)
        by = (
            jnp.clip(y0[..., None] + offs[None, None] + M, 0, Hp - 1)
        ).astype(jnp.int32)  # (H, W, M)
        idx = by * Wp + bx[..., None]
        v = cat[idx.reshape(-1)].reshape(H, W, M, M, C)  # (y-tap, x-tap, C)
        g = jnp.einsum(
            "hwc,hwijc->hwij", f1 / np.sqrt(C), v,
            preferred_element_type=jnp.float32,
        )
    corr = (
        (1 - fy) * (1 - fx) * g[:, :, 0:K, 0:K]
        + (1 - fy) * fx * g[:, :, 0:K, 1:K + 1]
        + fy * (1 - fx) * g[:, :, 1:K + 1, 0:K]
        + fy * fx * g[:, :, 1:K + 1, 1:K + 1]
    ).reshape(H, W, K * K)
    if not with_warp:
        return corr
    if v is None:
        x_hat = _grid_sample(f2, flow)
    else:
        # bilinear warp from the window's center 2x2 (offs 0,1 = taps r,r+1)
        wx1 = fx[..., 0, 0, None]
        wy1 = fy[..., 0, 0, None]
        x_hat = (
            (1 - wy1) * (1 - wx1) * v[:, :, r, r]
            + (1 - wy1) * wx1 * v[:, :, r, r + 1]
            + wy1 * (1 - wx1) * v[:, :, r + 1, r]
            + wy1 * wx1 * v[:, :, r + 1, r + 1]
        )
    return corr, x_hat


def _local_corr_dense(f1, f2, x0, y0, r, M, Hp, Wp, dtype):
    """Dense-correlate-then-slice window extraction (see local_correlation).

    Returns g (H, W, M, M) with g[p, dy, dx] = <f1[p], f2[y0-r+dy, x0-r+dx]>
    / sqrt(C), zeros for out-of-range taps. The full correlation matrix is
    chunked over positions to bound HBM (sequential lax.map)."""
    H, W, C = f1.shape
    N = H * W
    f1c = (f1 if dtype is None else f1.astype(dtype)).reshape(N, C)
    f2c = f2 if dtype is None else f2.astype(dtype)
    # M-wide zero border + one extra zero row so every clamped M*Wp-slice
    # stays in bounds without lax.gather's clip moving the window
    f2p = jnp.pad(f2c, ((M, M + 1), (M, M), (0, 0))).reshape(-1, C)
    row = jnp.clip(y0 + (M - r), 0, Hp - M).astype(jnp.int32)
    col = jnp.clip(x0 + (M - r), 0, Wp - M).astype(jnp.int32)
    start = (row * Wp + col).reshape(N)
    MWp = M * Wp

    def chunk_fn(args):
        f1_chunk, start_chunk = args
        cfull = jax.lax.dot_general(
            f1_chunk, f2p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, (Hp+1)*Wp)
        p = f1_chunk.shape[0]
        starts = jnp.stack(
            [jnp.arange(p, dtype=jnp.int32), start_chunk], axis=-1
        )
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        )
        # CLIP, not PROMISE_IN_BOUNDS: a NaN flow value (possible with
        # untrained weights) casts to garbage int32 and a promised OOB
        # access hard-faults the TPU worker; the runtime clamp is free.
        return jax.lax.gather(
            cfull, starts, dnums, slice_sizes=(1, MWp),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (P, MWp)

    cf_bytes = N * (Hp + 1) * Wp * 4
    nch = 1
    while cf_bytes // nch > int(512e6) or N % nch:
        nch += 1
    if nch == 1:
        seg = chunk_fn((f1c, start))
    else:
        seg = jax.lax.map(
            chunk_fn,
            (f1c.reshape(nch, N // nch, C), start.reshape(nch, N // nch)),
        ).reshape(N, MWp)
    return seg.reshape(H, W, M, Wp)[:, :, :, :M] / np.sqrt(C)


def conv_refiner_fwd(p, f1, f2, flow, scale: str, scale_factor=1.0,
                     compute_dtype="float32", corr_dtype=None):
    """One refinement step at a scale (reference ConvRefiner.forward).

    ``compute_dtype='bfloat16'`` runs the depthwise/1x1 conv stack and the
    feature gathers in bf16 (flow coordinates and the output head stay f32)
    — the refiners are HBM/VPU-bound at the fine scales, so halving the
    traffic is nearly a 2x on TPU."""
    B, H, W, C = f1.shape
    _ci, _h, _disp, radius = _REFINERS[scale]
    cdt = jnp.dtype(compute_dtype)
    if cdt != jnp.float32:
        f1 = f1.astype(cdt)
        f2 = f2.astype(cdt)
        p = {
            **jax.tree.map(
                lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x,
                {k: v for k, v in p.items() if k != "out"},
            ),
            "out": p["out"],
        }

    def per_image(x, y, fl):
        if radius is not None:
            # one windowed gather yields both the correlation volume and
            # the bilinear warp (center taps)
            corr, x_hat = local_correlation(
                x, y, fl, radius, with_warp=True, gather_dtype=corr_dtype
            )
        else:
            x_hat = _grid_sample(y, fl)
        coords = _grid(H, W)
        disp = fl - coords
        emb = (40 / 32 * scale_factor * disp) @ p["disp_emb"]["w"].astype(
            jnp.float32
        ) + p["disp_emb"]["b"].astype(jnp.float32)
        parts = [x, x_hat.astype(x.dtype), emb.astype(x.dtype)]
        if radius is not None:
            parts.append(corr.astype(x.dtype))
        d = jnp.concatenate(parts, axis=-1)
        return d

    d = jax.vmap(per_image)(f1, f2, flow)

    def block(x, bp, dw):
        groups = x.shape[-1] if dw else 1
        k = bp["conv1"]["w"].shape[0]
        pad = (k - 1) // 2
        h = jax.lax.conv_general_dilated(
            x, bp["conv1"]["w"], (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        ) + bp["conv1"]["b"]
        h = jax.nn.relu(h)
        return jax.lax.conv_general_dilated(
            h, bp["conv2"]["w"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bp["conv2"]["b"]

    blocks = [p["block1"]] + list(p["hidden"])
    use_pallas = (
        cdt == jnp.float32
        # measured on v5e: 2-3x for C=24 (scale 1); C=144 (scale 2) is
        # better served by the XLA conv pair
        and _h <= 64
        and jax.default_backend() == "tpu"
        and all(bp["conv1"]["w"].shape[:2] == (5, 5) for bp in blocks)
    )
    if use_pallas:
        # small-C dw stacks run far off roofline in XLA (see
        # ops/pallas_refiner.py); the fused kernel keeps lanes full
        from ..ops.pallas_refiner import refiner_dw_stack

        x = refiner_dw_stack(
            d,
            jnp.stack([bp["conv1"]["w"] for bp in blocks]),
            jnp.stack([bp["conv1"]["b"] for bp in blocks]),
            jnp.stack([bp["conv2"]["w"] for bp in blocks]),
            jnp.stack([bp["conv2"]["b"] for bp in blocks]),
        )
    else:
        x = block(d, p["block1"], dw=True)
        for bp in p["hidden"]:
            x = block(x, bp, dw=True)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["out"]["w"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["out"]["b"]
    return out[..., :2], out[..., 2:3]  # displacement, certainty


# ---------------------------------------------------------------------------
# Full matcher
# ---------------------------------------------------------------------------

def _resize(x, hw):
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), "linear")


def decode(params, f1_pyr, f2_pyr, scales=SCALES, flow=None, certainty=None,
           scale_factor=1.0, compute_dtype="float32", corr_dtype=None,
           with_cert16=False):
    """Coarse-to-fine warp decoding (reference Decoder.forward).

    ``with_cert16=True`` additionally returns the scale-16 certainty (after
    that scale's refiner), which the reference uses for certainty
    attenuation of the final output (matcher.py:758-768,808-810)."""
    sizes = {s: f1_pyr[s].shape[1:3] for s in f1_pyr}
    coarsest = scales[0]
    B = f1_pyr[coarsest].shape[0]
    if flow is None:
        h, w = sizes[coarsest]
        flow = jnp.tile(_grid(h, w)[None], (B, 1, 1, 1))
        certainty = jnp.zeros((B, h, w, 1), jnp.float32)
    else:
        flow = _resize(flow, sizes[coarsest])
        certainty = _resize(certainty, sizes[coarsest])

    for s in scales:
        f1_s = f1_pyr[s] @ params["proj"][s]["w"] + params["proj"][s]["b"]
        f2_s = f2_pyr[s] @ params["proj"][s]["w"] + params["proj"][s]["b"]
        if s == "16":
            gp = gp_posterior(params, f1_s, f2_s)
            tokens = jnp.concatenate([gp, f1_s], axis=-1)
            h, w = tokens.shape[1:3]
            t = tokens.reshape(B, h * w, -1)
            for blk in params["embed_blocks"]:
                t = _vit_block_fwd(t, blk)
            out = t @ params["embed_out"]["w"] + params["embed_out"]["b"]
            out = out.reshape(B, h, w, -1)
            cls_logits, certainty = out[..., :-1], out[..., -1:]
            flow = cls_to_flow_refine(cls_logits)
        ins = int(s)
        delta_flow, delta_cert = conv_refiner_fwd(
            params["refiners"][s], f1_s, f2_s, flow, s, scale_factor,
            compute_dtype=compute_dtype, corr_dtype=corr_dtype,
        )
        # displacement is normalized by the FULL (scale-1) resolution at
        # every scale (reference matcher.py:384,464-470: h, w = sizes[1];
        # delta / (refine_init * w)), not the per-scale feature size
        h1, w1 = sizes["1"]
        disp = ins * jnp.stack(
            [delta_flow[..., 0] / (4 * w1), delta_flow[..., 1] / (4 * h1)],
            axis=-1,
        )
        flow = flow + disp
        certainty = certainty + delta_cert
        if s == "16":
            cert16 = certainty
        if s != "1":
            nxt = str(ins // 2)
            flow = _resize(flow, sizes[nxt])
            certainty = _resize(certainty, sizes[nxt])
    if with_cert16:
        return flow, certainty, cert16
    return flow, certainty


def build_pyramid(params, images, use_dino=True, compute_dtype="bfloat16"):
    """images (B, H, W, 3) in [0,1] -> {scale: (B, h, w, c)} pyramid."""
    from .vgg_refiner import IMAGENET_MEAN, IMAGENET_STD

    x = (images - IMAGENET_MEAN) / IMAGENET_STD
    feats = vgg19_features(params["vgg"], x)  # scales [1, 2, 4, 8]
    pyr = {"1": feats[0], "2": feats[1], "4": feats[2], "8": feats[3]}
    if use_dino:
        B, H, W, _ = images.shape
        tokens = dinov2.forward_features(
            params["dinov2"], x, compute_dtype=compute_dtype
        )
        hp, wp = H // 14, W // 14
        pyr["16"] = tokens.reshape(B, hp, wp, -1)
    return pyr


def _attenuate(cert, cert16):
    """Reference certainty attenuation (matcher.py:758-768,808-810):
    interpolate the scale-16 certainty to the output resolution, keep only
    its negative part scaled by 0.5, and subtract from the final logits."""
    low = _resize(cert16, cert.shape[1:3])
    return cert - 0.5 * low * (low < 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "compute_dtype", "decoder_dtype", "corr_dtype",
        "attenuate_cert", "with_cert16",
    ),
)
def match_pair_impl(params, imA, imB, compute_dtype="bfloat16",
                    decoder_dtype="float32", corr_dtype=None,
                    attenuate_cert=False, with_cert16=False):
    """Symmetric dense matching at the model resolution.

    imA/imB (B, H, W, 3) with H, W multiples of 56 (14 and 8 divisible).
    Returns (warpAB, certA, warpBA, certB) at scale-1 resolution with
    normalized coordinates. ``with_cert16=True`` appends the scale-16
    certainties (certA16, certB16) for a following upsample pass to
    attenuate with; ``attenuate_cert=True`` applies the attenuation here
    (the no-upsample configuration)."""
    B = imA.shape[0]
    if imA.dtype == jnp.uint8:
        imA = imA.astype(jnp.float32) / 255.0
    if imB.dtype == jnp.uint8:
        imB = imB.astype(jnp.float32) / 255.0
    both = jnp.concatenate([imA, imB], axis=0)
    pyr = build_pyramid(params, both, compute_dtype=compute_dtype)
    f_q = pyr
    f_s = {s: jnp.concatenate([v[B:], v[:B]], axis=0) for s, v in pyr.items()}
    flow, cert, cert16 = decode(
        params, f_q, f_s, compute_dtype=decoder_dtype, corr_dtype=corr_dtype,
        with_cert16=True,
    )
    if attenuate_cert and not with_cert16:
        cert = _attenuate(cert, cert16)
    if with_cert16:
        return (flow[:B], cert[:B], flow[B:], cert[B:],
                cert16[:B], cert16[B:])
    return flow[:B], cert[:B], flow[B:], cert[B:]


match_pair = match_pair_impl


@functools.partial(
    jax.jit, static_argnames=("scale_factor", "compute_dtype", "corr_dtype")
)
def match_pair_upsample(
    params, imA_hr, imB_hr, flow_ab, cert_ab, flow_ba, cert_ba,
    scale_factor: float = 1.0, compute_dtype: str = "float32",
    corr_dtype=None, cert16_ab=None, cert16_ba=None,
):
    """Second refinement pass at the upsample resolution (reference
    ``RegressionMatcher.match`` upsample_preds path): VGG-only pyramid
    (scales 8..1), decoding seeded by the coarse-pass warp/certainty.
    imA_hr/imB_hr: (B, H', W', 3) with H', W' multiples of 8.
    ``cert16_ab/ba``: coarse-pass scale-16 certainties; when given, the
    reference's certainty attenuation subtracts their interpolated negative
    part from the final logits (matcher.py:758-768,808-810)."""
    B = imA_hr.shape[0]
    if imA_hr.dtype == jnp.uint8:
        imA_hr = imA_hr.astype(jnp.float32) / 255.0
    if imB_hr.dtype == jnp.uint8:
        imB_hr = imB_hr.astype(jnp.float32) / 255.0
    both = jnp.concatenate([imA_hr, imB_hr], axis=0)
    pyr = build_pyramid(params, both, use_dino=False)
    f_q = pyr
    f_s = {s: jnp.concatenate([v[B:], v[:B]], axis=0) for s, v in pyr.items()}
    flow = jnp.concatenate([flow_ab, flow_ba], axis=0)
    cert = jnp.concatenate([cert_ab, cert_ba], axis=0)
    flow, cert = decode(
        params, f_q, f_s, scales=["8", "4", "2", "1"],
        flow=flow, certainty=cert, scale_factor=scale_factor,
        compute_dtype=compute_dtype, corr_dtype=corr_dtype,
    )
    if cert16_ab is not None:
        cert16 = jnp.concatenate([cert16_ab, cert16_ba], axis=0)
        cert = _attenuate(cert, cert16)
    return flow[:B], cert[:B], flow[B:], cert[B:]


def sample_matches(
    warp_ab, cert_ab, warp_ba, cert_ba, key,
    num: int = 5000, sample_thresh: float = 0.05,
):
    """Threshold-balanced sampling (reference ``RegressionMatcher.sample``):
    certainties clamp to 1 above the threshold, 4x candidates drawn by
    certainty-weighted sampling without replacement (gumbel top-k), then
    rebalanced by inverse KDE density. Host-side numpy/JAX mix (one-shot per
    pair, not a hot loop). Returns (matches (num, 4) normalized, certainty)."""
    H, W = cert_ab.shape[:2]
    grid = np.asarray(_grid(H, W))
    m_ab = np.concatenate([grid, np.asarray(warp_ab)], axis=-1).reshape(-1, 4)
    m_ba = np.concatenate([np.asarray(warp_ba), grid], axis=-1).reshape(-1, 4)
    matches = np.concatenate([m_ab, m_ba], axis=0)
    cert = np.concatenate(
        [np.asarray(cert_ab).reshape(-1), np.asarray(cert_ba).reshape(-1)]
    )
    cert = 1.0 / (1.0 + np.exp(-cert))  # logits -> probs
    # out-of-range warps carry no mass; coordinates clamp to the image
    # (reference matcher.py:830-833)
    oob = (np.abs(matches[:, 2:]) > 1).any(axis=1) | (np.abs(matches[:, :2]) > 1).any(axis=1)
    cert[oob] = 0.0
    matches = np.clip(matches, -1.0, 1.0)
    cert_s = cert.copy()
    cert_s[cert_s > sample_thresh] = 1.0
    n_cand = min(4 * num, len(cert_s))
    # gumbel top-k == multinomial without replacement
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    g = rng.gumbel(size=len(cert_s))
    scores = np.log(np.maximum(cert_s, 1e-12)) + g
    cand = np.argpartition(-scores, n_cand - 1)[:n_cand]
    good = matches[cand]
    good_cert = cert_s[cand]
    # KDE balancing
    sub = good[rng.choice(len(good), size=min(len(good), 4000), replace=False)]
    d2 = ((good[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    density = np.exp(-d2 / (2 * 0.1**2)).sum(-1) * (len(good) / len(sub))
    p = 1.0 / (density + 1.0)
    p[density < 10] = 1e-7
    g2 = rng.gumbel(size=len(p))
    k = min(num, len(p))
    sel = np.argpartition(-(np.log(np.maximum(p, 1e-12)) + g2), k - 1)[:k]
    return good[sel], good_cert[sel]


@functools.partial(jax.jit, static_argnames=("num", "sample_thresh"))
def sample_matches_device(
    warp_ab, cert_ab, warp_ba, cert_ba, key,
    num: int = 5000, sample_thresh: float = 0.05,
):
    """Device-side :func:`sample_matches` (same math, JAX RNG): gumbel
    top-k candidate draw + inverse-KDE rebalance entirely on device, so a
    pair downloads (num, 4) matches (~80 KB) instead of the full-resolution
    warp/certainty maps (~24 MB at 864px). The KDE distance matrix is
    computed as |a|^2 + |b|^2 - 2ab^T (one MXU matmul). Stochastic outputs
    differ from the numpy version only through the RNG stream."""
    H, W = cert_ab.shape[:2]
    grid = _grid(H, W)
    m_ab = jnp.concatenate([grid, warp_ab], axis=-1).reshape(-1, 4)
    m_ba = jnp.concatenate([warp_ba, grid], axis=-1).reshape(-1, 4)
    matches = jnp.concatenate([m_ab, m_ba], axis=0)
    cert = jnp.concatenate([cert_ab.reshape(-1), cert_ba.reshape(-1)])
    cert = jax.nn.sigmoid(cert)
    oob = (
        (jnp.abs(matches[:, 2:]) > 1).any(axis=1)
        | (jnp.abs(matches[:, :2]) > 1).any(axis=1)
    )
    cert = jnp.where(oob, 0.0, cert)
    matches = jnp.clip(matches, -1.0, 1.0)
    cert_s = jnp.where(cert > sample_thresh, 1.0, cert)
    n_cand = min(4 * num, int(cert_s.shape[0]))
    k1, k2, k3 = jax.random.split(key, 3)
    g = jax.random.gumbel(k1, cert_s.shape)
    _, cand = jax.lax.top_k(jnp.log(jnp.maximum(cert_s, 1e-12)) + g, n_cand)
    good = matches[cand]
    good_cert = cert_s[cand]
    n_sub = min(n_cand, 4000)
    sub = good[jax.random.choice(k2, n_cand, (n_sub,), replace=False)]
    d2 = (
        (good**2).sum(-1)[:, None]
        + (sub**2).sum(-1)[None, :]
        - 2.0 * good @ sub.T
    )
    density = jnp.exp(-d2 / (2 * 0.1**2)).sum(-1) * (n_cand / n_sub)
    p = 1.0 / (density + 1.0)
    p = jnp.where(density < 10, 1e-7, p)
    g2 = jax.random.gumbel(k3, p.shape)
    k = min(num, int(p.shape[0]))
    _, sel = jax.lax.top_k(jnp.log(jnp.maximum(p, 1e-12)) + g2, k)
    return good[sel], good_cert[sel]


def to_pixel_coordinates(matches, H_A, W_A, H_B, W_B):
    kA = np.stack(
        [W_A / 2 * (matches[:, 0] + 1), H_A / 2 * (matches[:, 1] + 1)], -1
    )
    kB = np.stack(
        [W_B / 2 * (matches[:, 2] + 1), H_B / 2 * (matches[:, 3] + 1)], -1
    )
    return kA, kB
