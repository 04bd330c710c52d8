"""SE2-LoFTR: rotation-equivariant LoFTR (Bökman & Kahl, CVPRW'22).

Reference: ``thirdparty/se2loftr/src/loftr/backbone/resnet_e2.py:50-174``
(``E2_ResNetFPN_8_2``) + the standard LoFTR coarse/fine modules with
``configs/loftr/outdoor/loftr_ds_e2_dense_8rot.py`` (C8 rotations,
``E2_SAME_NBR_FILTERS=True`` -> regular-field channel counts
[16, 24, 32] x 8 = [128, 192, 256]).

TPU-native design: e2cnn's steerable ``R2Conv``/``InnerBatchNorm`` modules
are, at inference, exactly plain convolutions whose expanded filters satisfy
the C8 equivariance constraint — e2cnn ships ``.export()`` to produce that
plain-torch form. We implement the *exported* network: standard NHWC convs
with folded BNs, ReLU (the e2 backbone uses ReLU, not the standard
backbone's LeakyReLU), an extra 3x3 regular->trivial projection on the
coarse output (``layer3triv``), and the same FPN wiring; the coarse/fine
transformer and dual-softmax matching are shared with ``models/loftr.py``.
Equivariance lives in the weights, so the exported form is mathematically
identical to the steerable form. Converting the published ``8rot.ckpt``
requires a one-time ``model.export()`` with e2cnn installed (see
``scripts/convert_weights.py``); the converter here consumes that exported
state dict.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .loftr import (
    D_COARSE,
    D_FINE,
    NHEAD,
    _conv,
    coarse_match,
    fine_refine,
    sine_pos_encoding,
    transformer,
)

Params = Dict

# C8, same-filter-count variant: regular fields per stage and the resulting
# plain-conv channel counts (block_dims // 8 fields x 8 rotations).
N_ROT = 8
SE2_CHANNELS = [128, 192, 256]  # (128//8, 196//8, 256//8) * 8
TRIV_COARSE = 256  # layer3triv output (block_dims[2] trivial fields)
TRIV_FINE = 128    # layer1_outconv2 output (block_dims[0] trivial fields)


def _e2_layer_specs() -> Dict[str, tuple]:
    """(n_in_fields, in_repr_size, n_out_fields, out_repr_size, k) per R2Conv
    of the 8-rotation E2_ResNetFPN_8_2 (reference ``resnet_e2.py:51-137``
    with initial_dim=128, block_dims=[128,196,256], N=8,
    e2_same_nbr_filters=True -> regular fields [16, 24, 32])."""
    f1, f2, f3 = 16, 24, 32
    N = N_ROT
    specs = {
        "backbone.conv1": (1, 1, f1, N, 7),
        "backbone.layer3_outconv": (f3, N, f3, N, 1),
        "backbone.layer3triv": (f3, N, TRIV_COARSE, 1, 3),
        "backbone.layer2_outconv": (f2, N, f3, N, 1),
        "backbone.layer2_outconv2.0": (f3, N, f3, N, 3),
        "backbone.layer2_outconv2.3": (f3, N, f2, N, 3),
        "backbone.layer1_outconv": (f1, N, f2, N, 1),
        "backbone.layer1_outconv2.0": (f2, N, f2, N, 3),
        "backbone.layer1_outconv2.3": (f2, N, TRIV_FINE, 1, 3),
    }
    stage_fields = {1: (f1, f1), 2: (f1, f2), 3: (f2, f3)}
    for stage, (fi, fo) in stage_fields.items():
        for b in range(2):
            ci = fi if b == 0 else fo
            specs[f"backbone.layer{stage}.{b}.conv1"] = (ci, N, fo, N, 3)
            specs[f"backbone.layer{stage}.{b}.conv2"] = (fo, N, fo, N, 3)
        if stage > 1:
            specs[f"backbone.layer{stage}.0.downsample.0"] = (fi, N, fo, N, 1)
    return specs


def _expand_r2conv(sd: Dict, prefix: str, spec: tuple) -> np.ndarray:
    """Expand one e2cnn R2Conv to a plain (out, in, k, k) conv filter.

    Three sources, most exact first:
    1. a cached ``<prefix>.filter`` buffer (present when the checkpoint was
       saved in eval mode) — used verbatim;
    2. the basis coefficients ``<prefix>.weights`` combined with the
       persistent ``sampled_basis`` buffer(s) of the module's
       BlocksBasisExpansion — ``filter = einsum(coeff, sampled_basis)``,
       reassembled with field-major channel order (e2cnn FieldType layout);
    uniform field types per layer (true for this backbone) mean exactly one
    basis block per conv.
    """
    nf_in, s_in, nf_out, s_out, k = spec
    cached = sd.get(f"{prefix}.filter")
    if cached is not None:
        return np.asarray(cached, np.float32).reshape(
            nf_out * s_out, nf_in * s_in, k, k
        )
    w = np.asarray(sd[f"{prefix}.weights"], np.float32).reshape(-1)
    blocks = [
        v for key, v in sd.items()
        if key.startswith(f"{prefix}.basisexpansion")
        and key.endswith("sampled_basis")
    ]
    if len(blocks) != 1:
        raise KeyError(
            f"{prefix}: expected 1 sampled_basis buffer, found {len(blocks)} "
            "(non-uniform field types are not supported)"
        )
    basis = np.asarray(blocks[0], np.float32)  # (dim, s_out, s_in, k*k)
    dim = basis.shape[0]
    if basis.shape[1:] != (s_out, s_in, k * k):
        raise ValueError(
            f"{prefix}: sampled_basis shape {basis.shape} does not match "
            f"spec (*, {s_out}, {s_in}, {k * k})"
        )
    n_pairs = w.size // dim
    if n_pairs != nf_out * nf_in:
        raise ValueError(
            f"{prefix}: {w.size} coefficients / dim {dim} = {n_pairs} pairs, "
            f"expected {nf_out}*{nf_in}"
        )
    coeff = w.reshape(nf_out, nf_in, dim)
    block = np.einsum("oid,dabq->oiabq", coeff, basis)
    # (nf_out, nf_in, s_out, s_in, k*k) -> (nf_out*s_out, nf_in*s_in, k, k)
    full = block.transpose(0, 2, 1, 3, 4).reshape(
        nf_out * s_out, nf_in * s_in, k, k
    )
    return full


def export_e2cnn_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """Convert the published 8rot.ckpt (e2cnn modules) to the plain-conv
    "exported" form WITHOUT e2cnn installed — the numpy equivalent of a
    one-time ``model.export()``. R2Conv filters expand from the checkpoint's
    own persistent ``sampled_basis`` buffers; InnerBatchNorm's per-FIELD
    statistics (shared across the repr's rotation channels — that sharing is
    what makes BN equivariant) repeat across each field's repr size."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("matcher.", "", 1) if k.startswith("matcher.") else k
        sd[k] = np.asarray(v)

    out: Dict[str, np.ndarray] = {}
    specs = _e2_layer_specs()
    for prefix, spec in specs.items():
        out[f"{prefix}.weight"] = _expand_r2conv(sd, prefix, spec)

    # InnerBatchNorm -> BatchNorm2d (field stats repeated across repr size)
    bn_sizes = {
        "backbone.bn1": N_ROT,
        "backbone.layer2_outconv2.1": N_ROT,
        "backbone.layer1_outconv2.1": N_ROT,
    }
    for stage in (1, 2, 3):
        for b in range(2):
            bn_sizes[f"backbone.layer{stage}.{b}.bn1"] = N_ROT
            bn_sizes[f"backbone.layer{stage}.{b}.bn2"] = N_ROT
        if stage > 1:
            bn_sizes[f"backbone.layer{stage}.0.downsample.1"] = N_ROT
    for prefix, s in bn_sizes.items():
        for stat in ("weight", "bias", "running_mean", "running_var"):
            keys = [
                k for k in sd
                if k.startswith(f"{prefix}.") and k.endswith(f".{stat}")
                and "batch_norm" in k
            ]
            if len(keys) != 1:
                raise KeyError(
                    f"{prefix}: expected 1 InnerBatchNorm '{stat}' buffer, "
                    f"found {keys}"
                )
            out[f"{prefix}.{stat}"] = np.repeat(np.asarray(sd[keys[0]]), s)

    # plain (non-equivariant) transformer / matching modules pass through
    consumed_prefixes = ("backbone.",)
    for k, v in sd.items():
        if not k.startswith(consumed_prefixes):
            out[k] = v
    return out


def _is_e2cnn_state_dict(sd) -> bool:
    return any(
        k.endswith(".weights") or "basisexpansion" in k or "batch_norm" in k
        for k in sd
    )


def params_from_torch(state_dict) -> Params:
    """Convert SE2-LoFTR weights: the published e2cnn 8rot.ckpt directly
    (basis expansion done here in numpy, no e2cnn needed) or an already
    ``export()``-ed checkpoint."""
    sd = {k: v for k, v in state_dict.items()}
    if _is_e2cnn_state_dict(sd):
        sd = export_e2cnn_state_dict(sd)
    return params_from_exported_torch(sd)


def params_from_exported_torch(state_dict) -> Params:
    """Convert an e2cnn-``export()``-ed SE2-LoFTR checkpoint (plain Conv2d /
    BatchNorm2d modules with the original attribute names)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("matcher.", "", 1) if k.startswith("matcher.") else k
        sd[k] = np.asarray(v)

    def cw(key):
        return sd[key].transpose(2, 3, 1, 0)

    def folded(conv_key, bn_key):
        w = cw(f"{conv_key}.weight")
        b = sd.get(f"{conv_key}.bias")
        g, beta = sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"]
        mean, var = sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"]
        s = g / np.sqrt(var + 1e-5)
        wf = w * s[None, None, None, :]
        bf = ((b if b is not None else 0.0) - mean) * s + beta
        return {"w": jnp.asarray(wf, jnp.float32), "b": jnp.asarray(bf, jnp.float32)}

    def conv(key, bias=False):
        out = {"w": jnp.asarray(cw(f"{key}.weight"), jnp.float32)}
        if bias and f"{key}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{key}.bias"], jnp.float32)
        return out

    def block(prefix):
        p = {
            "conv1": folded(f"{prefix}.conv1", f"{prefix}.bn1"),
            "conv2": folded(f"{prefix}.conv2", f"{prefix}.bn2"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            p["down"] = folded(f"{prefix}.downsample.0", f"{prefix}.downsample.1")
        return p

    from .loftr import params_from_torch as _loftr_from_torch

    # transformer / fine modules share the LoFTR layout — reuse its converter
    # on a state dict stripped of the backbone keys
    rest = {k: v for k, v in sd.items() if not k.startswith("backbone.")}
    # give it a dummy standard backbone so the shared converter runs
    trans = _loftr_from_torch({**rest, **_dummy_standard_backbone()})
    params: Params = {
        "backbone": {
            "conv1": folded("backbone.conv1", "backbone.bn1"),
            "layer1": [block(f"backbone.layer1.{i}") for i in range(2)],
            "layer2": [block(f"backbone.layer2.{i}") for i in range(2)],
            "layer3": [block(f"backbone.layer3.{i}") for i in range(2)],
            "l3_out": conv("backbone.layer3_outconv"),
            "l3_triv": conv("backbone.layer3triv"),
            "l2_out": conv("backbone.layer2_outconv"),
            "l2_out2a": folded("backbone.layer2_outconv2.0", "backbone.layer2_outconv2.1"),
            "l2_out2b": conv("backbone.layer2_outconv2.3", bias=True),
            "l1_out": conv("backbone.layer1_outconv"),
            "l1_out2a": folded("backbone.layer1_outconv2.0", "backbone.layer1_outconv2.1"),
            "l1_out2b": conv("backbone.layer1_outconv2.3", bias=True),
        },
        "coarse": trans["coarse"],
        "fine_pre": trans["fine_pre"],
        "fine": trans["fine"],
    }
    return params


def _dummy_standard_backbone():
    """Minimal fake standard-LoFTR backbone tensors so the shared converter
    can be reused for the transformer part."""
    import numpy as np

    out = {}

    def conv(key, ci, co, k, bias=False):
        out[f"{key}.weight"] = np.zeros((co, ci, k, k), np.float32)
        if bias:
            out[f"{key}.bias"] = np.zeros((co,), np.float32)

    def bn(key, c):
        out[f"{key}.weight"] = np.ones((c,), np.float32)
        out[f"{key}.bias"] = np.zeros((c,), np.float32)
        out[f"{key}.running_mean"] = np.zeros((c,), np.float32)
        out[f"{key}.running_var"] = np.ones((c,), np.float32)

    conv("backbone.conv1", 1, 8, 7); bn("backbone.bn1", 8)
    for li, (ci, co) in enumerate([(8, 8), (8, 8), (8, 8)]):
        for bi in range(2):
            p = f"backbone.layer{li + 1}.{bi}"
            conv(f"{p}.conv1", ci, co, 3); bn(f"{p}.bn1", co)
            conv(f"{p}.conv2", co, co, 3); bn(f"{p}.bn2", co)
    conv("backbone.layer3_outconv", 8, 8, 1)
    conv("backbone.layer2_outconv", 8, 8, 1)
    conv("backbone.layer2_outconv2.0", 8, 8, 3); bn("backbone.layer2_outconv2.1", 8)
    conv("backbone.layer2_outconv2.3", 8, 8, 3, bias=True)
    conv("backbone.layer1_outconv", 8, 8, 1)
    conv("backbone.layer1_outconv2.0", 8, 8, 3); bn("backbone.layer1_outconv2.1", 8)
    conv("backbone.layer1_outconv2.3", 8, 8, 3, bias=True)
    return out


def init_params(key: jax.Array) -> Params:
    """Random init with the 8rot shapes (tests)."""
    from .loftr import init_params as _loftr_init

    rng = np.random.default_rng(3)

    def conv(kh, kw, ci, co, bias=True):
        w = rng.normal(0, np.sqrt(2.0 / (ci * kh * kw)), (kh, kw, ci, co))
        out = {"w": jnp.asarray(w, jnp.float32)}
        if bias:
            out["b"] = jnp.zeros((co,), jnp.float32)
        return out

    def block(ci, co, down=False):
        p = {"conv1": conv(3, 3, ci, co), "conv2": conv(3, 3, co, co)}
        if down:
            p["down"] = conv(1, 1, ci, co)
        return p

    c1, c2, c3 = SE2_CHANNELS
    base = _loftr_init(key)
    base["backbone"] = {
        "conv1": conv(7, 7, 1, c1),
        "layer1": [block(c1, c1), block(c1, c1)],
        "layer2": [block(c1, c2, down=True), block(c2, c2)],
        "layer3": [block(c2, c3, down=True), block(c3, c3)],
        "l3_out": conv(1, 1, c3, c3, False),
        "l3_triv": conv(3, 3, c3, TRIV_COARSE, False),
        "l2_out": conv(1, 1, c2, c3, False),
        "l2_out2a": conv(3, 3, c3, c3),
        "l2_out2b": conv(3, 3, c3, c2, True),
        "l1_out": conv(1, 1, c1, c2, False),
        "l1_out2a": conv(3, 3, c2, c2),
        "l1_out2b": conv(3, 3, c2, TRIV_FINE, True),
    }
    return base


def _block_fwd(x, p, stride):
    # reference resnet_e2.py:38-47: relu(bn1(conv1)) -> bn2(conv2) -> relu(x+y)
    y = jax.nn.relu(_conv(x, p["conv1"], stride))
    y = _conv(y, p["conv2"])
    sc = _conv(x, p["down"], stride) if "down" in p else x
    return jax.nn.relu(sc + y)


def backbone_forward(params, images):
    """images (B, H, W, 1) -> (coarse (B, H/8, W/8, 256),
    fine (B, H/2, W/2, 128)). Reference ``resnet_e2.py:148-172`` — note ReLU
    (not LeakyReLU) in the FPN out-convs and the extra ``layer3triv``
    regular->trivial projection on the coarse branch."""
    from ..ops.deform import upsample_bilinear_align

    bp = params["backbone"]
    x0 = jax.nn.relu(_conv(images, bp["conv1"], stride=2))
    x1 = _block_fwd(x0, bp["layer1"][0], 1)
    x1 = _block_fwd(x1, bp["layer1"][1], 1)
    x2 = _block_fwd(x1, bp["layer2"][0], 2)
    x2 = _block_fwd(x2, bp["layer2"][1], 1)
    x3 = _block_fwd(x2, bp["layer3"][0], 2)
    x3 = _block_fwd(x3, bp["layer3"][1], 1)

    x3_out = _conv(x3, bp["l3_out"])
    x3_up = upsample_bilinear_align(x3_out, 2).astype(x3_out.dtype)
    x2_out = _conv(x2, bp["l2_out"])
    x2_out = _conv(
        jax.nn.relu(_conv(x2_out + x3_up, bp["l2_out2a"])), bp["l2_out2b"]
    )
    x2_up = upsample_bilinear_align(x2_out, 2).astype(x2_out.dtype)
    x1_out = _conv(x1, bp["l1_out"])
    x1_out = _conv(
        jax.nn.relu(_conv(x1_out + x2_up, bp["l1_out2a"])), bp["l1_out2b"]
    )
    x3_inv = _conv(x3_out, bp["l3_triv"])
    return x3_inv, x1_out


def match_pair_impl(
    params: Params,
    images0: jnp.ndarray,
    images1: jnp.ndarray,
    max_matches: int = 2048,
    threshold: float = 0.2,
) -> Dict[str, jnp.ndarray]:
    """Full SE2-LoFTR matching — the transformer / coarse / fine stages are
    the shared LoFTR implementation (temp_bug_fix=True per the 8rot config)."""
    B = images0.shape[0]
    if images0.dtype == jnp.uint8:
        images0 = images0.astype(jnp.float32) / 255.0
    if images1.dtype == jnp.uint8:
        images1 = images1.astype(jnp.float32) / 255.0
    fc0_map, ff0 = backbone_forward(params, images0)
    fc1_map, ff1 = backbone_forward(params, images1)
    h0c, w0c = fc0_map.shape[1:3]
    h1c, w1c = fc1_map.shape[1:3]

    pe0 = sine_pos_encoding(h0c, w0c, D_COARSE, True)
    pe1 = sine_pos_encoding(h1c, w1c, D_COARSE, True)
    fc0 = (fc0_map + pe0[None]).reshape(B, h0c * w0c, D_COARSE)
    fc1 = (fc1_map + pe1[None]).reshape(B, h1c * w1c, D_COARSE)
    fc0, fc1 = transformer(fc0, fc1, params["coarse"], None, None, NHEAD)

    i_ids, j_ids, conf, valid = coarse_match(
        fc0, fc1, (h0c, w0c), (h1c, w1c), max_matches, threshold
    )
    offsets1 = fine_refine(
        params, ff0, ff1, fc0, fc1, i_ids, j_ids, valid, (h0c, w0c), (h1c, w1c)
    )
    x0 = (i_ids % w0c).astype(jnp.float32) * 8.0
    y0 = (i_ids // w0c).astype(jnp.float32) * 8.0
    x1 = (j_ids % w1c).astype(jnp.float32) * 8.0 + offsets1[..., 0] * 2.0
    y1 = (j_ids // w1c).astype(jnp.float32) * 8.0 + offsets1[..., 1] * 2.0
    kpts0 = jnp.where(valid[..., None], jnp.stack([x0, y0], -1), 0.0)
    kpts1 = jnp.where(valid[..., None], jnp.stack([x1, y1], -1), 0.0)
    return {
        "keypoints0": kpts0,
        "keypoints1": kpts1,
        "confidence": jnp.where(valid, conf, 0.0),
        "mask": valid,
    }


match_pair = jax.jit(match_pair_impl, static_argnames=("max_matches", "threshold"))
