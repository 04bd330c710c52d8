"""SE2-LoFTR: exported-form backbone parity + full match smoke.

The torch reference below is the e2cnn-``export()``-ed form of
``E2_ResNetFPN_8_2`` (reference resnet_e2.py:50-174): plain Conv2d/BatchNorm2d
with the same attribute names and wiring, which is what our converter
consumes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

C1, C2, C3 = 32, 48, 64  # scaled-down field channels (multiples of 8)


class _Block(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class _E2BackboneExported(nn.Module):
    def __init__(self, triv_coarse=64, triv_fine=32):
        super().__init__()
        self.conv1 = nn.Conv2d(1, C1, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(C1)
        self.layer1 = nn.Sequential(_Block(C1, C1), _Block(C1, C1))
        self.layer2 = nn.Sequential(_Block(C1, C2, 2), _Block(C2, C2))
        self.layer3 = nn.Sequential(_Block(C2, C3, 2), _Block(C3, C3))
        self.layer3_outconv = nn.Conv2d(C3, C3, 1, bias=False)
        self.layer3triv = nn.Conv2d(C3, triv_coarse, 3, 1, 1, bias=False)
        self.layer2_outconv = nn.Conv2d(C2, C3, 1, bias=False)
        self.layer2_outconv2 = nn.Sequential(
            nn.Conv2d(C3, C3, 3, 1, 1, bias=False), nn.BatchNorm2d(C3),
            nn.ReLU(), nn.Conv2d(C3, C2, 3, 1, 1, bias=False),
        )
        self.layer1_outconv = nn.Conv2d(C1, C2, 1, bias=False)
        self.layer1_outconv2 = nn.Sequential(
            nn.Conv2d(C2, C2, 3, 1, 1, bias=False), nn.BatchNorm2d(C2),
            nn.ReLU(), nn.Conv2d(C2, triv_fine, 3, 1, 1, bias=False),
        )

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_up = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_up)
        x2_up = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_up)
        return self.layer3triv(x3_out), x1_out


def _randomize(net, rng):
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.tensor(
                    rng.normal(0, 1.0 / np.sqrt(np.prod(m.weight.shape[1:])),
                               m.weight.shape), dtype=torch.float32))
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, m.weight.shape), dtype=torch.float32))
                m.bias.copy_(torch.tensor(rng.normal(0, 0.1, m.bias.shape), dtype=torch.float32))
                m.running_mean.copy_(torch.tensor(rng.normal(0, 0.1, m.running_mean.shape), dtype=torch.float32))
                m.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, m.running_var.shape), dtype=torch.float32))



def _build_torch_transformer_sd():
    """Minimal plain-transformer tensors so the shared converter path runs."""
    full = {}
    for prefix, d in [("loftr_coarse", 256), ("loftr_fine", 128)]:
        n = 8 if prefix == "loftr_coarse" else 2
        for i in range(n):
            p = f"{prefix}.layers.{i}"
            for name, shape in [("q_proj", (d, d)), ("k_proj", (d, d)),
                                ("v_proj", (d, d)), ("merge", (d, d)),
                                ("mlp.0", (2 * d, 2 * d)), ("mlp.2", (d, 2 * d))]:
                full[f"{p}.{name}.weight"] = np.zeros(shape, np.float32)
            for name in ("norm1", "norm2"):
                full[f"{p}.{name}.weight"] = np.ones((d,), np.float32)
                full[f"{p}.{name}.bias"] = np.zeros((d,), np.float32)
    full["fine_preprocess.down_proj.weight"] = np.zeros((128, 256), np.float32)
    full["fine_preprocess.down_proj.bias"] = np.zeros((128,), np.float32)
    full["fine_preprocess.merge_feat.weight"] = np.zeros((128, 256), np.float32)
    full["fine_preprocess.merge_feat.bias"] = np.zeros((128,), np.float32)
    return full


def test_se2_backbone_converter_parity():
    from deep_image_matching_tpu.models import se2loftr

    rng = np.random.default_rng(0)
    net = _E2BackboneExported().eval()
    _randomize(net, rng)

    x = rng.normal(0, 1, (1, 1, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref_c, ref_f = (t.numpy() for t in net(torch.tensor(x)))

    sd = {f"backbone.{k}": v for k, v in net.state_dict().items()}
    # minimal transformer tensors so the shared converter path runs
    import deep_image_matching_tpu.models.loftr as loftr

    base = loftr.init_params(jax.random.PRNGKey(0))
    params = {"backbone": None, "coarse": base["coarse"],
              "fine_pre": base["fine_pre"], "fine": base["fine"]}
    # convert only the backbone through the real converter (build a full sd)
    full = dict(sd)
    for prefix, d, dffn in [("loftr_coarse", 256, 256), ("loftr_fine", 128, 128)]:
        n = 8 if prefix == "loftr_coarse" else 2
        for i in range(n):
            p = f"{prefix}.layers.{i}"
            for name, shape in [("q_proj", (d, d)), ("k_proj", (d, d)),
                                ("v_proj", (d, d)), ("merge", (d, d)),
                                ("mlp.0", (2 * d, 2 * d)), ("mlp.2", (d, 2 * d))]:
                full[f"{p}.{name}.weight"] = np.zeros(shape, np.float32)
            for name in ("norm1", "norm2"):
                full[f"{p}.{name}.weight"] = np.ones((d,), np.float32)
                full[f"{p}.{name}.bias"] = np.zeros((d,), np.float32)
    full["fine_preprocess.down_proj.weight"] = np.zeros((128, 256), np.float32)
    full["fine_preprocess.down_proj.bias"] = np.zeros((128,), np.float32)
    full["fine_preprocess.merge_feat.weight"] = np.zeros((128, 256), np.float32)
    full["fine_preprocess.merge_feat.bias"] = np.zeros((128,), np.float32)

    conv = se2loftr.params_from_exported_torch(full)
    got_c, got_f = se2loftr.backbone_forward(
        conv, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got_c), ref_c.transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_f), ref_f.transpose(0, 2, 3, 1), atol=2e-4
    )


def test_se2_match_pair_smoke():
    """Full SE2-LoFTR forward on a synthetic translated pair produces
    finite, in-bounds matches."""
    from deep_image_matching_tpu.models import se2loftr

    params = se2loftr.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 1, (80, 112)).astype(np.float32)
    img0 = base[:64, :96][None, :, :, None]
    img1 = base[8:72, 8:104][None, :, :, None]
    out = se2loftr.match_pair_impl(
        params, jnp.asarray(img0), jnp.asarray(img1),
        max_matches=64, threshold=0.0,
    )
    k0 = np.asarray(out["keypoints0"])
    mask = np.asarray(out["mask"])
    assert np.isfinite(k0).all()
    assert mask.any()
    assert (k0[mask] >= 0).all() and (k0[mask][:, 0] < 96).all()


# ---------------------------------------------------------------------------
# Direct e2cnn checkpoint conversion (no export step)
# ---------------------------------------------------------------------------

def _synthetic_e2cnn_backbone(seed=0, with_cached_filter=False):
    """A state dict shaped like the published 8rot.ckpt backbone: R2Conv
    modules store basis `weights` + persistent `sampled_basis` buffers;
    InnerBatchNorm stores per-FIELD statistics."""
    from deep_image_matching_tpu.models.se2loftr import _e2_layer_specs

    rng = np.random.default_rng(seed)
    sd = {}
    dim = 5
    for prefix, (nf_in, s_in, nf_out, s_out, k) in _e2_layer_specs().items():
        basis = rng.normal(size=(dim, s_out, s_in, k * k)).astype(np.float32)
        w = rng.normal(size=(nf_out * nf_in * dim,)).astype(np.float32)
        sd[f"{prefix}.weights"] = w
        sd[
            f"{prefix}.basisexpansion.block_expansion_('regular', 'regular')"
            ".sampled_basis"
        ] = basis
        if with_cached_filter:
            coeff = w.reshape(nf_out, nf_in, dim)
            block = np.einsum("oid,dabq->oiabq", coeff, basis)
            sd[f"{prefix}.filter"] = block.transpose(0, 2, 1, 3, 4).reshape(
                nf_out * s_out, nf_in * s_in, k, k
            )
    bn_prefixes = ["backbone.bn1", "backbone.layer2_outconv2.1",
                   "backbone.layer1_outconv2.1"]
    from deep_image_matching_tpu.models.se2loftr import _e2_layer_specs as specs
    for stage in (1, 2, 3):
        for b in range(2):
            bn_prefixes += [f"backbone.layer{stage}.{b}.bn1",
                            f"backbone.layer{stage}.{b}.bn2"]
        if stage > 1:
            bn_prefixes.append(f"backbone.layer{stage}.0.downsample.1")
    # field counts per bn: look up the conv feeding it
    feed = {
        "backbone.bn1": "backbone.conv1",
        "backbone.layer2_outconv2.1": "backbone.layer2_outconv2.0",
        "backbone.layer1_outconv2.1": "backbone.layer1_outconv2.0",
    }
    for stage in (1, 2, 3):
        for b in range(2):
            feed[f"backbone.layer{stage}.{b}.bn1"] = f"backbone.layer{stage}.{b}.conv1"
            feed[f"backbone.layer{stage}.{b}.bn2"] = f"backbone.layer{stage}.{b}.conv2"
        if stage > 1:
            feed[f"backbone.layer{stage}.0.downsample.1"] = (
                f"backbone.layer{stage}.0.downsample.0"
            )
    table = _e2_layer_specs()
    for bn in bn_prefixes:
        nf = table[feed[bn]][2]
        sd[f"{bn}.batch_norm_[8].weight"] = rng.random(nf).astype(np.float32) + 0.5
        sd[f"{bn}.batch_norm_[8].bias"] = rng.normal(size=nf).astype(np.float32)
        sd[f"{bn}.batch_norm_[8].running_mean"] = rng.normal(size=nf).astype(np.float32)
        sd[f"{bn}.batch_norm_[8].running_var"] = rng.random(nf).astype(np.float32) + 0.5
        sd[f"{bn}.batch_norm_[8].num_batches_tracked"] = np.array(100)
    return sd


def test_e2cnn_expansion_matches_naive():
    """The vectorized basis expansion must equal a direct nested-loop
    reference for every layer of the backbone."""
    from deep_image_matching_tpu.models.se2loftr import (
        _e2_layer_specs, _expand_r2conv,
    )

    sd = _synthetic_e2cnn_backbone(seed=1)
    table = _e2_layer_specs()
    for prefix in ["backbone.conv1", "backbone.layer2.0.conv1",
                   "backbone.layer3triv", "backbone.layer1_outconv"]:
        nf_in, s_in, nf_out, s_out, k = table[prefix]
        got = _expand_r2conv(sd, prefix, table[prefix])
        dim = 5
        w = sd[f"{prefix}.weights"].reshape(nf_out, nf_in, dim)
        basis = [v for key, v in sd.items()
                 if key.startswith(f"{prefix}.basisexpansion")][0]
        want = np.zeros((nf_out * s_out, nf_in * s_in, k, k), np.float32)
        for of in range(nf_out):
            for inf in range(nf_in):
                blk = np.zeros((s_out, s_in, k * k), np.float32)
                for d in range(dim):
                    blk += w[of, inf, d] * basis[d]
                want[of * s_out:(of + 1) * s_out,
                     inf * s_in:(inf + 1) * s_in] = blk.reshape(s_out, s_in, k, k)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_e2cnn_cached_filter_path_equals_basis_path():
    from deep_image_matching_tpu.models.se2loftr import export_e2cnn_state_dict

    sd_basis = _synthetic_e2cnn_backbone(seed=2, with_cached_filter=False)
    sd_cached = _synthetic_e2cnn_backbone(seed=2, with_cached_filter=True)
    a = export_e2cnn_state_dict(sd_basis)
    b = export_e2cnn_state_dict(sd_cached)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_e2cnn_bn_field_stats_repeat():
    from deep_image_matching_tpu.models.se2loftr import export_e2cnn_state_dict

    sd = _synthetic_e2cnn_backbone(seed=3)
    out = export_e2cnn_state_dict(sd)
    g = out["backbone.bn1.weight"]
    assert g.shape == (16 * 8,)
    # repeated per field: each field's 8 rotation channels share one gamma
    np.testing.assert_array_equal(g.reshape(16, 8), np.tile(g[::8][:, None], (1, 8)))


def test_e2cnn_full_checkpoint_conversion_runs_model():
    """params_from_torch on an e2cnn-style ckpt (backbone) + plain
    transformer keys must produce params the jax model runs with."""
    from deep_image_matching_tpu.models import se2loftr as se2

    sd = _synthetic_e2cnn_backbone(seed=4)
    # synthesize the plain transformer part from a random exported ckpt:
    # reuse the existing test-module state dict via the exported-form route
    exported = se2.export_e2cnn_state_dict(sd)
    # the exported backbone must slot into params_from_exported_torch
    # together with transformer keys; build those with the torch test modules
    tm = _build_torch_transformer_sd()
    full = {**exported, **tm}
    params = se2.params_from_exported_torch(full)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 1)), jnp.float32)
    feats = se2.backbone_forward(params, x)
    assert feats[0].shape[0] == 1
