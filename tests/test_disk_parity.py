"""DISK converter + forward parity vs a torch implementation of the
published topology.

kornia (the reference's DISK backend, ``thirdparty/hloc/extractors/disk.py``)
is not installable offline, so the source-of-truth torch module here is a
re-implementation of the same thin U-Net (jatentaki ``unets``: pre-activation
InstanceNorm->PReLU->Conv5x5 blocks, avg-pool down, bilinear up) with
kornia-style Sequential key naming. This validates that
``params_from_torch`` maps a real state-dict layout correctly and that the
JAX forward computes the same function; it cannot validate the topology
reconstruction itself (tracked in docs/status.md).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deep_image_matching_tpu.models import disk as disk_jax

pytestmark = pytest.mark.slow

DOWN = disk_jax.DOWN
UP = disk_jax.UP


class _Conv(nn.Sequential):
    """Pre-activation block: InstanceNorm -> PReLU -> (NoOp dropout) -> Conv."""

    def __init__(self, in_, out_, gated=True):
        mods = []
        if gated:
            mods += [nn.InstanceNorm2d(in_, affine=False), nn.PReLU(in_)]
        mods += [nn.Identity(), nn.Conv2d(in_, out_, 5, padding=2, bias=True)]
        super().__init__(*mods)


class _TorchDisk(nn.Module):
    def __init__(self, first_gate: bool):
        super().__init__()
        self.path_down = nn.ModuleList()
        cin = 3
        for i, co in enumerate(DOWN):
            self.path_down.append(_Conv(cin, co, gated=(i > 0 or first_gate)))
            cin = co
        self.path_up = nn.ModuleList()
        for skip, co in zip(DOWN[-2::-1], UP):
            self.path_up.append(_Conv(cin + skip, co))
            cin = co

    def forward(self, x):
        skips = []
        for i, blk in enumerate(self.path_down):
            if i > 0:
                x = F.avg_pool2d(x, 2)
            x = blk(x)
            skips.append(x)
        for i, blk in enumerate(self.path_up):
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
            x = blk(torch.cat([x, skips[len(DOWN) - 2 - i]], dim=1))
        return x


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return model


@pytest.mark.parametrize("first_gate", [True, False])
def test_disk_converter_and_forward_parity(first_gate):
    tm = _randomize(_TorchDisk(first_gate), seed=3 + first_gate).eval()
    params = disk_jax.params_from_torch(tm.state_dict())
    # converter detected the first-block gate layout from the checkpoint
    assert (params["down"][0]["prelu"] is not None) == first_gate
    assert all(p["prelu"] is not None for p in params["down"][1:] + params["up"])

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (2, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(img).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    desc, heat = disk_jax.dense_forward(params, jnp.asarray(img))
    got = np.concatenate([np.asarray(desc), np.asarray(heat)[..., None]], -1)
    assert got.shape == ref.shape == (2, 64, 80, 129)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_disk_param_count_matches_published():
    # DISK is published as ~1.1M parameters; the fully-gated layout is
    # 1,092,165 — a structural check on the reconstructed topology.
    tm = _TorchDisk(first_gate=True)
    n = sum(p.numel() for p in tm.parameters())
    assert 1_050_000 < n < 1_150_000, n


def test_disk_extract_full_resolution():
    """Keypoints live in full input-resolution coordinates (the decoder
    restores H x W; a truncated decoder would halve the coordinate range)."""
    params = disk_jax.init_params(jax.random.PRNGKey(0))
    img = np.zeros((1, 64, 96, 3), np.float32)
    img[0, 40:44, 70:74] = 1.0  # feature in the lower-right quadrant
    out = disk_jax.extract(
        params, jnp.asarray(img), jnp.asarray([[64, 96]], np.int32), max_keypoints=128
    )
    kpts = np.asarray(out["keypoints"][0])[np.asarray(out["mask"][0])]
    assert kpts.size and kpts[:, 0].max() > 48 and kpts[:, 1].max() > 32
    assert kpts[:, 0].max() < 96 and kpts[:, 1].max() < 64

def test_disk_converter_rejects_residue():
    """Strict manifest: any checkpoint tensor the topology does not consume
    aborts the load (a different kornia/DISK variant must not half-load)."""
    tm = _randomize(_TorchDisk(first_gate=True), seed=9).eval()
    sd = {k: v.clone() for k, v in tm.state_dict().items()}

    extra = dict(sd)
    extra["extra_head.weight"] = torch.randn(7)
    with pytest.raises(ValueError, match="[Rr]esidue"):
        disk_jax.params_from_torch(extra)

    # affine InstanceNorms (1-d weights that are NOT gates for these convs)
    affine = dict(sd)
    affine["path_down.2.0.weight"] = torch.randn(123)
    with pytest.raises(ValueError):
        disk_jax.params_from_torch(affine)


def test_disk_converter_rejects_wrong_conv_count():
    tm = _randomize(_TorchDisk(first_gate=True), seed=9).eval()
    sd = {k: v.clone() for k, v in tm.state_dict().items()}
    sd["tail.conv.weight"] = torch.randn(4, 4, 3, 3)
    with pytest.raises(ValueError, match="conv layers"):
        disk_jax.params_from_torch(sd)

    short = {k: v for k, v in sd.items() if "path_up.3" not in k and "tail" not in k}
    with pytest.raises(ValueError, match="conv layers"):
        disk_jax.params_from_torch(short)


def test_disk_converter_strips_uniform_wrapper_prefix():
    tm = _randomize(_TorchDisk(first_gate=False), seed=4).eval()
    wrapped = {f"model.{k}": v.clone() for k, v in tm.state_dict().items()}
    params = disk_jax.params_from_torch(wrapped)
    assert [p["w"].shape[3] for p in params["down"]] == DOWN
