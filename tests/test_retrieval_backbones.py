"""Golden tests for the DIR (bottleneck ResNet + GeM) and OpenIBL
(VGG16 + NetVLAD) retrieval converters against hand-built torch references
(torchvision-style layouts; random weights, eval-mode BN)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.weight.shape), dtype=torch.float32))
        bn.bias.copy_(torch.tensor(rng.normal(0, 0.1, bn.bias.shape), dtype=torch.float32))
        bn.running_mean.copy_(torch.tensor(rng.normal(0, 0.1, bn.running_mean.shape), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.running_var.shape), dtype=torch.float32))


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * self.expansion
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


def test_resnet_gem_converter_parity():
    from deep_image_matching_tpu.models.retrieval import (
        resnet_gem_descriptor, resnet_gem_params_from_torch,
    )

    rng = np.random.default_rng(0)
    stages = [(2, 8, 1), (2, 16, 2)]  # tiny bottleneck net, same topology

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 8, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(8)
            cin = 8
            for si, (n, planes, s) in enumerate(stages):
                blocks = []
                for bi in range(n):
                    blocks.append(_Bottleneck(cin, planes, s if bi == 0 else 1))
                    cin = planes * 4
                setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))
            self.whiten = nn.Linear(cin, 16)
            self.register_parameter("gem_p", None)

        def forward(self, x, p=3.0):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.max_pool2d(x, 3, 2, 1)
            for si in range(len(stages)):
                x = getattr(self, f"layer{si + 1}")(x)
            v = x.clamp(min=1e-6).pow(p).mean(dim=(2, 3)).pow(1.0 / p)
            v = F.normalize(v, dim=-1)
            v = self.whiten(v)
            return F.normalize(v, dim=-1)

    net = Net().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.tensor(
                    rng.normal(0, 1.0 / np.sqrt(np.prod(m.weight.shape[1:])),
                               m.weight.shape), dtype=torch.float32))
            elif isinstance(m, nn.BatchNorm2d):
                _randomize_bn(m, rng)
            elif isinstance(m, nn.Linear):
                m.weight.copy_(torch.tensor(
                    rng.normal(0, 0.05, m.weight.shape), dtype=torch.float32))
                m.bias.copy_(torch.tensor(
                    rng.normal(0, 0.05, m.bias.shape), dtype=torch.float32))

    x = rng.normal(0, 1, (2, 3, 64, 48)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy()

    params = resnet_gem_params_from_torch(
        net.state_dict(),
        stages=[(n, p_ * 4, s) for (n, p_, s) in stages],
    )
    got = np.asarray(resnet_gem_descriptor(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        stages=[(n, p_ * 4, s) for (n, p_, s) in stages],
    ))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_openibl_netvlad_converter_parity():
    from deep_image_matching_tpu.models.retrieval import (
        netvlad_aggregate, openibl_params_from_torch, vgg16_features,
    )

    rng = np.random.default_rng(1)
    K, D = 8, 512

    # torch reference NetVLAD (OpenIBL layout: conv soft-assign + centroids,
    # input-normalized features, intra-norm then global L2)
    class NetVLAD(nn.Module):
        def __init__(self):
            super().__init__()
            self.centroids = nn.Parameter(torch.tensor(
                rng.normal(0, 0.1, (K, D)), dtype=torch.float32))
            self.conv = nn.Conv2d(D, K, 1)

        def forward(self, x):  # (B, D, H, W)
            B = x.shape[0]
            x = F.normalize(x, p=2, dim=1)
            soft = F.softmax(self.conv(x).view(B, K, -1), dim=1)  # (B, K, N)
            xf = x.view(B, D, -1)  # (B, D, N)
            agg = torch.einsum("bkn,bdn->bkd", soft, xf)
            vlad = agg - soft.sum(-1)[..., None] * self.centroids[None]
            vlad = F.normalize(vlad, p=2, dim=2)
            v = vlad.view(B, -1)
            return F.normalize(v, p=2, dim=1)

    nv = NetVLAD().eval()
    with torch.no_grad():
        nv.conv.weight.copy_(torch.tensor(
            rng.normal(0, 0.5, nv.conv.weight.shape), dtype=torch.float32))
        nv.conv.bias.copy_(torch.tensor(
            rng.normal(0, 0.1, nv.conv.bias.shape), dtype=torch.float32))

    feats = rng.normal(0, 1, (2, D, 4, 5)).astype(np.float32)
    with torch.no_grad():
        ref = nv(torch.tensor(feats)).numpy()

    sd = {f"net_vlad.{k}": v for k, v in nv.state_dict().items()}
    # minimal fake VGG16 weights so the converter's backbone pass succeeds
    from deep_image_matching_tpu.models.retrieval import _VGG16_CFG
    idx, cin = 0, 3
    for c in _VGG16_CFG:
        if c == "M":
            idx += 1
            continue
        sd[f"base_model.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (c, cin, 3, 3)), dtype=torch.float32)
        sd[f"base_model.{idx}.bias"] = torch.zeros(c)
        cin = c
        idx += 2
    params = openibl_params_from_torch(sd)
    got = np.asarray(netvlad_aggregate(
        jnp.asarray(feats.transpose(0, 2, 3, 1)),
        params["centers"], params["assign_w"], assign_b=params["assign_b"],
    ))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # backbone converted too: one forward through vgg16_features works
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(vgg16_features(params, jnp.asarray(img)))
    assert out.shape == (1, 4, 4, 512) and np.isfinite(out).all()
