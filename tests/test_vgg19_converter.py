"""Lock the VGG19-bn converter layer indices against a structurally
identical torch Sequential (torchvision itself is unavailable offline)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

# vgg19_bn 'E' configuration up to features[:40]
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M"]


def _build_torch_vgg19bn_features():
    layers = []
    cin = 3
    for c in _CFG:
        if c == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers += [
                torch.nn.Conv2d(cin, c, 3, padding=1),
                torch.nn.BatchNorm2d(c),
                torch.nn.ReLU(inplace=True),
            ]
            cin = c
    return torch.nn.Sequential(*layers)


def test_vgg19_features_parity():
    from deep_image_matching_tpu.models.vgg_refiner import (
        VGG19_CONV_IDX, vgg19_features, vgg19_params_from_torch,
    )

    net = _build_torch_vgg19bn_features().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in net.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) * (1.0 / max(fan_in, 1)) ** 0.5)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)

    # torch layer indices must equal the converter's table
    conv_idx = [
        i for i, m in enumerate(net) if isinstance(m, torch.nn.Conv2d)
    ]
    assert conv_idx == [i for stage in VGG19_CONV_IDX for i in stage]

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 32, 48)).astype(np.float32)
    feats_ref = []
    with torch.no_grad():
        t = torch.from_numpy(x)
        for layer in net:
            if isinstance(layer, torch.nn.MaxPool2d):
                feats_ref.append(t.numpy())
            t = layer(t)

    sd = {f"encoder.layers.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = vgg19_params_from_torch(sd)
    feats = vgg19_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats) == 4
    for got, ref in zip(feats, feats_ref):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4
        )


def test_keynet_pipeline_end_to_end(project_dir):
    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.image_matching import ImageMatcher
    from deep_image_matching_tpu.io.h5 import list_h5_names

    cfg = Config(
        args={
            "dir": str(project_dir),
            "pipeline": "keynetaffnethardnet+kornia_matcher",
            "strategy": "bruteforce",
            "quality": "lowest",
            "skip_reconstruction": True,
            "force": True,
        }
    )
    cfg.extractor["n_features"] = 256
    m = ImageMatcher(cfg)
    feature_path, match_path = m.run()
    assert len(list_h5_names(feature_path)) >= 3
