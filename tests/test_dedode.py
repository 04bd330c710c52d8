"""DeDoDe / shared VGG-refiner golden tests vs the vendored torch code."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

DEDODE_DIR = "/root/reference/src/deep_image_matching/thirdparty/DeDoDe/DeDoDe"


@pytest.fixture(scope="module")
def ref_decoder():
    # the module imports torchvision but only uses torch for these classes
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    spec = importlib.util.spec_from_file_location("ref_dedode_dec", f"{DEDODE_DIR}/decoder.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else max(p.shape[0], 1)
            p.copy_(torch.randn(p.shape, generator=g) * (2.0 / max(fan_in, 1)) ** 0.5)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return net


def test_conv_refiner_parity(ref_decoder):
    from deep_image_matching_tpu.models.vgg_refiner import (
        refiner_forward, refiner_params_from_torch,
    )

    net = _randomize(
        ref_decoder.ConvRefiner(
            64, 32, 17, hidden_blocks=3, residual=True, amp=False
        ).eval()
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 12, 16)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    sd = {f"r.{k}": v.numpy() for k, v in net.state_dict().items()}
    p = refiner_params_from_torch(sd, "r")
    got = np.asarray(
        refiner_forward(jnp.asarray(x.transpose(0, 2, 3, 1)), p, residual=True)
    )
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_dedode_detect_and_describe_shapes():
    from deep_image_matching_tpu.models import dedode as dd

    det = dd.init_detector_params(jax.random.PRNGKey(0))
    desc = dd.init_descriptor_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    kpts, conf, valid = dd.detect(det, jnp.asarray(img), num_keypoints=128)
    assert kpts.shape == (1, 128, 2)
    k = np.asarray(kpts)[0]
    assert (k[:, 0] < 64).all() and (k[:, 1] < 64).all()
    c = np.asarray(conf)[0]
    assert (c >= 0).all() and c.sum() <= 1.01  # softmax mass

    d = dd.describe(desc, jnp.asarray(img), kpts)
    d = np.asarray(d)[0]
    assert d.shape == (128, 256)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
