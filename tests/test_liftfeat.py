"""LiftFeat golden tests vs the vendored torch model (random weights)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

LF_DIR = "/root/reference/src/deep_image_matching/thirdparty/liftfeat"


@pytest.fixture(scope="module")
def ref_liftfeat():
    # model.py does relative imports (..utils.featurebooster); import as pkg
    import importlib

    pkg_root = "/root/reference/src/deep_image_matching/thirdparty"
    if pkg_root not in sys.path:
        sys.path.insert(0, pkg_root)
    return importlib.import_module("liftfeat.models.model")


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else max(p.shape[0], 1)
            # tame scale: LeakyReLU + BN chains amplify fp noise otherwise
            p.copy_(torch.randn(p.shape, generator=g) * (0.5 / max(fan_in, 1)) ** 0.5)
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return net


def test_liftfeat_dense_and_boost_parity(ref_liftfeat):
    from liftfeat.utils.config import featureboost_config

    from deep_image_matching_tpu.models.liftfeat import (
        dense_forward, feature_boost, params_from_torch,
    )
    from deep_image_matching_tpu.models.xfeat import _space_to_depth

    net = ref_liftfeat.LiftFeatSPModel(
        featureboost_config, use_kenc=False, use_normal=True, use_cross=True
    ).eval()
    _randomize(net)
    sd = net.state_dict()

    rng = np.random.default_rng(0)
    img = rng.random((1, 1, 64, 96), dtype=np.float64).astype(np.float32)
    with torch.no_grad():
        des_t, kpt_t, nrm_t = net.forward1(torch.from_numpy(img))
        boost_t = net.forward2(des_t, kpt_t, nrm_t).numpy()

    params = params_from_torch(sd)
    des_j, kpt_j, nrm_j = dense_forward(
        params, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(des_j).transpose(0, 3, 1, 2), des_t.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(kpt_j).transpose(0, 3, 1, 2), kpt_t.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(nrm_j).transpose(0, 3, 1, 2), nrm_t.numpy(), atol=2e-3
    )

    n192 = np.concatenate(
        [
            np.asarray(_space_to_depth(np.asarray(nrm_j)[..., c:c + 1], 8))
            for c in range(3)
        ],
        axis=-1,
    )
    Hc, Wc = des_j.shape[1:3]
    boost_j = np.asarray(
        feature_boost(
            params,
            jnp.asarray(np.asarray(des_j)[0].reshape(Hc * Wc, -1)),
            jnp.asarray(n192[0].reshape(Hc * Wc, -1)),
        )
    )
    np.testing.assert_allclose(boost_j, boost_t, atol=5e-3)


def test_liftfeat_extract_shapes(ref_liftfeat):
    from liftfeat.utils.config import featureboost_config

    from deep_image_matching_tpu.models.liftfeat import extract, params_from_torch

    net = ref_liftfeat.LiftFeatSPModel(
        featureboost_config, use_kenc=False, use_normal=True, use_cross=True
    ).eval()
    _randomize(net, seed=1)
    params = params_from_torch(net.state_dict())
    rng = np.random.default_rng(1)
    img = rng.random((1, 96, 128, 1)).astype(np.float32)
    out = extract(
        params, jnp.asarray(img), jnp.asarray([[96, 128]], np.int32),
        top_k=256, detection_threshold=0.001,
    )
    m = np.asarray(out["mask"][0])
    assert m.any()
    d = np.asarray(out["descriptors"][0])[m]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
