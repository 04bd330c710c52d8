"""XFeat JAX vs torch reference parity (random weights)."""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

REF_MODEL = (
    "/root/reference/src/deep_image_matching/thirdparty/accelerated_features/"
    "modules/model.py"
)


@pytest.fixture(scope="module")
def ref_xfeat_model():
    spec = importlib.util.spec_from_file_location("ref_xfeat_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else p.shape[0]
            p.copy_(torch.randn(p.shape, generator=g) * (2.0 / max(fan_in, 1)) ** 0.5)
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return net


def test_xfeat_dense_parity(ref_xfeat_model):
    from deep_image_matching_tpu.models.xfeat import dense_forward, params_from_torch

    net = _randomize(ref_xfeat_model.XFeatModel().eval())
    rng = np.random.default_rng(0)
    img = rng.random((1, 1, 64, 96), dtype=np.float64).astype(np.float32) * 255

    with torch.no_grad():
        feats_t, kpts_t, heat_t = net(torch.from_numpy(img))
    params = params_from_torch(net.state_dict())
    feats_j, kpts_j, heat_j = dense_forward(
        params, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(feats_j).transpose(0, 3, 1, 2), feats_t.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(kpts_j).transpose(0, 3, 1, 2), kpts_t.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(heat_j).transpose(0, 3, 1, 2), heat_t.numpy(), atol=1e-4
    )


def test_xfeat_extract_shapes(ref_xfeat_model):
    from deep_image_matching_tpu.models.xfeat import extract, params_from_torch

    net = _randomize(ref_xfeat_model.XFeatModel().eval(), seed=1)
    params = params_from_torch(net.state_dict())
    rng = np.random.default_rng(1)
    img = rng.random((2, 96, 128, 1)).astype(np.float32) * 255
    out = extract(
        params, jnp.asarray(img), jnp.asarray([[96, 128]] * 2, np.int32),
        top_k=256, detection_threshold=0.01,
    )
    assert out["keypoints"].shape == (2, 256, 2)
    m = np.asarray(out["mask"])
    assert m.any()
    descs = np.asarray(out["descriptors"])[0][m[0]]
    np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0, atol=1e-4)
    # keypoints inside the image
    k = np.asarray(out["keypoints"])[0][m[0]]
    assert (k[:, 0] < 128).all() and (k[:, 1] < 96).all()
