"""KeyNet learned-response parity and detection tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from deep_image_matching_tpu.models import keynet as kn  # noqa: E402

pytestmark = pytest.mark.slow


def _torch_spatial_gradient(x):
    """kornia spatial_gradient: normalized sobel, replicate padding."""
    kx = torch.tensor(
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=torch.float32
    ) / 8.0
    ky = kx.t().contiguous()
    b, c, h, w = x.shape
    xp = F.pad(x.reshape(b * c, 1, h, w), (1, 1, 1, 1), mode="replicate")
    dx = F.conv2d(xp, kx[None, None]).reshape(b, c, h, w)
    dy = F.conv2d(xp, ky[None, None]).reshape(b, c, h, w)
    return dx, dy


def _torch_handcrafted(x):
    dx, dy = _torch_spatial_gradient(x)
    dxx, dxy = _torch_spatial_gradient(dx)
    _, dyy = _torch_spatial_gradient(dy)
    return torch.cat(
        [dx, dy, dx**2, dy**2, dx * dy, dxy, dxy**2, dxx, dyy, dxx * dyy], 1
    )


def _torch_pyrdown(x, factor):
    k1 = torch.tensor([1.0, 4.0, 6.0, 4.0, 1.0])
    kernel = (torch.outer(k1, k1) / 256.0).float()
    b, c, h, w = x.shape
    xp = F.pad(x.reshape(b * c, 1, h, w), (2, 2, 2, 2), mode="reflect")
    blurred = F.conv2d(xp, kernel[None, None]).reshape(b, c, h, w)
    return F.interpolate(
        blurred, size=(int(h / factor), int(w / factor)), mode="bilinear",
        align_corners=False,
    )


def _make_torch_state_dict(seed=0):
    """Synthetic checkpoint in kornia KeyNet naming (conv+BN Sequentials)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    dims = [(10, 8), (8, 8), (8, 8)]
    for i, (ci, co) in enumerate(dims):
        p = f"feature_extractor.lb_block.{i}"
        sd[f"{p}.0.weight"] = torch.randn(co, ci, 5, 5, generator=g) * 0.2
        sd[f"{p}.0.bias"] = torch.randn(co, generator=g) * 0.1
        sd[f"{p}.1.weight"] = torch.rand(co, generator=g) + 0.5
        sd[f"{p}.1.bias"] = torch.randn(co, generator=g) * 0.1
        sd[f"{p}.1.running_mean"] = torch.randn(co, generator=g) * 0.1
        sd[f"{p}.1.running_var"] = torch.rand(co, generator=g) + 0.5
    sd["last_conv.0.weight"] = torch.randn(1, 24, 5, 5, generator=g) * 0.2
    sd["last_conv.0.bias"] = torch.randn(1, generator=g) * 0.1
    return sd


def _torch_keynet_forward(sd, x):
    """Reference forward (kornia feature/keynet.py KeyNet.forward)."""

    def block(x):
        feats = _torch_handcrafted(x)
        for i in range(3):
            p = f"feature_extractor.lb_block.{i}"
            feats = F.conv2d(feats, sd[f"{p}.0.weight"], sd[f"{p}.0.bias"],
                             padding=2)
            feats = F.batch_norm(
                feats, sd[f"{p}.1.running_mean"], sd[f"{p}.1.running_var"],
                sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], training=False,
            )
            feats = F.relu(feats)
        return feats

    shape = x.shape
    feats = [block(x)]
    cur = x
    for _ in range(1, 3):
        cur = _torch_pyrdown(cur, 1.2)
        fi = block(cur)
        feats.append(
            F.interpolate(fi, size=shape[2:], mode="bilinear",
                          align_corners=False)
        )
    cat = torch.cat(feats, 1)
    out = F.conv2d(cat, sd["last_conv.0.weight"], sd["last_conv.0.bias"],
                   padding=2)
    return F.relu(out)


def test_keynet_response_parity():
    sd = _make_torch_state_dict()
    params = kn.keynet_params_from_torch(sd)
    rng = np.random.default_rng(0)
    img = rng.random((2, 48, 64)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_keynet_forward(sd, torch.from_numpy(img)[:, None])
    got = np.asarray(kn.keynet_response(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, ref.numpy()[:, 0], rtol=2e-4, atol=2e-5)


def test_keynet_multiscale_detect_shapes():
    params = kn.init_keynet_params()
    rng = np.random.default_rng(1)
    img = rng.random((1, 96, 128)).astype(np.float32)
    kpts, scores, sig, valid = kn.keynet_multiscale_detect(
        params, jnp.asarray(img), jnp.asarray([[96, 128]], np.int32),
        max_keypoints=128,
    )
    kpts, scores, valid = map(np.asarray, (kpts, scores, valid))
    assert kpts.shape == (1, 128, 2)
    m = valid[0]
    assert m.sum() > 0
    assert kpts[0][m][:, 0].max() < 128 and kpts[0][m][:, 1].max() < 96


def test_keynet_wired_into_extractor(image_dir):
    """Extractor path runs with the learned detector (random init)."""
    import cv2

    from deep_image_matching_tpu import extractors as E
    from deep_image_matching_tpu.extractors import keynetaffnethardnet as mod
    from deep_image_matching_tpu.extractors.extractor_base import extractor_loader

    cls = extractor_loader(E, "keynetaffnethardnet")
    ext = cls({"extractor": {"name": "keynetaffnethardnet",
                             "n_features": 256, "detector": "doh"},
               "general": {}, "matcher": {}})
    img = cv2.imread(str(sorted(image_dir.iterdir())[0]), cv2.IMREAD_GRAYSCALE)
    img = cv2.resize(img, (192, 144)).astype(np.float32) / 255.0
    feats = ext._extract(img)
    assert len(feats["keypoints"]) > 0
    # learned path with injected random params
    ext.detector = "keynet"
    ext.keynet_params = kn.init_keynet_params()
    feats2 = ext._extract(img)
    assert feats2["descriptors"].shape[1] == 128
