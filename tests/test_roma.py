"""RoMa component golden tests + pipeline shape/sanity tests."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

ROMA_DIR = "/root/reference/src/deep_image_matching/thirdparty/RoMa"


def _stub_modules():
    for name in (
        "torchvision", "torchvision.models", "torchvision.transforms",
        "torchvision.transforms.functional",
        "kornia", "kornia.geometry", "kornia.geometry.epipolar",
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision.transforms"].Normalize = lambda *a, **k: (lambda x: x)
    sys.modules["torchvision.transforms"].Compose = lambda fs: (lambda x: x)
    sys.modules["torchvision.transforms"].ToTensor = lambda *a, **k: (lambda x: x)
    sys.modules["kornia"].geometry = sys.modules["kornia.geometry"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"
    ]
    class _IM:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    sys.modules["torchvision.transforms.functional"].InterpolationMode = _IM
    if ROMA_DIR not in sys.path:
        sys.path.insert(0, ROMA_DIR)


def _load(name, path):
    _stub_modules()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _roma_matcher_mod():
    _stub_modules()
    import importlib as _il

    return _il.import_module("roma.models.matcher")


def test_cls_to_flow_refine_parity():
    ref_utils = _load("ref_roma_utils", f"{ROMA_DIR}/roma/utils/utils.py")
    from deep_image_matching_tpu.models.roma import cls_to_flow_refine

    rng = np.random.default_rng(0)
    B, H, W, res = 1, 6, 7, 8
    cls = rng.normal(size=(B, res * res, H, W)).astype(np.float32)
    ref = ref_utils.cls_to_flow_refine(torch.from_numpy(cls)).numpy()  # (B,H,W,2)? torch: permute later
    got = np.asarray(
        cls_to_flow_refine(jnp.asarray(cls.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cos_kernel_parity():
    ref_matcher = _roma_matcher_mod()
    from deep_image_matching_tpu.models.roma import cos_kernel

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 12, 16)).astype(np.float32)
    y = rng.normal(size=(2, 15, 16)).astype(np.float32)
    K = ref_matcher.CosKernel(T=0.2)
    ref = K(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(cos_kernel(jnp.asarray(x), jnp.asarray(y), T=0.2))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gp_posterior_parity():
    ref_matcher = _roma_matcher_mod()
    from deep_image_matching_tpu.models.roma import gp_posterior

    torch.manual_seed(0)
    gp = ref_matcher.GP(
        ref_matcher.CosKernel, T=0.2, gp_dim=32, basis="fourier", no_cov=True
    ).eval()
    rng = np.random.default_rng(2)
    B, C, H, W = 1, 24, 6, 8
    f1 = rng.normal(size=(B, C, H, W)).astype(np.float32)
    f2 = rng.normal(size=(B, C, H, W)).astype(np.float32)
    with torch.no_grad():
        ref = gp(torch.from_numpy(f1), torch.from_numpy(f2)).numpy()
    params = {
        "gp_pos_conv": {
            "w": jnp.asarray(gp.pos_conv.weight.detach().numpy()[:, :, 0, 0].T),
            "b": jnp.asarray(gp.pos_conv.bias.detach().numpy()),
        }
    }
    got = np.asarray(
        gp_posterior(
            params,
            jnp.asarray(f1.transpose(0, 2, 3, 1)),
            jnp.asarray(f2.transpose(0, 2, 3, 1)),
            T=0.2,
        )
    )
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-3)


def test_local_correlation_parity():
    ref_lc = _load("ref_roma_lc", f"{ROMA_DIR}/roma/utils/local_correlation.py")
    from deep_image_matching_tpu.models.roma import local_correlation, _grid

    rng = np.random.default_rng(3)
    C, H, W, r = 8, 10, 12, 2
    f1 = rng.normal(size=(1, C, H, W)).astype(np.float32)
    f2 = rng.normal(size=(1, C, H, W)).astype(np.float32)
    flow = np.asarray(_grid(H, W))[None].transpose(0, 3, 1, 2).astype(np.float32)
    flow = flow + rng.normal(scale=0.05, size=flow.shape).astype(np.float32)
    ref = ref_lc.local_correlation(
        torch.from_numpy(f1), torch.from_numpy(f2), local_radius=r,
        flow=torch.from_numpy(flow),
    ).numpy()
    got = np.asarray(
        local_correlation(
            jnp.asarray(f1[0].transpose(1, 2, 0)),
            jnp.asarray(f2[0].transpose(1, 2, 0)),
            jnp.asarray(flow[0].transpose(1, 2, 0)),
            r,
        )
    )
    np.testing.assert_allclose(got, ref[0].transpose(1, 2, 0), atol=1e-4)


def test_sample_matches_device_semantics():
    """The on-device balanced sampler preserves the numpy sampler's
    semantics: output shapes/ranges, out-of-range warps carry no mass, and
    high-certainty positions dominate the sample."""
    from deep_image_matching_tpu.models import roma as rm

    H = W = 16
    rng = np.random.default_rng(5)
    warp_ab = rng.uniform(-0.9, 0.9, (H, W, 2)).astype(np.float32)
    warp_ba = rng.uniform(-0.9, 0.9, (H, W, 2)).astype(np.float32)
    # certainty logits: strongly positive in the top half, strongly negative
    # in the bottom half of the ab map
    cert_ab = np.full((H, W, 1), -9.0, np.float32)
    cert_ab[: H // 2] = 9.0
    cert_ba = np.full((H, W, 1), -9.0, np.float32)
    # out-of-range warp rows must be excluded even where certainty is high
    warp_ab[0, :, 0] = 1.5
    m, c = rm.sample_matches_device(
        jnp.asarray(warp_ab), jnp.asarray(cert_ab),
        jnp.asarray(warp_ba), jnp.asarray(cert_ba),
        jax.random.PRNGKey(0), num=64, sample_thresh=0.05,
    )
    m = np.asarray(m)
    c = np.asarray(c)
    assert m.shape == (64, 4) and c.shape == (64,)
    assert (np.abs(m) <= 1.0).all()
    # the sampled grid positions (cols 0:2 of the ab half) should come from
    # the high-certainty top half (grid y < 0), not the oob row 0
    grid = np.asarray(rm._grid(H, W))
    ab_rows = m[c > 0.5]
    assert len(ab_rows) > 32  # high-certainty positions dominate
    ys = ab_rows[:, 1]
    assert (ys < 0).mean() > 0.9  # top half of the image
    # nothing sampled from the oob row (y of row 0)
    y0 = float(grid[0, 0, 1])
    assert not np.isclose(ys, y0, atol=1e-6).any()


def test_roma_pipeline_shapes():
    from deep_image_matching_tpu.models import roma as rm

    params = rm.init_params(jax.random.PRNGKey(0), dinov2_depth=1)
    rng = np.random.default_rng(4)
    im = rng.random((1, 112, 112, 3), dtype=np.float64).astype(np.float32)
    wab, cab, wba, cba = rm.match_pair(
        params, jnp.asarray(im), jnp.asarray(im), compute_dtype="float32"
    )
    assert wab.shape == (1, 112, 112, 2)
    assert cab.shape == (1, 112, 112, 1)
    matches, cert = rm.sample_matches(
        np.asarray(wab[0]), np.asarray(cab[0]),
        np.asarray(wba[0]), np.asarray(cba[0]),
        jax.random.PRNGKey(0), num=500,
    )
    assert matches.shape[1] == 4
    assert len(matches) <= 500 and len(matches) > 0
    kA, kB = rm.to_pixel_coordinates(matches, 224, 224, 224, 224)
    assert (kA >= 0).all() and (kA <= 224).all()


def test_local_correlation_with_warp_matches_grid_sample():
    from deep_image_matching_tpu.models.roma import (
        _grid,
        _grid_sample,
        local_correlation,
    )

    rng = np.random.default_rng(3)
    H = W = 16
    C = 8
    f1 = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    # flow wandering off-image to exercise the zero border
    flow = jnp.asarray(
        (np.asarray(_grid(H, W)) + rng.normal(0, 0.4, (H, W, 2))).astype(
            np.float32
        )
    )
    corr_plain = local_correlation(f1, f2, flow, 2)
    corr, x_hat = local_correlation(f1, f2, flow, 2, with_warp=True)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_plain), atol=1e-6)
    ref = _grid_sample(f2, flow)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("impl", ["gather", "dense"])
def test_local_correlation_impls_parity(impl):
    ref_lc = _load("ref_roma_lc", f"{ROMA_DIR}/roma/utils/local_correlation.py")
    from deep_image_matching_tpu.models.roma import local_correlation, _grid

    rng = np.random.default_rng(7)
    C, H, W, r = 8, 10, 12, 2
    f1 = rng.normal(size=(1, C, H, W)).astype(np.float32)
    f2 = rng.normal(size=(1, C, H, W)).astype(np.float32)
    flow = np.asarray(_grid(H, W))[None].transpose(0, 3, 1, 2).astype(np.float32)
    flow = flow + rng.normal(scale=0.3, size=flow.shape).astype(np.float32)
    ref = ref_lc.local_correlation(
        torch.from_numpy(f1), torch.from_numpy(f2), local_radius=r,
        flow=torch.from_numpy(flow),
    ).numpy()
    got = np.asarray(
        local_correlation(
            jnp.asarray(f1[0].transpose(1, 2, 0)),
            jnp.asarray(f2[0].transpose(1, 2, 0)),
            jnp.asarray(flow[0].transpose(1, 2, 0)),
            r, impl=impl,
        )
    )
    np.testing.assert_allclose(got, ref[0].transpose(1, 2, 0), atol=1e-4)


def test_certainty_attenuation_parity():
    """_attenuate == the reference formula (matcher.py:758-768,808-810):
    bilinear-interpolate the scale-16 certainty to the output size
    (align_corners=False), keep 0.5x its negative part, subtract."""
    import torch.nn.functional as F

    from deep_image_matching_tpu.models.roma import _attenuate

    rng = np.random.default_rng(11)
    cert = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    cert16 = rng.normal(size=(2, 9, 9, 1)).astype(np.float32)

    low = F.interpolate(
        torch.from_numpy(cert16).permute(0, 3, 1, 2), size=(64, 64),
        align_corners=False, mode="bilinear",
    )
    low = 0.5 * low * (low < 0)
    ref = torch.from_numpy(cert).permute(0, 3, 1, 2) - low

    got = np.asarray(_attenuate(jnp.asarray(cert), jnp.asarray(cert16)))
    np.testing.assert_allclose(
        got, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_match_pair_attenuation_and_cert16():
    """attenuate_cert changes only the certainty (never the flow) and the
    with_cert16 outputs feed match_pair_upsample without shape errors."""
    from deep_image_matching_tpu.models import roma as rm

    params = rm.init_params(jax.random.PRNGKey(0), dinov2_depth=1)
    rng = np.random.default_rng(5)
    im = jnp.asarray(rng.random((1, 112, 112, 3)).astype(np.float32))

    base = rm.match_pair(params, im, im, compute_dtype="float32")
    att = rm.match_pair(
        params, im, im, compute_dtype="float32", attenuate_cert=True
    )
    np.testing.assert_allclose(np.asarray(att[0]), np.asarray(base[0]))
    six = rm.match_pair(
        params, im, im, compute_dtype="float32", with_cert16=True
    )
    assert len(six) == 6
    assert six[4].shape == (1, 8, 8, 1)  # 112/14 (DINOv2 patch grid)
    # with_cert16 leaves the main outputs unattenuated
    np.testing.assert_allclose(np.asarray(six[1]), np.asarray(base[1]))
    out = rm.match_pair_upsample(
        params, im, im, six[0], six[1], six[2], six[3],
        scale_factor=1.0, cert16_ab=six[4], cert16_ba=six[5],
    )
    plain = rm.match_pair_upsample(
        params, im, im, six[0], six[1], six[2], six[3], scale_factor=1.0,
    )
    # attenuation strictly increases certainty where cert16 < 0, else equal
    diff = np.asarray(out[1]) - np.asarray(plain[1])
    assert (diff >= -1e-6).all()
    assert diff.max() > 0
