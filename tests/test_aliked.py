"""ALIKED ops golden tests (vs naive numpy / torch functional) and a
real-pretrained-weights functional test."""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

ALIKED_WEIGHTS = Path(
    "/root/reference/src/deep_image_matching/thirdparty/ALIKED/models/aliked-n16rot.pth"
)


def test_bilinear_zeropad_matches_grid_sample():
    from deep_image_matching_tpu.ops.deform import bilinear_sample_zeropad

    rng = np.random.default_rng(0)
    H, W, C = 12, 17, 5
    fmap = rng.normal(size=(H, W, C)).astype(np.float32)
    coords = rng.uniform([-3, -3], [W + 2, H + 2], size=(64, 2)).astype(np.float32)

    got = np.asarray(
        bilinear_sample_zeropad(jnp.asarray(fmap), jnp.asarray(coords))
    )
    # torch grid_sample zeros + align_corners=True
    grid = (coords / np.array([W - 1, H - 1]) * 2 - 1).astype(np.float32)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(fmap.transpose(2, 0, 1))[None],
        torch.from_numpy(grid.reshape(1, 1, -1, 2)),
        mode="bilinear", align_corners=True, padding_mode="zeros",
    )[0, :, 0, :].numpy().T
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_upsample_align_corners_matches_torch():
    from deep_image_matching_tpu.ops.deform import upsample_bilinear_align

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    for f in (2, 4, 8):
        got = np.asarray(upsample_bilinear_align(jnp.asarray(x), f))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            scale_factor=f, mode="bilinear", align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def _naive_deform_conv(x, offset, weight, bias, pad=1):
    """Direct-definition deformable conv (numpy loops)."""
    H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    out = np.zeros((H, W, Cout), np.float32)

    def sample(px, py):
        x0, y0 = int(np.floor(px)), int(np.floor(py))
        acc = np.zeros(Cin, np.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi = x0 + dx, y0 + dy
                w = (1 - abs(px - xi)) * (1 - abs(py - yi))
                if 0 <= xi < W and 0 <= yi < H:
                    acc += w * x[yi, xi]
        return acc

    for y in range(H):
        for xx in range(W):
            o = offset[y, xx].reshape(kh * kw, 2)
            acc = np.zeros(Cout, np.float32)
            for i in range(kh):
                for j in range(kw):
                    k = i * kw + j
                    py = y + i - pad + o[k, 0]
                    px = xx + j - pad + o[k, 1]
                    v = sample(px, py)
                    acc += v @ weight[i, j]
            out[y, xx] = acc + (bias if bias is not None else 0)
    return out


def test_deform_conv_matches_naive():
    from deep_image_matching_tpu.ops.deform import deform_conv2d

    rng = np.random.default_rng(2)
    H, W, Cin, Cout = 8, 9, 4, 6
    x = rng.normal(size=(H, W, Cin)).astype(np.float32)
    offset = rng.normal(scale=1.5, size=(H, W, 18)).astype(np.float32)
    weight = rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32)
    bias = rng.normal(size=(Cout,)).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
                      jnp.asarray(bias))
    )
    ref = _naive_deform_conv(x, offset, weight, bias)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_extract_patches_matches_reference_semantics():
    from deep_image_matching_tpu.ops.deform import extract_patches

    rng = np.random.default_rng(3)
    H, W, C = 20, 24, 3
    fmap = rng.normal(size=(H, W, C)).astype(np.float32)
    centers = np.array([[0, 0], [5, 7], [23, 19], [12, 3]], np.int64)
    ps = 3
    got = np.asarray(
        extract_patches(jnp.asarray(fmap), jnp.asarray(centers), ps)
    )
    for k, (cx, cy) in enumerate(centers):
        corner_x = int(np.clip(cx - ps // 2 + 1, 0, W - 1 - ps))
        corner_y = int(np.clip(cy - ps // 2 + 1, 0, H - 1 - ps))
        ref = fmap[corner_y : corner_y + ps, corner_x : corner_x + ps]
        np.testing.assert_array_equal(got[k], ref)


@pytest.mark.skipif(not ALIKED_WEIGHTS.exists(), reason="bundled weights absent")
def test_aliked_pretrained_functional(image_dir):
    """Real pretrained weights: shifted crops of a real photo must match
    geometrically (median displacement == the known shift)."""
    import cv2

    from deep_image_matching_tpu.models import aliked as am
    from deep_image_matching_tpu.ops.nn_match import nn_match

    sd = torch.load(str(ALIKED_WEIGHTS), map_location="cpu")
    params = am.params_from_torch(sd, "aliked-n16rot")

    img = cv2.imread(str(sorted(image_dir.iterdir())[0]))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    img = cv2.resize(img, (512, 384))
    shift = 64
    a = img[:, :-shift]
    b = img[:, shift:]  # both 448x384 -> multiples of 32

    batch = np.stack([a, b])
    vhw = np.array([[384, 448], [384, 448]], np.int32)
    out = am.extract(
        params, jnp.asarray(batch), jnp.asarray(vhw),
        max_keypoints=512, detection_threshold=0.2, nms_radius=2,
        model_name="aliked-n16rot",
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    n0, n1 = out["mask"][0].sum(), out["mask"][1].sum()
    assert n0 > 50 and n1 > 50
    # descriptors unit norm on valid slots
    norms = np.linalg.norm(out["descriptors"][0][out["mask"][0]], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # scores in (0, 1)
    s = out["scores"][0][out["mask"][0]]
    assert (s > 0).all() and (s <= 1).all()

    matches0, valid = nn_match(
        jnp.asarray(out["descriptors"][0]), jnp.asarray(out["descriptors"][1]),
        jnp.asarray(out["mask"][0]), jnp.asarray(out["mask"][1]),
        mode="smnn", ratio_th=0.95,
    )
    matches0 = np.asarray(matches0)
    valid = np.asarray(valid)
    rows = np.nonzero(valid)[0]
    assert len(rows) > 30
    k0 = out["keypoints"][0][rows]
    k1 = out["keypoints"][1][np.asarray(matches0)[rows]]
    dx = np.median(k0[:, 0] - k1[:, 0])
    dy = np.median(k0[:, 1] - k1[:, 1])
    assert abs(dx - shift) < 1.5
    assert abs(dy) < 1.5


def test_bilinear_zeropad_wide_matches_plain():
    from deep_image_matching_tpu.ops.deform import (
        bilinear_sample_zeropad,
        bilinear_sample_zeropad_wide,
    )

    rng = np.random.default_rng(1)
    H, W, C = 11, 19, 7
    fmap = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    # cover interiors, borders, the floor==-1 edge band, and far out-of-range
    coords = np.concatenate(
        [
            rng.uniform([-0.999, -0.999], [W - 1, H - 1], size=(64, 2)),
            rng.uniform([-6, -6], [W + 5, H + 5], size=(64, 2)),
            np.array([[-0.5, 3.0], [W - 1.0, H - 1.0], [-1.0, -1.0], [0.0, 0.0]]),
        ]
    ).astype(np.float32)
    got = np.asarray(bilinear_sample_zeropad_wide(fmap, jnp.asarray(coords)))
    ref = np.asarray(bilinear_sample_zeropad(fmap, jnp.asarray(coords)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pixel_budget_conf_knob():
    """``extractor: {pixel_budget: N}`` caps the device batch size
    (round-5 tiled-budget A/B knob); default comes from the class attr."""
    from deep_image_matching_tpu.extractors.aliked import ALIKEDExtractor

    if not ALIKED_WEIGHTS.exists():
        pytest.skip("bundled ALIKED checkpoint not present")

    base = {
        "general": {},
        "extractor": {"name": "aliked", "model_name": "aliked-n16rot"},
    }
    ex = ALIKEDExtractor(base)
    assert ex.pixel_budget == ALIKEDExtractor.pixel_budget

    tuned = {
        "general": {},
        "extractor": {
            "name": "aliked",
            "model_name": "aliked-n16rot",
            "pixel_budget": 6_000_000,
        },
    }
    ex2 = ALIKEDExtractor(tuned)
    assert ex2.pixel_budget == 6_000_000
    # the cap math: 1216px tiles -> 4 fit at 6.0 MP, 2 at the 4.2 MP default
    ph = pw = 1216
    assert max(1, min(4, ex2.pixel_budget // (ph * pw))) == 4
    assert max(1, min(4, ex.pixel_budget // (ph * pw))) == 2
