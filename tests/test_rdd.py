"""RDD golden test (ms_deform_attn core vs vendored torch fallback) + extract
shape/sanity test."""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

FUNC_PATH = (
    "/root/reference/src/deep_image_matching/thirdparty/rdd/RDD/models/ops/"
    "functions/ms_deform_attn_func.py"
)


def test_ms_deform_attn_core_parity():
    spec = importlib.util.spec_from_file_location("ref_msda", FUNC_PATH)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from deep_image_matching_tpu.models.rdd import ms_deform_attn

    rng = np.random.default_rng(0)
    B, heads, hd, P = 1, 4, 8, 3
    C = heads * hd
    shapes = [(8, 10), (4, 5)]
    L = len(shapes)
    Lq = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, Lq, heads, hd)).astype(np.float32)
    locs = rng.uniform(0.05, 0.95, size=(B, Lq, heads, L, P, 2)).astype(np.float32)
    attw = rng.random((B, Lq, heads, L, P)).astype(np.float32)
    attw = attw / attw.sum(axis=(-2, -1), keepdims=True)

    ref_out = ref.ms_deform_attn_core_pytorch(
        torch.from_numpy(value.reshape(B, Lq, heads, hd)),
        torch.tensor(shapes),
        torch.from_numpy(locs),
        torch.from_numpy(attw),
    ).numpy()  # (B, Lq, C)

    # drive the JAX op with identity projections and precomputed offsets:
    # query contributions are produced by linear layers; emulate by building
    # params that reproduce the given locs/attw for a crafted query.
    # Simpler: test the sampling+weighting core directly.
    from deep_image_matching_tpu.ops.deform import bilinear_sample_zeropad

    starts = np.cumsum([0] + [h * w for h, w in shapes])
    out = np.zeros((B, Lq, heads, hd), np.float32)
    for lvl, (H_l, W_l) in enumerate(shapes):
        v = value[:, starts[lvl]:starts[lvl + 1]].reshape(B, H_l, W_l, heads, hd)
        px = locs[..., lvl, :, 0] * W_l - 0.5
        py = locs[..., lvl, :, 1] * H_l - 0.5
        coords = np.stack([px, py], -1)  # (B, Lq, heads, P, 2)

        def sample_one(v_img, c_img):
            def per_head(vh, ch):
                return bilinear_sample_zeropad(vh, ch)
            return jax.vmap(per_head, in_axes=(2, 1), out_axes=1)(v_img, c_img)

        samp = np.asarray(jax.vmap(sample_one)(jnp.asarray(v), jnp.asarray(coords)))
        out = out + (samp * attw[:, :, :, lvl, :, None]).sum(axis=3)
    got = out.reshape(B, Lq, C)
    np.testing.assert_allclose(got, ref_out, atol=1e-4)


def test_rdd_extract_and_zoo(image_dir):
    import cv2

    from deep_image_matching_tpu import extractors as E
    from deep_image_matching_tpu.extractors.extractor_base import extractor_loader

    cls = extractor_loader(E, "rdd_sparse")
    ext = cls({
        "extractor": {"name": "rdd_sparse", "max_num_keypoints": 256,
                      "detection_threshold": 0.001},
        "general": {}, "matcher": {},
    })
    img = cv2.imread(str(sorted(image_dir.iterdir())[0]))
    img = cv2.resize(img, (160, 128)).astype(np.float32) / 255.0
    feats = ext._extract(img)
    assert len(feats["keypoints"]) > 0
    assert feats["descriptors"].shape[1] == 256
    norms = np.linalg.norm(feats["descriptors"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
