"""Decode-prefetch + device batch assembly (utils/prefetch.py,
ops/assemble.py): the round-5 extract-stage overlap path. Fast default-tier
coverage; the end-to-end extractor paths are covered by
test_device_handoff.py / test_device_tiling.py (slow tier).

Reference analog for the pixels' journey: per-image read + preprocess
inline with the model call (``extractor_base.py:190-196``)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate([(120, 160), (120, 160), (90, 140)]):
        cv2.imwrite(
            str(tmp_path / f"im{i}.png"),
            rng.integers(0, 255, (h, w, 3), np.uint8),
        )
    return tmp_path


def test_prefetch_matches_inline_decode(image_dir):
    from deep_image_matching_tpu.utils.image import Image, read_image
    from deep_image_matching_tpu.utils.prefetch import (
        fetch_device_image, prefetch_device_images,
    )

    imgs = [Image(p) for p in sorted(image_dir.glob("*.png"))]
    futs = prefetch_device_images(imgs, True, lambda a: a, "test-view")
    for img, fut in zip(imgs, futs):
        dev, cur_hw, (w0, h0) = fut.result()
        ref = read_image(img.path, grayscale=True)
        assert cur_hw == ref.shape[:2]
        assert (w0, h0) == (ref.shape[1], ref.shape[0])
        assert dev.dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(dev), ref)
    # cache hit returns the identical device buffer without re-decoding
    d1, _, _ = fetch_device_image(imgs[0], True, lambda a: a, "test-view")
    d2, _, _ = fetch_device_image(imgs[0], True, lambda a: a, "test-view")
    assert d1 is d2


def test_prefetch_resize_and_view_keying(image_dir):
    from deep_image_matching_tpu.utils.image import Image
    from deep_image_matching_tpu.utils.prefetch import fetch_device_image

    img = Image(sorted(image_dir.glob("*.png"))[0])

    def halve(a):
        return cv2.resize(a, (a.shape[1] // 2, a.shape[0] // 2))

    dev_full, hw_full, _ = fetch_device_image(img, True, lambda a: a, "full")
    dev_half, hw_half, _ = fetch_device_image(img, True, halve, "half")
    assert hw_half == (hw_full[0] // 2, hw_full[1] // 2)
    # distinct view tags do not collide in the cache
    assert dev_full.shape != dev_half.shape


def test_assemble_batch_matches_host_padding(image_dir):
    import jax

    from deep_image_matching_tpu.ops.assemble import (
        assemble_batch, is_device_array,
    )

    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, (h, w), np.uint8)
        for h, w in [(60, 80), (50, 70)]
    ]
    dev = [jax.device_put(a) for a in imgs]
    assert all(is_device_array(d) for d in dev)
    assert not is_device_array(imgs[0])

    out = np.asarray(assemble_batch(dev, (64, 96), channels=1))
    assert out.shape == (2, 64, 96, 1) and out.dtype == np.uint8
    for j, a in enumerate(imgs):
        h, w = a.shape
        np.testing.assert_array_equal(out[j, :h, :w, 0], a)
        assert out[j, h:, :, 0].max(initial=0) == 0
        assert out[j, :, w:, 0].max(initial=0) == 0
    # grayscale -> RGB broadcast
    out3 = np.asarray(assemble_batch(dev[:1], (64, 96), channels=3))
    assert out3.shape == (1, 64, 96, 3)
    assert (out3[0, :, :, 0] == out3[0, :, :, 2]).all()
