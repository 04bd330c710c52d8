"""AsyncFeatureWriter: per-image puts and the device-batch path.

The device-batch path (one batched device_get of the whole extraction
batch's f16 arrays) must produce byte-identical features.h5 content to the
per-image put path — it is the deferred-write side of the device handoff
(`ExtractorBase._arm_device_handoff`).
"""

import numpy as np
import pytest

from deep_image_matching_tpu.io.h5 import get_features
from deep_image_matching_tpu.io.writer import AsyncFeatureWriter, MatchWriter

pytestmark = pytest.mark.slow


def _make_batch(n=3, cap=64, d=32, seed=0):
    rng = np.random.default_rng(seed)
    names = [f"img_{i}.jpg" for i in range(n)]
    counts = rng.integers(10, cap, n).astype(np.int32)
    kpts = rng.uniform(0, 640, (n, cap, 2)).astype(np.float32)
    desc = rng.normal(size=(n, cap, d)).astype(np.float32)
    scores = rng.uniform(0, 1, (n, cap)).astype(np.float32)
    sizes = np.tile(np.array([[640, 480]], np.int64), (n, 1))
    return names, counts, kpts, desc, scores, sizes


def test_put_device_batch_matches_per_image_puts(tmp_path):
    import jax.numpy as jnp

    names, counts, kpts, desc, scores, sizes = _make_batch()

    # reference: per-image puts with host arrays (f16 storage via as_half)
    ref = tmp_path / "ref.h5"
    with AsyncFeatureWriter(ref) as w:
        for i, name in enumerate(names):
            w.put(
                name,
                keypoints=kpts[i],
                descriptors=desc[i].astype(np.float16),
                scores=scores[i].astype(np.float16),
                image_size=sizes[i],
                n_valid=int(counts[i]),
            )

    # device-batch path: arrays enter as (possibly device) f16 batches
    got = tmp_path / "got.h5"
    with AsyncFeatureWriter(got) as w:
        w.put_device_batch(
            names=names,
            kpts=kpts,
            desc_f16=jnp.asarray(desc.astype(np.float16)),
            scores_f16=jnp.asarray(scores.astype(np.float16)),
            image_size=sizes,
            counts=counts,
        )

    for i, name in enumerate(names):
        fr = get_features(ref, name)
        fg = get_features(got, name)
        assert len(fr["keypoints"]) == int(counts[i])
        np.testing.assert_array_equal(fr["keypoints"], fg["keypoints"])
        np.testing.assert_array_equal(fr["descriptors"], fg["descriptors"])
        np.testing.assert_array_equal(fr["scores"], fg["scores"])
        np.testing.assert_array_equal(fr["image_size"], fg["image_size"])


def test_put_device_batch_no_kwarg_collision(tmp_path):
    """A plain put() with arbitrary kwargs must never be mistaken for a
    device batch (the old dict sentinel could collide with a kwarg)."""
    names, counts, kpts, desc, scores, sizes = _make_batch(n=1)
    p = tmp_path / "f.h5"
    with AsyncFeatureWriter(p) as w:
        w.put(
            names[0], keypoints=kpts[0], descriptors=desc[0],
            scores=scores[0], image_size=sizes[0], n_valid=int(counts[0]),
        )
    f = get_features(p, names[0])
    assert len(f["keypoints"]) == int(counts[0])


def test_async_writer_error_surfaces_at_close(tmp_path):
    w = AsyncFeatureWriter(tmp_path / "x.h5")
    # an item save_features cannot handle -> error recorded on the thread
    w._q.put({"name": "bad", "keypoints": object()})
    with pytest.raises(RuntimeError):
        w.close()


def test_match_writer_roundtrip(tmp_path):
    from deep_image_matching_tpu.io.h5 import get_matches

    mp = tmp_path / "matches.h5"
    m = np.array([[0, 1], [2, 3]], np.int32)
    with MatchWriter(mp) as w:
        w.save_raw("a.jpg", "b.jpg", m)
        w.save_verified("a.jpg", "b.jpg", m[:1])
    np.testing.assert_array_equal(get_matches(mp, "a.jpg", "b.jpg"), m[:1])
    np.testing.assert_array_equal(
        get_matches(mp.parent / "raw_matches.h5", "a.jpg", "b.jpg"), m
    )
