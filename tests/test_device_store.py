"""Device-resident feature store and image caches."""

import numpy as np
import pytest

from deep_image_matching_tpu.io.h5 import save_features
from deep_image_matching_tpu.matchers.matcher_base import _PaddedFeatureStore


@pytest.fixture
def feature_file(tmp_path):
    path = tmp_path / "features.h5"
    rng = np.random.default_rng(0)
    for i, n in enumerate(["a.jpg", "b.jpg", "c.jpg"]):
        k = 100 + 30 * i
        save_features(
            path, n,
            keypoints=rng.uniform(0, 640, (k, 2)).astype(np.float32),
            descriptors=rng.normal(size=(k, 64)).astype(np.float32),
            scores=rng.random(k).astype(np.float32),
            image_size=np.array([640, 480], np.int64),
        )
    return path


def test_gather_device_matches_host_gather(feature_file):
    store = _PaddedFeatureStore(feature_file, ["a.jpg", "b.jpg", "c.jpg"])
    idx = [2, 0, 1, 2]
    host = store.gather(idx)
    dev = store.gather_device(idx)
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k])
    # upload happens once: the cached device dict is reused
    assert store.device() is store.device()


def test_loftr_image_cache_eviction(image_dir):
    from deep_image_matching_tpu import matchers as M
    from deep_image_matching_tpu.matchers.matcher_base import matcher_loader

    cls = matcher_loader(M, "loftr")
    m = cls.__new__(cls)  # skip weight loading
    m.conf = {"image_cache_mb": 1, "max_tile_size": 256}
    from deep_image_matching_tpu.constants import Quality

    m.quality = Quality.HIGH
    paths = sorted(image_dir.iterdir())
    d1 = m._device_image(paths[0])
    assert d1.dtype == np.uint8 and d1.ndim == 3
    # same path -> same cached array, full shape recorded from that decode
    assert m._device_image(paths[0]) is d1
    assert str(paths[0]) in m._full_shapes
    # cap the cache below 2 entries: inserting two more must evict
    m.conf["image_cache_mb"] = 0  # cap resolves to 0 bytes -> keep newest only
    m._device_image(paths[1])
    m._device_image(paths[2])
    keys = list(m._img_cache.keys())
    assert str(paths[0]) not in keys, "oldest entry must be evicted"
    assert keys == [str(paths[2])]
    assert m._img_cache_bytes == m._img_cache[str(paths[2])][1]


def test_feature_cache_bitwise_equals_h5(tmp_path):
    """The extract->match in-memory handoff must hold EXACTLY what an h5
    round trip produces (f16 descriptor/score storage) — otherwise a cached
    run and a resumed run would diverge numerically."""
    from deep_image_matching_tpu.extractors.extractor_base import ExtractorBase
    from deep_image_matching_tpu.io.h5 import get_features

    class _Stub(ExtractorBase):
        def _extract(self, image):
            raise NotImplementedError

    ex = _Stub({})
    ex.feature_cache = {}
    rng = np.random.default_rng(1)
    path = tmp_path / "features.h5"
    k = 137
    kpts = rng.uniform(0, 640, (k, 2)).astype(np.float32)
    desc = rng.normal(size=(k, 64)).astype(np.float32)
    scores = rng.random(k).astype(np.float32)
    size = np.array([640, 480], np.int64)
    save_features(path, "a.jpg", keypoints=kpts, descriptors=desc,
                  scores=scores, image_size=size)
    ex._cache_put("a.jpg", keypoints=kpts, descriptors=desc, scores=scores,
                  image_size=size)

    h5 = get_features(path, "a.jpg")
    cached = ex.feature_cache["a.jpg"]
    np.testing.assert_array_equal(cached["keypoints"], h5["keypoints"])
    d = h5["descriptors"]
    if d.shape[0] != k:
        d = d.T
    np.testing.assert_array_equal(cached["descriptors"], d)
    np.testing.assert_array_equal(cached["scores"], h5["scores"])

    # the padded store built from the cache == built from the file
    s_file = _PaddedFeatureStore(path, ["a.jpg"])
    s_cache = _PaddedFeatureStore(path, ["a.jpg"], cache=ex.feature_cache)
    np.testing.assert_array_equal(s_file.kpts, s_cache.kpts)
    np.testing.assert_array_equal(s_file.desc, s_cache.desc)
    np.testing.assert_array_equal(s_file.scores, s_cache.scores)
    np.testing.assert_array_equal(s_file.counts, s_cache.counts)
