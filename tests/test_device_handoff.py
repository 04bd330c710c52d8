"""Device-resident extract->match handoff: every extractor that arms it must
produce bit-identical features.h5 vs its host download path, and the handoff
arrays must agree with an h5 reload (the f16 storage roundtrip runs on
device). CPU exercises the path via DIM_TPU_FORCE_DEVICE_HANDOFF=1."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

os.environ.setdefault("DIM_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _h5_tree(path):
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = np.asarray(obj)
        f.visititems(visit)
    return out


def _make_extractor(kind, conf):
    if kind == "superpoint":
        from deep_image_matching_tpu.extractors.superpoint import (
            SuperPointExtractor as cls,
        )
    elif kind == "alike":
        from deep_image_matching_tpu.extractors.alike import AlikeExtractor as cls
    elif kind == "aliked":
        from deep_image_matching_tpu.extractors.aliked import (
            ALIKEDExtractor as cls,
        )
    else:
        from deep_image_matching_tpu.extractors.xfeat import XFeatExtractor as cls
    return cls(conf)


@pytest.mark.parametrize("kind", ["superpoint", "alike", "xfeat", "aliked"])
def test_handoff_h5_bitwise_equals_host_path(kind, image_dir, tmp_path,
                                             monkeypatch):
    import jax

    from deep_image_matching_tpu.parallel import mesh as mesh_mod
    from deep_image_matching_tpu.utils.image import ImageList

    monkeypatch.setattr(
        mesh_mod, "_DEFAULT_MESH", mesh_mod.MeshRunner(jax.devices()[:1])
    )
    images = list(ImageList(image_dir))
    conf = {"extractor": {"max_keypoints": 256, "top_k": 256},
            "general": {}}

    # handoff run
    monkeypatch.setenv("DIM_TPU_FORCE_DEVICE_HANDOFF", "1")
    ex1 = _make_extractor(kind, conf)
    ex1.feature_cache = {}
    p1 = tmp_path / "handoff.h5"
    ex1.extract_batch(images, p1)
    assert ex1.device_handoff is not None, "handoff did not engage"
    ex1.flush()

    # host-path run
    monkeypatch.delenv("DIM_TPU_FORCE_DEVICE_HANDOFF")
    ex2 = _make_extractor(kind, conf)
    ex2.feature_cache = {}
    p2 = tmp_path / "host.h5"
    ex2.extract_batch(images, p2)
    assert ex2.device_handoff is None
    ex2.flush()

    t1, t2 = _h5_tree(p1), _h5_tree(p2)
    assert t1.keys() == t2.keys() and len(t1) > 0
    for k in t1:
        np.testing.assert_array_equal(t1[k], t2[k], err_msg=f"{kind}:{k}")

    # handoff host mirrors agree with the file
    ho = ex1.device_handoff
    from deep_image_matching_tpu.io.h5 import get_features

    for n in ho.names:
        f = get_features(p1, n)
        i = ho.index[n]
        c = ho.counts[i]
        np.testing.assert_array_equal(ho.kpts[i, :c], f["keypoints"])


def test_handoff_store_lazy_host_fallback(image_dir, tmp_path, monkeypatch):
    """A handoff-built store must still serve the HOST fallback paths
    (mesh gathers, device-store failure): desc/scores/mask materialize
    lazily from the device arrays and match the h5 content."""
    import jax

    from deep_image_matching_tpu.io.h5 import get_features
    from deep_image_matching_tpu.matchers.matcher_base import _PaddedFeatureStore
    from deep_image_matching_tpu.parallel import mesh as mesh_mod
    from deep_image_matching_tpu.utils.image import ImageList

    monkeypatch.setattr(
        mesh_mod, "_DEFAULT_MESH", mesh_mod.MeshRunner(jax.devices()[:1])
    )
    monkeypatch.setenv("DIM_TPU_FORCE_DEVICE_HANDOFF", "1")
    images = list(ImageList(image_dir))
    ex = _make_extractor("superpoint", {"extractor": {"max_keypoints": 256},
                                        "general": {}})
    ex.feature_cache = {}
    p = tmp_path / "f.h5"
    ex.extract_batch(images, p)
    assert ex.device_handoff is not None
    ex.flush()

    names = sorted(n.name for n in images)
    store = _PaddedFeatureStore(p, names, device_handoff=ex.device_handoff)
    assert store._lazy_dev  # built from the handoff
    batch = store.gather([0, 1])  # forces the lazy host mirrors
    for n in names:
        i = store.index[n]
        c = store.counts[i]
        f = get_features(p, n)
        d = f["descriptors"].T if f["descriptors"].shape[1] == c else f["descriptors"]
        np.testing.assert_array_equal(store.desc[i, :c], d)
        np.testing.assert_array_equal(store.scores[i, :c], f["scores"])
        assert store.mask[i, :c].all() and not store.mask[i, c:].any()
    assert batch["descriptors"].shape[0] == 2
