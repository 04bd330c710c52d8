"""Model-zoo coverage: every preset resolves; implemented extractors run."""

import numpy as np
import pytest

from deep_image_matching_tpu import extractors as E
from deep_image_matching_tpu import matchers as M
from deep_image_matching_tpu.config import Config, confs
from deep_image_matching_tpu.extractors.extractor_base import extractor_loader
from deep_image_matching_tpu.matchers.matcher_base import matcher_loader

def test_every_preset_resolves(project_dir):
    """All 19 preset names must resolve to loadable classes."""
    for name, preset in confs.items():
        cfg = Config(
            args={
                "dir": str(project_dir), "pipeline": name,
                "strategy": "bruteforce", "skip_reconstruction": True,
            }
        )
        ext_cls = extractor_loader(E, cfg.extractor["name"])
        mat_cls = matcher_loader(M, cfg.matcher["name"])
        assert ext_cls is not None and mat_cls is not None


@pytest.mark.parametrize(
    "name",
    ["disk", "dedode", "ripe", "keynetaffnethardnet"],
)
def test_extractor_runs(name, image_dir):
    """Random-init extraction must produce valid feature structures."""
    cls = extractor_loader(E, name)
    ext = cls({
        "extractor": {"name": name, "n_features": 256, "max_keypoints": 256,
                      "max_num_keypoints": 256, "n_limit": 256,
                      "resolution": 256},
        "general": {},
        "matcher": {},
    })
    import cv2

    img = cv2.imread(str(sorted(image_dir.iterdir())[0]))
    img = cv2.resize(img, (256, 192)).astype(np.float32) / 255.0
    if ext.grayscale:
        img = img.mean(-1)
    feats = ext._extract(img)
    assert feats["keypoints"].ndim == 2 and feats["keypoints"].shape[1] == 2
    assert len(feats["keypoints"]) > 0
    assert len(feats["descriptors"]) == len(feats["keypoints"])
    # descriptors normalized (all these zoo members L2-normalize)
    norms = np.linalg.norm(feats["descriptors"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # keypoints in range
    h, w = img.shape[:2]
    assert feats["keypoints"][:, 0].max() < w
    assert feats["keypoints"][:, 1].max() < h


def test_hardnet_converter_shapes():
    """A synthetic HardNet state_dict converts and produces 128-d output."""
    import jax.numpy as jnp
    import torch

    from deep_image_matching_tpu.models.hardnet import (
        _HARDNET_LAYERS, hardnet_describe, hardnet_params_from_torch,
    )

    g = torch.Generator().manual_seed(0)
    sd = {}
    conv_idx = [0, 3, 6, 9, 12, 15, 19]
    for i, (ci, co, k, _s, _p) in zip(conv_idx, _HARDNET_LAYERS):
        sd[f"features.{i}.weight"] = torch.randn(co, ci, k, k, generator=g) * 0.05
        sd[f"features.{i + 1}.running_mean"] = torch.randn(co, generator=g) * 0.1
        sd[f"features.{i + 1}.running_var"] = torch.rand(co, generator=g) + 0.5
    params = hardnet_params_from_torch(sd)
    patches = np.random.default_rng(0).random((8, 32, 32)).astype(np.float32)
    d = np.asarray(hardnet_describe(params, jnp.asarray(patches)))
    assert d.shape == (8, 128)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)


