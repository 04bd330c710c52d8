"""End-to-end SuperPoint+LightGlue pipeline (CPU, random weights).

Pretrained checkpoints are unavailable offline, so these tests assert the
*mechanics* (batched extraction, padded matching, gating, h5 schema) rather
than match quality; quality parity is covered by the architecture-parity
golden tests in test_model_parity.py. A duplicated-image pair is used to get
deterministic self-matches through random weights.
"""

import shutil

import numpy as np
import pytest

from deep_image_matching_tpu.config import Config
from deep_image_matching_tpu.image_matching import ImageMatcher
from deep_image_matching_tpu.io.h5 import get_features, list_h5_names, list_pairs

pytestmark = pytest.mark.slow


def _run(project_dir, **kw):
    args = {
        "dir": str(project_dir),
        "pipeline": "superpoint+lightglue",
        "strategy": "bruteforce",
        "quality": "low",
        "skip_reconstruction": True,
        "force": True,
    }
    args.update(kw)
    cfg = Config(args=args)
    matcher = ImageMatcher(cfg)
    return (cfg, *matcher.run())


def test_sp_lg_pipeline_mechanics(project_dir, image_dir):
    cfg, feature_path, match_path = _run(project_dir)
    names = list_h5_names(feature_path)
    assert len(names) == len(list(image_dir.iterdir()))
    feats = get_features(feature_path, names[0])
    assert feats["descriptors"].shape[0] == 256
    assert len(feats["keypoints"]) > 0
    assert len(feats["keypoints"]) <= 2048
    # keypoints are in full-res coordinates despite quality=low
    import cv2

    img = cv2.imread(str(image_dir / names[0]))
    h, w = img.shape[:2]
    assert feats["keypoints"][:, 0].max() > w * 0.25
    assert feats["keypoints"][:, 0].max() <= w
    # raw matches exist for every pair (mutual-NN always yields some)
    raw = match_path.parent / "raw_matches.h5"
    assert raw.exists()
    assert len(list_pairs(raw)) == 3


def test_sp_lg_shifted_pair_verifies(tmp_path, image_dir):
    """A translated crop must match through random weights (conv features are
    shift-equivariant for multiples of the stride) and survive GV."""
    import cv2

    proj = tmp_path / "dup"
    (proj / "images").mkdir(parents=True)
    src = sorted(image_dir.iterdir())[0]
    img = cv2.imread(str(src))
    shift = 64  # multiple of 8*4 so quality=low keeps stride alignment
    cv2.imwrite(str(proj / "images" / "a.jpg"), img[:, :-shift])
    cv2.imwrite(str(proj / "images" / "b.jpg"), img[:, shift:])
    # random-weight LightGlue cannot produce confident matches; the NN
    # matcher on raw (shift-equivariant) SuperPoint descriptors can.
    cfg, feature_path, match_path = _run(proj, pipeline="superpoint+kornia_matcher")
    pairs = list_pairs(match_path)
    assert len(pairs) == 1
    from deep_image_matching_tpu.io.h5 import get_keypoints, get_matches

    m = get_matches(match_path, *pairs[0])
    assert len(m) >= 15
    # matched keypoints differ by the known translation
    k0 = get_keypoints(feature_path, pairs[0][0])
    k1 = get_keypoints(feature_path, pairs[0][1])
    dx = k0[m[:, 0], 0] - k1[m[:, 1], 0]
    dy = k0[m[:, 0], 1] - k1[m[:, 1], 1]
    assert abs(np.median(dx) - shift) < 2.0
    assert abs(np.median(dy)) < 2.0


def test_device_handoff_bitwise_equals_h5_path(project_dir, monkeypatch):
    """The device-resident extract->match handoff must produce bit-identical
    features.h5 AND matches vs the reload-from-h5 path (the handoff applies
    the same f16 storage roundtrip on device)."""
    import h5py

    def _tree(path):
        out = {}
        with h5py.File(path, "r") as f:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out[name] = np.asarray(obj)
            f.visititems(visit)
        return out

    # pin a 1-device mesh: the handoff is a single-accelerator fast path
    # (the mesh branch gathers pair batches on host) and both runs must
    # differ ONLY in the handoff
    import jax

    from deep_image_matching_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(
        mesh_mod, "_DEFAULT_MESH", mesh_mod.MeshRunner(jax.devices()[:1])
    )

    monkeypatch.setenv("DIM_TPU_FORCE_DEVICE_HANDOFF", "1")
    cfg1, f1, m1 = _run(project_dir, outs=str(project_dir / "out_handoff"))
    # the handoff must actually have engaged (guards against silently
    # falling back and comparing identical code paths)
    from deep_image_matching_tpu.extractors.superpoint import SuperPointExtractor

    engaged = {"n": 0}
    orig = SuperPointExtractor._try_extract_batch_device

    def spy(self, *a, **k):
        ok = orig(self, *a, **k)
        engaged["n"] += int(ok)
        return ok

    monkeypatch.setattr(SuperPointExtractor, "_try_extract_batch_device", spy)
    cfg1, f1, m1 = _run(project_dir, outs=str(project_dir / "out_handoff"))
    assert engaged["n"] == 1, "device handoff did not engage"
    monkeypatch.delenv("DIM_TPU_FORCE_DEVICE_HANDOFF")
    cfg2, f2, m2 = _run(project_dir, outs=str(project_dir / "out_h5"))

    t1, t2 = _tree(f1), _tree(f2)
    assert t1.keys() == t2.keys()
    for k in t1:
        np.testing.assert_array_equal(t1[k], t2[k], err_msg=k)
    r1 = _tree(m1.parent / "raw_matches.h5")
    r2 = _tree(m2.parent / "raw_matches.h5")
    assert r1.keys() == r2.keys()
    for k in r1:
        np.testing.assert_array_equal(r1[k], r2[k], err_msg=k)
