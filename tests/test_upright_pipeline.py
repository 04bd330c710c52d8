"""Upright rotation end-to-end: a 90-degree-rotated image pairs with its
unrotated sibling only after upright correction (conv features are not
rotation invariant), and keypoints are written back in ORIGINAL image
coordinates."""

import numpy as np
import pytest

from deep_image_matching_tpu.config import Config
from deep_image_matching_tpu.image_matching import ImageMatcher
from deep_image_matching_tpu.io.h5 import get_features, get_matches, list_pairs


@pytest.fixture
def rotated_project(tmp_path, image_dir):
    import cv2

    proj = tmp_path / "rot"
    (proj / "images").mkdir(parents=True)
    src = sorted(image_dir.iterdir())[0]
    img = cv2.imread(str(src))
    img = cv2.resize(img, (400, 304))
    cv2.imwrite(str(proj / "images" / "a.jpg"), img)
    # b = a rotated 90 deg clockwise; rotations.txt asks to rotate it 270
    # more (i.e. back upright)
    cv2.imwrite(
        str(proj / "images" / "b.jpg"), cv2.rotate(img, cv2.ROTATE_90_CLOCKWISE)
    )
    (proj / "images" / "rotations.txt").write_text("a.jpg 0\nb.jpg 270\n")
    return proj


def _run(proj, upright):
    args = {
        "dir": str(proj),
        "pipeline": "superpoint+kornia_matcher",
        "strategy": "bruteforce",
        "quality": "low",
        "skip_reconstruction": True,
        "force": True,
        "upright": upright,
    }
    cfg = Config(args=args)
    cfg.general["upright_strategy"] = "custom"
    m = ImageMatcher(cfg)
    return (cfg, *m.run())


def test_upright_enables_rotated_matching(rotated_project):
    # baseline: match count without upright correction
    _, _, match_path0 = _run(rotated_project, upright=False)
    pairs0 = list_pairs(match_path0)
    n_base = len(get_matches(match_path0, *pairs0[0])) if pairs0 else 0

    # with upright: far more verified matches, and keypoints map back to the
    # ORIGINAL (rotated) image frame
    cfg, feature_path, match_path = _run(rotated_project, upright=True)
    pairs = list_pairs(match_path)
    assert len(pairs) == 1
    m = get_matches(match_path, *pairs[0])
    assert len(m) >= 15
    assert len(m) > 2 * max(n_base, 1)

    feats_b = get_features(feature_path, "b.jpg")
    # original b.jpg is 304x400 (w x h) after the 90-degree rotation
    assert tuple(feats_b["image_size"]) == (304, 400)
    k = feats_b["keypoints"]
    assert k[:, 0].max() <= 304 and k[:, 1].max() <= 400
