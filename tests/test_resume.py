"""Checkpoint/resume: features and raw matches are reused on rerun."""

import h5py
import numpy as np

from deep_image_matching_tpu.config import Config
from deep_image_matching_tpu.image_matching import ImageMatcher
from deep_image_matching_tpu.io.h5 import list_h5_names, list_pairs


def test_resume_skips_completed_work(project_dir, image_dir, caplog):
    args = {
        "dir": str(project_dir),
        "pipeline": "sift+kornia_matcher",
        "strategy": "bruteforce",
        "quality": "low",
        "skip_reconstruction": True,
        "force": True,
    }
    cfg = Config(args=args)
    m = ImageMatcher(cfg)
    feature_path, match_path = m.run()
    n_feats = len(list_h5_names(feature_path))
    raw_pairs = list_pairs(match_path.parent / "raw_matches.h5")

    # tamper a features group so we can detect it survives the resume
    with h5py.File(feature_path, "r+") as fd:
        name0 = list(fd.keys())[0]
        sentinel = np.float32(123.456)
        fd[name0]["keypoints"][0, 0] = sentinel

    args2 = dict(args)
    args2["force"] = False
    args2["resume"] = True
    cfg2 = Config(args=args2)
    m2 = ImageMatcher(cfg2)
    fp2, mp2 = m2.run()
    assert fp2 == feature_path
    # features untouched (extraction skipped)
    with h5py.File(fp2) as fd:
        assert fd[name0]["keypoints"][0, 0] == sentinel
    assert len(list_h5_names(fp2)) == n_feats
    # raw matches unchanged in count
    assert len(list_pairs(mp2.parent / "raw_matches.h5")) == len(raw_pairs)
