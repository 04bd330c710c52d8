"""End-to-end slice: SIFT + NN matcher -> h5 -> COLMAP db (CPU-runnable).

Mirrors the reference's integration-test style (tests/test_pipelines.py):
run the real pipeline on the bundled 3-image set and assert artifact
existence + database contents.
"""

import sqlite3

import numpy as np
import pytest

from deep_image_matching_tpu.config import Config
from deep_image_matching_tpu.image_matching import ImageMatcher
from deep_image_matching_tpu.io.h5 import get_features, get_matches, list_h5_names
from deep_image_matching_tpu.io.h5_to_db import export_to_colmap


def _run(project_dir, **kw):
    args = {
        "dir": str(project_dir),
        "pipeline": "sift+kornia_matcher",
        "strategy": "bruteforce",
        "skip_reconstruction": True,
        "force": True,
    }
    args.update(kw)
    cfg = Config(args=args)
    matcher = ImageMatcher(cfg)
    feature_path, match_path = matcher.run()
    return cfg, feature_path, match_path


def test_sift_pipeline_end_to_end(project_dir, image_dir):
    cfg, feature_path, match_path = _run(project_dir)
    assert feature_path.exists()
    assert match_path.exists()

    names = list_h5_names(feature_path)
    assert len(names) == len(list(image_dir.iterdir()))
    feats = get_features(feature_path, names[0])
    assert feats["keypoints"].ndim == 2 and feats["keypoints"].shape[1] == 2
    assert len(feats["keypoints"]) > 100
    # descriptors stored (D, N) like the reference schema
    assert feats["descriptors"].shape[0] == 128
    assert feats["descriptors"].shape[1] == len(feats["keypoints"])

    # at least one pair of the sacre_coeur set must verify
    from deep_image_matching_tpu.io.h5 import list_pairs

    pairs = list_pairs(match_path)
    assert len(pairs) >= 1
    m = get_matches(match_path, *pairs[0])
    assert m.shape[1] == 2
    assert len(m) >= 15

    # COLMAP export
    db_path = cfg.output_dir / "database.db"
    export_to_colmap(image_dir, feature_path, match_path, db_path)
    con = sqlite3.connect(db_path)
    n_images = con.execute("SELECT COUNT(*) FROM images").fetchone()[0]
    n_kpt = con.execute("SELECT COUNT(*) FROM keypoints").fetchone()[0]
    n_tvg = con.execute(
        "SELECT COUNT(*) FROM two_view_geometries WHERE rows >= 15"
    ).fetchone()[0]
    n_cam = con.execute("SELECT COUNT(*) FROM cameras").fetchone()[0]
    con.close()
    assert n_images == len(names)
    assert n_kpt == len(names)
    assert n_tvg >= 1
    assert n_cam >= 1

    # pairs.txt written
    assert (cfg.output_dir / "pairs.txt").exists()
    # config snapshot
    cfg.save()
    assert (cfg.output_dir / "config.json").exists()


def test_match_batch_oom_fallback(project_dir, monkeypatch):
    """A batch-level failure (simulated device OOM) bisects and retries;
    a single bad pair is skipped, the rest still match (reference CUDA-OOM
    fallback semantics)."""
    from deep_image_matching_tpu.matchers.kornia_matcher import NNMatcher

    orig = NNMatcher._dispatch_chunk
    calls = {"n": 0}

    def flaky(self, chunk, *a, **kw):
        calls["n"] += 1
        if len(chunk) > 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: simulated OOM")
        return orig(self, chunk, *a, **kw)

    monkeypatch.setattr(NNMatcher, "_dispatch_chunk", flaky)
    cfg, feature_path, match_path = _run(project_dir)
    from deep_image_matching_tpu.io.h5 import list_pairs

    assert calls["n"] > 1  # split actually happened
    assert len(list_pairs(match_path)) >= 1  # pipeline still produced matches


def test_match_finish_failure_retries_sync(project_dir, monkeypatch):
    """An async device error surfacing at materialization time (pipelined
    finish) falls back to the synchronous bisecting path and still produces
    matches."""
    from deep_image_matching_tpu.matchers.kornia_matcher import NNMatcher

    orig = NNMatcher._finish_chunk
    calls = {"n": 0}

    def flaky(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated async device error")
        return orig(self, *a, **kw)

    monkeypatch.setattr(NNMatcher, "_finish_chunk", flaky)
    cfg, feature_path, match_path = _run(project_dir)
    from deep_image_matching_tpu.io.h5 import list_pairs

    assert calls["n"] > 1  # sync retry actually ran
    assert len(list_pairs(match_path)) >= 1


def test_match_writer_roundtrip(tmp_path):
    """MatchWriter writes are identical to save_matches semantics (group per
    first image, overwrite-on-rewrite) and readable after close."""
    from deep_image_matching_tpu.io.writer import MatchWriter

    mp = tmp_path / "matches.h5"
    m = np.array([[0, 1], [2, 3]], np.int32)
    m2 = np.array([[5, 6]], np.int32)
    with MatchWriter(mp) as w:
        w.save_raw("a.jpg", "b.jpg", m)
        w.save_verified("a.jpg", "b.jpg", m)
        w.save_verified("a.jpg", "b.jpg", m2)  # overwrite
    got = get_matches(mp, "a.jpg", "b.jpg")
    np.testing.assert_array_equal(got, m2)
    raw = get_matches(tmp_path / "raw_matches.h5", "a.jpg", "b.jpg")
    np.testing.assert_array_equal(raw, m)


def test_sift_pipeline_sequential(project_dir):
    cfg, feature_path, match_path = _run(project_dir, strategy="sequential", overlap=1)
    pairs_file = cfg.output_dir / "pairs.txt"
    lines = pairs_file.read_text().strip().splitlines()
    n = len(list_h5_names(feature_path))
    assert len(lines) == n - 1


def test_sift_pipeline_quality_low(project_dir, image_dir):
    cfg, feature_path, _ = _run(project_dir, quality="low")
    names = list_h5_names(feature_path)
    feats = get_features(feature_path, names[0])
    # keypoints must be rescaled back to full-resolution coordinates
    import cv2

    img = cv2.imread(str(image_dir / names[0]))
    h, w = img.shape[:2]
    kpts = feats["keypoints"]
    assert kpts[:, 0].max() > w * 0.3
    assert kpts[:, 0].max() <= w + 1
    assert kpts[:, 1].max() <= h + 1


def test_orb_pipeline(project_dir):
    cfg, feature_path, match_path = _run(project_dir, pipeline="orb+kornia_matcher")
    assert feature_path.exists()
    names = list_h5_names(feature_path)
    assert len(names) >= 3


def test_sift_pipeline_custom_pairs(project_dir, image_dir):
    """custom_pairs strategy: match exactly the pairs in --pair_file."""
    names = sorted(p.name for p in image_dir.iterdir())
    pair_file = project_dir / "my_pairs.txt"
    pair_file.write_text(f"{names[0]} {names[1]}\n")
    cfg, feature_path, match_path = _run(
        project_dir, strategy="custom_pairs", pair_file=str(pair_file)
    )
    written = (cfg.output_dir / "pairs.txt").read_text().split()
    assert written == [names[0], names[1]]
    import h5py

    # the raw matches must cover exactly the requested pair (GV may gate
    # the verified file, but the pair list itself must be respected)
    with h5py.File(cfg.output_dir / "raw_matches.h5", "r") as f:
        raw_pairs = [(a, b) for a in f for b in f[a]]
    assert raw_pairs == [(names[0], names[1])]
    with h5py.File(match_path, "r") as f:
        verified = [(a, b) for a in f for b in f[a]]
    assert set(verified) <= {(names[0], names[1])}
