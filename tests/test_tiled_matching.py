"""Tiled extraction + tiled matching end-to-end (grid and exhaustive)."""

import numpy as np
from pathlib import Path
import pytest

from deep_image_matching_tpu.config import Config
from deep_image_matching_tpu.image_matching import ImageMatcher
from deep_image_matching_tpu.io.h5 import get_features, get_matches, list_pairs

pytestmark = pytest.mark.slow


def test_tile_pair_selection_math():
    from deep_image_matching_tpu.constants import TileSelection
    from deep_image_matching_tpu.matchers.tiling import (
        points_in_tiles, select_tile_pairs, tile_grid_for,
    )

    origins, twh = tile_grid_for((200, 100), (100, 50), 0)
    assert len(origins) == 4
    pts = np.array([[10.0, 10.0], [150.0, 80.0]], np.float32)
    inm = points_in_tiles(pts, origins, twh)
    assert inm[0, 0] and not inm[0, 3]
    assert inm[1, 3] and not inm[1, 0]

    assert select_tile_pairs(TileSelection.GRID, 4, 4) == [(t, t) for t in range(4)]
    assert len(select_tile_pairs(TileSelection.EXHAUSTIVE, 2, 3)) == 6
    # preselection: matches concentrated in tile (0, 3)
    lp0 = np.tile(pts[0], (12, 1))
    lp1 = np.tile(pts[1], (12, 1))
    sel = select_tile_pairs(
        TileSelection.PRESELECTION, 4, 4,
        lowres_pts0=lp0, lowres_pts1=lp1,
        origins0=origins, origins1=origins, tile_wh0=twh, tile_wh1=twh,
        min_matches=10,
    )
    assert sel == [(0, 3)]


def test_affine_tile_preselection():
    """PRESELECTION_AFFINE_TRANSFORM: a pure-translation mapping selects
    exactly the translated tile pairs via projected-rectangle overlap."""
    from deep_image_matching_tpu.constants import TileSelection
    from deep_image_matching_tpu.matchers.tiling import (
        estimate_affine_ransac, select_tile_pairs, tile_grid_for,
    )

    rng = np.random.default_rng(1)
    # image 1 = image 0 shifted by (+100, 0): tile column t maps to column t+1
    src = rng.uniform(0, 200, size=(40, 2)).astype(np.float32)
    dst = src + np.array([100.0, 0.0], np.float32)
    A = estimate_affine_ransac(src, dst)
    np.testing.assert_allclose(A, [[1, 0, 100], [0, 1, 0]], atol=1e-3)

    # 2x2 grids of 100x50 tiles over a 200x100 image
    origins, twh = tile_grid_for((200, 100), (100, 50), 0)
    sel = select_tile_pairs(
        TileSelection.PRESELECTION_AFFINE_TRANSFORM, 4, 4,
        lowres_pts0=src, lowres_pts1=dst,
        origins0=origins, origins1=origins, tile_wh0=twh, tile_wh1=twh,
    )
    # origins order: (0,0), (100,0), (0,50), (100,50) -> tiles 0->1 and 2->3
    assert (0, 1) in sel and (2, 3) in sel
    assert (0, 0) not in sel and (1, 0) not in sel

    # outlier contamination: RANSAC still recovers the translation
    src_o = np.concatenate([src, rng.uniform(0, 200, (10, 2)).astype(np.float32)])
    dst_o = np.concatenate([dst, rng.uniform(0, 200, (10, 2)).astype(np.float32)])
    A2 = estimate_affine_ransac(src_o, dst_o)
    np.testing.assert_allclose(A2, [[1, 0, 100], [0, 1, 0]], atol=1e-2)

    # degenerate: too few points -> None -> caller falls back
    assert estimate_affine_ransac(src[:2], dst[:2]) is None


def test_lowres_probe_lightglue_path(image_dir):
    """LowResProbe routes through LightGlueRunner when one is set (the
    weights-present path); output shape contract holds."""
    import jax
    from deep_image_matching_tpu.matchers.tiling import LowResProbe
    from deep_image_matching_tpu.models.lightglue import (
        LightGlueRunner, init_params,
    )

    paths = sorted(image_dir.iterdir())[:2]
    probe = LowResProbe(preselection_size=256, max_keypoints=256)
    probe._lg = LightGlueRunner(
        params=init_params(jax.random.PRNGKey(0), n_layers=2),
        filter_threshold=0.0,
    )
    probe._lg_checked = True
    p0, p1 = probe.matches(paths[0], paths[1])
    assert p0.shape == p1.shape and p0.shape[1] == 2
    # fallback path still works on the same cached features
    probe._lg = None
    q0, q1 = probe.matches(paths[0], paths[1])
    assert q0.shape == q1.shape and q0.shape[1] == 2 and len(q0) > 0


def test_tiled_sift_pipeline(project_dir, image_dir):
    """SIFT with grid tiling: features carry tile_idx; tiled matching
    produces verified pairs equivalent to untiled on the same data."""
    args = {
        "dir": str(project_dir),
        "pipeline": "sift+kornia_matcher",
        "strategy": "bruteforce",
        "tiling": "grid",
        "skip_reconstruction": True,
        "force": True,
    }
    cfg = Config(args=args)
    cfg.general["tile_size"] = (400, 300)
    cfg.general["tile_overlap"] = 20
    matcher = ImageMatcher(cfg)
    feature_path, match_path = matcher.run()

    names = sorted({n for p in matcher.pairs for n in p})
    feats = get_features(feature_path, names[0])
    assert "tile_idx" in feats
    assert feats["tile_idx"].max() >= 1  # multiple tiles used

    pairs = list_pairs(match_path)
    assert len(pairs) >= 1
    m = get_matches(match_path, *pairs[0])
    assert len(m) >= 15
    # no duplicate query indices after dedup
    assert len(np.unique(m[:, 0])) == len(m)


def test_tiled_device_store_equals_host(project_dir, image_dir, monkeypatch):
    """Tiles-as-batch-dim on the device-resident store (SURVEY §7 step 7)
    produces bitwise-identical matches to the host-gather tiled path: the
    tile restriction is the same mask AND, applied on device."""
    def run(tag, force_device):
        if force_device:
            monkeypatch.setenv("DIM_TPU_FORCE_DEVICE_STORE", "1")
        else:
            monkeypatch.delenv("DIM_TPU_FORCE_DEVICE_STORE", raising=False)
        args = {
            "dir": str(project_dir),
            "outs": str(project_dir / f"out_{tag}"),
            "pipeline": "sift+kornia_matcher",
            "strategy": "bruteforce",
            "tiling": "grid",
            "skip_reconstruction": True,
            "force": True,
        }
        cfg = Config(args=args)
        cfg.general["tile_size"] = (400, 300)
        cfg.general["tile_overlap"] = 20
        matcher = ImageMatcher(cfg)
        _, match_path = matcher.run()
        return match_path

    mp_host = run("host", force_device=False)
    mp_dev = run("dev", force_device=True)
    pairs_host = sorted(list_pairs(mp_host))
    pairs_dev = sorted(list_pairs(mp_dev))
    assert pairs_host == pairs_dev and len(pairs_host) >= 1
    for a, b in pairs_host:
        np.testing.assert_array_equal(
            get_matches(mp_host, a, b), get_matches(mp_dev, a, b)
        )


def test_tiled_sift_pipeline_per_tile_gv(project_dir, image_dir):
    """geometric_verification_per_tile: each tile pair's matches verify
    independently (reference matcher_base.py:428-440); the pipeline still
    produces verified pairs on the test scene."""
    args = {
        "dir": str(project_dir),
        "pipeline": "sift+kornia_matcher",
        "strategy": "bruteforce",
        "tiling": "grid",
        "skip_reconstruction": True,
        "force": True,
    }
    cfg = Config(args=args)
    cfg.general["tile_size"] = (400, 300)
    cfg.general["tile_overlap"] = 20
    cfg.general["geometric_verification_per_tile"] = True
    cfg.general["gv_threshold_in_tiles_matching"] = 4
    matcher = ImageMatcher(cfg)
    feature_path, match_path = matcher.run()
    pairs = list_pairs(match_path)
    assert len(pairs) >= 1
    m = get_matches(match_path, *pairs[0])
    assert len(m) >= 15


def test_tiles_as_batch_extraction_equals_loop(image_dir):
    """The tiles-as-batch `_extract_many` override (one padded device
    program per shape bucket) produces the same features as the base
    per-tile loop. At quality HIGH the uint8 tile path normalizes on device
    (/255 in f32), bitwise-identical to the host f32 load."""
    from deep_image_matching_tpu.extractors.superpoint import (
        SuperPointExtractor,
    )

    cfg = {
        "extractor": {"name": "superpoint", "max_keypoints": 512},
        "general": {"tile_selection": __import__(
            "deep_image_matching_tpu.constants", fromlist=["TileSelection"]
        ).TileSelection.GRID, "tile_size": (300, 260), "tile_overlap": 16},
    }
    img = sorted(Path(image_dir).iterdir())[0]

    ex_batched = SuperPointExtractor(dict(cfg))
    f_b = ex_batched.extract(img)

    ex_loop = SuperPointExtractor(dict(cfg))
    orig_many = ex_loop._extract_many
    ex_loop._extract_many = (
        lambda images: [orig_many([im])[0] for im in images]
    )
    f_l = ex_loop.extract(img)

    np.testing.assert_array_equal(f_b["keypoints"], f_l["keypoints"])
    np.testing.assert_array_equal(f_b["tile_idx"], f_l["tile_idx"])
    np.testing.assert_allclose(
        f_b["descriptors"], f_l["descriptors"], atol=1e-6
    )
    assert f_b["tile_idx"].max() >= 1  # multiple tiles actually used


def test_roma_probe_selected_by_config(project_dir, monkeypatch):
    """preselection_pipeline: roma wires the RomaProbe into tile selection
    (reference matcher_base.py:1095-1110). The probe itself is exercised via
    a stub (running real RoMa on CPU is the slow-tier roma test's job)."""
    from deep_image_matching_tpu.matchers import tiling as tiling_mod

    calls = {}

    class _StubRoma:
        def matches(self, p0, p1):
            calls["probe"] = (p0, p1)
            return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)

    monkeypatch.setattr(tiling_mod, "RomaProbe", lambda: _StubRoma())
    args = {
        "dir": str(project_dir),
        "pipeline": "sift+kornia_matcher",
        "strategy": "bruteforce",
        "tiling": "preselection",
        "skip_reconstruction": True,
        "force": True,
    }
    cfg = Config(args=args)
    cfg.general["tile_size"] = (400, 300)
    cfg.general["preselection_pipeline"] = "roma"
    matcher = ImageMatcher(cfg)
    matcher.run()
    assert "probe" in calls, "RomaProbe was not used for preselection"
