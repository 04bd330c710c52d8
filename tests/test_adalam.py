"""Exact AdaLAM (ops/adalam.py): synthetic-motion ground truth tests.

A known locally-affine motion field with injected outliers — the filter must
keep the affine-consistent matches and reject the random ones (reference
semantics: kornia match_adalam / Cavalli ECCV'20)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_image_matching_tpu.ops.adalam import adalam_filter, adalam_filter_np


def _scene(n_in=300, n_out=60, seed=0):
    """Inliers follow two different affinities (left/right half); outliers
    map to random locations."""
    rng = np.random.default_rng(seed)
    W = H = 1000.0
    k0 = rng.uniform([0, 0], [W, H], (n_in + n_out, 2)).astype(np.float32)
    A_left = np.array([[1.05, 0.08], [-0.05, 0.97]], np.float32)
    A_right = np.array([[0.9, -0.1], [0.12, 1.1]], np.float32)
    t_left = np.array([30.0, -12.0], np.float32)
    t_right = np.array([-25.0, 40.0], np.float32)
    k1 = np.empty_like(k0)
    left = k0[:, 0] < W / 2
    k1[left] = k0[left] @ A_left.T + t_left
    k1[~left] = k0[~left] @ A_right.T + t_right
    # outliers: random targets
    k1[n_in:] = rng.uniform([0, 0], [W, H], (n_out, 2))
    k1 += rng.normal(0, 0.5, k1.shape)  # localization noise
    matches0 = np.arange(len(k0), dtype=np.int32)
    valid = np.ones(len(k0), bool)
    ratios = rng.uniform(0.4, 0.8, len(k0)).astype(np.float32)
    gt_inlier = np.zeros(len(k0), bool)
    gt_inlier[:n_in] = True
    return k0, k1, matches0, valid, ratios, (W, H), gt_inlier


def test_adalam_keeps_affine_consistent_rejects_outliers():
    k0, k1, m0, valid, ratios, wh, gt = _scene()
    keep = adalam_filter_np(k0, k1, m0, valid, ratios, wh, wh,
                            force_seed_mnn=False)
    recall = keep[gt].mean()
    false_rate = keep[~gt].mean()
    assert recall > 0.8, f"recall {recall:.2f}"
    assert false_rate < 0.15, f"outlier leak {false_rate:.2f}"


def test_adalam_invalid_candidates_stay_invalid():
    k0, k1, m0, valid, ratios, wh, gt = _scene(n_in=100, n_out=20, seed=1)
    valid[::3] = False
    keep = adalam_filter_np(k0, k1, m0, valid, ratios, wh, wh,
                            force_seed_mnn=False)
    assert not keep[~valid].any()


def test_adalam_all_outliers_rejected():
    rng = np.random.default_rng(2)
    n = 200
    k0 = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
    k1 = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
    keep = adalam_filter_np(
        k0, k1, np.arange(n, dtype=np.int32), np.ones(n, bool),
        rng.uniform(0.4, 0.8, n).astype(np.float32),
        (1000, 1000), (1000, 1000), force_seed_mnn=False,
    )
    assert keep.mean() < 0.1, f"random motion kept {keep.mean():.2f}"


def test_adalam_orientation_gate():
    """Members whose relative rotation disagrees with the seed's must be
    excluded from its neighborhood (they can still be verified elsewhere,
    so test with a scene where rotation is the only discriminator)."""
    k0, k1, m0, valid, ratios, wh, gt = _scene(n_in=200, n_out=0, seed=3)
    rng = np.random.default_rng(4)
    ori0 = np.zeros(len(k0), np.float32)
    ori1 = np.zeros(len(k0), np.float32)
    # half the matches claim a wildly different rotation
    bad = rng.random(len(k0)) < 0.3
    ori1[bad] = 120.0
    keep_gated = adalam_filter_np(
        k0, k1, m0, valid, ratios, wh, wh, force_seed_mnn=False,
        ori0=jnp.asarray(ori0), ori1=jnp.asarray(ori1),
    )
    # without the gate everything passes (consistent affine field)
    keep_plain = adalam_filter_np(
        k0, k1, m0, valid, ratios, wh, wh, force_seed_mnn=False,
    )
    assert keep_plain[bad].mean() > keep_gated[bad].mean()


def test_adalam_batched_vmap():
    k0, k1, m0, valid, ratios, wh, gt = _scene(n_in=150, n_out=30, seed=5)
    B = 2
    stack = lambda a: jnp.asarray(np.stack([a] * B))
    keys = jnp.stack([jax.random.PRNGKey(0)] * B)
    keep = jax.vmap(
        lambda a, b, c, d, e, k: adalam_filter(
            a, b, c, d, e,
            jnp.asarray(np.asarray(wh, np.float32)),
            jnp.asarray(np.asarray(wh, np.float32)), k,
            force_seed_mnn=False,
        )
    )(stack(k0), stack(k1), stack(m0), stack(valid), stack(ratios), keys)
    keep = np.asarray(keep)
    assert keep.shape == (B, len(k0))
    np.testing.assert_array_equal(keep[0], keep[1])  # same scene + key


def test_adalam_matcher_pipeline_smoke(tmp_path):
    """AdalamMatcher (exact mode) through the real pipeline on the bundled
    test images with SIFT features."""
    import shutil
    from pathlib import Path

    src_imgs = Path("/root/reference/assets/pytest/images")
    if not src_imgs.is_dir():
        pytest.skip("no test images")
    proj = tmp_path / "proj"
    (proj / "images").mkdir(parents=True)
    for f in src_imgs.iterdir():
        shutil.copy(f, proj / "images" / f.name)

    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.image_matching import ImageMatcher
    from deep_image_matching_tpu.io.h5 import list_pairs, get_matches

    cfg = Config(
        args={
            "dir": str(proj), "pipeline": "sift+kornia_matcher",
            "strategy": "bruteforce", "skip_reconstruction": True,
            "force": True,
        },
        matcher={"name": "adalam", "match_mode": "adalam"},
    )
    im = ImageMatcher(cfg)
    feature_path, match_path = im.run()
    pairs = list_pairs(match_path)
    assert len(pairs) >= 1
    m = get_matches(match_path, *pairs[0])
    assert len(m) >= 15
