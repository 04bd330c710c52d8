"""Full-pipeline multi-device equality: ``ImageMatcher.run()`` on the
8-virtual-device CPU mesh must produce the same artifacts as on 1 device.

Op-level sharded==unsharded is covered by ``tests/test_parallel.py``; this
covers the PRODUCTION mesh branch end-to-end — pair chunking, batch padding
to the mesh size (``parallel/mesh.py::pad_batch``), the sharded dispatch in
``matchers/matcher_base.py::_dispatch_chunk``, geometric verification, and
the single-writer h5 path — by diffing the resulting features.h5/matches.h5
content between mesh sizes.

Reference behavior being matched: the torch pipeline is single-device; its
per-pair loop (``image_matching.py:467-487``) defines the ground truth the
mesh run must reproduce exactly.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

import jax

from deep_image_matching_tpu.io.h5 import (
    get_features,
    get_matches,
    list_h5_names,
    list_pairs,
)

pytestmark = pytest.mark.slow

REFERENCE_IMAGES = Path(
    "/root/reference/assets/example_sacre_coeur/images"
)


def _run_pipeline(project_dir: Path, devices, tiling: bool = False):
    from deep_image_matching_tpu import image_matching
    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.parallel import mesh as mesh_mod

    prev = mesh_mod._DEFAULT_MESH
    mesh_mod._DEFAULT_MESH = mesh_mod.MeshRunner(devices=devices)
    try:
        args = {
            "dir": str(project_dir),
            "pipeline": "sift+kornia_matcher",
            "strategy": "bruteforce",
            "skip_reconstruction": True,
            "force": True,
        }
        if tiling:
            args["tiling"] = "grid"
        cfg = Config(args=args)
        if tiling:
            cfg.general["tile_size"] = (400, 300)
            cfg.general["tile_overlap"] = 20
        matcher = image_matching.ImageMatcher(cfg)
        feature_path, match_path = matcher.run()
    finally:
        mesh_mod._DEFAULT_MESH = prev
    return feature_path, match_path


@pytest.mark.skipif(
    not REFERENCE_IMAGES.exists(), reason="reference assets not available"
)
def test_pipeline_mesh_equals_single_device(tmp_path):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device (virtual CPU) test mesh")

    proj_multi = tmp_path / "multi"
    proj_single = tmp_path / "single"
    for proj in (proj_multi, proj_single):
        proj.mkdir()
        shutil.copytree(REFERENCE_IMAGES, proj / "images")

    # the mesh run must actually use the mesh-resident store (no silent
    # fallback to host gathers)
    from deep_image_matching_tpu.matchers import matcher_base as mb

    calls = {"n": 0}
    orig = mb._PaddedFeatureStore.gather_device_mesh

    def spy(self, idx, mesh):
        out = orig(self, idx, mesh)
        calls["n"] += 1
        return out

    mb._PaddedFeatureStore.gather_device_mesh = spy
    try:
        feat_m, match_m = _run_pipeline(proj_multi, devs)
    finally:
        mb._PaddedFeatureStore.gather_device_mesh = orig
    assert calls["n"] > 0, "mesh-resident store gather did not engage"
    feat_s, match_s = _run_pipeline(proj_single, devs[:1])

    # identical feature content (extraction is host-side and deterministic,
    # but the h5 must round-trip identically through both runs)
    names_m = sorted(list_h5_names(feat_m))
    names_s = sorted(list_h5_names(feat_s))
    assert names_m == names_s and len(names_m) == 5
    for n in names_m:
        fm, fs = get_features(feat_m, n), get_features(feat_s, n)
        np.testing.assert_array_equal(fm["keypoints"], fs["keypoints"])
        np.testing.assert_array_equal(fm["descriptors"], fs["descriptors"])

    # identical verified matches for every pair
    pairs_m = {tuple(p) for p in list_pairs(match_m)}
    pairs_s = {tuple(p) for p in list_pairs(match_s)}
    assert pairs_m == pairs_s and len(pairs_m) >= 3
    total = 0
    for a, b in sorted(pairs_m):
        mm, ms = get_matches(match_m, a, b), get_matches(match_s, a, b)
        # canonical row order (the writer preserves order, but don't let an
        # implementation-detail permutation fail an equality of content)
        mm = mm[np.lexsort(mm.T[::-1])]
        ms = ms[np.lexsort(ms.T[::-1])]
        np.testing.assert_array_equal(mm, ms, err_msg=f"pair {a}-{b}")
        total += len(mm)
    assert total > 200


@pytest.mark.skipif(
    not REFERENCE_IMAGES.exists(), reason="reference assets not available"
)
def test_tiled_pipeline_mesh_equals_single_device(tmp_path, monkeypatch):
    """Tiled matching on the >1-device mesh (SPMD tiles-as-batch-dim:
    replicated store + tile table, batch-sharded tile-pair jobs) must
    reproduce the single-device tiled run exactly."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device (virtual CPU) test mesh")
    # the CPU test env needs the device-store path forced on
    monkeypatch.setenv("DIM_TPU_FORCE_DEVICE_STORE", "1")

    proj_multi = tmp_path / "multi"
    proj_single = tmp_path / "single"
    for proj in (proj_multi, proj_single):
        proj.mkdir()
        shutil.copytree(REFERENCE_IMAGES, proj / "images")

    from deep_image_matching_tpu.matchers import matcher_base as mb

    calls = {"n": 0}
    orig = mb._PaddedFeatureStore.gather_device_mesh_tiled

    def spy(self, idx, tiles, mesh):
        out = orig(self, idx, tiles, mesh)
        calls["n"] += 1
        return out

    mb._PaddedFeatureStore.gather_device_mesh_tiled = spy
    try:
        _, match_m = _run_pipeline(proj_multi, devs, tiling=True)
    finally:
        mb._PaddedFeatureStore.gather_device_mesh_tiled = orig
    assert calls["n"] > 0, "mesh tiled store gather did not engage"
    _, match_s = _run_pipeline(proj_single, devs[:1], tiling=True)

    pairs_m = {tuple(p) for p in list_pairs(match_m)}
    pairs_s = {tuple(p) for p in list_pairs(match_s)}
    assert pairs_m == pairs_s and len(pairs_m) >= 1
    for a, b in sorted(pairs_m):
        mm, ms = get_matches(match_m, a, b), get_matches(match_s, a, b)
        mm = mm[np.lexsort(mm.T[::-1])]
        ms = ms[np.lexsort(ms.T[::-1])]
        np.testing.assert_array_equal(mm, ms, err_msg=f"pair {a}-{b}")
