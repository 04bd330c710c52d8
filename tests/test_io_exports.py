"""Exporters, track building, triangulation utilities, COLMAP model IO."""

import json
import sqlite3
from pathlib import Path

import h5py
import numpy as np
import pytest

from deep_image_matching_tpu.io.h5 import save_features, save_matches


@pytest.fixture
def toy_project(tmp_path, image_dir):
    """Small synthetic features/matches over the test images."""
    rng = np.random.default_rng(0)
    names = sorted(p.name for p in image_dir.iterdir())[:3]
    feature_path = tmp_path / "features.h5"
    match_path = tmp_path / "matches.h5"
    import cv2

    for name in names:
        img = cv2.imread(str(image_dir / name))
        h, w = img.shape[:2]
        kpts = rng.uniform([0, 0], [w - 1, h - 1], size=(50, 2)).astype(np.float32)
        save_features(
            feature_path, name,
            keypoints=kpts,
            descriptors=rng.normal(size=(50, 64)).astype(np.float32),
            scores=rng.random(50).astype(np.float32),
            image_size=np.array([w, h]),
        )
    # chain matches: img0<->img1, img1<->img2 share indices (tracks form)
    m01 = np.stack([np.arange(30), np.arange(30)], 1)
    m12 = np.stack([np.arange(20), np.arange(20)], 1)
    save_matches(match_path, names[0], names[1], m01)
    save_matches(match_path, names[1], names[2], m12)
    return names, feature_path, match_path, image_dir


def test_build_tracks(toy_project):
    from deep_image_matching_tpu.io.tracks import build_tracks

    names, feature_path, match_path, image_dir = toy_project
    img_names, tracks = build_tracks(match_path)
    assert len(img_names) == 3
    # 20 tracks span all 3 images; 10 span only (0,1)
    lens = sorted(len(t) for t in tracks)
    assert len(tracks) == 30
    assert lens.count(3) == 20
    assert lens.count(2) == 10


def test_native_unionfind_matches_scipy():
    from deep_image_matching_tpu.native import connected_components, _load_lib

    rng = np.random.default_rng(1)
    n = 500
    edges = rng.integers(0, n, size=(800, 2))
    roots = connected_components(n, edges)
    # same-component iff same root; compare against scipy labels
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as scc

    g = coo_matrix((np.ones(len(edges)), (edges[:, 0], edges[:, 1])), shape=(n, n))
    _, labels = scc(g, directed=False)
    # equivalence of partitions
    seen = {}
    for r, l in zip(roots, labels):
        if r in seen:
            assert seen[r] == l
        else:
            seen[r] = l
    assert len(set(seen.values())) == len(seen)


def test_bundler_export(toy_project, tmp_path):
    from deep_image_matching_tpu.io.h5_to_bundler import export_to_bundler

    names, feature_path, match_path, image_dir = toy_project
    out = export_to_bundler(image_dir, feature_path, match_path, tmp_path / "bundler")
    assert out.exists()
    lines = out.read_text().splitlines()
    assert lines[0].startswith("# Bundle file")
    n_cams, n_pts = map(int, lines[1].split())
    assert n_cams == 3
    assert n_pts == 30


def test_openmvg_export(toy_project, tmp_path):
    from deep_image_matching_tpu.io.h5_to_openmvg import export_to_openmvg

    names, feature_path, match_path, image_dir = toy_project
    out = export_to_openmvg(
        image_dir, feature_path, match_path, tmp_path / "openmvg"
    )
    sfm = json.loads((out / "matches" / "sfm_data.json").read_text())
    assert len(sfm["views"]) == len(list(image_dir.iterdir()))
    assert len(sfm["intrinsics"]) >= 1
    feats = list((out / "matches").glob("*.feat"))
    assert len(feats) == 3
    assert (out / "matches" / "matches.f.bin").exists()


def test_micmac_export(toy_project, tmp_path):
    from deep_image_matching_tpu.io.h5_to_micmac import export_to_micmac

    names, feature_path, match_path, image_dir = toy_project
    out = export_to_micmac(image_dir, feature_path, match_path, tmp_path / "micmac")
    homol = out / "Homol"
    f01 = homol / f"Pastis{names[0]}" / f"{names[1]}.txt"
    assert f01.exists()
    rows = f01.read_text().strip().splitlines()
    assert len(rows) == 30
    # symmetric file exists
    assert (homol / f"Pastis{names[1]}" / f"{names[0]}.txt").exists()


def test_micmac_roundtrip(toy_project, tmp_path):
    """Homol export -> micmac_to_h5 import recovers the same tie-point
    coordinates per pair (the reference ships this importer as a stub)."""
    from deep_image_matching_tpu.io.h5_to_micmac import (
        export_to_micmac, get_matched_coords,
    )
    from deep_image_matching_tpu.io.micmac_to_h5 import micmac_to_h5

    names, feature_path, match_path, image_dir = toy_project
    out = export_to_micmac(image_dir, feature_path, match_path, tmp_path / "mm")
    f2 = tmp_path / "back_features.h5"
    m2 = tmp_path / "back_matches.h5"
    micmac_to_h5(out / "Homol", f2, m2)

    with h5py.File(m2) as fd:
        pairs = [(a, b) for a in fd for b in fd[a]]
    assert len(pairs) == 2
    for a, b in pairs:
        orig0, orig1 = get_matched_coords(feature_path, match_path, a, b)
        back0, back1 = get_matched_coords(f2, m2, a, b)
        # same tie points, up to the 1e-6 text precision and row order
        o = np.concatenate([orig0, orig1], 1)
        r = np.concatenate([back0, back1], 1)
        o = o[np.lexsort(o.T[::-1])]
        r = r[np.lexsort(r.T[::-1])]
        np.testing.assert_allclose(r, o, atol=1e-4)


def test_colmap_model_roundtrip(tmp_path):
    from deep_image_matching_tpu.io.colmap_read_write_model import (
        Camera, Image, Point3D, read_model, write_model,
    )

    cameras = {
        1: Camera(1, "SIMPLE_RADIAL", 640, 480, np.array([700.0, 320.0, 240.0, 0.01]))
    }
    images = {
        1: Image(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "a.jpg",
                 np.array([[1.0, 2.0]]), np.array([5])),
        2: Image(2, np.array([0.9, 0.1, 0, 0]), np.ones(3), 1, "b.jpg",
                 np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    points = {
        5: Point3D(5, np.array([0.0, 1.0, 2.0]), np.array([10, 20, 30]), 0.5,
                   np.array([1]), np.array([0]))
    }
    for ext in (".txt", ".bin"):
        d = tmp_path / ext.strip(".")
        write_model(cameras, images, points, d, ext=ext)
        c2, i2, p2 = read_model(d, ext=ext)
        assert c2[1].model == "SIMPLE_RADIAL"
        np.testing.assert_allclose(c2[1].params, cameras[1].params)
        assert i2[1].name == "a.jpg"
        np.testing.assert_allclose(i2[2].tvec, np.ones(3))
        np.testing.assert_allclose(p2[5].xyz, [0.0, 1.0, 2.0])


def test_triangulation_db_from_poses(toy_project, tmp_path):
    from deep_image_matching_tpu.io.colmap_read_write_model import (
        Camera, Image, write_model,
    )
    from deep_image_matching_tpu.triangulation import db_from_existing_poses

    names, feature_path, match_path, image_dir = toy_project
    # synthetic model with 3 posed images sharing one camera
    cameras = {1: Camera(1, "PINHOLE", 800, 533, np.array([800.0, 800.0, 400.0, 266.0]))}
    images = {}
    for i, name in enumerate(names):
        images[i + 1] = Image(
            i + 1, np.array([1.0, 0, 0, 0]), np.array([i * 1.0, 0, 0]), 1,
            name, np.zeros((0, 2)), np.zeros(0, np.int64),
        )
    model_dir = tmp_path / "model"
    write_model(cameras, images, {}, model_dir, ext=".txt")

    db_path = tmp_path / "tri.db"
    db_from_existing_poses(model_dir, feature_path, match_path, db_path)
    con = sqlite3.connect(db_path)
    assert con.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 3
    assert con.execute("SELECT COUNT(*) FROM keypoints").fetchone()[0] == 3
    assert con.execute("SELECT COUNT(*) FROM matches").fetchone()[0] == 2
    con.close()


def test_epipolar_errors_zero_for_consistent_points():
    from deep_image_matching_tpu.triangulation import compute_epipolar_errors

    rng = np.random.default_rng(2)
    # F for pure horizontal translation: x1 = x0 + t -> y0 == y1
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], float)
    p0 = rng.uniform(0, 100, (50, 2))
    p1 = p0 + np.array([10.0, 0.0])
    d0, d1 = compute_epipolar_errors(F, p0, p1)
    assert d0.max() < 1e-9
    assert d1.max() < 1e-9


def test_dense_to_multiview(toy_project, tmp_path):
    from deep_image_matching_tpu.utils.dense_to_multiview import dense_to_multiview

    names, feature_path, match_path, image_dir = toy_project
    db = tmp_path / "mv.db"
    mvf, mvm = dense_to_multiview(feature_path, match_path, db, image_dir)
    assert mvf.exists() and mvm.exists() and db.exists()
    with h5py.File(mvf, "r") as fd:
        assert len(fd) == 3
        for name in fd:
            assert "keypoints" in fd[name]


def test_upright_rotation_roundtrip(tmp_path, image_dir):
    import cv2

    from deep_image_matching_tpu.upright import (
        rotate_image, rotate_keypoints_back,
    )

    img = cv2.imread(str(sorted(image_dir.iterdir())[0]), cv2.IMREAD_GRAYSCALE)
    h, w = img.shape
    for deg in (0, 90, 180, 270):
        rot = rotate_image(img, deg)
        rh, rw = rot.shape
        # probe: a known pixel in the rotated image maps back correctly
        pts = np.array([[10.0, 20.0], [rw - 5.0, rh - 7.0]], np.float32)
        back = rotate_keypoints_back(pts, deg, (rw, rh))
        for (rx, ry), (ox, oy) in zip(pts.astype(int), back.astype(int)):
            assert img[oy, ox] == rot[ry, rx]


def test_bundler_proximity_merging(tmp_path, image_dir):
    """Two distinct keypoints within px_tolerance in a shared image, observed
    from two different pairs, must merge into ONE track (reference
    h5_to_bundler.py:517 proximity merging + :788 chain resolution)."""
    from deep_image_matching_tpu.io.h5_to_bundler import export_to_bundler

    names = sorted(p.name for p in image_dir.iterdir())[:3]
    feature_path = tmp_path / "features.h5"
    match_path = tmp_path / "matches.h5"
    import cv2

    rng = np.random.default_rng(3)
    for i, name in enumerate(names):
        img = cv2.imread(str(image_dir / name))
        h, w = img.shape[:2]
        kpts = rng.uniform([10, 10], [w - 10, h - 10], (10, 2)).astype(np.float32)
        if i == 1:
            kpts[1] = kpts[0] + 0.4  # sub-tolerance near-duplicate in image 1
        descs = rng.normal(size=(10, 8)).astype(np.float32)
        descs[1] = descs[0]  # identical descriptors for the near-duplicates
        save_features(feature_path, name, keypoints=kpts, descriptors=descs,
                      scores=np.ones(10, np.float32),
                      image_size=np.array([w, h]))
    # pair (0,1) matches kpt0<->kpt0; pair (1,2) matches kpt1<->kpt0:
    # without merging these are two tracks; with px_tolerance=1 they join
    save_matches(match_path, names[0], names[1], np.array([[0, 0]]))
    save_matches(match_path, names[1], names[2], np.array([[1, 0]]))

    out_merge = export_to_bundler(
        image_dir, feature_path, match_path, tmp_path / "merged",
        px_tolerance=1.0, use_descriptors=True,
    )
    lines = out_merge.read_text().splitlines()
    n_cams, n_tracks = map(int, lines[1].split())
    assert n_tracks == 1, f"expected 1 merged track, got {n_tracks}"
    # observation line: 3 observations across 3 images
    obs_line = lines[2 + 5 * n_cams + 2]
    assert obs_line.split()[0] == "3"

    out_none = export_to_bundler(
        image_dir, feature_path, match_path, tmp_path / "unmerged",
        px_tolerance=0.0,
    )
    lines = out_none.read_text().splitlines()
    _, n_tracks = map(int, lines[1].split())
    assert n_tracks == 2


def test_bundler_descriptor_gate_blocks_merge(tmp_path, image_dir):
    """Spatially close observations with DISSIMILAR descriptors must NOT
    merge when use_descriptors=True (reference :648,774 cosine gating)."""
    from deep_image_matching_tpu.io.h5_to_bundler import export_to_bundler

    names = sorted(p.name for p in image_dir.iterdir())[:3]
    feature_path = tmp_path / "features.h5"
    match_path = tmp_path / "matches.h5"
    import cv2

    rng = np.random.default_rng(4)
    for i, name in enumerate(names):
        img = cv2.imread(str(image_dir / name))
        h, w = img.shape[:2]
        kpts = rng.uniform([10, 10], [w - 10, h - 10], (10, 2)).astype(np.float32)
        descs = np.zeros((10, 8), np.float32)
        descs[np.arange(10), np.arange(10) % 8] = 1.0  # orthogonal units
        if i == 1:
            kpts[1] = kpts[0] + 0.4
            descs[1, :] = 0.0
            descs[1, 7] = 1.0  # orthogonal to descs[0]
        save_features(feature_path, name, keypoints=kpts, descriptors=descs,
                      scores=np.ones(10, np.float32),
                      image_size=np.array([w, h]))
    save_matches(match_path, names[0], names[1], np.array([[0, 0]]))
    save_matches(match_path, names[1], names[2], np.array([[1, 0]]))

    out = export_to_bundler(
        image_dir, feature_path, match_path, tmp_path / "gated",
        px_tolerance=1.0, use_descriptors=True, descriptor_threshold=0.8,
    )
    lines = out.read_text().splitlines()
    _, n_tracks = map(int, lines[1].split())
    assert n_tracks == 2, "orthogonal descriptors must block the merge"


def test_bundler_camera_config(tmp_path, image_dir, toy_project):
    """cameras.yaml focal/k1/k2 must appear in the camera block (reference
    _parse_camera_config :146-213)."""
    from deep_image_matching_tpu.io.h5_to_bundler import export_to_bundler

    names, feature_path, match_path, image_dir = toy_project
    cfg = tmp_path / "cameras.yaml"
    cfg.write_text(
        "general:\n  single_camera: false\n"
        f"cam0:\n  images: \"{names[0]}\"\n  intrinsics: [1234.5, 0, 0, 0.01, -0.002]\n"
    )
    out = export_to_bundler(
        image_dir, feature_path, match_path, tmp_path / "cams",
        camera_config_path=cfg,
    )
    lines = out.read_text().splitlines()
    assert lines[2].split() == ["1234.5", "0.01", "-0.002"]
