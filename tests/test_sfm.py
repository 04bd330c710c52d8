"""Native SfM: geometry primitives, device bundle adjustment, and the
incremental mapper end-to-end on a synthetic scene written through the real
COLMAP database layer.

Mirrors the reference's reconstruction coverage (reference
``tests/test_pipelines.py:123-151`` runs pycolmap end-to-end); here the
assertions are numeric (pose/intrinsics recovery) because the scene is
synthetic with known ground truth.
"""

import numpy as np
import pytest

from deep_image_matching_tpu.sfm import geometry as G
from deep_image_matching_tpu.sfm.ba import bundle_adjust


def _make_scene(rng, n_cams=6, n_pts=600, f=900.0, k1=-0.05):
    intr = np.array([f, 320.0, 240.0, k1])
    X = rng.uniform([-3, -3, 6], [3, 3, 12], (n_pts, 3))
    poses = []
    for i in range(n_cams):
        rv = rng.normal(0, 0.08, 3)
        R = G.rotvec_to_matrix(rv)
        c = np.array([i * 0.8 - 2, rng.normal(0, 0.2), rng.normal(0, 0.2)])
        poses.append(np.concatenate([rv, -R @ c]))
    return intr, X, np.array(poses)


def test_rotvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        rv = rng.normal(size=3) * rng.uniform(0, 3.1)
        R = G.rotvec_to_matrix(rv)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)
        rv2 = G.matrix_to_rotvec(R)
        assert np.allclose(G.rotvec_to_matrix(rv2), R, atol=1e-8)


def test_triangulate_and_project_exact():
    rng = np.random.default_rng(1)
    intr, X, poses = _make_scene(rng, n_cams=2)
    R1 = G.rotvec_to_matrix(poses[1, :3])
    uv0, z0 = G.project_points(intr, np.eye(3), np.zeros(3), X)
    uv1, z1 = G.project_points(intr, R1, poses[1, 3:], X)
    assert (z0 > 0).all() and (z1 > 0).all()
    x0 = G.undistort_normalized(intr, uv0)
    x1 = G.undistort_normalized(intr, uv1)
    P0 = G.pose_to_P(np.eye(3), np.zeros(3))
    P1 = G.pose_to_P(R1, poses[1, 3:])
    Xt = G.triangulate_dlt(P0, P1, x0, x1)
    assert np.abs(Xt - X).max() < 1e-8


def test_essential_decomposition_recovers_pose():
    rng = np.random.default_rng(2)
    intr, X, poses = _make_scene(rng, n_cams=2)
    R1 = G.rotvec_to_matrix(poses[1, :3])
    t1 = poses[1, 3:]
    uv0, _ = G.project_points(intr, np.eye(3), np.zeros(3), X)
    uv1, _ = G.project_points(intr, R1, t1, X)
    x0 = G.undistort_normalized(intr, uv0)
    x1 = G.undistort_normalized(intr, uv1)
    E, mask = G.ransac_essential(x0, x1, thresh=1.0 / intr[0], n_iters=50)
    assert mask.sum() > 0.95 * len(x0)
    R, t, front = G.decompose_essential(E, x0[mask], x1[mask])
    rot_err = np.linalg.norm(G.matrix_to_rotvec(R @ R1.T))
    assert np.degrees(rot_err) < 0.1
    cos = np.dot(t / np.linalg.norm(t), t1 / np.linalg.norm(t1))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(3)
    intr, X, poses = _make_scene(rng, n_cams=2)
    R1 = G.rotvec_to_matrix(poses[1, :3])
    t1 = poses[1, 3:]
    uv, _ = G.project_points(intr, R1, t1, X)
    uv = uv + rng.normal(0, 0.5, uv.shape)
    out = rng.random(len(uv)) < 0.25
    uv[out] = rng.uniform([0, 0], [640, 480], (out.sum(), 2))
    res = G.pnp_ransac(X, uv, intr, n_hyp=256, thresh_px=4.0,
                       rng=np.random.default_rng(0))
    assert res is not None
    R, t, mask = res
    assert mask.sum() >= 0.9 * (~out).sum()
    assert np.degrees(np.linalg.norm(G.matrix_to_rotvec(R @ R1.T))) < 0.5
    assert np.linalg.norm(t - t1) < 0.05


def test_pnp_planar_scene():
    """DLT degenerates on planar scenes; the cv2 path (or refit) must cope."""
    pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    intr = np.array([900.0, 320.0, 240.0, 0.0])
    X = rng.uniform([-3, -3, 0], [3, 3, 0], (300, 3)) + [0, 0, 8.0]
    X[:, 2] += rng.normal(0, 0.01, len(X))  # quasi-planar facade
    rv = np.array([0.1, -0.2, 0.05])
    R = G.rotvec_to_matrix(rv)
    t = np.array([0.4, -0.1, 0.5])
    uv, _ = G.project_points(intr, R, t, X)
    uv += rng.normal(0, 0.5, uv.shape)
    res = G.pnp_ransac(X, uv, intr, thresh_px=4.0)
    assert res is not None
    Rp, tp, mask = res
    assert mask.sum() > 0.9 * len(X)
    assert np.degrees(np.linalg.norm(G.matrix_to_rotvec(Rp @ R.T))) < 0.5


def _observations(intr, X, poses, rng, noise=0.4):
    obs = [[], [], [], []]
    for i, p in enumerate(poses):
        R = G.rotvec_to_matrix(p[:3])
        uv, z = G.project_points(intr, R, p[3:], X)
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        )
        idx = np.where(vis)[0]
        obs[0].append(np.full(len(idx), i))
        obs[1].append(np.zeros(len(idx), int))
        obs[2].append(idx)
        obs[3].append(uv[idx] + rng.normal(0, noise, (len(idx), 2)))
    return [np.concatenate(o) for o in obs]


def test_bundle_adjust_converges_to_noise_floor():
    rng = np.random.default_rng(5)
    intr, X, poses = _make_scene(rng)
    obs_pose, obs_cam, obs_pt, obs_uv = _observations(intr, X, poses, rng)
    poses0 = poses + rng.normal(0, 0.02, poses.shape)
    poses0[0] = poses[0]
    X0 = X + rng.normal(0, 0.05, X.shape)
    intr0 = np.array([[950.0, 320.0, 240.0, 0.0]])
    pose_free = np.ones((len(poses), 6))
    pose_free[0] = 0
    pose_free[1, 3] = 0
    intr_free = np.array([[1.0, 0, 0, 1.0]])
    out = bundle_adjust(
        poses0, intr0, X0, obs_pose, obs_cam, obs_pt, obs_uv,
        pose_free, intr_free, n_lm_iters=30, n_cg_iters=30,
    )

    def rms(poses_, intr_, pts_):
        errs = []
        for i in range(len(poses_)):
            R = G.rotvec_to_matrix(poses_[i, :3])
            sel = obs_pose == i
            uv, _ = G.project_points(intr_[0], R, poses_[i, 3:], pts_[obs_pt[sel]])
            errs.append(np.linalg.norm(uv - obs_uv[sel], axis=1))
        e = np.concatenate(errs)
        return np.sqrt((e**2).mean())

    assert rms(poses0, intr0, X0) > 5.0  # the perturbation was real
    final = rms(out["poses"], out["intr"], out["points"])
    assert final < 0.8  # ~ the 0.4 px injected noise
    # gauge pose untouched
    assert np.allclose(out["poses"][0], poses[0], atol=1e-6)


def test_incremental_mapper_end_to_end(tmp_path):
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.io.colmap_read_write_model import (
        qvec2rotmat, read_model,
    )
    from deep_image_matching_tpu.sfm.incremental import (
        native_incremental_mapping,
    )

    rng = np.random.default_rng(6)
    intr, X, poses = _make_scene(rng, n_cams=6, n_pts=900, k1=0.0)
    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        uv, z = G.project_points(intr, R, p[3:], X)
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        )
        ids = np.where(vis)[0]
        ids = ids[rng.permutation(len(ids))]
        kpts.append(uv[ids] + rng.normal(0, 0.4, (len(ids), 2)))
        vis_ids.append(ids)

    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    cam_id = db.add_camera(2, 640, 480, intr)
    img_ids = []
    for i in range(len(poses)):
        iid = db.add_image(f"img{i}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    for i in range(len(poses)):
        for j in range(i + 1, min(i + 4, len(poses))):
            _, ia, ib = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True
            )
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            m = m[rng.random(len(m)) < 0.8]
            db.add_matches(img_ids[i], img_ids[j], m)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
    db.commit()
    db.close()

    res = native_incremental_mapping(tmp_path / "database.db", tmp_path, tmp_path)
    assert res is not None
    cameras, images, points3D = res
    assert len(images) == len(poses)
    assert len(points3D) > 500
    # focal recovered within 2%
    assert abs(cameras[cam_id].params[0] - intr[0]) / intr[0] < 0.02
    # pairwise relative rotations within 0.5 deg of ground truth
    Rrec = {im.name: qvec2rotmat(im.qvec) for im in images.values()}
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            Rg = (
                G.rotvec_to_matrix(poses[j, :3])
                @ G.rotvec_to_matrix(poses[i, :3]).T
            )
            Rr = Rrec[f"img{j}.jpg"] @ Rrec[f"img{i}.jpg"].T
            err = np.degrees(np.linalg.norm(G.matrix_to_rotvec(Rr @ Rg.T)))
            assert err < 0.5, (i, j, err)
    # artifacts on disk, readable by the standard model reader
    rec = tmp_path / "reconstruction"
    cams2, imgs2, pts2 = read_model(rec, ".txt")
    assert len(imgs2) == len(images) and len(pts2) == len(points3D)
    assert (rec / "model.ply").stat().st_size > 1000


def test_native_triangulate_points_from_poses(tmp_path):
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.io.colmap_read_write_model import (
        Camera, Image, rotmat2qvec, write_model,
    )
    from deep_image_matching_tpu.sfm.incremental import (
        native_triangulate_points,
    )

    rng = np.random.default_rng(7)
    intr, X, poses = _make_scene(rng, n_cams=4, n_pts=500, k1=0.0)
    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        uv, z = G.project_points(intr, R, p[3:], X)
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        )
        ids = np.where(vis)[0]
        kpts.append(uv[ids] + rng.normal(0, 0.3, (len(ids), 2)))
        vis_ids.append(ids)

    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    cam_id = db.add_camera(2, 640, 480, intr)
    img_ids = []
    for i in range(len(poses)):
        iid = db.add_image(f"img{i}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            _, ia, ib = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True
            )
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
    db.commit()
    db.close()

    # ground-truth poses as a COLMAP model (no points)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    cameras = {
        cam_id: Camera(
            id=cam_id, model="SIMPLE_RADIAL", width=640, height=480,
            params=intr.copy(),
        )
    }
    images = {}
    for i, iid in enumerate(img_ids):
        R = G.rotvec_to_matrix(poses[i, :3])
        images[iid] = Image(
            id=iid, qvec=rotmat2qvec(R), tvec=poses[i, 3:].copy(),
            camera_id=cam_id, name=f"img{i}.jpg",
            xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, np.int64),
        )
    write_model(cameras, images, {}, model_dir, ext=".txt")

    out_dir = tmp_path / "triangulated"
    res = native_triangulate_points(
        model_dir, tmp_path / "database.db", tmp_path, out_dir
    )
    assert res is not None
    _, imgs_out, pts_out = res
    assert len(pts_out) > 300
    # triangulated points land near ground truth (poses were exact)
    errs = []
    for p in pts_out.values():
        d = np.linalg.norm(X - p.xyz, axis=1).min()
        errs.append(d)
    assert np.median(errs) < 0.05
    assert (out_dir / "points3D.txt").exists()


def test_build_tracks_matches_bruteforce_reference():
    """Vectorized native-union-find track builder == a brute-force
    transitive-closure implementation, including ambiguity dropping."""
    from deep_image_matching_tpu.sfm.incremental import SfMData, build_tracks

    rng = np.random.default_rng(7)
    n_imgs, n_kpts = 6, 40
    keypoints = {
        i: rng.random((n_kpts, 2)) * 100 for i in range(1, n_imgs + 1)
    }
    pair_matches = {}
    for a in range(1, n_imgs + 1):
        for b in range(a + 1, n_imgs + 1):
            m = rng.integers(0, n_kpts, (rng.integers(5, 25), 2))
            pair_matches[(a, b)] = np.unique(m, axis=0)
    data = SfMData(
        image_names={i: f"im{i}" for i in keypoints},
        image_cam={i: 1 for i in keypoints},
        keypoints=keypoints,
        cameras={1: {}},
        pair_matches=pair_matches,
    )

    # brute-force reference: python union-find with the same semantics
    offsets = {i: (i - 1) * n_kpts for i in keypoints}
    parent = list(range(n_imgs * n_kpts))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (a, b), m in pair_matches.items():
        for i0, i1 in m:
            ra, rb = find(offsets[a] + i0), find(offsets[b] + i1)
            if ra != rb:
                parent[rb] = ra
    comps = {}
    for img in keypoints:
        for k in range(n_kpts):
            comps.setdefault(find(offsets[img] + k), []).append((img, k))
    expected = set()
    for nodes in comps.values():
        imgs = [i for i, _ in nodes]
        if len(nodes) >= 2 and len(set(imgs)) == len(imgs):
            expected.add(frozenset(nodes))

    got = {frozenset(tr.items()) for tr in build_tracks(data)}
    assert got == expected


def test_opencv_camera_roundtrip_geometry():
    """project -> undistort round-trips with the full OPENCV model
    (fx != fy, k1, k2, p1, p2 all nonzero)."""
    rng = np.random.default_rng(11)
    intr = np.array([900.0, 940.0, 320.0, 240.0, -0.12, 0.03, 0.001, -0.0015])
    X = rng.uniform([-2, -2, 6], [2, 2, 10], (500, 3))
    R = G.rotvec_to_matrix(np.array([0.05, -0.1, 0.02]))
    t = np.array([0.2, -0.1, 0.3])
    uv, z = G.project_points(intr, R, t, X)
    assert (z > 0).all()
    xn = G.undistort_normalized(intr, uv)
    Xc = X @ R.T + t
    xn_true = Xc[:, :2] / Xc[:, 2:3]
    np.testing.assert_allclose(xn, xn_true, atol=1e-9)


def test_bundle_adjust_recovers_opencv_distortion():
    """BA with intr_free on k1/k2/p1/p2 recovers injected distortion."""
    from deep_image_matching_tpu.sfm.ba import bundle_adjust

    rng = np.random.default_rng(12)
    intr_true = np.array(
        [[900.0, 900.0, 320.0, 240.0, -0.15, 0.02, 0.002, -0.001]]
    )
    _, X, poses = _make_scene(rng, n_cams=4, n_pts=600)
    obs_pose, obs_cam, obs_pt, obs_uv = _observations(
        intr_true[0], X, poses, rng, noise=0.1
    )
    intr0 = intr_true.copy()
    intr0[0, 4:] = 0.0  # start from zero distortion
    pose_free = np.ones((len(poses), 6))
    pose_free[0] = 0
    pose_free[1, 3] = 0
    intr_free = np.zeros((1, 8))
    intr_free[0, 4:8] = 1.0
    out = bundle_adjust(
        poses, intr0, X, obs_pose, obs_cam, obs_pt, obs_uv,
        pose_free, intr_free, n_lm_iters=40, n_cg_iters=40,
    )
    got = out["intr"][0]
    assert abs(got[4] - intr_true[0, 4]) < 0.02, got
    assert abs(got[5] - intr_true[0, 5]) < 0.02, got
    # residual check: reprojection with recovered intr near the noise floor
    errs = []
    for i in range(len(poses)):
        Rm = G.rotvec_to_matrix(out["poses"][i, :3])
        sel = obs_pose == i
        uv, _ = G.project_points(got, Rm, out["poses"][i, 3:],
                                 out["points"][obs_pt[sel]])
        errs.append(np.linalg.norm(uv - obs_uv[sel], axis=1))
    rms = np.sqrt((np.concatenate(errs) ** 2).mean())
    assert rms < 0.3, rms


def test_incremental_mapper_opencv_scene(tmp_path):
    """Full mapper on a synthetic OPENCV-distorted scene: registers all
    images, refines distortion, and writes the model back as OPENCV."""
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.sfm.incremental import (
        native_incremental_mapping,
    )

    rng = np.random.default_rng(13)
    intr = np.array([900.0, 920.0, 320.0, 240.0, -0.10, 0.015, 0.001, -0.001])
    X = rng.uniform([-4, -4, 8], [4, 4, 16], (900, 3))
    poses = [np.zeros(6)]
    for i in range(1, 6):
        poses.append(np.concatenate([
            rng.normal(0, 0.08, 3), [0.9 * i, 0.15 * i, 0.1 * i]
        ]))
    poses = np.stack(poses)
    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        uv, z = G.project_points(intr, R, p[3:], X)
        vis = ((z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
               & (uv[:, 1] >= 0) & (uv[:, 1] < 480))
        ids = np.where(vis)[0]
        ids = ids[rng.permutation(len(ids))]
        kpts.append(uv[ids] + rng.normal(0, 0.3, (len(ids), 2)))
        vis_ids.append(ids)

    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    cam_id = db.add_camera(4, 640, 480, intr)  # model 4 = OPENCV
    img_ids = []
    for i in range(len(poses)):
        iid = db.add_image(f"img{i}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    for i in range(len(poses)):
        for j in range(i + 1, min(i + 4, len(poses))):
            _, ia, ib = np.intersect1d(vis_ids[i], vis_ids[j],
                                       return_indices=True)
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            m = m[rng.random(len(m)) < 0.85]
            db.add_matches(img_ids[i], img_ids[j], m)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
    db.commit()
    db.close()

    res = native_incremental_mapping(
        tmp_path / "database.db", tmp_path, tmp_path
    )
    assert res is not None
    cameras, images, points3D = res
    assert len(images) == len(poses)
    assert len(points3D) > 400
    cam = cameras[cam_id]
    assert cam.model == "OPENCV"
    assert len(cam.params) == 8
    # focal and k1 recovered reasonably
    assert abs(cam.params[0] - intr[0]) / intr[0] < 0.03
    assert abs(cam.params[4] - intr[4]) < 0.04


def test_disconnected_scene_graph_keeps_largest_model(tmp_path):
    """Two independent clusters in one database (no cross-cluster pairs):
    the mapper maps each connected component and keeps the largest model,
    like the reference's COLMAP multi-model selection
    (``reconstruction.py:81-89``); the registration report names why the
    small cluster's images are absent."""
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.sfm.incremental import (
        IncrementalMapper, MapperOptions, load_database,
        native_incremental_mapping, scene_components,
    )

    rng = np.random.default_rng(11)
    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    clusters = []
    # cluster A: 5 cameras, cluster B: 3 cameras, disjoint 3D points
    for n_cams, seed in ((5, 1), (3, 2)):
        crng = np.random.default_rng(seed)
        intr, X, poses = _make_scene(crng, n_cams=n_cams, n_pts=700, k1=0.0)
        cam_id = db.add_camera(2, 640, 480, intr)
        kpts, vis_ids, img_ids = [], [], []
        for p in poses:
            R = G.rotvec_to_matrix(p[:3])
            uv, z = G.project_points(intr, R, p[3:], X)
            vis = (
                (z > 0)
                & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
                & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
            )
            ids = np.where(vis)[0]
            ids = ids[crng.permutation(len(ids))]
            kpts.append(uv[ids] + crng.normal(0, 0.3, (len(ids), 2)))
            vis_ids.append(ids)
        for i in range(n_cams):
            iid = db.add_image(f"c{seed}_img{i}.jpg", cam_id)
            db.add_keypoints(iid, kpts[i].astype(np.float32))
            img_ids.append(iid)
        for i in range(n_cams):
            for j in range(i + 1, n_cams):
                _, ia, ib = np.intersect1d(
                    vis_ids[i], vis_ids[j], return_indices=True
                )
                m = np.stack([ia, ib], axis=1).astype(np.uint32)
                db.add_matches(img_ids[i], img_ids[j], m)
                db.add_two_view_geometry(img_ids[i], img_ids[j], m)
        clusters.append(img_ids)
    db.commit()
    db.close()

    data = load_database(tmp_path / "database.db")
    comps = scene_components(data)
    assert [len(c) for c in comps] == [5, 3]
    assert comps[0] == set(clusters[0])

    res = native_incremental_mapping(
        tmp_path / "database.db", tmp_path, tmp_path
    )
    assert res is not None
    _, images, points3D = res
    names = {im.name for im in images.values()}
    # the larger (5-image) cluster wins; nothing from the small one leaks in
    assert names == {f"c1_img{i}.jpg" for i in range(5)}
    assert len(points3D) > 300
    # the registration-report artifact names the other component's images
    report = (tmp_path / "reconstruction" / "registration_report.txt").read_text()
    for i in range(3):
        assert f"c2_img{i}.jpg" in report
    assert "connected component" in report
    # the smaller component is exported as a secondary model (COLMAP's
    # models/N layout), not lost
    from deep_image_matching_tpu.io.colmap_read_write_model import read_model

    models_dir = tmp_path / "reconstruction" / "models"
    subdirs = sorted(p for p in models_dir.iterdir() if p.is_dir())
    assert len(subdirs) == 1
    _, imgs2, pts2 = read_model(subdirs[0], ".txt")
    assert {im.name for im in imgs2.values()} == {
        f"c2_img{i}.jpg" for i in range(3)
    }
    assert len(pts2) > 100

    # per-image failure reasons: map only cluster A's subgraph and ask why
    # cluster B never registered
    from deep_image_matching_tpu.sfm.incremental import _component_subset

    sub = _component_subset(data, comps[0] | comps[1])
    mapper = IncrementalMapper(sub, MapperOptions())
    assert mapper.run()
    report = mapper.registration_report()
    # whichever cluster hosted the init pair, the OTHER one is fully
    # unregistered and every absence has a named reason
    a = {f"c1_img{i}.jpg" for i in range(5)}
    b = {f"c2_img{i}.jpg" for i in range(3)}
    assert set(report) in (a, b)
    for reason in report.values():
        assert "2D-3D" in reason or "tracks" in reason


def test_fisheye_distort_roundtrip_and_zero_k():
    rng = np.random.default_rng(3)
    k = np.array([-0.03, 0.01, -0.002, 0.0004])
    xy = rng.uniform(-0.9, 0.9, (500, 2))
    xyd = G.fisheye_distort_normalized(k, xy)
    assert np.abs(G.fisheye_undistort_normalized(k, xyd) - xy).max() < 1e-10
    # zero-k equidistant is r -> atan(r), NOT identity; inverse still exact
    z = G.fisheye_distort_normalized(np.zeros(4), xy)
    assert np.abs(G.fisheye_undistort_normalized(np.zeros(4), z) - xy).max() < 1e-10


def test_incremental_mapper_fisheye_scene(tmp_path):
    """Full mapper on a synthetic OPENCV_FISHEYE scene: keypoints are
    rectified to the pinhole frame at load, mapping registers every image,
    and the exported camera keeps the OPENCV_FISHEYE model with its
    equidistant coefficients (reference covers fisheye via pycolmap,
    ``reconstruction.py:28``)."""
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.sfm.incremental import (
        native_incremental_mapping,
    )

    rng = np.random.default_rng(7)
    f, cx, cy = 520.0, 320.0, 240.0
    fk = np.array([-0.03, 0.01, -0.002, 0.0004])
    X = rng.uniform([-3, -3, 6], [3, 3, 12], (900, 3))
    poses = []
    for i in range(6):
        rv = rng.normal(0, 0.08, 3)
        R = G.rotvec_to_matrix(rv)
        c = np.array([i * 0.8 - 2, rng.normal(0, 0.2), rng.normal(0, 0.2)])
        poses.append(np.concatenate([rv, -R @ c]))
    poses = np.array(poses)

    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        Xc = X @ R.T + p[3:]
        z = Xc[:, 2]
        xy = Xc[:, :2] / np.where(np.abs(z) < 1e-12, 1e-12, z)[:, None]
        xyd = G.fisheye_distort_normalized(fk, xy)
        uv = xyd * [f, f] + [cx, cy]
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        )
        ids = np.where(vis)[0]
        ids = ids[rng.permutation(len(ids))]
        kpts.append(uv[ids] + rng.normal(0, 0.3, (len(ids), 2)))
        vis_ids.append(ids)

    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    cam_id = db.add_camera(5, 640, 480, [f, f, cx, cy, *fk])  # OPENCV_FISHEYE
    img_ids = []
    for i in range(len(poses)):
        iid = db.add_image(f"img{i}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            _, ia, ib = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True
            )
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            db.add_matches(img_ids[i], img_ids[j], m)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
    db.commit()
    db.close()

    res = native_incremental_mapping(
        tmp_path / "database.db", tmp_path, tmp_path
    )
    assert res is not None
    cameras, images, points3D = res
    assert len(images) == len(poses)
    assert len(points3D) > 400
    cam = cameras[cam_id]
    assert cam.model == "OPENCV_FISHEYE"
    assert len(cam.params) == 8
    # focal recovered on the pinhole equivalent; equidistant coefficients
    # pass through unchanged
    assert abs(cam.params[0] - f) / f < 0.03
    assert np.allclose(cam.params[4:], fk)
    # exported 2D observations are the OBSERVED (distorted) pixels
    from deep_image_matching_tpu.io.colmap_read_write_model import qvec2rotmat

    name_to_id = {f"img{i}.jpg": img_ids[i] for i in range(len(poses))}
    for im in images.values():
        src = kpts[img_ids.index(name_to_id[im.name])]
        if len(im.xys):
            d = np.abs(src[None, :, :] - im.xys[:, None, :]).sum(-1).min(1)
            assert d.max() < 1e-3
    # pairwise relative rotations close to ground truth
    Rrec = {im.name: qvec2rotmat(im.qvec) for im in images.values()}
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            Rg = (
                G.rotvec_to_matrix(poses[j, :3])
                @ G.rotvec_to_matrix(poses[i, :3]).T
            )
            Rr = Rrec[f"img{j}.jpg"] @ Rrec[f"img{i}.jpg"].T
            err = np.degrees(np.linalg.norm(G.matrix_to_rotvec(Rr @ Rg.T)))
            assert err < 1.0, (i, j, err)


def test_full_opencv_distort_roundtrip():
    rng = np.random.default_rng(9)
    p12 = np.array([500.0, 500.0, 320.0, 240.0,
                    -0.05, 0.01, 0.001, -0.0005, 0.002, -0.03, 0.005, 0.001])
    xy = rng.uniform(-0.6, 0.6, (500, 2))
    xyd = G.full_opencv_distort_normalized(p12, xy)
    assert np.abs(
        G.full_opencv_undistort_normalized(p12, xyd) - xy
    ).max() < 1e-9


def test_incremental_mapper_full_opencv_scene(tmp_path):
    """FULL_OPENCV camera: the rational tail (k3..k6) is rectified to plain
    OPENCV at load; mapping registers every image and the export keeps the
    FULL_OPENCV model with refined f/c/k1/k2/p1/p2 and the original tail."""
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.sfm.incremental import (
        native_incremental_mapping,
    )

    rng = np.random.default_rng(12)
    p12 = np.array([520.0, 520.0, 320.0, 240.0,
                    -0.04, 0.008, 0.0008, -0.0004, 0.001, -0.02, 0.004, 0.0008])
    X = rng.uniform([-3, -3, 6], [3, 3, 12], (900, 3))
    poses = []
    for i in range(6):
        rv = rng.normal(0, 0.08, 3)
        R = G.rotvec_to_matrix(rv)
        c = np.array([i * 0.8 - 2, rng.normal(0, 0.2), rng.normal(0, 0.2)])
        poses.append(np.concatenate([rv, -R @ c]))
    poses = np.array(poses)

    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        Xc = X @ R.T + p[3:]
        z = Xc[:, 2]
        xy = Xc[:, :2] / np.where(np.abs(z) < 1e-12, 1e-12, z)[:, None]
        xyd = G.full_opencv_distort_normalized(p12, xy)
        uv = xyd * p12[0:2] + p12[2:4]
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        )
        ids = np.where(vis)[0]
        ids = ids[rng.permutation(len(ids))]
        kpts.append(uv[ids] + rng.normal(0, 0.3, (len(ids), 2)))
        vis_ids.append(ids)

    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    cam_id = db.add_camera(6, 640, 480, p12)  # FULL_OPENCV
    img_ids = []
    for i in range(len(poses)):
        iid = db.add_image(f"img{i}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            _, ia, ib = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True
            )
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            db.add_matches(img_ids[i], img_ids[j], m)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
    db.commit()
    db.close()

    res = native_incremental_mapping(
        tmp_path / "database.db", tmp_path, tmp_path
    )
    assert res is not None
    cameras, images, points3D = res
    assert len(images) == len(poses)
    assert len(points3D) > 400
    cam = cameras[cam_id]
    assert cam.model == "FULL_OPENCV"
    assert len(cam.params) == 12
    assert abs(cam.params[0] - p12[0]) / p12[0] < 0.03
    np.testing.assert_allclose(cam.params[8:], p12[8:])
    from deep_image_matching_tpu.io.colmap_read_write_model import qvec2rotmat

    Rrec = {im.name: qvec2rotmat(im.qvec) for im in images.values()}
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            Rg = (
                G.rotvec_to_matrix(poses[j, :3])
                @ G.rotvec_to_matrix(poses[i, :3]).T
            )
            Rr = Rrec[f"img{j}.jpg"] @ Rrec[f"img{i}.jpg"].T
            err = np.degrees(np.linalg.norm(G.matrix_to_rotvec(Rr @ Rg.T)))
            assert err < 1.0, (i, j, err)


@pytest.mark.parametrize(
    "model_id,model_name,params,distort",
    [
        (7, "FOV", [520.0, 520.0, 320.0, 240.0, 0.75],
         lambda p, xy: G.fov_distort_normalized(p[4], xy)),
        (10, "THIN_PRISM_FISHEYE",
         [520.0, 520.0, 320.0, 240.0,
          -0.02, 0.005, 0.0008, -0.0004, 0.0002, -0.0001, 0.0008, -0.0006],
         lambda p, xy: G.thin_prism_distort_normalized(np.asarray(p), xy)),
    ],
)
def test_incremental_mapper_fov_thin_prism(tmp_path, model_id, model_name,
                                           params, distort):
    """FOV and THIN_PRISM_FISHEYE cameras: rectified to pinhole at load,
    full registration, model/params round-trip (completes COLMAP camera
    models 0-10; reference reaches these only via pycolmap)."""
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.sfm.incremental import (
        native_incremental_mapping,
    )

    rng = np.random.default_rng(13)
    params = np.asarray(params, np.float64)
    X = rng.uniform([-3, -3, 6], [3, 3, 12], (900, 3))
    poses = []
    for i in range(6):
        rv = rng.normal(0, 0.08, 3)
        R = G.rotvec_to_matrix(rv)
        c = np.array([i * 0.8 - 2, rng.normal(0, 0.2), rng.normal(0, 0.2)])
        poses.append(np.concatenate([rv, -R @ c]))
    poses = np.array(poses)

    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        Xc = X @ R.T + p[3:]
        z = Xc[:, 2]
        xy = Xc[:, :2] / np.where(np.abs(z) < 1e-12, 1e-12, z)[:, None]
        uv = distort(params, xy) * params[0:2] + params[2:4]
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        )
        ids = np.where(vis)[0]
        ids = ids[rng.permutation(len(ids))]
        kpts.append(uv[ids] + rng.normal(0, 0.3, (len(ids), 2)))
        vis_ids.append(ids)

    db = COLMAPDatabase.connect(tmp_path / "database.db")
    db.create_tables()
    cam_id = db.add_camera(model_id, 640, 480, params)
    img_ids = []
    for i in range(len(poses)):
        iid = db.add_image(f"img{i}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            _, ia, ib = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True
            )
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            db.add_matches(img_ids[i], img_ids[j], m)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
    db.commit()
    db.close()

    res = native_incremental_mapping(
        tmp_path / "database.db", tmp_path, tmp_path
    )
    assert res is not None
    cameras, images, points3D = res
    assert len(images) == len(poses)
    assert len(points3D) > 400
    cam = cameras[cam_id]
    assert cam.model == model_name
    assert len(cam.params) == len(params)
    assert abs(cam.params[0] - params[0]) / params[0] < 0.03
    np.testing.assert_allclose(cam.params[4:], params[4:])
    from deep_image_matching_tpu.io.colmap_read_write_model import qvec2rotmat

    Rrec = {im.name: qvec2rotmat(im.qvec) for im in images.values()}
    for i in range(len(poses)):
        for j in range(i + 1, len(poses)):
            Rg = (
                G.rotvec_to_matrix(poses[j, :3])
                @ G.rotvec_to_matrix(poses[i, :3]).T
            )
            Rr = Rrec[f"img{j}.jpg"] @ Rrec[f"img{i}.jpg"].T
            err = np.degrees(np.linalg.norm(G.matrix_to_rotvec(Rr @ Rg.T)))
            assert err < 1.0, (i, j, err)


def test_fov_thin_prism_roundtrips():
    rng = np.random.default_rng(4)
    xy = rng.uniform(-0.8, 0.8, (400, 2))
    for w in (0.9, 0.3):
        d = G.fov_distort_normalized(w, xy)
        assert np.abs(G.fov_undistort_normalized(w, d) - xy).max() < 1e-12
    p12 = np.array([500, 500, 320, 240, -0.02, 0.005, 0.001, -0.0005,
                    0.0002, -0.0001, 0.0008, -0.0006])
    d = G.thin_prism_distort_normalized(p12, xy)
    assert np.abs(G.thin_prism_undistort_normalized(p12, d) - xy).max() < 1e-9


def test_bundle_adjust_early_exit_on_converged_problem():
    """The host-driven LM loop stops once the cost plateaus.

    Feeding bundle_adjust noise-free ground truth (already at the optimum)
    must exit well before the iteration budget — three consecutive steps
    under 1e-6 relative decrease (sfm/ba.py::_ba_solve) — instead of
    burning all n_lm_iters like the old whole-solver scan did.
    """
    rng = np.random.default_rng(11)
    intr, X, poses = _make_scene(rng, k1=0.0)
    obs_pose, obs_cam, obs_pt, obs_uv = _observations(
        intr, X, poses, rng, noise=0.0
    )
    pose_free = np.ones((len(poses), 6))
    pose_free[0] = 0
    pose_free[1, 3] = 0
    out = bundle_adjust(
        poses, np.atleast_2d(intr),
        X, obs_pose, obs_cam, obs_pt, obs_uv,
        pose_free, np.zeros((1, 4)), n_lm_iters=30, n_cg_iters=30,
    )
    assert len(out["costs"]) < 30
    # and it did not wander away from the optimum
    assert np.allclose(out["poses"], poses, atol=1e-4)
