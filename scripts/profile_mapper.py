"""Profile the native incremental mapper in isolation on a synthetic scene.

The scale-scene run (docs/status.md round 5) spends ~160 s in the mapper —
the largest stage. This driver rebuilds a scene of comparable size (60
images, dense verified-pair graph, thousands of tracks) WITHOUT the
front-end, runs ``IncrementalMapper`` with its phase timers, and prints the
attribution table, so mapper optimizations can iterate in ~minutes.

Usage: python scripts/profile_mapper.py [--n 60] [--pts 6000] [--window 40]
       [--platform tpu|cpu]

Reference analog: the pycolmap/COLMAP incremental mapper the reference
invokes at ``/root/reference/src/deep_image_matching/reconstruction.py:28``.
"""

import argparse
import logging
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "src"))


def build_scene(n_imgs: int, n_pts: int, window: int, tmp: Path, seed=0):
    """Synthetic ring-of-cameras scene written as a COLMAP database."""
    from deep_image_matching_tpu.io.colmap_db import COLMAPDatabase
    from deep_image_matching_tpu.sfm import geometry as G

    rng = np.random.default_rng(seed)
    W, H, f = 1024, 768, 1100.0
    intr = np.array([f, W / 2, H / 2, -0.03])  # SIMPLE_RADIAL legacy 4-vec
    # points in a box; cameras on a ring looking at the centroid
    X = rng.uniform([-4, -3, 6], [4, 3, 14], (n_pts, 3))
    poses = []
    for i in range(n_imgs):
        ang = 0.7 * np.sin(2 * np.pi * i / n_imgs)
        R = G.rotvec_to_matrix(np.array([0.0, ang, 0.0]))
        C = np.array([6.0 * np.sin(ang), 0.3 * np.sin(3 * ang), -2.0 + 0.5 * np.cos(ang)])
        t = -R @ C
        poses.append(np.concatenate([G.matrix_to_rotvec(R), t]))
    poses = np.stack(poses)

    kpts, vis_ids = [], []
    for p in poses:
        R = G.rotvec_to_matrix(p[:3])
        uv, z = G.project_points(intr, R, p[3:], X)
        vis = (
            (z > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < W)
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        )
        ids = np.where(vis)[0]
        ids = ids[rng.permutation(len(ids))]
        kpts.append(uv[ids] + rng.normal(0, 0.4, (len(ids), 2)))
        vis_ids.append(ids)

    db_path = tmp / "database.db"
    db = COLMAPDatabase.connect(db_path)
    db.create_tables()
    cam_id = db.add_camera(2, W, H, intr)
    img_ids = []
    for i in range(n_imgs):
        iid = db.add_image(f"img{i:03d}.jpg", cam_id)
        db.add_keypoints(iid, kpts[i].astype(np.float32))
        img_ids.append(iid)
    n_pairs = 0
    total_matches = 0
    for i in range(n_imgs):
        for j in range(i + 1, min(i + 1 + window, n_imgs)):
            _, ia, ib = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True
            )
            m = np.stack([ia, ib], axis=1).astype(np.uint32)
            m = m[rng.random(len(m)) < 0.7]
            if len(m) < 20:
                continue
            db.add_matches(img_ids[i], img_ids[j], m)
            db.add_two_view_geometry(img_ids[i], img_ids[j], m)
            n_pairs += 1
            total_matches += len(m)
    db.commit()
    db.close()
    print(
        f"scene: {n_imgs} imgs, {n_pts} pts, {n_pairs} verified pairs, "
        f"{total_matches} matches ({total_matches / max(n_pairs,1):.0f}/pair)",
        file=sys.stderr,
    )
    return db_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--pts", type=int, default=6000)
    ap.add_argument("--window", type=int, default=40)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--ba-global-every", type=int, default=None,
                    help="override MapperOptions.ba_global_every")
    args = ap.parse_args()
    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    logging.getLogger("dim_tpu").setLevel(logging.INFO)

    from deep_image_matching_tpu.sfm.incremental import (
        IncrementalMapper,
        MapperOptions,
        load_database,
    )

    tmp = Path(tempfile.mkdtemp(prefix="profile_mapper_"))
    db_path = build_scene(args.n, args.pts, args.window, tmp)

    t0 = time.perf_counter()
    data = load_database(db_path)
    t_load = time.perf_counter() - t0
    opt = MapperOptions()
    if args.ba_global_every is not None:
        opt.ba_global_every = args.ba_global_every
    mapper = IncrementalMapper(data, opt)
    t0 = time.perf_counter()
    ok = mapper.run()
    t_run = time.perf_counter() - t0
    print(
        f"load_database: {t_load:.1f} s   mapper.run: {t_run:.1f} s   "
        f"registered {len(mapper.poses)}/{args.n}, "
        f"{len(mapper.points)} points, ok={ok}"
    )


if __name__ == "__main__":
    main()
