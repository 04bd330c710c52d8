"""Constrain a COLMAP reconstruction's 3D points to a lidar point cloud.

Parity: reference scripts/lidar_optimization.py (open3d + pycolmap based
nearest-neighbor constraint builder). Both dependencies are optional in
this environment; the script gates on them at runtime.

Usage: python scripts/lidar_optimization.py CLOUD.ply MODEL_DIR OUT_DIR
"""

import argparse
import sys
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def _read_ascii_ply(path: Path) -> np.ndarray:
    """Minimal ascii-PLY vertex reader (x y z leading columns)."""
    with open(path) as f:
        line = f.readline().strip()
        assert line == "ply", "not a PLY file"
        n = 0
        while True:
            line = f.readline().strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
            if line.startswith("format") and "ascii" not in line:
                raise ValueError("binary PLY needs open3d")
        pts = [
            [float(v) for v in f.readline().split()[:3]] for _ in range(n)
        ]
    return np.asarray(pts, np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("point_cloud", type=Path)
    ap.add_argument("model_dir", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--max_dist", type=float, default=0.2,
                    help="max snap distance (model units)")
    args = ap.parse_args()

    from scipy.spatial import cKDTree

    from deep_image_matching_tpu.io.colmap_read_write_model import (
        read_model, write_model,
    )

    try:
        import open3d as o3d

        cloud = np.asarray(o3d.io.read_point_cloud(str(args.point_cloud)).points)
    except ImportError:
        cloud = _read_ascii_ply(args.point_cloud)
    cameras, images, points3D = read_model(args.model_dir)
    tree = cKDTree(cloud)
    pids = list(points3D.keys())
    xyz = np.stack([points3D[p].xyz for p in pids])
    d, j = tree.query(xyz, workers=-1)
    moved = 0
    for pid, di, ji in zip(pids, d, j):
        if di <= args.max_dist:
            points3D[pid] = points3D[pid]._replace(xyz=cloud[ji])
            moved += 1
    args.out_dir.mkdir(parents=True, exist_ok=True)
    write_model(cameras, images, points3D, str(args.out_dir), ext=".txt")
    print(f"Snapped {moved}/{len(points3D)} points to the cloud -> {args.out_dir}")


if __name__ == "__main__":
    main()
