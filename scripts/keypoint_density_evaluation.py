"""Per-image keypoint density statistics from a features.h5.

Equivalent of reference ``scripts/keypoint_density_evaluation.py``: reports
keypoint counts, per-megapixel density, and a coarse spatial-coverage score
(fraction of an 8x8 grid containing at least one keypoint).

Usage:
    python scripts/keypoint_density_evaluation.py results_dir/features.h5
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def main(feature_path, grid=8):
    with h5py.File(feature_path) as fd:
        print(f"{'image':40s} {'kpts':>7s} {'kpts/MP':>9s} {'coverage':>9s}")
        totals = []
        for name in fd:
            g = fd[name]
            kp = np.asarray(g["keypoints"])
            if "image_size" in g:
                w, h = (int(v) for v in np.asarray(g["image_size"])[:2])
            else:
                w = int(kp[:, 0].max()) + 1 if len(kp) else 1
                h = int(kp[:, 1].max()) + 1 if len(kp) else 1
            mp = max(w * h / 1e6, 1e-9)
            if len(kp):
                gx = np.clip((kp[:, 0] / max(w, 1) * grid).astype(int), 0, grid - 1)
                gy = np.clip((kp[:, 1] / max(h, 1) * grid).astype(int), 0, grid - 1)
                cover = len(set(zip(gx.tolist(), gy.tolist()))) / grid**2
            else:
                cover = 0.0
            totals.append((len(kp), len(kp) / mp, cover))
            print(f"{name:40s} {len(kp):7d} {len(kp)/mp:9.1f} {cover:9.2f}")
        if totals:
            t = np.asarray(totals)
            print(f"{'MEAN':40s} {t[:,0].mean():7.0f} {t[:,1].mean():9.1f} "
                  f"{t[:,2].mean():9.2f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("features", help="path to features.h5")
    ap.add_argument("--grid", type=int, default=8)
    a = ap.parse_args()
    main(a.features, a.grid)
