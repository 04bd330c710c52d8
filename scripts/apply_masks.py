"""Remove keypoints falling inside masked regions from a features.h5.

Equivalent of reference ``scripts/apply_masks.py``, but operating on the
feature file instead of blacking out pixels: given per-image binary masks
(same filename, any common extension; nonzero = keep), drop masked keypoints
and remap the match indices.

Usage:
    python scripts/apply_masks.py results_dir/ masks_dir/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import numpy as np


def _find_mask(masks_dir, name):
    stem = Path(name).stem
    for p in Path(masks_dir).iterdir():
        if p.stem == stem:
            return p
    return None


def apply_masks(results_dir, masks_dir):
    import cv2

    results_dir = Path(results_dir)
    keep_idx = {}
    with h5py.File(results_dir / "features.h5", "a") as fd:
        for name in list(fd.keys()):
            mp = _find_mask(masks_dir, name)
            if mp is None:
                continue
            mask = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
            kp = np.asarray(fd[name]["keypoints"])
            x = np.clip(kp[:, 0].astype(int), 0, mask.shape[1] - 1)
            y = np.clip(kp[:, 1].astype(int), 0, mask.shape[0] - 1)
            keep = mask[y, x] > 0
            keep_idx[name] = keep
            remap = {k: ds[...] for k, ds in fd[name].items()}
            del fd[name]
            g = fd.create_group(name)
            for k, v in remap.items():
                if v.ndim and len(v) == len(keep) and k != "image_size":
                    g.create_dataset(k, data=v[keep])
                elif k == "descriptors" and v.shape[-1] == len(keep):
                    g.create_dataset(k, data=v[:, keep])
                else:
                    g.create_dataset(k, data=v)
            print(f"{name}: kept {keep.sum()}/{len(keep)} keypoints")

    for fname in ("raw_matches.h5", "matches.h5"):
        path = results_dir / fname
        if not path.exists():
            continue
        with h5py.File(path, "a") as fd:
            for n0 in list(fd.keys()):
                for n1 in list(fd[n0].keys()):
                    m = np.asarray(fd[n0][n1])
                    new = m.copy()
                    ok = np.ones(len(m), bool)
                    for col, nm in ((0, n0), (1, n1)):
                        if nm not in keep_idx:
                            continue
                        keep = keep_idx[nm]
                        newpos = np.cumsum(keep) - 1
                        ok &= keep[m[:, col]]
                        new[:, col] = newpos[m[:, col]]
                    del fd[n0][n1]
                    fd[n0].create_dataset(n1, data=new[ok])


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results_dir")
    ap.add_argument("masks_dir")
    a = ap.parse_args()
    apply_masks(a.results_dir, a.masks_dir)
