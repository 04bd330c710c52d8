"""Cluster images by global descriptor (k-means) for scene splitting.

Equivalent of reference ``scripts/globaldes_kmeans.py``: compute global
descriptors for an image folder and write a cluster assignment CSV; useful to
split mixed datasets into per-scene runs.

Usage:
    python scripts/globaldes_kmeans.py images/ clusters.csv --k 3 \
        [--retrieval netvlad|openibl|cosplace|dir]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "src"))


def kmeans(x, k, iters=50, seed=0):
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=False)]
    assign = np.zeros(len(x), int)
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        new = d.argmin(1)
        if (new == assign).all():
            break
        assign = new
        for j in range(k):
            if (assign == j).any():
                centers[j] = x[assign == j].mean(0)
    return assign


def main(image_dir, output, k=2, retrieval="netvlad"):
    from deep_image_matching_tpu.image_retrieval import (
        compute_global_descriptors,
    )
    from deep_image_matching_tpu.utils.image import ImageList

    imlist = ImageList(Path(image_dir))
    descs = compute_global_descriptors(imlist, retrieval)
    assign = kmeans(np.asarray(descs, np.float64), k)
    lines = [f"{im.name},{int(c)}" for im, c in zip(imlist, assign)]
    Path(output).write_text("\n".join(lines) + "\n")
    for j in range(k):
        print(f"cluster {j}: {(assign == j).sum()} images")
    print(f"Wrote {output}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image_dir")
    ap.add_argument("output")
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--retrieval", default="netvlad",
                    choices=["netvlad", "openibl", "cosplace", "dir"])
    a = ap.parse_args()
    main(a.image_dir, a.output, a.k, a.retrieval)
