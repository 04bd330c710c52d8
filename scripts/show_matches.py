"""Render a side-by-side match visualization for one pair from a results dir.

Equivalent of reference ``scripts/show_matches.py``.

Usage:
    python scripts/show_matches.py results_dir/ images_dir/ img0.jpg img1.jpg \
        out.png [--raw]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "src"))


def main(results_dir, images_dir, name0, name1, out, raw=False):
    import numpy as np

    from deep_image_matching_tpu.io.h5 import get_features, get_matches
    from deep_image_matching_tpu.visualization import viz_matches_cv2
    from deep_image_matching_tpu.utils.image import read_image

    results_dir = Path(results_dir)
    match_file = results_dir / ("raw_matches.h5" if raw else "matches.h5")
    f0 = get_features(results_dir / "features.h5", name0)
    f1 = get_features(results_dir / "features.h5", name1)
    m = get_matches(match_file, name0, name1)
    img0 = read_image(Path(images_dir) / name0, grayscale=False)
    img1 = read_image(Path(images_dir) / name1, grayscale=False)
    k0 = np.asarray(f0["keypoints"])[m[:, 0]]
    k1 = np.asarray(f1["keypoints"])[m[:, 1]]
    viz_matches_cv2(img0, img1, k0, k1, output_path=out)
    print(f"{len(m)} matches -> {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results_dir")
    ap.add_argument("images_dir")
    ap.add_argument("name0")
    ap.add_argument("name1")
    ap.add_argument("out")
    ap.add_argument("--raw", action="store_true")
    a = ap.parse_args()
    main(a.results_dir, a.images_dir, a.name0, a.name1, a.out, a.raw)
