"""Plot matches given as an `x1 y1 x2 y2` text file over an image pair.

Parity: reference scripts/show_matches_x1y1x2y2format.py.

Usage: python scripts/show_matches_x1y1x2y2format.py MATCHES.TXT IMG0 IMG1 [-o OUT.png]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("matches_txt", type=Path)
    ap.add_argument("image0", type=Path)
    ap.add_argument("image1", type=Path)
    ap.add_argument("-o", "--out", type=Path, default=Path("matches.png"))
    args = ap.parse_args()

    import cv2

    from deep_image_matching_tpu.visualization import viz_matches_cv2

    data = np.loadtxt(args.matches_txt, dtype=np.float32).reshape(-1, 4)
    img0 = cv2.imread(str(args.image0))
    img1 = cv2.imread(str(args.image1))
    out = viz_matches_cv2(img0, img1, data[:, :2], data[:, 2:4])
    cv2.imwrite(str(args.out), out)
    print(f"{len(data)} matches -> {args.out}")


if __name__ == "__main__":
    main()
