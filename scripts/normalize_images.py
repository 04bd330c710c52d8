"""Normalize a folder of images for matching: gradient, equalization, or CLAHE.

Equivalent of reference ``scripts/normalize_images.py`` (same three methods,
argparse CLI). Optional Gaussian noise reduction before normalization.

Usage:
    python scripts/normalize_images.py in_dir/ out_dir/ --method clahe
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def img_gradient(gray: np.ndarray, ksize: int = 3) -> np.ndarray:
    import cv2

    gx = cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=ksize)
    gy = cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=ksize)
    mag = cv2.magnitude(gx, gy)
    return cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)


def img_equalized(gray: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.equalizeHist(gray)


def img_clahe(gray: np.ndarray, clip: float = 2.0, grid: int = 8) -> np.ndarray:
    import cv2

    return cv2.createCLAHE(clipLimit=clip, tileGridSize=(grid, grid)).apply(gray)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_dir", type=Path)
    ap.add_argument("output_dir", type=Path)
    ap.add_argument(
        "--method", choices=["gradient", "equalize", "clahe"], default="clahe"
    )
    ap.add_argument("--no-reduce-noise", action="store_true")
    ap.add_argument("--noise-kernel", type=int, default=5)
    ap.add_argument("--ksize", type=int, default=3, help="Sobel size (gradient)")
    ap.add_argument("--clip", type=float, default=2.0, help="CLAHE clip limit")
    ap.add_argument("--grid", type=int, default=8, help="CLAHE tile grid")
    args = ap.parse_args()

    import cv2

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for path in sorted(args.input_dir.iterdir()):
        if path.suffix.lower() not in IMAGE_EXTS:
            continue
        gray = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if gray is None:
            print(f"skipping unreadable {path.name}")
            continue
        if not args.no_reduce_noise:
            k = args.noise_kernel
            gray = cv2.GaussianBlur(gray, (k, k), 0)
        if args.method == "gradient":
            out = img_gradient(gray, args.ksize)
        elif args.method == "equalize":
            out = img_equalized(gray)
        else:
            out = img_clahe(gray, args.clip, args.grid)
        cv2.imwrite(str(args.output_dir / path.name), out)
        print(f"{path.name}: {args.method} -> {args.output_dir}")


if __name__ == "__main__":
    main()
