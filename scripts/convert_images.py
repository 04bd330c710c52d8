"""Batch-convert images between formats / bit depths.

Equivalent of reference ``scripts/convert_images.py`` (argparse CLI instead of
edited-in-place constants). Reads with rasterio/opencv/pillow, optionally
percentile-normalizes high-bit-depth data to 8-bit, and writes to the chosen
format.

Usage:
    python scripts/convert_images.py in_dir/ out_dir/ --ext .jpg \
        --reader opencv --normalize
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}


def load_img(path: Path, reader: str) -> np.ndarray:
    if reader == "rasterio":
        import rasterio

        with rasterio.open(path) as dataset:
            img = dataset.read()
        img = np.squeeze(np.moveaxis(img, 0, -1))
    elif reader == "opencv":
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    elif reader == "pillow":
        from PIL import Image

        img = np.asarray(Image.open(path))
    else:
        raise ValueError(f"unknown reader {reader!r}")
    if img is None:
        raise IOError(f"failed to read {path}")
    return img


def normalize_to_uint8(img: np.ndarray, p_low: float = 1.0, p_high: float = 99.0):
    """Percentile-stretch to uint8 (for 16-bit / float rasters)."""
    if img.dtype == np.uint8:
        return img
    lo, hi = np.percentile(img.astype(np.float64), [p_low, p_high])
    scale = 255.0 / max(hi - lo, 1e-9)
    return np.clip((img.astype(np.float64) - lo) * scale, 0, 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_dir", type=Path)
    ap.add_argument("output_dir", type=Path)
    ap.add_argument("--ext", default=".jpg", help="output extension (default .jpg)")
    ap.add_argument(
        "--reader", choices=["rasterio", "opencv", "pillow"], default="opencv"
    )
    ap.add_argument(
        "--normalize", action="store_true", help="percentile-stretch to 8-bit"
    )
    ap.add_argument("--jpg-quality", type=int, default=95)
    args = ap.parse_args()

    import cv2

    args.output_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted(
        p for p in args.input_dir.iterdir() if p.suffix.lower() in IMAGE_EXTS
    )
    for path in paths:
        img = load_img(path, args.reader)
        if args.normalize or (
            args.ext.lower() in {".jpg", ".jpeg"} and img.dtype != np.uint8
        ):
            img = normalize_to_uint8(img)
        out = args.output_dir / (path.stem + args.ext)
        params = []
        if args.ext.lower() in {".jpg", ".jpeg"}:
            params = [cv2.IMWRITE_JPEG_QUALITY, args.jpg_quality]
        if not cv2.imwrite(str(out), img, params):
            raise IOError(f"failed to write {out}")
        print(f"{path.name} -> {out}")


if __name__ == "__main__":
    main()
