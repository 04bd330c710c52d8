"""Write a float array as a (geo)TIFF (parity: reference
scripts/misc/write_tif_file.py; rasterio is optional here — falls back to
cv2 plain TIFF when unavailable).

Usage: python scripts/misc/write_tif_file.py IN.npy OUT.tif
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("array", type=Path, help=".npy input")
    ap.add_argument("out", type=Path)
    args = ap.parse_args()
    data = np.load(args.array)
    try:
        import rasterio

        with rasterio.open(
            args.out, "w", driver="GTiff", height=data.shape[0],
            width=data.shape[1],
            count=1 if data.ndim == 2 else data.shape[2],
            dtype=str(data.dtype),
        ) as dst:
            dst.write(data[None] if data.ndim == 2 else data.transpose(2, 0, 1))
    except ImportError:
        import cv2

        cv2.imwrite(str(args.out), data)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
