"""Copy a folder of images with all EXIF metadata stripped (re-encode).

Equivalent of reference ``scripts/copy_images_no_exif.py``.

Usage:
    python scripts/copy_images_no_exif.py input_folder/ output_folder/
"""

from __future__ import annotations

import argparse
from pathlib import Path

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_folder", type=Path)
    ap.add_argument("output_folder", type=Path)
    args = ap.parse_args()

    import cv2

    args.output_folder.mkdir(parents=True, exist_ok=True)
    for path in sorted(args.input_folder.iterdir()):
        if path.suffix.lower() not in IMAGE_EXTS:
            continue
        img = cv2.imread(str(path))  # decodes pixels only; EXIF is dropped
        if img is None:
            print(f"skipping unreadable {path.name}")
            continue
        cv2.imwrite(str(args.output_folder / path.name), img)
        print(f"Copied {path.name} to {args.output_folder}")


if __name__ == "__main__":
    main()
