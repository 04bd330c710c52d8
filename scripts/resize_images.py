"""Resize every image in a folder (longest side or scale factor).

Equivalent of reference ``scripts/resize_images.py`` / ``convert_images.py``.

Usage:
    python scripts/resize_images.py in_dir/ out_dir/ --max-size 2000
    python scripts/resize_images.py in_dir/ out_dir/ --scale 0.5 --ext .png
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(in_dir, out_dir, max_size=None, scale=None, ext=None):
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(Path(in_dir).iterdir()):
        if p.suffix.lower() not in (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".bmp"):
            continue
        img = Image.open(p)
        w, h = img.size
        if max_size:
            s = max_size / max(w, h)
        elif scale:
            s = scale
        else:
            s = 1.0
        if s != 1.0:
            img = img.resize((max(1, round(w * s)), max(1, round(h * s))),
                             Image.LANCZOS)
        suffix = ext if ext else p.suffix
        target = out_dir / (p.stem + suffix)
        img = img.convert("RGB") if suffix.lower() in (".jpg", ".jpeg") else img
        img.save(target)
        n += 1
    print(f"Wrote {n} images to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("in_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--max-size", type=int, default=None)
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--ext", default=None, help="output extension, e.g. .png")
    a = ap.parse_args()
    main(a.in_dir, a.out_dir, a.max_size, a.scale, a.ext)
