"""Synthesize a 60-100 image scene for scale testing.

The bundled example scenes top out at 12 images; the reference routinely
handles hundreds. This replicates a real multi-view set (default: the
10-view cyprus scene) with photometric/geometric perturbations — random
sub-window crop resized back, small rotation, gamma — producing N variants
per view. Cross-view pairs keep their true parallax (the mapper initializes
there; its ``init_min_angle_deg`` gate rejects the zero-baseline
variant-variant pairs), while same-view variants must register via PnP on
already-triangulated points, exactly like video-frame SfM.

Usage: python scripts/make_scale_scene.py OUT_DIR [N_TOTAL] [SRC_IMAGES_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np

DEFAULT_SRC = "/root/reference/assets/example_cyprus/images"


def make_scale_scene(
    out_dir,
    n_total: int = 60,
    src_dir=DEFAULT_SRC,
    max_side: int = 1024,
    seed: int = 0,
) -> int:
    """Write ~n_total perturbed variants of the source images into
    ``out_dir/images``. Returns the number of images written."""
    out = Path(out_dir) / "images"
    out.mkdir(parents=True, exist_ok=True)
    srcs = sorted(
        p for p in Path(src_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not srcs:
        raise FileNotFoundError(f"no images under {src_dir}")
    per_view = -(-n_total // len(srcs))
    rng = np.random.default_rng(seed)
    n = 0
    for p in srcs:
        img = cv2.imread(str(p))
        h, w = img.shape[:2]
        if max(h, w) > max_side:
            s = max_side / max(h, w)
            img = cv2.resize(img, (round(w * s), round(h * s)),
                             interpolation=cv2.INTER_AREA)
            h, w = img.shape[:2]
        for v in range(per_view):
            if n >= n_total:
                break
            if v == 0:
                var = img
            else:
                frac = rng.uniform(0.88, 0.98)
                ch, cw = round(h * frac), round(w * frac)
                y0 = rng.integers(0, h - ch + 1)
                x0 = rng.integers(0, w - cw + 1)
                var = img[y0:y0 + ch, x0:x0 + cw]
                ang = rng.uniform(-4.0, 4.0)
                M = cv2.getRotationMatrix2D((cw / 2, ch / 2), ang, 1.0)
                var = cv2.warpAffine(var, M, (cw, ch),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_REFLECT)
                var = cv2.resize(var, (w, h), interpolation=cv2.INTER_LINEAR)
                gamma = rng.uniform(0.85, 1.15)
                lut = ((np.arange(256) / 255.0) ** gamma * 255.0).astype(
                    np.uint8
                )
                var = lut[var]
            cv2.imwrite(
                str(out / f"{p.stem}_v{v:02d}.jpg"), var,
                [cv2.IMWRITE_JPEG_QUALITY, int(rng.integers(88, 97))],
            )
            n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_scene"
    n_total = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    src = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_SRC
    print(f"wrote {make_scale_scene(out, n_total, src)} images to {out}/images")
