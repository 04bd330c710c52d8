"""Export tie points as a Bundler v0.3 file (Metashape import path).

Parity: reference ``io/h5_to_bundler.py:29-1095`` — multiview tracks from
pairwise matches, emitted as ``bundler.out`` + image list. Track building
uses the native union-find (``io/tracks.py``) instead of the reference's
pandas chain resolution. Cameras carry zero poses (the file transports tie
points; Metashape estimates orientation itself), keypoint coordinates use
the Bundler convention (origin at image center, y up).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import h5py
import numpy as np
from PIL import Image as PILImage

from .tracks import build_tracks

logger = logging.getLogger("dim_tpu")


def export_to_bundler(
    img_dir: Path,
    feature_path: Path,
    match_path: Path,
    out_dir: Path,
    out_name: str = "bundler",
    min_track_length: int = 2,
) -> Optional[Path]:
    img_dir = Path(img_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    names, tracks = build_tracks(match_path, min_track_length=min_track_length)
    if not tracks:
        logger.warning("No tracks built; skipping Bundler export")
        return None

    # keypoints + image sizes
    kpts = {}
    sizes = {}
    with h5py.File(str(feature_path), "r") as fd:
        for name in names:
            kpts[name] = np.asarray(fd[name]["keypoints"])
            if "image_size" in fd[name]:
                sizes[name] = np.asarray(fd[name]["image_size"])
            else:
                with PILImage.open(img_dir / name) as im:
                    sizes[name] = np.array(im.size)

    bundler_path = out_dir / f"{out_name}.out"
    list_path = out_dir / f"{out_name}_list.txt"
    with open(list_path, "w") as f:
        for name in names:
            f.write(f"{name}\n")

    with open(bundler_path, "w") as f:
        f.write("# Bundle file v0.3\n")
        f.write(f"{len(names)} {len(tracks)}\n")
        # zero-pose cameras: f k1 k2 / R / t
        for name in names:
            f.write("0 0 0\n")
            f.write("0 0 0\n0 0 0\n0 0 0\n")
            f.write("0 0 0\n")
        for track in tracks:
            f.write("0 0 0\n")        # position (unknown)
            f.write("128 128 128\n")  # color
            obs = []
            for img_i, feat_i in track:
                name = names[img_i]
                w, h = sizes[name][:2]
                x, y = kpts[name][feat_i][:2]
                # Bundler convention: origin at image center, y up
                bx = x - w / 2.0
                by = h / 2.0 - y
                obs.append(f"{img_i} {feat_i} {bx:.4f} {by:.4f}")
            f.write(f"{len(track)} " + " ".join(obs) + "\n")
    logger.info(
        f"Bundler export: {len(names)} images, {len(tracks)} tracks "
        f"-> {bundler_path}"
    )
    return bundler_path
