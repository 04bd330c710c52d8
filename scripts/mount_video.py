"""Assemble a directory of images into a video (inverse of frames_from_video).

Equivalent of reference ``scripts/mount_video.py`` (argparse CLI).

Usage:
    python scripts/mount_video.py frames_dir/ out.avi --frame-duration 0.5
"""

from __future__ import annotations

import argparse
from pathlib import Path

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image_folder", type=Path)
    ap.add_argument("output_video", type=Path)
    ap.add_argument("--frame-duration", type=float, default=0.5, help="seconds")
    ap.add_argument("--codec", default="MJPG")
    args = ap.parse_args()

    import cv2

    images = sorted(
        p for p in args.image_folder.iterdir() if p.suffix.lower() in IMAGE_EXTS
    )
    if not images:
        raise SystemExit(f"no images in {args.image_folder}")
    first = cv2.imread(str(images[0]))
    height, width = first.shape[:2]

    fourcc = cv2.VideoWriter_fourcc(*args.codec)
    video = cv2.VideoWriter(
        str(args.output_video), fourcc, 1.0 / args.frame_duration, (width, height)
    )
    for i, path in enumerate(images):
        frame = cv2.imread(str(path))
        if frame.shape[:2] != (height, width):
            frame = cv2.resize(frame, (width, height))
        video.write(frame)
        print(f"Processed frame {i}: {path.name}")
    video.release()
    print(f"wrote {args.output_video}")


if __name__ == "__main__":
    main()
