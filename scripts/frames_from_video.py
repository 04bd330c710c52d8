"""Extract frames from a video into an images/ folder for the pipeline.

Equivalent of reference ``scripts/frames_from_video.py``.

Usage:
    python scripts/frames_from_video.py input.mp4 out_images/ --every 10
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(video, out_dir, every=10, max_frames=None):
    import cv2

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(video))
    i = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % every == 0:
            cv2.imwrite(str(out_dir / f"frame_{i:06d}.jpg"), frame)
            saved += 1
            if max_frames and saved >= max_frames:
                break
        i += 1
    cap.release()
    print(f"Saved {saved} frames to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("video")
    ap.add_argument("out_dir")
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--max-frames", type=int, default=None)
    a = ap.parse_args()
    main(a.video, a.out_dir, a.every, a.max_frames)
