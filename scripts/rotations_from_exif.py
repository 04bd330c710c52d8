"""Write a rotations.txt (image_name rotation_degrees) from EXIF orientation.

Equivalent of reference ``scripts/rotations_from_exif.py``; the output feeds
``--upright`` with the ``custom`` strategy.

Usage:
    python scripts/rotations_from_exif.py images/ rotations.txt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "src"))

_ORIENT_TO_DEG = {1: 0, 3: 180, 6: 90, 8: 270}


def main(image_dir, output):
    from deep_image_matching_tpu.utils.image import ImageList

    lines = []
    for im in ImageList(Path(image_dir)):
        deg = 0
        try:
            import exifread

            with open(im.path, "rb") as f:
                tags = exifread.process_file(f, details=False)
            o = tags.get("Image Orientation")
            if o is not None:
                deg = _ORIENT_TO_DEG.get(o.values[0], 0)
        except Exception:
            try:
                from PIL import Image as PILImage

                exif = PILImage.open(im.path).getexif()
                deg = _ORIENT_TO_DEG.get(exif.get(274, 1), 0)
            except Exception:
                pass
        lines.append(f"{im.name} {deg}")
    Path(output).write_text("\n".join(lines) + "\n")
    print(f"Wrote {len(lines)} rotations to {output}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image_dir")
    ap.add_argument("output")
    a = ap.parse_args()
    main(a.image_dir, a.output)
