"""Print the images of a directory as a comma-separated list.

Equivalent of reference ``scripts/list_images.py`` (argparse instead of a
hardcoded path). Useful for building pair files / CLI arguments.

Usage:
    python scripts/list_images.py images_dir/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "src"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image_dir", type=Path, nargs="?", default=Path("./images"))
    args = ap.parse_args()

    from deep_image_matching_tpu.utils.image import ImageList

    names = [img.name for img in ImageList(args.image_dir)]
    print(",".join(names))


if __name__ == "__main__":
    main()
