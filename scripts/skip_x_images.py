"""Subsample a directory of images: copy every x-th file to an output folder.

Equivalent of reference ``scripts/skip_x_images.py`` (argparse CLI).

Usage:
    python scripts/skip_x_images.py source_folder/ output_folder/ 10
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source_folder", type=Path)
    ap.add_argument("output_folder", type=Path)
    ap.add_argument("x", type=int, help="keep every x-th image")
    args = ap.parse_args()

    args.output_folder.mkdir(parents=True, exist_ok=True)
    for i, path in enumerate(sorted(args.source_folder.iterdir())):
        if path.is_file() and i % args.x == 0:
            shutil.copy2(path, args.output_folder / path.name)
            print(f"Copying {path.name} to {args.output_folder}")


if __name__ == "__main__":
    main()
