"""Prepare a COLMAP ``images.txt`` for the point triangulator.

Blanks the 2D-observation lines of an existing ``images.txt`` (every second
non-comment line) so COLMAP's point_triangulator re-detects observations from
the database while keeping the known poses.

Equivalent of reference ``scripts/prepare_images_for_triangulator.py``.

Usage:
    python scripts/prepare_images_for_triangulator.py -i images.txt -o out_dir/
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--images_txt", type=Path, required=True)
    ap.add_argument("-o", "--output_dir", type=Path, required=True)
    args = ap.parse_args()

    output_file = args.output_dir / "images.txt"
    if output_file.exists():
        raise SystemExit(f"Output file {output_file} already exists. Exiting.")
    args.output_dir.mkdir(parents=True, exist_ok=True)

    with open(args.images_txt) as f, open(output_file, "w") as out_f:
        c = 0
        for line in f:
            if line.startswith("#"):
                continue
            out_f.write(line if c % 2 == 0 else "\n")
            c += 1
    print(f"wrote {output_file}")


if __name__ == "__main__":
    main()
