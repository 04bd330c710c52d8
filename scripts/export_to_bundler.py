"""Export an existing project's matches to Bundler format.

Parity: reference scripts/export_to_bundler.py (builds multiview tracks
from a COLMAP database and writes bundler.out + image list). This version
drives the package exporter over the results directory's h5 files.

Usage: python scripts/export_to_bundler.py RESULTS_DIR IMAGE_DIR [-o OUT]
"""

import argparse
import sys
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir", type=Path)
    ap.add_argument("image_dir", type=Path)
    ap.add_argument("-o", "--out", type=Path, default=None)
    args = ap.parse_args()

    from deep_image_matching_tpu.io.h5_to_bundler import export_to_bundler

    out = args.out or args.results_dir / "bundler"
    export_to_bundler(
        img_dir=args.image_dir,
        feature_path=args.results_dir / "features.h5",
        match_path=args.results_dir / "matches.h5",
        out_dir=out,
    )
    print(f"Bundler export written to {out}")


if __name__ == "__main__":
    main()
