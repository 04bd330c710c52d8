"""Export an existing project's matches for Agisoft Metashape.

Parity: reference scripts/export_to_metashape.py. Metashape imports tie
points via the Bundler format; this writes the bundler.out + image list
and prints the Metashape import steps (see scripts/metashape/).

Usage: python scripts/export_to_metashape.py RESULTS_DIR IMAGE_DIR [-o OUT]
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

    from deep_image_matching_tpu.io.h5_to_metashape import export_to_metashape

    out = args.out or args.results_dir / "metashape"
    export_to_metashape(
        img_dir=args.image_dir,
        feature_path=args.results_dir / "features.h5",
        match_path=args.results_dir / "matches.h5",
        out_dir=out,
    )
    print(f"Metashape (Bundler-format) export written to {out}")
    print("In Metashape: File > Import > Import Cameras (Bundler), or run "
          "scripts/metashape/metashape_from_dim.py in the Metashape console.")


if __name__ == "__main__":
    main()
