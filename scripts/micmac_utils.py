"""MicMac helpers: import/export Homol tie points.

Parity: reference scripts/micmac_utils.py.

Usage:
  python scripts/micmac_utils.py export RESULTS_DIR IMAGE_DIR [-o OUT]
  python scripts/micmac_utils.py import HOMOL_DIR -o OUT.h5
"""

import argparse
import sys
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("export")
    e.add_argument("results_dir", type=Path)
    e.add_argument("image_dir", type=Path)
    e.add_argument("-o", "--out", type=Path, default=None)
    i = sub.add_parser("import")
    i.add_argument("homol_dir", type=Path)
    i.add_argument("-o", "--out_dir", type=Path, required=True,
                   help="directory for features.h5/matches.h5")
    args = ap.parse_args()

    if args.cmd == "export":
        from deep_image_matching_tpu.io.h5_to_micmac import export_to_micmac

        out = args.out or args.results_dir / "micmac"
        export_to_micmac(
            image_dir=args.image_dir,
            feature_path=args.results_dir / "features.h5",
            match_path=args.results_dir / "matches.h5",
            out_dir=out,
        )
        print(f"MicMac export written to {out}")
    else:
        from deep_image_matching_tpu.io.micmac_to_h5 import micmac_to_h5

        args.out_dir.mkdir(parents=True, exist_ok=True)
        fp, mp = micmac_to_h5(
            args.homol_dir,
            args.out_dir / "features.h5",
            args.out_dir / "matches.h5",
        )
        print(f"Homol tie points imported into {fp} / {mp}")


if __name__ == "__main__":
    main()
