"""Run OpenMVG incremental SfM on an exported project.

Parity: reference scripts/run_openmvg.py. Requires the openMVG binaries
(PATH or --binaries).

Usage: python scripts/run_openmvg.py OPENMVG_EXPORT_DIR [--binaries DIR]
"""

import argparse
import sys
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("openmvg_dir", type=Path,
                    help="directory containing sfm_data.json + matches")
    ap.add_argument("--conf", type=Path, default=None,
                    help="openmvg yaml with general.path_to_binaries (see config/openmvg_linux.yaml), a binaries dir, or the executable")
    args = ap.parse_args()

    from deep_image_matching_tpu.openmvg import openmvg_reconstruction

    openmvg_reconstruction(
        openmvg_out_path=args.openmvg_dir,
        openmvg_conf=str(args.conf) if args.conf else None,
    )


if __name__ == "__main__":
    main()
