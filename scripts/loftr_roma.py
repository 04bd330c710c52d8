"""Standalone LoFTR/RoMa dense-matches → multiview tracks → COLMAP database.

Parity: reference ``scripts/loftr_roma.py`` (notebook-derived; merges per-pair
dense keypoints with <1 px rounding into shared indices, then imports
keypoints/matches into a COLMAP SQLite db). Here the merge is done by the
framework's :func:`dense_to_multiview` (``utils/dense_to_multiview.py``), so
this script is a thin CLI over the same artifacts:

  python scripts/loftr_roma.py -i RESULTS_DIR -d IMAGE_DIR [-o OUT_DIR]

where RESULTS_DIR contains the detector-free run's ``features.h5`` and
``matches.h5``.
"""

import argparse
import sys
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser(
        description=(
            "Merge LoFTR/RoMa per-pair dense matches into multiview tracks "
            "(keypoints within <1 px share an index) and build a COLMAP db."
        )
    )
    ap.add_argument("-i", "--input_dir", type=Path, required=True,
                    help="dir with features.h5 and matches.h5")
    ap.add_argument("-d", "--image_dir", type=Path, required=True)
    ap.add_argument("-o", "--output_dir", type=Path, default=None,
                    help="output dir (default: INPUT_DIR)")
    ap.add_argument("--camera_options", type=Path, default=None,
                    help="optional cameras.yaml for intrinsics grouping")
    args = ap.parse_args()

    from deep_image_matching_tpu.utils.dense_to_multiview import dense_to_multiview

    out_dir = args.output_dir or args.input_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    db_path = out_dir / "database.db"
    if db_path.exists():
        db_path.unlink()

    mv_feats, mv_matches = dense_to_multiview(
        feature_path=args.input_dir / "features.h5",
        match_path=args.input_dir / "matches.h5",
        database_path=db_path,
        img_dir=args.image_dir,
        camera_config_path=args.camera_options,
    )
    print(f"multiview features: {mv_feats}")
    print(f"multiview matches:  {mv_matches}")
    print(f"COLMAP database:    {db_path}")


if __name__ == "__main__":
    main()
