"""Dense matching on known camera poses (sparse-then-dense workflow).

Parity: reference scripts/dense_matching.py:
1. run a feature-based pipeline + reconstruction first (any sparse preset);
2. run a detector-free pipeline (loftr/roma) over the same images;
3. triangulate the dense matches against the known poses.

Usage:
  python scripts/dense_matching.py PROJ_DIR --sfm_results RESULTS_SPARSE \
      --dense_results RESULTS_DENSE
"""

import argparse
import sys
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("project_dir", type=Path)
    ap.add_argument("--sfm_results", type=Path, required=True,
                    help="results dir of the sparse run (with reconstruction/)")
    ap.add_argument("--dense_results", type=Path, required=True,
                    help="results dir of the detector-free run")
    ap.add_argument("-o", "--out", type=Path, default=None)
    args = ap.parse_args()

    from deep_image_matching_tpu.triangulation import (
        db_from_existing_poses, triangulate_points,
    )

    out = args.out or args.dense_results / "dense_reconstruction"
    model = args.sfm_results / "reconstruction"
    db = args.dense_results / "database_dense.db"
    db_from_existing_poses(
        model_path=model,
        feature_path=args.dense_results / "features.h5",
        match_path=args.dense_results / "matches.h5",
        database_path=db,
    )
    triangulate_points(model, db, args.project_dir / "images", out)
    print(f"Dense triangulation written to {out}")


if __name__ == "__main__":
    main()
