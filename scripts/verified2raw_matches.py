"""Copy a database's verified two-view geometries back into the raw
matches table of a new COLMAP database.

Parity: reference scripts/verified2raw_matches.py (hardcoded paths there;
proper CLI here). Useful to re-run geometric verification or feed tools
that read the matches table only.

Usage: python scripts/verified2raw_matches.py SRC_DB DST_DB
"""

import argparse
import sys
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src_db", type=Path)
    ap.add_argument("dst_db", type=Path)
    args = ap.parse_args()

    from deep_image_matching_tpu.io.colmap_db import (
        COLMAPDatabase, blob_to_array, pair_id_to_image_ids,
    )

    src = COLMAPDatabase.connect(str(args.src_db))
    if args.dst_db.exists():
        args.dst_db.unlink()
    dst = COLMAPDatabase.connect(str(args.dst_db))
    dst.create_tables()

    for cam_id, model, w, h, params, prior in src.execute(
        "SELECT * FROM cameras"
    ):
        dst.add_camera(model, w, h, blob_to_array(params, np.float64),
                       prior_focal_length=prior, camera_id=cam_id)
    for image_id, name, cam_id in src.execute(
        "SELECT image_id, name, camera_id FROM images"
    ):
        dst.add_image(name, cam_id, image_id=image_id)
    for image_id, rows, cols, data in src.execute(
        "SELECT image_id, rows, cols, data FROM keypoints"
    ):
        if data is not None and rows:
            # COLMAP stores N x {2,4,6} float32; keep only x, y
            kpts = blob_to_array(data, np.float32, (rows, cols))[:, :2]
            dst.add_keypoints(image_id, kpts)
    n = 0
    for pair_id, rows, cols, data in src.execute(
        "SELECT pair_id, rows, cols, data FROM two_view_geometries"
    ):
        if data is None or rows == 0:
            continue
        i0, i1 = pair_id_to_image_ids(pair_id)
        dst.add_matches(i0, i1, blob_to_array(data, np.uint32, (-1, 2)))
        n += 1
    dst.commit()
    print(f"Copied {n} verified pair geometries into {args.dst_db} matches table")


if __name__ == "__main__":
    main()
