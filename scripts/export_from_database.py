"""Export keypoints + matches from a COLMAP database back to h5.

Equivalent of reference ``scripts/export_from_database.py``: recover the
pipeline's ``features.h5`` / ``matches.h5`` schema from a database (ours or
any COLMAP-produced one), so downstream exporters and the view graph can run
without the original run directory.

Usage:
    python scripts/export_from_database.py database.db out_dir/ \
        [--table matches|two_view_geometries] [--min-matches 0]
"""

from __future__ import annotations

import argparse
import sqlite3
import sys
from pathlib import Path

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "src"))


def export(database_path, out_dir, table="two_view_geometries", min_matches=0):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    con = sqlite3.connect(str(database_path))
    names = dict(con.execute("SELECT image_id, name FROM images"))

    with h5py.File(out_dir / "features.h5", "w") as fd:
        for image_id, rows, cols, blob in con.execute(
            "SELECT image_id, rows, cols, data FROM keypoints"
        ):
            if image_id not in names or blob is None:
                continue
            kp = np.frombuffer(blob, np.float32).reshape(rows, cols)[:, :2]
            g = fd.create_group(names[image_id])
            # COLMAP stores the +0.5 pixel-center convention
            g.create_dataset("keypoints", data=kp - 0.5)
            g.create_dataset("scores", data=np.ones((rows,), np.float32))

    n_pairs = 0
    with h5py.File(out_dir / "matches.h5", "w") as fd:
        for pair_id, rows, cols, blob in con.execute(
            f"SELECT pair_id, rows, cols, data FROM {table}"
        ):
            if blob is None or rows is None or rows < max(1, min_matches):
                continue
            id2 = pair_id % 2147483647
            id1 = (pair_id - id2) // 2147483647
            if id1 not in names or id2 not in names:
                continue
            m = np.frombuffer(blob, np.uint32).reshape(rows, cols)[:, :2]
            fd.require_group(names[id1]).create_dataset(
                names[id2], data=m.astype(np.int64)
            )
            n_pairs += 1
    con.close()
    print(f"Exported {len(names)} images, {n_pairs} pairs to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("database")
    ap.add_argument("out_dir")
    ap.add_argument("--table", default="two_view_geometries",
                    choices=["matches", "two_view_geometries"])
    ap.add_argument("--min-matches", type=int, default=0)
    a = ap.parse_args()
    export(a.database, a.out_dir, a.table, a.min_matches)
