"""Merge two COLMAP databases into one (disjoint or overlapping image sets).

Equivalent of reference ``scripts/join_databases.py``: images present in both
databases keep the first database's ids; cameras, keypoints, matches, and
two-view geometries are remapped and appended.

Usage:
    python scripts/join_databases.py a.db b.db merged.db
"""

from __future__ import annotations

import argparse
import shutil
import sqlite3
from pathlib import Path


def join(db_a, db_b, out_db):
    out_db = Path(out_db)
    shutil.copy(db_a, out_db)
    dst = sqlite3.connect(str(out_db))
    src = sqlite3.connect(str(db_b))

    names_dst = {n: i for i, n in dst.execute("SELECT image_id, name FROM images")}
    cam_map = {}
    for row in src.execute("SELECT camera_id, model, width, height, params, "
                           "prior_focal_length FROM cameras"):
        cur = dst.execute(
            "INSERT INTO cameras (model, width, height, params, "
            "prior_focal_length) VALUES (?, ?, ?, ?, ?)", row[1:]
        )
        cam_map[row[0]] = cur.lastrowid

    img_map = {}
    for image_id, name, camera_id in src.execute(
        "SELECT image_id, name, camera_id FROM images"
    ):
        if name in names_dst:
            img_map[image_id] = names_dst[name]
            continue
        cur = dst.execute(
            "INSERT INTO images (name, camera_id) VALUES (?, ?)",
            (name, cam_map.get(camera_id)),
        )
        img_map[image_id] = cur.lastrowid
        for table in ("keypoints", "descriptors"):
            row = src.execute(
                f"SELECT rows, cols, data FROM {table} WHERE image_id=?",
                (image_id,),
            ).fetchone()
            if row:
                dst.execute(
                    f"INSERT INTO {table} (image_id, rows, cols, data) "
                    "VALUES (?, ?, ?, ?)", (img_map[image_id], *row),
                )

    def remap_pair(pair_id):
        id2 = pair_id % 2147483647
        id1 = (pair_id - id2) // 2147483647
        n1, n2 = img_map.get(id1), img_map.get(id2)
        if n1 is None or n2 is None:
            return None
        if n1 > n2:
            n1, n2 = n2, n1
        return n1 * 2147483647 + n2

    for table, cols in (
        ("matches", "rows, cols, data"),
        ("two_view_geometries", "rows, cols, data, config, F, E, H"),
    ):
        for row in src.execute(f"SELECT pair_id, {cols} FROM {table}"):
            new_id = remap_pair(row[0])
            if new_id is None:
                continue
            exists = dst.execute(
                f"SELECT 1 FROM {table} WHERE pair_id=?", (new_id,)
            ).fetchone()
            if exists:
                continue
            placeholders = ", ".join("?" * (1 + len(cols.split(","))))
            dst.execute(
                f"INSERT INTO {table} (pair_id, {cols}) "
                f"VALUES ({placeholders})", (new_id, *row[1:]),
            )
    dst.commit()
    n = dst.execute("SELECT COUNT(*) FROM images").fetchone()[0]
    print(f"Merged into {out_db}: {n} images")
    src.close()
    dst.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db_a")
    ap.add_argument("db_b")
    ap.add_argument("out")
    a = ap.parse_args()
    join(a.db_a, a.db_b, a.out)
