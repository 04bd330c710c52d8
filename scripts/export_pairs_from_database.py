"""Export a pairs.txt from an existing COLMAP database.

Equivalent of reference ``scripts/export_pairs_from_database.py``: list every
image pair whose (verified) match count clears a threshold.

Usage:
    python scripts/export_pairs_from_database.py database.db pairs.txt \
        --min-matches 15 [--table matches|two_view_geometries]
"""

from __future__ import annotations

import argparse
import sqlite3
from pathlib import Path


def export_pairs(database_path, output_path, min_matches=15,
                 table="two_view_geometries"):
    con = sqlite3.connect(str(database_path))
    names = dict(con.execute("SELECT image_id, name FROM images"))
    lines = []
    for pair_id, rows in con.execute(f"SELECT pair_id, rows FROM {table}"):
        if rows is None or rows < min_matches:
            continue
        id2 = pair_id % 2147483647
        id1 = (pair_id - id2) // 2147483647
        if id1 in names and id2 in names:
            lines.append(f"{names[id1]} {names[id2]}")
    con.close()
    Path(output_path).write_text("\n".join(lines) + ("\n" if lines else ""))
    print(f"Wrote {len(lines)} pairs to {output_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("database")
    ap.add_argument("output")
    ap.add_argument("--min-matches", type=int, default=15)
    ap.add_argument("--table", default="two_view_geometries",
                    choices=["matches", "two_view_geometries"])
    a = ap.parse_args()
    export_pairs(a.database, a.output, a.min_matches, a.table)
