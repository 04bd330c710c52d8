"""Minimal library-API demo (parity with the reference's repo-root demo.py).

Runs the CPU-friendly SIFT pipeline on a small image folder and prints the
verified match counts per pair.
"""

import argparse
import sqlite3
from pathlib import Path

import deep_image_matching_tpu as dim
from deep_image_matching_tpu.io.h5_to_db import export_to_colmap


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", required=True, help="project dir with images/")
    parser.add_argument("--pipeline", default="sift+kornia_matcher")
    args = parser.parse_args()

    config = dim.Config(
        args={
            "dir": args.dir,
            "pipeline": args.pipeline,
            "strategy": "bruteforce",
            "skip_reconstruction": True,
            "force": True,
        }
    )
    matcher = dim.ImageMatcher(config)
    feature_path, match_path = matcher.run()

    db = config.output_dir / "database.db"
    export_to_colmap(config.image_dir, feature_path, match_path, db)

    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT pair_id, rows FROM two_view_geometries ORDER BY rows DESC"
    ).fetchall()
    print(f"\n{len(rows)} verified pairs -> {db}")
    for pair_id, n in rows[:10]:
        print(f"  pair {pair_id}: {n} inlier matches")


if __name__ == "__main__":
    main()
