"""Run the bundled reference example scenes end-to-end and report quality.

Covers the BASELINE.md quality bar ("reconstructions equivalent to the
reference on assets/example_*"): extract -> match -> GV -> COLMAP db ->
native incremental mapper, printing registered images / 3D points / stage
wall times per scene. Pipelines are the real-weight ones available offline
(reference-bundled ALIKED; SIFT) — same policy as
tests/test_pipeline_realweights.py.

Usage:
    python scripts/run_example_scenes.py [scene ...]
scenes default to: nadar temple_baal thermal (the previously unrecorded
ones); also accepts sacre_coeur, cyprus.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

ASSETS = Path("/root/reference/assets")

PIPELINES = {
    # Hard scenes (nadar/temple_baal/thermal) need dense detection + a
    # permissive or geometry-aware matcher; measured round 3 (docs/status.md):
    # nadar 11/12, temple_baal 3/4, thermal 5/6 with these two.
    "aliked4k+smnn95": dict(
        extractor={"name": "aliked", "max_num_keypoints": 4096,
                   "detection_threshold": 0.1},
        matcher={"name": "kornia_matcher", "match_mode": "smnn", "th": 0.95},
    ),
    "aliked4k+adalam": dict(
        extractor={"name": "aliked", "max_num_keypoints": 4096,
                   "detection_threshold": 0.1},
        matcher={"name": "adalam"},
    ),
    "aliked+smnn": dict(
        extractor={"name": "aliked", "max_num_keypoints": 2048},
        matcher={"name": "kornia_matcher", "match_mode": "smnn", "th": 0.85},
    ),
    "sift+smnn": dict(
        extractor={"name": "sift", "max_num_keypoints": 4096},
        matcher={"name": "kornia_matcher", "match_mode": "smnn", "th": 0.9},
    ),
}


def run_scene(scene: str, pipeline: str = "aliked+smnn", upright: bool = True):
    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.image_matching import ImageMatcher
    from deep_image_matching_tpu.io.h5 import list_pairs
    from deep_image_matching_tpu.io.h5_to_db import export_to_colmap
    from deep_image_matching_tpu.sfm import native_incremental_mapping

    src = ASSETS / f"example_{scene}" / "images"
    if not src.is_dir():
        raise FileNotFoundError(src)
    tmp = Path(tempfile.mkdtemp(prefix=f"scene_{scene}_"))
    (tmp / "images").mkdir()
    for f in sorted(src.iterdir()):
        shutil.copy(f, tmp / "images" / f.name)
    n_imgs = len(list((tmp / "images").iterdir()))

    t0 = time.perf_counter()
    cfg = Config(
        args={
            "dir": str(tmp),
            "pipeline": "aliked+lightglue",  # overridden below
            "strategy": "bruteforce",
            "skip_reconstruction": True,
            "upright": upright,
            "force": True,
        },
        **PIPELINES[pipeline],
    )
    im = ImageMatcher(cfg)
    feature_path, match_path = im.run()
    t_match = time.perf_counter() - t0
    n_pairs = len(list_pairs(match_path)) if Path(match_path).exists() else 0
    if n_pairs == 0:
        return dict(scene=scene, pipeline=pipeline, n_imgs=n_imgs, pairs=0,
                    registered=0, points=0, t_match=t_match, t_sfm=0.0)

    t0 = time.perf_counter()
    db_path = cfg.output_dir / "database.db"
    export_to_colmap(tmp / "images", feature_path, match_path, db_path)
    out = native_incremental_mapping(db_path, tmp / "images", cfg.output_dir)
    t_sfm = time.perf_counter() - t0
    if out is None:
        return dict(scene=scene, pipeline=pipeline, n_imgs=n_imgs,
                    pairs=n_pairs, registered=0, points=0,
                    t_match=t_match, t_sfm=t_sfm)
    _, images, points3D = out
    return dict(scene=scene, pipeline=pipeline, n_imgs=n_imgs, pairs=n_pairs,
                registered=len(images), points=len(points3D),
                t_match=t_match, t_sfm=t_sfm)


if __name__ == "__main__":
    scenes = sys.argv[1:] or ["nadar", "temple_baal", "thermal"]
    rows = []
    for sc in scenes:
        for pl in PIPELINES:
            try:
                r = run_scene(sc, pl)
            except Exception as e:  # keep going; report the failure
                print(f"!! {sc} / {pl} failed: {type(e).__name__}: {e}")
                continue
            rows.append(r)
            print(
                f"== {r['scene']:12s} {r['pipeline']:12s} "
                f"{r['registered']}/{r['n_imgs']} registered, "
                f"{r['points']} pts, {r['pairs']} pairs verified, "
                f"match {r['t_match']:.1f}s sfm {r['t_sfm']:.1f}s"
            )
    print("\n| scene | pipeline | pairs verified | registered | points |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| example_{r['scene']} ({r['n_imgs']} imgs) | {r['pipeline']} "
            f"| {r['pairs']} | {r['registered']}/{r['n_imgs']} "
            f"| {r['points']} |"
        )
