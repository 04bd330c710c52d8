"""Full-size scale-scene run on the TPU with a per-stage timing table.

The recorded evidence promised by ``tests/test_scale_scene.py``: the same
60-image synthesized scene (``scripts/make_scale_scene.py``) at full
resolution (max_side 1024) through the default pipeline — low-res probe
pair generation, batched extraction, batched matching + device RANSAC GV,
COLMAP db export, native incremental mapper — with per-stage wall times.
Paste the emitted markdown row block into docs/status.md.

Usage: python scripts/run_scale_scene_tpu.py [--n 60] [--pipeline aliked]
  --pipeline aliked: ALIKED-n16rot real weights + smnn (quality evidence)
  --pipeline superpoint: superpoint+lightglue (random weights; the default
    preset's throughput shape)
"""

import argparse
import importlib.util
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "src"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    logging.getLogger("dim_tpu").setLevel(logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--pipeline", choices=["aliked", "superpoint"],
                    default="aliked")
    ap.add_argument("--max-side", type=int, default=1024)
    ap.add_argument("--strategy", default="matching_lowres",
                    help="pair-selection strategy (matching_lowres, "
                         "retrieval, bruteforce, sequential, ...)")
    ap.add_argument("--retrieval", default="tiny",
                    help="global descriptor for --strategy retrieval")
    ap.add_argument("--pairs-only", action="store_true",
                    help="time pair generation only (for strategy "
                         "comparisons), skip extract/match/reconstruction")
    args = ap.parse_args()

    os.environ.setdefault("DIM_TPU_ALLOW_RANDOM_WEIGHTS", "1")

    spec = importlib.util.spec_from_file_location(
        "make_scale_scene", REPO / "scripts" / "make_scale_scene.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    proj = Path(tempfile.mkdtemp(prefix="scale_scene_tpu_"))
    n = mod.make_scale_scene(proj, n_total=args.n, max_side=args.max_side)
    log(f"scene: {n} images at max_side {args.max_side} in {proj}")

    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.image_matching import ImageMatcher
    from deep_image_matching_tpu.io.h5 import list_pairs
    from deep_image_matching_tpu.io.h5_to_db import export_to_colmap
    from deep_image_matching_tpu.sfm import native_incremental_mapping

    if args.pipeline == "aliked":
        overrides = dict(
            extractor={"name": "aliked", "model_name": "aliked-n16rot",
                       "max_num_keypoints": 2048},
            matcher={"name": "kornia_matcher", "match_mode": "smnn",
                     "th": 0.95},
        )
        preset = "aliked+lightglue"
    else:
        overrides = {}
        preset = "superpoint+lightglue"
    cfg_args = {
        "dir": str(proj),
        "pipeline": preset,
        "strategy": args.strategy,
        "skip_reconstruction": True,
        "force": True,
    }
    if args.strategy == "retrieval":
        cfg_args["global_feature"] = args.retrieval
    cfg = Config(args=cfg_args, **overrides)
    im = ImageMatcher(cfg)

    t = {}
    t0 = time.perf_counter()
    pairs = im.generate_pairs()
    t[f"pair generation ({args.strategy})"] = time.perf_counter() - t0
    log(f"pairs: {len(pairs)}")
    if args.pairs_only:
        dt = t[f"pair generation ({args.strategy})"]
        print(f"\nScale scene pair selection: {n} images, strategy "
              f"{args.strategy}"
              + (f" ({args.retrieval})" if args.strategy == "retrieval"
                 else "")
              + f", {len(pairs)} pairs in {dt:.1f} s")
        return
    t0 = time.perf_counter()
    fpath = im.extract_features()
    t["extract (batched, device)"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    mpath = im.match_pairs(pairs, fpath)
    t["match + GV (batched + device RANSAC) + h5"] = time.perf_counter() - t0
    n_ver = len(list_pairs(mpath)) if Path(mpath).exists() else 0
    log(f"verified: {n_ver}/{len(pairs)}")

    db_path = cfg.output_dir / "database.db"
    t0 = time.perf_counter()
    export_to_colmap(proj / "images", fpath, mpath, db_path)
    t["COLMAP db export"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec = native_incremental_mapping(db_path, proj / "images", cfg.output_dir)
    t["native incremental mapper"] = time.perf_counter() - t0
    if rec is None:
        reg, pts = 0, 0
    else:
        _, images, points3D = rec
        reg, pts = len(images), len(points3D)
        registered = {im.name for im in images.values()}
        missing = sorted(
            p.name for p in (proj / "images").iterdir()
            if p.name not in registered
        )
        if missing:
            # per-image reasons come from IncrementalMapper.registration_report
            # via the dim_tpu logger (enabled above at INFO)
            log(f"unregistered images: {missing}")

    total = sum(t.values())
    print(f"\nScale scene: {n} images (max_side {args.max_side}), "
          f"{args.pipeline} pipeline, {len(pairs)} probe-selected pairs, "
          f"{n_ver} verified, {reg}/{n} registered, {pts} points")
    print("\n| stage | wall time |")
    print("|---|---|")
    for k, v in t.items():
        print(f"| {k} | {v:.1f} s |")
    print(f"| **total** | **{total:.1f} s** |")


if __name__ == "__main__":
    main()
