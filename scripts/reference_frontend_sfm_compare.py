"""Reconstruction comparison: torch-reference front-end vs the JAX port,
through the SAME native mapper, on the scenes below full registration.

VERDICT round-3 missing #1: nadar 11/12, temple_baal 3/4, thermal 5/6
registered — with no reference-side number, "pipeline deficiency vs scene
difficulty" was indistinguishable. This script produces the torch-reference
column: the reference's ALIKED (real aliked-n16rot weights, its own torch
forward — ``/root/reference/src/deep_image_matching/thirdparty/LightGlue/
lightglue/aliked.py``) extracts features, which are written into the repo's
features.h5 and pushed through the repo's OWN production matcher
(kornia_matcher smnn .95 — parity-tested vs kornia), MAGSAC GV, COLMAP
export, and native incremental mapper (``sfm/``). The JAX front-end runs the
identical config. The ONLY difference between the two rows is the extractor
forward, so a registration gap is attributable to the port; matching gaps
both ways indicate scene difficulty.

Both stacks run upright=False (identical conditions; the repo's recorded
status.md rows used upright=True, kept there for context).

Usage:
  JAX_PLATFORMS=cpu python scripts/reference_frontend_sfm_compare.py \
      [--scenes nadar temple_baal thermal] [--max-kpts 4096]
"""

import argparse
import shutil
import sys
import tempfile
import time
from itertools import combinations
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_REF = Path("/root/reference/src/deep_image_matching/thirdparty")
ASSETS = Path("/root/reference/assets")
sys.path.insert(0, str(_HERE / "torch_shims"))
sys.path.insert(0, str(_HERE.parent / "src"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def torch_aliked_extract(paths, max_kpts=4096):
    """The reference's own ALIKED forward (LightGlue-bundled package, real
    aliked-n16rot weights)."""
    import cv2
    import torch

    sys.path.insert(0, str(_REF / "LightGlue"))
    hub = Path.home() / ".cache/torch/hub/checkpoints"
    hub.mkdir(parents=True, exist_ok=True)
    src = _REF / "ALIKED/models/aliked-n16rot.pth"
    if not (hub / src.name).exists():
        shutil.copy(src, hub / src.name)
    from lightglue import ALIKED as TorchALIKED

    net = TorchALIKED(
        model_name="aliked-n16rot", max_num_keypoints=max_kpts,
        detection_threshold=0.2, nms_radius=3,
    ).eval()
    net.load_state_dict(torch.load(str(src), map_location="cpu"), strict=True)
    out = {}
    with torch.no_grad():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
            t = torch.from_numpy(img).float().permute(2, 0, 1)[None] / 255.0
            o = net({"image": t})
            out[p.name] = dict(
                keypoints=o["keypoints"][0].numpy(),
                descriptors=o["descriptors"][0].numpy(),  # (N, D) rows
                scores=o["keypoint_scores"][0].numpy(),
                image_size=np.array(
                    [img.shape[1], img.shape[0]], dtype=np.int64
                ),
            )
            log(f"  torch aliked {p.name}: {len(out[p.name]['keypoints'])} kpts")
    return out


def run_pipeline(proj, tag, torch_features=None, max_kpts=4096):
    """One front-end run through the repo's production matcher + native
    mapper. torch_features given -> features.h5 is pre-written and
    extraction resumes over it (the repo's own resume seam), so the matcher
    /GV/export/mapper path is IDENTICAL for both stacks."""
    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.image_matching import ImageMatcher
    from deep_image_matching_tpu.io.h5 import list_pairs, save_features
    from deep_image_matching_tpu.io.h5_to_db import export_to_colmap
    from deep_image_matching_tpu.sfm import native_incremental_mapping

    out = proj / f"out_{tag}"
    args = {
        "dir": str(proj),
        "outs": str(out),
        "pipeline": "aliked+lightglue",  # overridden below
        "strategy": "bruteforce",
        "skip_reconstruction": True,
        "force": torch_features is None,
    }
    overrides = dict(
        extractor={"name": "aliked", "model_name": "aliked-n16rot",
                   "max_num_keypoints": max_kpts,
                   "detection_threshold": 0.2, "nms_radius": 3},
        matcher={"name": "kornia_matcher", "match_mode": "smnn", "th": 0.95},
    )
    if torch_features is not None:
        out.mkdir(parents=True, exist_ok=True)
        fpath = out / "features.h5"
        if fpath.exists():
            fpath.unlink()
        for name, f in torch_features.items():
            save_features(fpath, name, **f)
        args["force"] = False
    cfg = Config(args=args, **overrides)
    if torch_features is not None:
        cfg.general["resume"] = True
    im = ImageMatcher(cfg)
    t0 = time.perf_counter()
    pairs = im.generate_pairs()
    fpath = im.extract_features()
    mpath = im.match_pairs(pairs, fpath)
    t_match = time.perf_counter() - t0
    n_ver = len(list_pairs(mpath)) if Path(mpath).exists() else 0
    db_path = out / "database.db"
    export_to_colmap(proj / "images", fpath, mpath, db_path)
    t0 = time.perf_counter()
    rec = native_incremental_mapping(db_path, proj / "images", out)
    t_sfm = time.perf_counter() - t0
    if rec is None:
        reg, pts = 0, 0
    else:
        _, images, points3D = rec
        reg, pts = len(images), len(points3D)
    return dict(pairs=len(pairs), verified=n_ver, registered=reg,
                points=pts, t_match=t_match, t_sfm=t_sfm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+",
                    default=["nadar", "temple_baal", "thermal"])
    ap.add_argument("--dir", default=None,
                    help="compare on a custom scene: a directory containing "
                         "an images/ subfolder (e.g. the 60-image scale "
                         "scene) instead of the bundled example scenes")
    ap.add_argument("--max-kpts", type=int, default=4096)
    args = ap.parse_args()

    scenes = args.scenes
    if args.dir:
        scenes = [f"dir:{args.dir}"]

    rows = []
    for scene in scenes:
        if scene.startswith("dir:"):
            src = Path(scene[4:]) / "images"
            scene = Path(scene[4:]).name
        else:
            src = ASSETS / f"example_{scene}" / "images"
            scene = f"example_{scene}"
        if not src.is_dir():
            log(f"skipping {scene}: {src} missing")
            continue
        proj = Path(tempfile.mkdtemp(prefix=f"refcmp_{scene}_"))
        (proj / "images").mkdir()
        paths = sorted(
            p for p in src.iterdir()
            if p.suffix.lower() in {".jpg", ".jpeg", ".png", ".tif"}
        )
        for p in paths:
            shutil.copy(p, proj / "images" / p.name)
        n_imgs = len(paths)

        log(f"== {scene}: torch-reference front-end ==")
        tfeats = torch_aliked_extract(
            [proj / "images" / p.name for p in paths], args.max_kpts
        )
        torch_row = run_pipeline(proj, "torch", torch_features=tfeats,
                                 max_kpts=args.max_kpts)
        log(f"  torch: {torch_row}")

        log(f"== {scene}: JAX front-end ==")
        jax_row = run_pipeline(proj, "jax", max_kpts=args.max_kpts)
        log(f"  jax:   {jax_row}")

        rows.append((scene, n_imgs, torch_row, jax_row))
        shutil.rmtree(proj, ignore_errors=True)

    print("\n| scene | imgs | front-end | pairs verified | registered |"
          " points |")
    print("|---|---|---|---|---|---|")
    for scene, n_imgs, t, j in rows:
        print(f"| {scene} | {n_imgs} | torch reference "
              f"(ALIKED-n16rot) | {t['verified']}/{t['pairs']} | "
              f"{t['registered']}/{n_imgs} | {t['points']} |")
        print(f"| {scene} | {n_imgs} | JAX port (this repo) | "
              f"{j['verified']}/{j['pairs']} | {j['registered']}/{n_imgs} | "
              f"{j['points']} |")


if __name__ == "__main__":
    main()
