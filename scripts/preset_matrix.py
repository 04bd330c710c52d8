"""Run every pipeline preset end-to-end on a tiny image set and report results.

A correctness sweep over the full zoo (reference test strategy: smoke-level
end-to-end runs per configuration, tests/test_pipelines.py in the reference).
Usage: python scripts/preset_matrix.py [--images DIR] [--only NAME ...]
"""

import argparse
import shutil
import sys
import time
import traceback
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def run_preset(name: str, images: Path, work: Path) -> dict:
    from deep_image_matching_tpu.config import Config
    from deep_image_matching_tpu.image_matching import ImageMatcher

    proj = work / name.replace("+", "_")
    proj.mkdir(parents=True)
    shutil.copytree(images, proj / "images")
    cfg = Config(
        args={
            "dir": str(proj),
            "pipeline": name,
            "strategy": "bruteforce",
            "quality": "low",
            "skip_reconstruction": True,
            "force": True,
        }
    )
    t0 = time.time()
    matcher = ImageMatcher(cfg)
    feature_path, match_path = matcher.run()
    dt = time.time() - t0

    import h5py

    with h5py.File(feature_path, "r") as f:
        n_imgs = len(f.keys())
        n_kpts = sum(int(f[k]["keypoints"].shape[0]) for k in f.keys())
    n_pairs = 0
    n_matches = 0
    if Path(match_path).exists():
        with h5py.File(match_path, "r") as f:
            for g0 in f.keys():
                for g1 in f[g0].keys():
                    n_pairs += 1
                    n_matches += int(f[g0][g1].shape[0])
    return {
        "imgs": n_imgs, "kpts": n_kpts, "pairs": n_pairs,
        "matches": n_matches, "secs": round(dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/assets/pytest/images")
    ap.add_argument("--work", default="/tmp/preset_matrix")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from deep_image_matching_tpu.config import confs

    work = Path(args.work)
    if work.exists():
        shutil.rmtree(work)
    names = args.only or list(confs.keys())
    results = {}
    for name in names:
        try:
            results[name] = run_preset(name, Path(args.images), work)
            status = "OK "
        except Exception as e:
            traceback.print_exc()
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            status = "FAIL"
        r = results[name]
        print(f"[{status}] {name}: {r}", flush=True)

    fails = [n for n, r in results.items() if "error" in r]
    print(f"\n{len(names) - len(fails)}/{len(names)} presets OK")
    if fails:
        print("FAILED:", ", ".join(fails))
        sys.exit(1)


if __name__ == "__main__":
    main()
