"""Cross-view parity: run the torch reference ALIKED/ALIKE next to the JAX
ports on real image pairs and compare keypoints, descriptors, and match /
inlier counts.

This is the evidence path for "converted weights behave like the reference
on real scenes", beyond the shifted-crop golden tests: both stacks extract
on the same images, match with symmetric-mutual-NN + ratio, verify with
MAGSAC, and the per-pair counts are printed side by side. Offline
requirements handled here:
- ``scripts/torch_shims`` provides a pure-torch ``torchvision.ops
  .deform_conv2d`` (matching torchvision v2 semantics) and the two kornia
  color helpers the reference imports, so the LightGlue-bundled ALIKED runs
  without torchvision/kornia installed;
- the reference's torch-hub download is satisfied by seeding
  ``~/.cache/torch/hub/checkpoints`` with the repo-bundled .pth.

Usage:
  JAX_PLATFORMS=cpu python scripts/parity_vs_torch_reference.py aliked IMG_DIR
  JAX_PLATFORMS=cpu python scripts/parity_vs_torch_reference.py alike IMG_DIR

Measured on example_sacre_coeur (2026-08, this environment):
  ALIKED aliked-n16rot: 1345/1345 keypoints coincide (<0.5 px) on image A,
  descriptor cosine mean 0.9985 min 0.9812; per-pair match/inlier counts
  within a few percent of torch on all 10 pairs (incl. torch failing the
  rotated pairs — ALIKED descriptors are not rotation-invariant).
  ALIKE alike-n: bit-equivalent — same keypoint counts, descriptor cosine
  1.0000, identical match/inlier counts on all 10 pairs.
"""

import argparse
import shutil
import sys
from itertools import combinations
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_REF = Path("/root/reference/src/deep_image_matching/thirdparty")
sys.path.insert(0, str(_HERE / "torch_shims"))
sys.path.insert(0, str(_HERE.parent / "src"))

import cv2
import numpy as np


def mnn_match(d0, d1, ratio=0.85):
    sim = d0 @ d1.T
    nn12 = sim.argmax(1)
    nn21 = sim.argmax(0)
    s_sorted = np.sort(sim, axis=1)[:, ::-1]
    d1_ = np.sqrt(np.maximum(2 - 2 * s_sorted[:, 0], 0))
    d2_ = np.sqrt(np.maximum(2 - 2 * s_sorted[:, 1], 0))
    ok = d1_ <= ratio * d2_
    idx0 = np.arange(len(d0))
    m = (nn21[nn12] == idx0) & ok
    return np.stack([idx0[m], nn12[m]], 1)


def gv(k0, k1):
    if len(k0) < 8:
        return 0
    F, mask = cv2.findFundamentalMat(k0, k1, cv2.USAC_MAGSAC, 4.0, 0.99999, 10000)
    return int(mask.sum()) if mask is not None else 0


def torch_aliked(paths):
    import torch

    sys.path.insert(0, str(_REF / "LightGlue"))
    # satisfy the reference's torch-hub download offline
    hub = Path.home() / ".cache/torch/hub/checkpoints"
    hub.mkdir(parents=True, exist_ok=True)
    src = _REF / "ALIKED/models/aliked-n16rot.pth"
    if not (hub / src.name).exists():
        shutil.copy(src, hub / src.name)
    from lightglue import ALIKED as TorchALIKED

    net = TorchALIKED(
        model_name="aliked-n16rot", max_num_keypoints=4000,
        detection_threshold=0.2, nms_radius=3,
    ).eval()
    net.load_state_dict(torch.load(str(src), map_location="cpu"), strict=True)
    out = {}
    with torch.no_grad():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
            t = torch.from_numpy(img).float().permute(2, 0, 1)[None] / 255.0
            o = net({"image": t})
            out[p.name] = (o["keypoints"][0].numpy(), o["descriptors"][0].numpy())
    return out


def torch_alike(paths):
    import torch

    sys.path.insert(0, str(_REF))
    from alike.alike import ALike, configs

    net = ALike(**configs["alike-n"], device="cpu", top_k=-1,
                scores_th=0.2, n_limit=8192).eval()
    out = {}
    with torch.no_grad():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
            o = net(img, sub_pixel=True)
            out[p.name] = (o["keypoints"], o["descriptors"])
    return out


def jax_aliked(paths):
    from deep_image_matching_tpu.extractors.aliked import ALIKEDExtractor

    ex = ALIKEDExtractor({
        "extractor": {"name": "aliked", "model_name": "aliked-n16rot",
                      "max_num_keypoints": 4000,
                      "detection_threshold": 0.2, "nms_radius": 3},
        "general": {},
    })
    out = {}
    for p in paths:
        img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        res = ex._run([(img, None)])[0]
        d = res["descriptors"]
        out[p.name] = (res["keypoints"], d.T if d.shape[0] < d.shape[1] else d)
    return out


def jax_alike(paths):
    import jax.numpy as jnp

    from deep_image_matching_tpu.extractors.alike import load_params
    from deep_image_matching_tpu.models import alike as am

    params = load_params("alike-n")
    out = {}
    for p in paths:
        img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        img = img.astype(np.float32) / 255.0
        h, w = img.shape[:2]
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        batch = np.zeros((1, ph, pw, 3), np.float32)
        batch[0, :h, :w] = img
        o = am.extract(params, jnp.asarray(batch),
                       jnp.asarray([[h, w]], dtype=np.int32),
                       max_keypoints=8192, scores_th=0.2, nms_radius=2)
        m = np.asarray(o["mask"][0])
        out[p.name] = (np.asarray(o["keypoints"][0])[m],
                       np.asarray(o["descriptors"][0])[m])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["aliked", "alike"])
    ap.add_argument("image_dir", type=Path)
    args = ap.parse_args()
    paths = sorted(
        p for p in args.image_dir.iterdir()
        if p.suffix.lower() in {".jpg", ".jpeg", ".png"}
    )
    tfeats = (torch_aliked if args.model == "aliked" else torch_alike)(paths)
    jfeats = (jax_aliked if args.model == "aliked" else jax_alike)(paths)
    for name in tfeats:
        print(f"torch {name}: {len(tfeats[name][0])} kpts | "
              f"jax: {len(jfeats[name][0])} kpts")
    print("\npair | torch matches/inliers | jax matches/inliers")
    for a, b in combinations(sorted(tfeats), 2):
        tm = mnn_match(tfeats[a][1], tfeats[b][1])
        ti = gv(tfeats[a][0][tm[:, 0]], tfeats[b][0][tm[:, 1]])
        jm = mnn_match(jfeats[a][1], jfeats[b][1])
        ji = gv(jfeats[a][0][jm[:, 0]], jfeats[b][0][jm[:, 1]])
        print(f"{a:>24}-{b:<24} torch {len(tm):4d}/{ti:4d}  jax {len(jm):4d}/{ji:4d}")
    from scipy.spatial import cKDTree

    a = sorted(tfeats)[0]
    tk, td = tfeats[a]
    jk, jd = jfeats[a]
    dist, idx = cKDTree(tk).query(jk, k=1)
    close = dist < 0.5
    if close.sum():
        cos = (jd[close] * td[idx[close]]).sum(1)
        print(f"\n{a}: {close.sum()}/{len(jk)} kpts coincide (<0.5 px); "
              f"desc cos mean {cos.mean():.4f} min {cos.min():.4f}")


if __name__ == "__main__":
    main()
