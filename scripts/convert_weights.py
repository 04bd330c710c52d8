"""Convert upstream torch checkpoints into the local weight cache.

Usage:
    python scripts/convert_weights.py --weights-dir ~/.cache/dim_tpu

Copies/renames known checkpoint files into the layout the extractors and
matchers expect, and sanity-loads each through its converter so failures
surface here instead of mid-pipeline. See README "Pretrained weights" for
the filename table.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

CONVERTERS = {
    "superpoint_v1.pth": ("deep_image_matching_tpu.models.superpoint", "params_from_torch"),
    "superpoint_lightglue.pth": ("deep_image_matching_tpu.models.lightglue", "params_from_torch"),
    "superglue_outdoor.pth": ("deep_image_matching_tpu.models.superglue", "params_from_torch"),
    "superglue_indoor.pth": ("deep_image_matching_tpu.models.superglue", "params_from_torch"),
    "aliked-n16rot.pth": ("deep_image_matching_tpu.models.aliked", "params_from_torch"),
    "alike-n.pth": ("deep_image_matching_tpu.models.alike", "params_from_torch"),
    "xfeat.pt": ("deep_image_matching_tpu.models.xfeat", "params_from_torch"),
    "outdoor_ds.ckpt": ("deep_image_matching_tpu.models.loftr", "params_from_torch"),
    "dedode_detector_L.pth": ("deep_image_matching_tpu.models.dedode", "detector_params_from_torch"),
    "dedode_descriptor_B.pth": ("deep_image_matching_tpu.models.dedode", "descriptor_params_from_torch"),
    "RDD-v2.pth": ("deep_image_matching_tpu.models.rdd", "params_from_torch"),
    "ripe_weights.pth": ("deep_image_matching_tpu.models.ripe", "params_from_torch"),
    "vgg16_netvlad.pth": ("deep_image_matching_tpu.models.retrieval", "openibl_params_from_torch"),
    "Resnet101-AP-GeM-LM18.pt": ("deep_image_matching_tpu.models.retrieval", "resnet_gem_params_from_torch"),
    "se2loftr_8rot_exported.pth": ("deep_image_matching_tpu.models.se2loftr", "params_from_exported_torch"),
    "hardnet.pth": ("deep_image_matching_tpu.models.hardnet", "hardnet_params_from_torch"),
    "keynet.pth": ("deep_image_matching_tpu.models.keynet", "keynet_params_from_torch"),
    "affnet.pth": ("deep_image_matching_tpu.models.affnet", "affnet_params_from_torch"),
    "orinet.pth": ("deep_image_matching_tpu.models.affnet", "orinet_params_from_torch"),
}

# SE2-LoFTR note: the published 8rot.ckpt stores e2cnn *basis* parameters.
# Export it once on any machine with e2cnn installed:
#     from src.loftr import LoFTR  # the se2loftr repo
#     model = LoFTR(config); model.load_state_dict(ckpt["state_dict"])
#     exported = model.eval().export()  # e2cnn modules -> plain Conv2d/BN
#     torch.save(exported.state_dict(), "se2loftr_8rot_exported.pth")
# The exported plain-conv form is mathematically identical at inference.


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights-dir", default=str(Path.home() / ".cache/dim_tpu"))
    parser.add_argument("--source-dir", default=None,
                        help="Directory with downloaded upstream checkpoints")
    args = parser.parse_args()

    wdir = Path(args.weights_dir).expanduser()
    wdir.mkdir(parents=True, exist_ok=True)
    if args.source_dir:
        for name in CONVERTERS:
            src = Path(args.source_dir) / name
            if src.exists() and not (wdir / name).exists():
                shutil.copy(src, wdir / name)
                print(f"copied {name}")

    import importlib

    import torch

    for name, (mod_name, fn_name) in CONVERTERS.items():
        path = wdir / name
        if not path.exists():
            print(f"[missing] {name}")
            continue
        try:
            mod = importlib.import_module(mod_name)
            ckpt = torch.load(str(path), map_location="cpu")
            sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
            getattr(mod, fn_name)(sd)
            print(f"[ok]      {name}")
        except Exception as e:
            print(f"[FAILED]  {name}: {e}")


if __name__ == "__main__":
    main()
