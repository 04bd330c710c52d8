"""Retrieval-based pair selection from global descriptors.

Parity: reference ``image_retrieval.py:7-44`` — global descriptors
(NetVLAD / OpenIBL / CosPlace / DIR) + top-k similarity pairs, deduplicated.
The descriptor runs as one jitted batch program; similarity is a single
matmul.

Weight policy (same as extractors/matchers, ``utils/weights.py``): asking
for a learned global descriptor without its checkpoint ABORTS with the
expected-filename table — a silent quality substitution in pair selection
changes which pairs exist for every downstream stage. The weight-free
``tiny`` descriptor is an EXPLICIT option (``--global_feature tiny`` /
``retrieval: tiny``), or the fallback when random weights are allowed.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List, Tuple

import numpy as np

from .models import retrieval as R
from .utils.image import ImageList, read_image, resize_image
from .utils.weights import classical_fallback, missing_weights

# appended to the abort message at every retrieval checkpoint-miss site
_TINY_NOTE = (
    "Or select the weight-free descriptor explicitly: --global_feature tiny "
    "(config `general: {retrieval: tiny}`)."
)

logger = logging.getLogger("dim_tpu")


def compute_global_descriptors(
    image_list: ImageList,
    retrieval: str = "netvlad",
    resize_max: int = 640,
    batch_size: int = 8,
) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    imgs = []
    for im in image_list:
        arr = read_image(im.path, grayscale=False).astype(np.float32) / 255.0
        h, w = arr.shape[:2]
        s = resize_max / max(h, w)
        arr = resize_image(arr, (max(8, round(w * s)), max(8, round(h * s))))
        # common size for batching
        arr = resize_image(arr, (resize_max, resize_max * 3 // 4))
        imgs.append(arr)
    batch_all = np.stack(imgs)

    netvlad_params = _load_netvlad() if retrieval == "netvlad" else None
    cosplace_params = _load_cosplace() if retrieval == "cosplace" else None
    openibl_params = _load_openibl() if retrieval == "openibl" else None
    dir_params = _load_dir() if retrieval == "dir" else None
    descs = []
    for s in range(0, len(batch_all), batch_size):
        chunk = jnp.asarray(batch_all[s : s + batch_size])
        if netvlad_params is not None:
            feats = R.vgg16_features(netvlad_params["backbone"], chunk)
            d = R.netvlad_aggregate(
                feats,
                netvlad_params["centers"], netvlad_params["assign_w"],
                netvlad_params.get("pca_w"), netvlad_params.get("pca_b"),
            )
        elif openibl_params is not None:
            feats = R.vgg16_features(openibl_params, chunk)
            d = R.netvlad_aggregate(
                feats, openibl_params["centers"], openibl_params["assign_w"],
                assign_b=openibl_params.get("assign_b"),
            )
        elif dir_params is not None:
            from .models.vgg_refiner import IMAGENET_MEAN, IMAGENET_STD

            d = R.resnet_gem_descriptor(
                dir_params, (chunk - IMAGENET_MEAN) / IMAGENET_STD
            )
        elif cosplace_params is not None:
            from .models.vgg_refiner import IMAGENET_MEAN, IMAGENET_STD

            d = R.cosplace_descriptor(
                cosplace_params, (chunk - IMAGENET_MEAN) / IMAGENET_STD
            )
        else:
            d = R.tiny_descriptor(chunk)
        descs.append(np.asarray(d))
    return np.concatenate(descs, axis=0)


def _load_cosplace():
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for name in ("cosplace_resnet18.pth", "cosplace.pth"):
            cand = base / name
            if cand.exists():
                import torch

                from .models.retrieval import cosplace_params_from_torch

                logger.info(f"Loaded CosPlace weights from {cand}")
                ckpt = torch.load(str(cand), map_location="cpu")
                return cosplace_params_from_torch(ckpt.get("state_dict", ckpt))
    missing_weights(
        "CosPlace", ["cosplace_resnet18.pth", "cosplace.pth"], note=_TINY_NOTE
    )
    classical_fallback("CosPlace", "'tiny' global descriptor")
    return None


def _load_openibl():
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for name in ("vgg16_netvlad.pth", "openibl.pth"):
            cand = base / name
            if cand.exists():
                import torch

                from .models.retrieval import openibl_params_from_torch

                logger.info(f"Loaded OpenIBL weights from {cand}")
                ckpt = torch.load(str(cand), map_location="cpu")
                return openibl_params_from_torch(ckpt.get("state_dict", ckpt))
    missing_weights(
        "OpenIBL", ["vgg16_netvlad.pth", "openibl.pth"], note=_TINY_NOTE
    )
    classical_fallback("OpenIBL", "'tiny' global descriptor")
    return None


def _load_dir():
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for name in ("Resnet101-AP-GeM-LM18.pt", "dir_resnet101_gem.pth"):
            cand = base / name
            if cand.exists():
                import torch

                from .models.retrieval import resnet_gem_params_from_torch

                logger.info(f"Loaded DIR weights from {cand}")
                ckpt = torch.load(str(cand), map_location="cpu")
                return resnet_gem_params_from_torch(
                    ckpt.get("state_dict", ckpt)
                )
    missing_weights(
        "DIR", ["Resnet101-AP-GeM-LM18.pt", "dir_resnet101_gem.pth"],
        note=_TINY_NOTE,
    )
    classical_fallback("DIR", "'tiny' global descriptor")
    return None


def _load_netvlad():
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        cand = base / "netvlad.npz"
        if cand.exists():
            import jax.numpy as jnp

            data = np.load(cand)
            logger.info(f"Loaded NetVLAD weights from {cand}")
            return {k: jnp.asarray(v) for k, v in data.items()}
    missing_weights("NetVLAD", ["netvlad.npz"], note=_TINY_NOTE)
    classical_fallback("NetVLAD", "'tiny' global descriptor")
    return None


def retrieval_pairs(
    image_list: ImageList,
    retrieval: str = "netvlad",
    num_matched: int = 10,
) -> List[Tuple[str, str]]:
    names = image_list.img_names
    if retrieval not in ("netvlad", "openibl", "cosplace", "dir", "tiny"):
        raise ValueError(f"Unknown retrieval method '{retrieval}'")
    descs = compute_global_descriptors(image_list, retrieval)
    sim = descs @ descs.T
    np.fill_diagonal(sim, -np.inf)
    pairs = set()
    k = min(num_matched, len(names) - 1)
    for i in range(len(names)):
        for j in np.argsort(-sim[i])[:k]:
            pairs.add(tuple(sorted((names[i], names[int(j)]))))
    logger.info(f"Retrieval selected {len(pairs)} pairs (top-{k})")
    return sorted(pairs)
