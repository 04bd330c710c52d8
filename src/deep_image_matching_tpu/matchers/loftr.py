"""LoFTR detector-free matcher wrapper.

Parity: reference ``matchers/loftr.py:16-289`` (pretrained outdoor/indoor,
detector-free semi-dense matching; keypoints appended to features.h5 during
matching). Images are quality-resized and cropped to a multiple of 8 (the
reference resizes to model resolutions); matching runs as one jitted program
per pair (``models/loftr.py``) with fixed match capacity.

Pretrained weights load from DIM_TPU_WEIGHTS_DIR/outdoor_ds.ckpt (or
loftr_outdoor.ckpt); deterministic random init otherwise.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Tuple

import numpy as np

from ..constants import Quality, get_size_by_quality
from ..utils.image import read_image, resize_image
from .matcher_base import DetectorFreeMatcher

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def load_params(pretrained: str = "outdoor"):
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    from ..models import loftr as loftr_model

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    names = [f"{pretrained}_ds.ckpt", f"loftr_{pretrained}.ckpt", f"loftr_{pretrained}.pth"]
    bases = ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]
    for base in bases:
        for name in names:
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt)
                _PARAMS = loftr_model.params_from_torch(sd)
                logger.info(f"Loaded LoFTR weights from {cand}")
                return _PARAMS
    logger.warning(
        "No pretrained LoFTR weights found (set DIM_TPU_WEIGHTS_DIR); "
        "using deterministic random init - matches will be meaningless."
    )
    import jax

    _PARAMS = loftr_model.init_params(jax.random.PRNGKey(21))
    return _PARAMS


class LOFTRMatcher(DetectorFreeMatcher):
    default_conf = {
        "pretrained": "outdoor",
        "max_matches": 2048,
        "match_threshold": 0.2,
        "max_tile_size": 1200,
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = load_params(str(self.conf.get("pretrained", "outdoor")))
        self.max_matches = int(self.conf.get("max_matches", 2048))
        self.match_threshold = float(self.conf.get("match_threshold", 0.2))

    def _load(self, path) -> np.ndarray:
        img = read_image(path, grayscale=True).astype(np.float32) / 255.0
        h, w = img.shape
        if self.quality is not Quality.HIGH:
            nw, nh = get_size_by_quality(self.quality, (w, h))
            img = resize_image(img, (max(nw, 8), max(nh, 8)))
        # cap resolution (reference loftr.py:44 limits tiles to 1200 px)
        cap = int(self.conf.get("max_tile_size", 1200))
        hh, ww = img.shape
        if max(hh, ww) > cap:
            s = cap / max(hh, ww)
            img = resize_image(img, (round(ww * s), round(hh * s)))
        hh, ww = img.shape
        return img[: hh - hh % 8, : ww - ww % 8]  # crop to /8 (avoid pad borders)

    def _match_images(self, path0, path1):
        import jax.numpy as jnp

        from ..models import loftr as loftr_model

        img0 = self._load(path0)
        img1 = self._load(path1)
        # original sizes for rescale
        full0 = read_image(path0, grayscale=True).shape
        full1 = read_image(path1, grayscale=True).shape
        out = loftr_model.match_pair(
            self.params,
            jnp.asarray(img0[None, ..., None]),
            jnp.asarray(img1[None, ..., None]),
            max_matches=self.max_matches,
            threshold=self.match_threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        k0 = out["keypoints0"][0][m]
        k1 = out["keypoints1"][0][m]
        s0 = np.array([full0[1] / img0.shape[1], full0[0] / img0.shape[0]], np.float32)
        s1 = np.array([full1[1] / img1.shape[1], full1[0] / img1.shape[0]], np.float32)
        return k0 * s0, k1 * s1
