"""LiftFeat extractor wrapper (JAX).

Parity: reference ``extractors/liftfeat.py:10-76`` (max_keypoints,
detect_threshold; ``thirdparty/liftfeat``). Full port in
``models/liftfeat.py`` (backbone + depth-normal lifting + FeatureBooster).
Weights: DIM_TPU_WEIGHTS_DIR/LiftFeat.pth.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from ..models import liftfeat as lf_model
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def _load():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for name in ("LiftFeat.pth", "liftfeat.pth"):
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt)
                _PARAMS = lf_model.params_from_torch(sd)
                logger.info(f"Loaded LiftFeat weights from {cand}")
                return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("LiftFeat", ["LiftFeat.pth", "liftfeat.pth"])
    _PARAMS = lf_model.init_params(jax.random.PRNGKey(41))
    return _PARAMS


class LiftFeatExtractor(ExtractorBase):
    default_conf = {
        "max_keypoints": 4096,
        "detect_threshold": 0.05,
    }
    grayscale = True
    as_float = True
    descriptor_size = 64

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = _load()
        self.max_keypoints = int(
            self.conf.get("max_keypoints", self.conf.get("max_num_keypoints", 4096))
        )
        self.threshold = float(self.conf.get("detect_threshold", 0.05))

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 3:
            image = image.mean(-1)
        h, w = image.shape
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        batch = np.zeros((1, ph, pw, 1), np.float32)
        batch[0, :h, :w, 0] = image
        cap = ((min(self.max_keypoints, 8192) + 127) // 128) * 128
        out = lf_model.extract(
            self.params, jnp.asarray(batch), jnp.asarray([[h, w]], np.int32),
            top_k=cap, detection_threshold=self.threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "scores": out["scores"][0][m],
            "descriptors": out["descriptors"][0][m],
        }
