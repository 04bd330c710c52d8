"""RDD (sparse) extractor wrapper (JAX).

Parity: reference ``extractors/rdd_sparse.py:10-75`` (max_num_keypoints;
pairs with a custom-weight LightGlue head per ``config.py:213-227``).
The deformable-attention descriptor runs as XLA gathers+matmuls
(``models/rdd.py``); weights load from DIM_TPU_WEIGHTS_DIR/RDD-v2.pth.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from ..models import rdd as rdd_model
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
        for name in ("RDD-v2.pth", "RDD-v1.pth", "rdd.pth"):
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt)
                _PARAMS = rdd_model.params_from_torch(sd)
                logger.info(f"Loaded RDD weights from {cand}")
                return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("RDD", ["RDD-v2.pth", "RDD-v1.pth", "rdd.pth"])
    _PARAMS = rdd_model.init_params(jax.random.PRNGKey(37))
    return _PARAMS


class RDDSparseExtractor(ExtractorBase):
    default_conf = {
        "max_num_keypoints": 4000,
        "detection_threshold": 0.01,
    }
    grayscale = False
    as_float = True
    descriptor_size = 256

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = _load()
        self.max_keypoints = int(self.conf.get("max_num_keypoints", 4000))
        self.detection_threshold = float(self.conf.get("detection_threshold", 0.01))

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        h, w = image.shape[:2]
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        batch = np.zeros((1, ph, pw, 3), np.float32)
        batch[0, :h, :w] = image
        cap = ((min(self.max_keypoints, 8192) + 127) // 128) * 128
        out = rdd_model.extract(
            self.params, jnp.asarray(batch), jnp.asarray([[h, w]], np.int32),
            max_keypoints=cap, detection_threshold=self.detection_threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "scores": out["scores"][0][m],
            "descriptors": out["descriptors"][0][m],
        }
