"""RIPE extractor wrapper (JAX).

Parity: reference ``extractors/ripe.py:11-120`` (max_keypoints,
detect_threshold). Weights: tempdir ``ripe_weights.pth`` per the upstream
factory, or DIM_TPU_WEIGHTS_DIR.
"""

from __future__ import annotations

import logging
import os
import tempfile
from pathlib import Path

import numpy as np

from ..models import ripe as ripe_model
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def _load():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    candidates = []
    for base in ([Path(wdir)] if wdir else []) + [
        Path.home() / ".cache/dim_tpu",
        Path(tempfile.gettempdir()),
    ]:
        candidates.append(base / "ripe_weights.pth")
    for cand in candidates:
        if cand.exists():
            import torch

            _PARAMS = ripe_model.params_from_torch(
                torch.load(str(cand), map_location="cpu")
            )
            logger.info(f"Loaded RIPE weights from {cand}")
            return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("RIPE", ["ripe_weights.pth"])
    _PARAMS = ripe_model.init_params(jax.random.PRNGKey(17))
    return _PARAMS


class RIPEExtractor(ExtractorBase):
    default_conf = {
        "max_keypoints": 4096,
        "detect_threshold": 0.5,
    }
    grayscale = False
    as_float = True
    descriptor_size = 960  # hypercolumn (64+128+256+512); reduced if ckpt has 1x1

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = _load()
        self.max_keypoints = int(
            self.conf.get("max_keypoints", self.conf.get("max_num_keypoints", 4096))
        )
        self.threshold = float(self.conf.get("detect_threshold", 0.5))

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        h, w = image.shape[:2]
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        batch = np.zeros((1, ph, pw, 3), np.float32)
        batch[0, :h, :w] = image
        cap = ((self.max_keypoints + 127) // 128) * 128
        out = ripe_model.extract(
            self.params, jnp.asarray(batch), jnp.asarray([[h, w]], np.int32),
            max_keypoints=cap, threshold=self.threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "scores": out["scores"][0][m],
            "descriptors": out["descriptors"][0][m],
        }
