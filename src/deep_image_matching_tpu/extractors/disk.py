"""DISK extractor wrapper (JAX).

Parity: reference ``extractors/disk.py:10-64`` config surface
(max_keypoints, nms_window_size, detection_threshold, pad_if_not_divisible).
See ``models/disk.py`` for the architecture/converter status.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from ..models import disk as disk_model
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
        for name in ("disk_depth.pth", "disk.pth", "epipolar-save.pth"):
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("extractor", ckpt.get("state_dict", ckpt))
                _PARAMS = disk_model.params_from_torch(sd)
                logger.info(f"Loaded DISK weights from {cand} (experimental mapping)")
                return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("DISK", ["disk_depth.pth", "disk.pth", "epipolar-save.pth"])
    _PARAMS = disk_model.init_params(jax.random.PRNGKey(19))
    return _PARAMS


class DISKExtractor(ExtractorBase):
    default_conf = {
        "max_keypoints": 4096,
        "nms_window_size": 5,
        "detection_threshold": 0.0,
        "pad_if_not_divisible": True,
    }
    grayscale = False
    as_float = True
    descriptor_size = 128

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = _load()
        self.max_keypoints = int(self.conf.get("max_keypoints", 4096))
        self.nms_window_size = int(self.conf.get("nms_window_size", 5))
        self.detection_threshold = float(self.conf.get("detection_threshold", 0.0))

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        h, w = image.shape[:2]
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        batch = np.zeros((1, ph, pw, 3), np.float32)
        batch[0, :h, :w] = image
        cap = ((self.max_keypoints + 127) // 128) * 128
        out = disk_model.extract(
            self.params, jnp.asarray(batch), jnp.asarray([[h, w]], np.int32),
            max_keypoints=cap,
            nms_window_size=self.nms_window_size,
            detection_threshold=self.detection_threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "scores": out["scores"][0][m],
            "descriptors": out["descriptors"][0][m],
        }
