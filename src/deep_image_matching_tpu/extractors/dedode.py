"""DeDoDe extractor wrapper (detector-L + descriptor-B, JAX).

Parity: reference ``extractors/dedode.py:10-114`` (n_features config; the
reference instantiates detector-L + descriptor-G). The descriptor here is
the VGG-based descriptor-B — the G variant's DINOv2 backbone is pending;
both share the decoder/converter (``models/dedode.py``). Images are
processed at the reference's 784x784 working resolution.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List

import numpy as np

from ..io.h5 import save_features
from ..models import dedode as dd
from ..utils.image import Image, read_image, resize_image
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")

_PARAMS = {}


def _load(kind: str):
    if kind in _PARAMS:
        return _PARAMS[kind]
    import jax

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    names = {
        "detector": ["dedode_detector_L.pth", "dedode_detector_L_v2.pth"],
        "descriptor": ["dedode_descriptor_B.pth"],
        "descriptor_g": ["dedode_descriptor_G.pth"],
    }[kind]
    if kind == "descriptor_g":
        for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
            cand = base / names[0]
            if cand.exists():
                import torch

                dino = None
                dcand = base / "dinov2_vitl14_pretrain.pth"
                if dcand.exists():
                    dino = torch.load(str(dcand), map_location="cpu")
                _PARAMS[kind] = dd.descriptor_g_params_from_torch(
                    torch.load(str(cand), map_location="cpu"), dino
                )
                if dino is None:
                    from ..models import dinov2 as dino_model

                    _PARAMS[kind]["dinov2"] = dino_model.init_params(
                        jax.random.PRNGKey(0), depth=2
                    )
                logger.info(f"Loaded DeDoDe descriptor-G from {cand}")
                return _PARAMS[kind]
        from ..utils.weights import missing_weights

        missing_weights("DeDoDe descriptor-G", names)
        _PARAMS[kind] = dd.init_descriptor_g_params(jax.random.PRNGKey(31))
        return _PARAMS[kind]
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for name in names:
            cand = base / name
            if cand.exists():
                import torch

                sd = torch.load(str(cand), map_location="cpu")
                conv = (
                    dd.detector_params_from_torch
                    if kind == "detector"
                    else dd.descriptor_params_from_torch
                )
                _PARAMS[kind] = conv(sd)
                logger.info(f"Loaded DeDoDe {kind} weights from {cand}")
                return _PARAMS[kind]
    from ..utils.weights import missing_weights

    missing_weights(f"DeDoDe {kind}", names)
    init = dd.init_detector_params if kind == "detector" else dd.init_descriptor_params
    _PARAMS[kind] = init(jax.random.PRNGKey(13))
    return _PARAMS[kind]


class DeDoDeExtractor(ExtractorBase):
    default_conf = {
        "n_features": 4000,
        "upright": False,
        "resolution": 784,
    }
    grayscale = False
    as_float = True
    descriptor_size = 256

    def __init__(self, config: dict):
        super().__init__(config)
        self.descriptor_variant = str(self.conf.get("descriptor", "B")).upper()
        self.det_params = _load("detector")
        self.desc_params = _load(
            "descriptor_g" if self.descriptor_variant == "G" else "descriptor"
        )
        self.n_features = int(self.conf.get("n_features", 4000))
        self.resolution = int(self.conf.get("resolution", 784))
        if self.descriptor_variant == "G" and self.resolution % 56 != 0:
            raise ValueError("descriptor-G needs resolution divisible by 56")

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        h, w = image.shape[:2]
        res = self.resolution
        work = resize_image(image.astype(np.float32), (res, res))
        batch = jnp.asarray(work[None])
        cap = ((self.n_features + 127) // 128) * 128
        kpts, conf, valid = dd.detect(self.det_params, batch, num_keypoints=cap)
        if self.descriptor_variant == "G":
            descs = dd.describe_g(self.desc_params, batch, kpts)
        else:
            descs = dd.describe(self.desc_params, batch, kpts)
        kpts = np.asarray(kpts)[0]
        conf = np.asarray(conf)[0]
        valid = np.asarray(valid)[0]
        descs = np.asarray(descs)[0]
        kpts = kpts[valid] * np.array([w / res, h / res], np.float32)
        return {
            "keypoints": kpts,
            "scores": conf[valid],
            "descriptors": descs[valid],
        }
