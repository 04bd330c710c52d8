"""ALIKE extractor wrapper (JAX, batched, pretrained weights).

Parity: reference ``extractors/alike.py:8-58`` (model alike-t/s/n/l, top_k,
scores_th, n_limit, subpixel). Loads the reference's bundled checkpoints.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..constants import Quality, TileSelection, get_size_by_quality
from ..io.h5 import save_features
from ..models import alike as alike_model
from ..utils.image import Image, read_image, resize_image
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")

_WEIGHT_CANDIDATES = [
    "{wdir}/{name}.pth",
    str(Path.home() / ".cache/dim_tpu/{name}.pth"),
    "/root/reference/src/deep_image_matching/thirdparty/alike/models/{name}.pth",
]
_PARAM_CACHE: Dict[str, dict] = {}


def load_params(model_name: str) -> dict:
    if model_name in _PARAM_CACHE:
        return _PARAM_CACHE[model_name]
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR", "")
    for tmpl in _WEIGHT_CANDIDATES:
        if wdir == "" and "{wdir}" in tmpl:
            continue
        cand = Path(tmpl.format(wdir=wdir, name=model_name))
        if cand.exists():
            import torch

            params = alike_model.params_from_torch(
                torch.load(str(cand), map_location="cpu"), model_name
            )
            logger.info(f"Loaded ALIKE weights from {cand}")
            _PARAM_CACHE[model_name] = params
            return params
    raise FileNotFoundError(f"No ALIKE checkpoint '{model_name}.pth' found")


class AlikeExtractor(ExtractorBase):
    default_conf = {
        "model": "alike-n",
        "top_k": 15000,
        "scores_th": 0.2,
        "n_limit": 15000,
        "subpixel": True,
    }
    grayscale = False
    as_float = True
    descriptor_size = 128

    def __init__(self, config: dict):
        super().__init__(config)
        self.model_name = str(self.conf["model"])
        self.params = load_params(self.model_name)
        self.descriptor_size = alike_model.CONFIGS[self.model_name]["dim"]
        self.max_keypoints = int(self.conf.get("n_limit", 15000))
        self.scores_th = float(self.conf.get("scores_th", 0.2))
        self.batch_size = int(
            self.config.get("general", {}).get("tpu", {}).get("extract_batch_size", 4)
        )

    def extract_batch(self, images: List[Image], feature_path) -> None:
        if self.tile_selection is not TileSelection.NONE:
            return super().extract_batch(images, feature_path)
        import jax.numpy as jnp

        prepped = []
        for img in images:
            arr = read_image(img.path, grayscale=False).astype(np.float32) / 255.0
            h, w = arr.shape[:2]
            if self.quality is not Quality.HIGH:
                nw, nh = get_size_by_quality(self.quality, (w, h))
                arr = resize_image(arr, (max(nw, 1), max(nh, 1)))
            prepped.append((arr, (w, h)))

        pad_to = 32
        buckets: Dict[tuple, list] = {}
        for i, (arr, _) in enumerate(prepped):
            h, w = arr.shape[:2]
            key = (-(-h // pad_to) * pad_to, -(-w // pad_to) * pad_to)
            buckets.setdefault(key, []).append(i)
        cap = min(self.max_keypoints, 8192)
        cap = ((cap + 127) // 128) * 128
        use_handoff = self._device_handoff_allowed()
        dev_chunks = []

        def _finish_host(chunk, out):
            out = {k: np.asarray(v) for k, v in out.items()}
            for j, i in enumerate(chunk):
                m = out["mask"][j]
                img = images[i]
                arr, (w, h) = prepped[i]
                ah, aw = arr.shape[:2]
                kpts = out["keypoints"][j][m] * np.array(
                    [w / aw, h / ah], np.float32
                )
                save_features(
                    feature_path, img.name,
                    keypoints=kpts,
                    descriptors=out["descriptors"][j][m],
                    scores=out["scores"][j][m],
                    image_size=np.array([w, h], np.int64),
                )
                self._cache_put(
                    img.name, keypoints=kpts,
                    descriptors=out["descriptors"][j][m],
                    scores=out["scores"][j][m],
                    image_size=np.array([w, h], np.int64),
                )

        for (ph, pw), idxs in buckets.items():
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start : start + self.batch_size]
                batch = np.zeros((len(chunk), ph, pw, 3), np.float32)
                vhw = np.zeros((len(chunk), 2), np.int32)
                for j, i in enumerate(chunk):
                    arr = prepped[i][0]
                    h, w = arr.shape[:2]
                    batch[j, :h, :w] = arr
                    vhw[j] = (h, w)
                out = alike_model.extract(
                    self.params, jnp.asarray(batch), jnp.asarray(vhw),
                    max_keypoints=cap, scores_th=self.scores_th, nms_radius=2,
                )
                if use_handoff:
                    dev_chunks.append((chunk, out))
                else:
                    _finish_host(chunk, out)
        if use_handoff:
            try:
                fac = np.array(
                    [(w / a.shape[1], h / a.shape[0]) for a, (w, h) in prepped],
                    np.float32,
                )
                self._arm_device_handoff(
                    names=[img.name for img in images],
                    chunks=dev_chunks, fac=fac,
                    image_size=[wh for _, wh in prepped],
                    feature_path=feature_path,
                )
            except Exception as e:
                logger.warning(
                    f"Device feature handoff unavailable "
                    f"({type(e).__name__}: {e}); using the host path"
                )
                self.device_handoff = None
                for chunk, out in dev_chunks:
                    _finish_host(chunk, out)

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        h, w = image.shape[:2]
        ph = -(-h // 32) * 32
        pw = -(-w // 32) * 32
        batch = np.zeros((1, ph, pw, 3), np.float32)
        batch[0, :h, :w] = image
        out = alike_model.extract(
            self.params, jnp.asarray(batch),
            jnp.asarray([[h, w]], np.int32),
            max_keypoints=((min(self.max_keypoints, 8192) + 127) // 128) * 128,
            scores_th=self.scores_th, nms_radius=2,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "descriptors": out["descriptors"][0][m],
            "scores": out["scores"][0][m],
        }
