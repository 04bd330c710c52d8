"""XFeat extractor wrapper (JAX, batched).

Parity: reference ``extractors/xfeat.py:11-67`` (max_num_keypoints / top_k
config surface). Pretrained weights load from DIM_TPU_WEIGHTS_DIR/xfeat.pt
when present (the reference downloads them via torch.hub); deterministic
random init otherwise.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..constants import Quality, TileSelection, get_size_by_quality
from ..io.h5 import save_features
from ..models import xfeat as xfeat_model
from ..utils.image import Image, read_image, resize_image
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def load_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    candidates = []
    if wdir:
        candidates.append(Path(wdir) / "xfeat.pt")
    candidates.append(Path.home() / ".cache/dim_tpu/xfeat.pt")
    for cand in candidates:
        if cand.exists():
            import torch

            _PARAMS = xfeat_model.params_from_torch(
                torch.load(str(cand), map_location="cpu")
            )
            logger.info(f"Loaded XFeat weights from {cand}")
            return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("XFeat", ["xfeat.pt"])
    import jax

    _PARAMS = xfeat_model.init_params(jax.random.PRNGKey(3))
    return _PARAMS


class XFeatExtractor(ExtractorBase):
    default_conf = {
        "max_num_keypoints": 4096,
        "detection_threshold": 0.05,
    }
    grayscale = True
    as_float = True
    descriptor_size = 64

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = load_params()
        self.top_k = int(self.conf.get("max_num_keypoints", 4096))
        self.detection_threshold = float(self.conf.get("detection_threshold", 0.05))
        self.batch_size = int(
            self.config.get("general", {}).get("tpu", {}).get("extract_batch_size", 8)
        )

    def extract_batch(self, images: List[Image], feature_path) -> None:
        if self.tile_selection is not TileSelection.NONE:
            return super().extract_batch(images, feature_path)
        import jax.numpy as jnp

        prepped = []
        for img in images:
            # uint8 end-to-end; the model's input instance-norm makes
            # the scale irrelevant and uint8 uploads are 4x smaller
            arr = read_image(img.path, grayscale=True)
            h, w = arr.shape
            if self.quality is not Quality.HIGH:
                nw, nh = get_size_by_quality(self.quality, (w, h))
                arr = resize_image(arr, (max(nw, 1), max(nh, 1)))
            prepped.append((arr, (w, h)))

        cap = ((self.top_k + 127) // 128) * 128
        buckets: Dict[tuple, list] = {}
        for i, (arr, _) in enumerate(prepped):
            h, w = arr.shape
            key = (-(-h // 32) * 32, -(-w // 32) * 32)
            buckets.setdefault(key, []).append(i)
        batch_dtype = (
            np.uint8
            if all(p[0].dtype == np.uint8 for p in prepped)
            else np.float32
        )
        use_handoff = self._device_handoff_allowed()
        dev_chunks = []

        def _finish_host(chunk, out):
            out = {k: np.asarray(v) for k, v in out.items()}
            for j, i in enumerate(chunk):
                m = out["mask"][j]
                img = images[i]
                arr, (w, h) = prepped[i]
                ah, aw = arr.shape
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
                batch = np.zeros((len(chunk), ph, pw, 1), batch_dtype)
                vhw = np.zeros((len(chunk), 2), np.int32)
                for j, i in enumerate(chunk):
                    arr = prepped[i][0]
                    h, w = arr.shape
                    batch[j, :h, :w, 0] = arr
                    vhw[j] = (h, w)
                out = xfeat_model.extract(
                    self.params, jnp.asarray(batch), jnp.asarray(vhw),
                    top_k=cap, detection_threshold=self.detection_threshold,
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

        if image.ndim == 3:
            image = image.mean(-1)
        h, w = image.shape
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        batch = np.zeros((1, ph, pw, 1), np.float32)
        batch[0, :h, :w, 0] = image
        out = xfeat_model.extract(
            self.params, jnp.asarray(batch), jnp.asarray([[h, w]], np.int32),
            top_k=((self.top_k + 127) // 128) * 128,
            detection_threshold=self.detection_threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "descriptors": out["descriptors"][0][m],
            "scores": out["scores"][0][m],
        }
