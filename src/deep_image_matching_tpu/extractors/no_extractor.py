"""No-op extractor for detector-free matchers.

Parity: reference ``extractors/no_extractor.py:15-104`` — writes empty
feature groups (plus image_size) so LoFTR/RoMa-style matchers can append
their own keypoints into features.h5 during matching.
"""

from __future__ import annotations

import numpy as np

from ..io.h5 import save_features
from ..utils.image import Image
from .extractor_base import ExtractorBase, FeaturesDict


class NoExtractor(ExtractorBase):
    default_conf = {}
    grayscale = True
    as_float = False

    def extract(self, img) -> FeaturesDict:
        if not isinstance(img, Image):
            img = Image(img)
        w, h = img.size
        return {
            "keypoints": np.zeros((0, 2), np.float32),
            "image_size": np.array([w, h], dtype=np.int64),
        }

    def extract_and_save(self, img, feature_path) -> None:
        if not isinstance(img, Image):
            img = Image(img)
        feats = self.extract(img)
        save_features(
            feature_path,
            img.name,
            keypoints=feats["keypoints"],
            image_size=feats["image_size"],
        )

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        return {"keypoints": np.zeros((0, 2), np.float32)}
