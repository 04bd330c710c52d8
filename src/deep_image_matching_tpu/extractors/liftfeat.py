"""LiftFeat extractor wrapper.

Parity target: reference ``extractors/liftfeat.py:10-76``
(``thirdparty/liftfeat``: XFeat-style backbone + depth-normal feature
lifting + FeatureBooster). The JAX port of the lifting/booster stack is
scheduled for the next round; until then this wrapper runs the XFeat
backbone family (closest published relative, same detection semantics and
config surface) so the ``liftfeat+kornia_matcher`` preset is functional,
and logs the substitution loudly.
"""

from __future__ import annotations

import logging

from .xfeat import XFeatExtractor

logger = logging.getLogger("dim_tpu")


class LiftFeatExtractor(XFeatExtractor):
    default_conf = {
        "max_keypoints": 4096,
        "detect_threshold": 0.05,
    }

    def __init__(self, config: dict):
        logger.warning(
            "LiftFeat: the depth-lifted feature stack port is pending; "
            "running the XFeat backbone (same detection pipeline) instead."
        )
        cfg = dict(config)
        extractor = dict(cfg.get("extractor", {}))
        extractor.setdefault(
            "max_num_keypoints", extractor.get("max_keypoints", 4096)
        )
        extractor.setdefault(
            "detection_threshold", extractor.get("detect_threshold", 0.05)
        )
        cfg["extractor"] = extractor
        super().__init__(cfg)
