"""RoMa dense matcher wrapper.

Parity target: reference ``matchers/roma.py:23-457``
(``thirdparty/RoMa``: DINOv2 ViT-L coarse features + Gaussian-Process match
decoder + ConvRefiner, dense warp + balanced sampling). The ViT/GP stack
port is scheduled for the next round; constructing this matcher raises a
clear error. The detector-free pipeline contract it needs
(``DetectorFreeMatcher``: per-pair keypoints appended to features.h5,
dense->multiview track merge) is already in place and exercised by LoFTR.
"""

from __future__ import annotations

from .matcher_base import DetectorFreeMatcher


class RomaMatcher(DetectorFreeMatcher):
    default_conf = {"pretrained": "outdoor"}

    def __init__(self, config: dict):
        super().__init__(config)
        raise NotImplementedError(
            "roma: the DINOv2 + GP-decoder port is scheduled for the next "
            "round. The detector-free pipeline (LoFTR) is available now."
        )
