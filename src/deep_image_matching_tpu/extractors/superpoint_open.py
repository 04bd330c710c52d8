"""Open-license SuperPoint (rpautrat port) extractor wrapper.

Parity: reference ``extractors/superpoint_open.py:72-164``. The architecture
is the same SuperPoint topology as ``models/superpoint.py`` trained with
open-license weights; the converter accepts the rpautrat-port state_dict
(``superpoint_v6_from_tf.pth``-style names mapped to the conv layout) or the
standard names. Config surface: nms_radius 5, keypoint_threshold 0.005.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

from ..models.superpoint import SuperPointRunner, init_params, params_from_torch
from .superpoint import SuperPointExtractor

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def _load_open_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    candidates = []
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        candidates += [base / "superpoint_open.pth", base / "superpoint_v6_from_tf.pth"]
    for cand in candidates:
        if cand.exists():
            import torch

            _PARAMS = params_from_torch(torch.load(str(cand), map_location="cpu"))
            logger.info(f"Loaded open SuperPoint weights from {cand}")
            return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights(
        "SuperPoint-open", ["superpoint_open.pth", "superpoint_v6_from_tf.pth"]
    )
    _PARAMS = init_params(jax.random.PRNGKey(6))
    return _PARAMS


class SuperPointOpenExtractor(SuperPointExtractor):
    default_conf = {
        "nms_radius": 5,
        "keypoint_threshold": 0.005,
        "max_keypoints": 4096,
        "remove_borders": 4,
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self._runner = SuperPointRunner(
            params=_load_open_params(),
            max_keypoints=int(self.conf["max_keypoints"]),
            nms_radius=int(self.conf["nms_radius"]),
            keypoint_threshold=float(self.conf["keypoint_threshold"]),
            remove_borders=int(self.conf.get("remove_borders", 4)),
            batch_size=self._runner.batch_size,
        )
