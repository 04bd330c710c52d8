"""SE2-LoFTR detector-free matcher wrapper.

Parity target: reference ``matchers/se2loftr.py:20-339``
(``thirdparty/se2loftr``: LoFTR with a C8 rotation-equivariant e2cnn
backbone, ``loftr_ds_e2_dense_8rot`` config). The rotation-equivariant
backbone is implemented in its e2cnn-*exported* form
(``models/se2loftr.py``): plain convolutions carrying the expanded steerable
filters — mathematically identical to the steerable modules at inference.

Weights: place an exported checkpoint at
``DIM_TPU_WEIGHTS_DIR/se2loftr_8rot_exported.pth`` (one-time
``model.export()`` with e2cnn installed converts the published
``8rot.ckpt``; see scripts/convert_weights.py). Without it, this wrapper
falls back to the standard LoFTR pipeline with a warning (use ``--upright``
for rotated imagery in that mode).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from .loftr import LOFTRMatcher

logger = logging.getLogger("dim_tpu")

_SE2_PARAMS = None
_SE2_TRIED = False


def load_se2_params():
    """SE2-LoFTR params from the published e2cnn checkpoint (8rot.ckpt —
    basis expansion happens at conversion time in numpy, no e2cnn needed) or
    an already-exported one; None when no checkpoint exists."""
    global _SE2_PARAMS, _SE2_TRIED
    if _SE2_TRIED:
        return _SE2_PARAMS
    _SE2_TRIED = True
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    bases = ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]
    for base in bases:
        for name in (
            "8rot.ckpt", "se2loftr_8rot.ckpt",
            "se2loftr_8rot_exported.pth", "8rot_exported.ckpt",
        ):
            cand = base / name
            if cand.exists():
                import torch

                from ..models import se2loftr as se2_model

                ckpt = torch.load(
                    str(cand), map_location="cpu", weights_only=False
                )
                _SE2_PARAMS = se2_model.params_from_torch(
                    ckpt.get("state_dict", ckpt)
                )
                logger.info(f"Loaded SE2-LoFTR weights from {cand}")
                return _SE2_PARAMS
    return None


class SE2LOFTRMatcher(LOFTRMatcher):
    default_conf = dict(LOFTRMatcher.default_conf)

    def __init__(self, config: dict):
        super().__init__(config)
        self.se2_params = load_se2_params()
        if self.se2_params is None:
            from ..utils.weights import missing_weights

            # aborts under the strict policy; under allow_random_weights the
            # pipeline degrades to standard LoFTR (use --upright for rotated
            # imagery in that mode)
            missing_weights(
                "SE2-LoFTR",
                ["8rot.ckpt", "se2loftr_8rot_exported.pth"],
                note="The published 8rot.ckpt converts directly (the e2cnn "
                "C8 basis expansion runs at load time in numpy).",
            )
            logger.warning(
                "se2loftr: running standard LoFTR instead "
                "(use --upright for rotated imagery)."
            )

    def _match_images(self, path0, path1):
        if self.se2_params is None:
            return super()._match_images(path0, path1)
        import jax.numpy as jnp

        from ..models import se2loftr as se2_model
        from ..utils.image import read_image

        img0 = self._load(path0)
        img1 = self._load(path1)
        full0 = read_image(path0, grayscale=True).shape
        full1 = read_image(path1, grayscale=True).shape
        out = se2_model.match_pair(
            self.se2_params,
            jnp.asarray(img0[None, ..., None]),
            jnp.asarray(img1[None, ..., None]),
            max_matches=self.max_matches,
            threshold=self.match_threshold,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        k0 = out["keypoints0"][0][m]
        k1 = out["keypoints1"][0][m]
        s0 = np.array([full0[1] / img0.shape[1], full0[0] / img0.shape[0]], np.float32)
        s1 = np.array([full1[1] / img1.shape[1], full1[0] / img1.shape[0]], np.float32)
        return k0 * s0, k1 * s1
