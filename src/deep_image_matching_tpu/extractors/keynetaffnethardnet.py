"""KeyNet+AffNet+HardNet extractor wrapper.

Parity: reference ``extractors/keynetaffnethardnet.py:9-58`` (kornia
``KF.KeyNetAffNetHardNet``; n_features, upright). Every learned stage is
implemented with a checkpoint converter: KeyNet's learned response
(``models/keynet.py``), AffNetFast affine shape + OriNetFast orientation
(``models/affnet.py``), and the exact HardNet descriptor CNN
(``models/hardnet.py``). When a stage's weights are absent the weight-free
fallbacks apply (determinant-of-Hessian detection, identity shape,
gradient-moment orientation).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from ..models import hardnet as hn
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
        for name in ("hardnet.pth", "HardNet++.pth", "checkpoint_liberty_with_aug.pth"):
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt)
                _PARAMS = hn.hardnet_params_from_torch(sd)
                logger.info(f"Loaded HardNet weights from {cand}")
                return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights(
        "HardNet",
        ["hardnet.pth", "HardNet++.pth", "checkpoint_liberty_with_aug.pth"],
    )
    _PARAMS = hn.init_hardnet_params(jax.random.PRNGKey(23))
    return _PARAMS


_KEYNET_PARAMS = "unset"
_AFFNET_PARAMS = "unset"
_ORINET_PARAMS = "unset"


def _load_affnet_orinet():
    """Learned AffNetFast / OriNetFast weights, or (None, None) to fall back
    to identity shape + gradient-moment orientation."""
    global _AFFNET_PARAMS, _ORINET_PARAMS
    if _AFFNET_PARAMS != "unset":
        return _AFFNET_PARAMS, _ORINET_PARAMS
    from ..models import affnet as an

    found = {"affnet": None, "orinet": None}
    convert = {
        "affnet": an.affnet_params_from_torch,
        "orinet": an.orinet_params_from_torch,
    }
    names = {
        "affnet": ("affnet.pth", "AffNet.pth"),
        "orinet": ("orinet.pth", "OriNet.pth"),
    }
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for net in ("affnet", "orinet"):
            if found[net] is not None:
                continue
            for name in names[net]:
                cand = base / name
                if not cand.exists():
                    continue
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
                try:
                    found[net] = convert[net](sd)
                    logger.info(f"Loaded {net} weights from {cand}")
                    break
                except KeyError as e:
                    logger.warning(f"{net} checkpoint {cand} not convertible: {e}")
    from ..utils.weights import classical_fallback

    if found["affnet"] is None:
        classical_fallback("AffNet", "identity affine shape")
    if found["orinet"] is None:
        classical_fallback("OriNet", "gradient-moment orientation")
    _AFFNET_PARAMS, _ORINET_PARAMS = found["affnet"], found["orinet"]
    return _AFFNET_PARAMS, _ORINET_PARAMS


def _load_keynet():
    """Learned KeyNet response weights, or None to fall back to the
    weight-free determinant-of-Hessian detector."""
    global _KEYNET_PARAMS
    if _KEYNET_PARAMS != "unset":
        return _KEYNET_PARAMS
    from ..models import keynet as kn

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        for name in ("keynet.pth", "keynet_pytorch.pth", "keynet_pytorch.ckpt"):
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
                try:
                    _KEYNET_PARAMS = kn.keynet_params_from_torch(sd)
                    logger.info(f"Loaded KeyNet weights from {cand}")
                    return _KEYNET_PARAMS
                except KeyError as e:
                    logger.warning(f"KeyNet checkpoint {cand} not convertible: {e}")
    from ..utils.weights import classical_fallback

    classical_fallback("KeyNet", "determinant-of-Hessian detection")
    _KEYNET_PARAMS = None
    return _KEYNET_PARAMS


class KeyNetAffNetHardNetExtractor(ExtractorBase):
    default_conf = {
        "n_features": 4000,
        "upright": False,
    }
    grayscale = True
    as_float = True
    descriptor_size = 128

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = _load()
        self.n_features = int(self.conf.get("n_features", 4000))
        self.upright = bool(self.conf.get("upright", False))
        # detector: "keynet" (learned response, needs weights), "doh"
        # (weight-free), or "auto" = keynet when weights are available
        requested = str(self.conf.get("detector", "auto"))
        self.keynet_params = _load_keynet() if requested != "doh" else None
        if requested == "keynet" and self.keynet_params is None:
            logger.warning("detector=keynet requested but no weights; using doh")
        self.detector = "keynet" if self.keynet_params is not None else "doh"
        self.affnet_params, self.orinet_params = _load_affnet_orinet()

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        import jax.numpy as jnp

        if image.ndim == 3:
            image = image.mean(-1)
        h, w = image.shape
        cap = ((min(self.n_features, 8192) + 127) // 128) * 128
        out = hn.keynet_hardnet_extract(
            self.params, jnp.asarray(image[None].astype(np.float32)),
            jnp.asarray([[h, w]], np.int32),
            max_keypoints=cap, upright=self.upright,
            detector=self.detector, keynet_params=self.keynet_params,
            affnet_params=self.affnet_params,
            orinet_params=self.orinet_params,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        m = out["mask"][0]
        return {
            "keypoints": out["keypoints"][0][m],
            "scores": out["scores"][0][m],
            "descriptors": out["descriptors"][0][m],
        }
