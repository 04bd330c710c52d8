"""SuperGlue matcher wrapper (JAX, batched on device).

Parity: reference ``matchers/superglue.py:54-106`` config surface (weights
indoor/outdoor, sinkhorn_iterations, match_threshold). Pair batches run as
one jitted program (``models/superglue.py``); Sinkhorn is a ``lax.scan`` on
device instead of the reference's per-pair torch loop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import superglue as sg
from .matcher_base import BatchedMatcher

_PARAM_CACHE: Dict[str, dict] = {}


def load_default_params(weights: str = "outdoor") -> dict:
    if weights in _PARAM_CACHE:
        return _PARAM_CACHE[weights]
    import logging
    import os
    from pathlib import Path

    logger = logging.getLogger("dim_tpu")
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    for base in ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]:
        cand = base / f"superglue_{weights}.pth"
        if cand.exists():
            import torch

            params = sg.params_from_torch(torch.load(str(cand), map_location="cpu"))
            logger.info(f"Loaded SuperGlue weights from {cand}")
            _PARAM_CACHE[weights] = params
            return params
    from ..utils.weights import missing_weights

    missing_weights(
        f"SuperGlue ({weights})", [f"superglue_{weights}.pth"]
    )
    params = sg.init_params(jax.random.PRNGKey(7))
    _PARAM_CACHE[weights] = params
    return params


class SuperGlueMatcher(BatchedMatcher):
    default_conf = {
        "weights": "outdoor",
        "match_threshold": 0.3,
        "sinkhorn_iterations": 100,
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = load_default_params(str(self.conf.get("weights", "outdoor")))
        self.sinkhorn_iterations = int(self.conf.get("sinkhorn_iterations", 100))
        self.match_threshold = float(self.conf.get("match_threshold", 0.3))

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        out = sg.forward(
            self.params,
            jnp.asarray(batch0["keypoints"]), jnp.asarray(batch1["keypoints"]),
            jnp.asarray(batch0["scores"]), jnp.asarray(batch1["scores"]),
            jnp.asarray(batch0["descriptors"]), jnp.asarray(batch1["descriptors"]),
            jnp.asarray(batch0["mask"]), jnp.asarray(batch1["mask"]),
            jnp.asarray(batch0["image_size"], dtype=jnp.float32),
            jnp.asarray(batch1["image_size"], dtype=jnp.float32),
            sinkhorn_iterations=self.sinkhorn_iterations,
            match_threshold=self.match_threshold,
            compute_dtype=str(self.tpu.get("dtype", "bfloat16")),
            attn_impl="flash" if jax.default_backend() != "cpu" else "xla",
        )
        return out["matches0"], out["valid0"]  # lazy; caller materializes
