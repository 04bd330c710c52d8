"""LighterGlue matcher wrapper (distilled LightGlue for XFeat).

Parity: reference ``matchers/lighterglue.py:78-241`` — LightGlue
architecture at reduced size (input_dim 64 -> descriptor_dim 96, 6 layers,
1 head; ``thirdparty/accelerated_features/modules/lighterglue.py:7-41``).
Runs through the same batched JAX LightGlue program.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import lightglue as lg
from .matcher_base import BatchedMatcher

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def load_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    candidates = []
    if wdir:
        candidates.append(Path(wdir) / "xfeat-lighterglue.pt")
    candidates.append(Path.home() / ".cache/dim_tpu/xfeat-lighterglue.pt")
    for cand in candidates:
        if cand.exists():
            import torch

            sd = torch.load(str(cand), map_location="cpu")
            sd = {k.replace("net.", "", 1) if k.startswith("net.") else k: v
                  for k, v in sd.items()}
            _PARAMS = lg.params_from_torch(sd, n_layers=6)
            logger.info(f"Loaded LighterGlue weights from {cand}")
            return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("LighterGlue", ["xfeat-lighterglue.pt"])
    _PARAMS = lg.init_params(
        jax.random.PRNGKey(11), n_layers=6, dim=96, num_heads=1, input_dim=64
    )
    return _PARAMS


class LighterGlueMatcher(BatchedMatcher):
    default_conf = {
        "filter_threshold": 0.1,
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = load_params()
        self.filter_threshold = float(self.conf.get("filter_threshold", 0.1))

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        out = lg.forward(
            self.params,
            jnp.asarray(batch0["keypoints"]), jnp.asarray(batch1["keypoints"]),
            jnp.asarray(batch0["descriptors"]), jnp.asarray(batch1["descriptors"]),
            jnp.asarray(batch0["mask"]), jnp.asarray(batch1["mask"]),
            jnp.asarray(batch0["image_size"], dtype=jnp.float32),
            jnp.asarray(batch1["image_size"], dtype=jnp.float32),
            num_heads=1,
            filter_threshold=self.filter_threshold,
            compute_dtype=str(self.tpu.get("dtype", "bfloat16")),
            attn_impl=lg.default_attn_impl(),
            assignment_impl=lg.default_assignment_impl(),
        )
        return out["matches0"], out["valid0"]  # lazy; caller materializes
