"""LightGlue matcher wrapper (JAX, batched on device).

Parity: reference ``matchers/lightglue.py:77-125`` config surface
(n_layers, depth_confidence, width_confidence, filter_threshold, flash, mp).
The per-pair torch forward becomes one jitted program per pair batch
(``models/lightglue.py``); ``depth_confidence`` drives the model's
batch-level adaptive-depth early exit (a ``lax.while_loop`` that stops once
every pair in the batch is token-confident — reference
``lightglue.py:593-604`` semantics, batched conservatively);
``width_confidence`` (point pruning, reference ``lightglue.py:501-516``)
masks confident-but-unmatchable points out of later layers and the
assignment — same math as the reference's gather, static shapes. When
depth_confidence <= 0 the pruning mask is matchability-only, matching the
reference's get_pruning_mask (token confidences are None there).

Default 0.95/0.99 matches the reference's defaults. Measured cost of the
adaptive while_loop path vs the fixed-depth lax.scan path on v5e at B=16,
K=2048, bf16 with inputs that NEVER exit early (worst case): 74.8 vs
72.0 ms/batch (+3.9%); easy batches exit at 5-7 layers for up to ~1.8x.
Set depth_confidence/width_confidence: -1 in YAML for the scan path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.lightglue import (
    LightGlueRunner,
    default_assignment_impl,
    default_attn_impl,
    forward,
    load_default_params,
)
from .matcher_base import BatchedMatcher


class LightGlueMatcher(BatchedMatcher):
    default_conf = {
        "n_layers": 9,
        "mp": False,
        "flash": True,
        "depth_confidence": 0.95,
        "width_confidence": 0.99,
        "filter_threshold": 0.1,
        "features": "superpoint",
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self.n_layers = int(self.conf.get("n_layers", 9))
        self.filter_threshold = float(self.conf.get("filter_threshold", 0.1))
        self.depth_confidence = float(self.conf.get("depth_confidence", -1))
        self.width_confidence = float(self.conf.get("width_confidence", -1))
        self.params = load_default_params(
            str(self.conf.get("features", "superpoint")), self.n_layers
        )

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        # if every slot is a real keypoint (the common case: detection filled
        # the top-k capacity) promise it statically so attention skips
        # segment-id masking and its runtime all-full cond (ops/attention.py).
        # At most 2 compiled variants. The store passes the hint computed
        # from host-side counts ("_full"); falling back to np.all on the mask
        # would force a blocking device->host sync when inputs are
        # HBM-resident gathers.
        full = batch0.get("_full")
        if full is None:
            full = bool(np.all(np.asarray(batch0["mask"]))
                        and np.all(np.asarray(batch1["mask"])))
        else:
            full = bool(full and batch1.get("_full"))
        out = forward(
            self.params,
            jnp.asarray(batch0["keypoints"]), jnp.asarray(batch1["keypoints"]),
            jnp.asarray(batch0["descriptors"]), jnp.asarray(batch1["descriptors"]),
            jnp.asarray(batch0["mask"]), jnp.asarray(batch1["mask"]),
            jnp.asarray(batch0["image_size"], dtype=jnp.float32),
            jnp.asarray(batch1["image_size"], dtype=jnp.float32),
            filter_threshold=self.filter_threshold,
            depth_confidence=self.depth_confidence,
            width_confidence=self.width_confidence,
            compute_dtype=str(self.tpu.get("dtype", "bfloat16")),
            attn_impl=self.tpu.get("attn_impl", default_attn_impl()),
            assignment_impl=self.tpu.get(
                "assignment_impl", default_assignment_impl()
            ),
            ffn_impl=self.tpu.get("ffn_impl", "auto"),
            assume_full_masks=full,
        )
        # returned lazily (jax arrays): the caller overlaps host work with
        # the async device execution and materializes at finish time
        return out["matches0"], out["valid0"]

    def _match_pairs(self, feats0: dict, feats1: dict) -> np.ndarray:
        runner = LightGlueRunner(
            params=self.params, filter_threshold=self.filter_threshold,
            compute_dtype=self.tpu.get("dtype"),
            depth_confidence=self.depth_confidence,
            width_confidence=self.width_confidence,
        )
        f0 = _to_rows(feats0)
        f1 = _to_rows(feats1)
        return runner.match_pairs([f0, f1], [(0, 1)])[0]


def _to_rows(feats: dict) -> dict:
    d = np.asarray(feats["descriptors"], np.float32)
    n = len(feats["keypoints"])
    if d.ndim == 2 and d.shape[0] != n:
        d = d.T
    return {
        "keypoints": np.asarray(feats["keypoints"], np.float32),
        "descriptors": d,
        "image_size": np.asarray(feats.get("image_size", (0, 0)), np.float32),
    }
