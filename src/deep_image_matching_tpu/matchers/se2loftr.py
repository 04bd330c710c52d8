"""SE2-LoFTR detector-free matcher wrapper.

Parity target: reference ``matchers/se2loftr.py:20-339``
(``thirdparty/se2loftr``: LoFTR with a rotation-equivariant e2cnn backbone).
The steerable-CNN backbone port is pending; this wrapper runs the standard
LoFTR pipeline (identical transformer/matching stages — the reference's
se2 variant differs only in the backbone) and warns that rotation
equivariance is not yet provided. Combine with ``--upright`` for rotated
inputs meanwhile.
"""

from __future__ import annotations

import logging

from .loftr import LOFTRMatcher

logger = logging.getLogger("dim_tpu")


class SE2LOFTRMatcher(LOFTRMatcher):
    default_conf = dict(LOFTRMatcher.default_conf)

    def __init__(self, config: dict):
        logger.warning(
            "se2loftr: rotation-equivariant backbone port pending; running "
            "standard LoFTR (use --upright for rotated imagery)."
        )
        super().__init__(config)
