"""SRIF (scale/rotation-invariant detector-free) matcher wrapper.

Parity: reference ``matchers/srif.py:18-305``. NOTE: the reference's own
vendored SRIF package is an EMPTY directory (``thirdparty/SRIF/`` contains
zero Python files; SURVEY.md section 2.6) and its wrapper mirrors the LoFTR
wrapper — the preset exists but cannot run upstream either. For API parity
the preset resolves to the LoFTR detector-free path here, with a warning.
"""

from __future__ import annotations

import logging

from .loftr import LOFTRMatcher

logger = logging.getLogger("dim_tpu")


class SRIFMatcher(LOFTRMatcher):
    default_conf = dict(LOFTRMatcher.default_conf)

    def __init__(self, config: dict):
        logger.warning(
            "SRIF: the upstream implementation is an empty placeholder; "
            "running the LoFTR detector-free pipeline for API compatibility."
        )
        super().__init__(config)
