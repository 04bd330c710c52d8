"""RDD (sparse) extractor wrapper.

Parity target: reference ``extractors/rdd_sparse.py:10-75``
(``thirdparty/rdd``: deformable-transformer detector whose multi-scale
deformable attention is a CUDA custom op upstream — SURVEY.md section 2.4).
The TPU building blocks exist (``ops/deform.py`` implements the bilinear
multi-point sampling the op needs); the full RDD transformer port is
scheduled for the next round. Constructing this extractor raises a clear
error instead of failing deep inside model code.
"""

from __future__ import annotations

from .extractor_base import ExtractorBase


class RDDSparseExtractor(ExtractorBase):
    default_conf = {"max_num_keypoints": 4000}

    def __init__(self, config: dict):
        super().__init__(config)
        raise NotImplementedError(
            "rdd_sparse: the RDD deformable-transformer port is scheduled for "
            "the next round (its ms_deform_attn CUDA op already has a TPU "
            "equivalent in ops/deform.py). Use aliked+lightglue or "
            "superpoint+lightglue meanwhile."
        )
