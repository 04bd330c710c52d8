"""torchvision.transforms.functional subset (InterpolationMode enum only —
imported by ``thirdparty/DeDoDe/DeDoDe/utils.py:7``)."""

from enum import Enum


class InterpolationMode(Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    LANCZOS = "lanczos"
