"""Minimal torchvision shim for running the reference ALIKED offline.
Provides ops.deform_conv2d (pure torch, matching torchvision v2 semantics)
and models.resnet conv helpers."""
from . import ops, models  # noqa
