"""Minimal torchvision shim for running the reference ALIKED / RoMa / DeDoDe
offline. Provides ops.deform_conv2d (pure torch, matching torchvision v2
semantics), models.resnet conv helpers, models.vgg*_bn feature builders, and
a functional transforms subset (Normalize/Compose/ToTensor)."""
from . import ops, models, transforms  # noqa
