"""Pure-torch VGG-BN builders matching torchvision's layer topology exactly.

The vendored RoMa and DeDoDe encoders construct their backbone via
``torchvision.models.vgg19_bn(pretrained=False).features[:N]``
(reference ``thirdparty/RoMa/roma/models/encoders.py:73``,
``thirdparty/DeDoDe/DeDoDe/encoder.py:9,33-41``); torchvision is absent in
this offline environment, so this shim reproduces the ``features``
nn.Sequential with identical indices/shapes (torchvision ``vgg.py``
``make_layers`` with ``batch_norm=True``). Only ``features`` is built —
the classifier head is never used by either encoder.
"""

import torch.nn as nn

_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512,
          "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
          512, "M", 512, 512, 512, 512, "M"],
}


def _make_layers(cfg, batch_norm=True):
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            if batch_norm:
                layers.append(nn.BatchNorm2d(v))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


class _VGGFeatures(nn.Module):
    """Carrier exposing only the ``.features`` attribute the encoders use."""

    def __init__(self, cfg):
        super().__init__()
        self.features = _make_layers(_CFGS[cfg], batch_norm=True)

    def forward(self, x):
        return self.features(x)


def vgg11_bn(pretrained=False, weights=None, **kwargs):
    assert not pretrained and weights is None, "shim has no hub access"
    return _VGGFeatures("A")


def vgg13_bn(pretrained=False, weights=None, **kwargs):
    assert not pretrained and weights is None, "shim has no hub access"
    return _VGGFeatures("B")


def vgg19_bn(pretrained=False, weights=None, **kwargs):
    assert not pretrained and weights is None, "shim has no hub access"
    return _VGGFeatures("E")
