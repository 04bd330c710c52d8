"""Functional subset of torchvision.transforms used by the vendored RoMa /
DeDoDe code paths (reference ``thirdparty/RoMa/roma/utils/utils.py``
``get_tuple_transform_ops`` and ``thirdparty/DeDoDe/DeDoDe/utils.py``):
Normalize / Compose / ToTensor / Resize with real math, since the encoders
apply ImageNet normalization inside their forward paths."""

import torch
from . import functional  # noqa


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, x):
        return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    def __call__(self, pic):
        import numpy as np

        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(arr.copy())


class Resize:
    def __init__(self, size, interpolation=None, antialias=None):
        self.size = size

    def __call__(self, x):
        if isinstance(x, torch.Tensor):
            return torch.nn.functional.interpolate(
                x[None], size=self.size, mode="bilinear", align_corners=False
            )[0]
        return x.resize(self.size[::-1])
