from . import resnet  # noqa
from .vgg import vgg11_bn, vgg13_bn, vgg19_bn  # noqa
