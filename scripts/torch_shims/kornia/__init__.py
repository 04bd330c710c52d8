from . import color  # noqa
