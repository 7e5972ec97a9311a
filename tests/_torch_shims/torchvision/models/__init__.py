from . import swin_transformer  # noqa: F401
