from . import patch_ops, window_attention  # noqa: F401
