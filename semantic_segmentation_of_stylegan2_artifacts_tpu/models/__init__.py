from .msunet import MSUNet, MSUNetSys  # noqa: F401
