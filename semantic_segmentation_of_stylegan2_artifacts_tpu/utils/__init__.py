from .platform import apply_platform_override  # noqa: F401
