from . import ConvModule  # noqa: F401
