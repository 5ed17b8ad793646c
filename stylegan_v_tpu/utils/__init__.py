from .misc import EasyDict, assert_shape, format_time  # noqa: F401
