from . import luts, sampling, types  # noqa: F401
