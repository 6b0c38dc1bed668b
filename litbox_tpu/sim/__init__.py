from . import emission, materials, oracle  # noqa: F401
