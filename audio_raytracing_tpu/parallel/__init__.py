from . import mesh, sharding  # noqa: F401
