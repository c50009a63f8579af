from . import mesh, sharding  # noqa: F401  (public subpackage surface)
