from . import tables, numpy_ref  # noqa: F401
