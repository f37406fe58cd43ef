from . import strings, vectors  # noqa: F401
