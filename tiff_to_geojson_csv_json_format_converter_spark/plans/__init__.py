from . import session  # noqa: F401
