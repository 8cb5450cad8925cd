from . import affine, cells, geometry, projection  # noqa: F401
