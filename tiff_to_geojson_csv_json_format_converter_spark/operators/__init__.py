from . import dedup, extract, joins, multimodal, similarity, sinks, text, tiling, zonal  # noqa: F401
