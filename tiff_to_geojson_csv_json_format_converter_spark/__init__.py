"""PySpark-native spatial-join + tiling engine.

A from-scratch distributed re-expression of the semantics of the public
reference repo ``Aditya00712/Tiff-to-geojson-csv-json-format-converter``
(affine pixel->lon/lat extraction, NoData filtering, stride sampling,
GeoJSON/CSV/JSON feature export, zonal statistics under polygon clips,
bbox/catalog pruning, nearest-point lookup) as idiomatic PySpark
DataFrame operators over an Iceberg-style table of image+caption pairs,
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) such a table needs at 100 TB scale.

All per-pixel work runs in vectorized Arrow/pandas UDFs (no per-row
Python); everything else is built-in Catalyst-optimizable DataFrame ops.
"""

__version__ = "0.1.0"
