"""CLI mirroring the reference scripts' __main__ blocks.

    python -m tiff_to_geojson_csv_json_format_converter_spark.cli \
        convert --input-dir /data/tiffs --out /data/out --mode sampled

Subcommands: convert (valid|sampled|full), analyze, zonal, catalog.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tiff2geo-spark")
    ap.add_argument("command", choices=["convert", "analyze", "zonal", "catalog"])
    ap.add_argument("--input-dir", help="directory of GeoTIFFs")
    ap.add_argument("--synthetic", default=None, help="use synthetic scale xs|s|m instead of --input-dir")
    ap.add_argument("--out", default="./out")
    ap.add_argument("--mode", default="sampled", choices=["valid", "sampled", "full"])
    ap.add_argument("--geometry", help="GeoJSON geometry (string or @file) for zonal")
    ap.add_argument("--layer", default="layer")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .api import Converter
    from .plans.session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"tiff2geo-{args.command}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    if args.synthetic:
        conv = Converter.from_synthetic(spark, args.synthetic)
    elif args.input_dir:
        conv = Converter.from_tiff_dir(spark, args.input_dir)
    else:
        ap.error("need --input-dir or --synthetic")

    if args.command == "convert":
        res = conv.convert(args.out, mode=args.mode)
        print(json.dumps({"geojson_files": len(res["geojson_files"]),
                          "total_files": res["catalog"]["total_files"]}))
    elif args.command == "analyze":
        rows = [r.asDict() for r in conv.analyze().orderBy("image_id").collect()]
        print(json.dumps({"files": len(rows), "valid_total": sum(r["valid_pixels"] for r in rows)}))
    elif args.command == "zonal":
        g = args.geometry
        if g and g.startswith("@"):
            with open(g[1:]) as f:
                g = f.read()
        print(conv.zonal_response(json.loads(g), args.layer))
    elif args.command == "catalog":
        print(json.dumps(conv.catalog(), indent=2)[:2000])
    if not preexisting:  # don't tear down a session we merely joined
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
