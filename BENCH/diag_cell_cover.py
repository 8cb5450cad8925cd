"""Diagnose the r05 cell_cover_join core-count inversion.

r05_suite_scaling.json: the 4x-input cell_cover_join ran 5.67 s at
local[8] but 7.96 s at local[32] — more cores made a multi-second
equi-join SLOWER. Candidate causes: shuffle-partition sizing at the
high width, AQE partition coalescing interacting with the local
scheduler, or the Python scorer stage (pip_pair pandas_udf) paying
per-worker constants at 32 workers.

Method (same noisy-host discipline as everywhere): fresh JVM per
(width, variant) in a subprocess, interleaved across widths, 2 reps,
host probe stamped before each run. Each run times three nested
plans so the inverting phase is visible:

- scan:   pts_m.count() — explode+jitter only, no join, no Python
- cand:   candidate equi-join + broadcast ring re-attach, no pip filter
- full:   the complete cell_cover_join + groupBy (the bench shape)

Variants:
- base:        bench configuration (shuffle_partitions = max(cpus, 8))
- shuffle128:  shuffle_partitions pinned to 128 at every width
- nocoalesce:  AQE partition coalescing off

Usage: python BENCH/diag_cell_cover.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_DIAG_REPS", "2"))

RUNNER = r"""
import json, sys, time
cpus, variant, sf_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from tiff_to_geojson_csv_json_format_converter_spark.plans.session import get_spark
from tiff_to_geojson_csv_json_format_converter_spark.plans import entry_queries
from tiff_to_geojson_csv_json_format_converter_spark.operators import joins
from tiff_to_geojson_csv_json_format_converter_spark.sources import synth

shuffle = {"base": max(cpus, 8), "shuffle128": 128,
           "nocoalesce": max(cpus, 8), "arrow": max(cpus, 8),
           "codegen": max(cpus, 8)}[variant]
extra = {}
if variant == "nocoalesce":
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
scorer = "arrow" if variant in ("base", "shuffle128", "nocoalesce",
                                "arrow") else "codegen"
spark = get_spark(app_name="diag", master=f"local[{cpus}]",
                  shuffle_partitions=shuffle, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 1000, numPartitions=cpus).selectExpr("sum(id)").collect()

mult = 4
rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("r")
pts = entry_queries._pts(spark, sf_dir).filter("valid")
pts_m = (
    pts.select("*", rep)
    .withColumn("lon", F.col("lon") + F.col("r") * F.lit(1e-4))
    .withColumn("point_id", F.col("point_id") * mult + F.col("r"))
    .drop("r")
)
polys = synth.polygons_df(spark)

full_df = joins.cell_cover_join(
    pts_m, polys, lon_col="lon", lat_col="lat", scorer=scorer
).groupBy("polygon_id").agg(
    F.count("*").alias("n"), F.sum(F.col("z").cast("long")).alias("sum_z")
)
cand_df, _, _ = joins.cell_cover_candidates(
    pts_m, polys, lon_col="lon", lat_col="lat", rings="none"
)

def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)

out = {
    "scan": best_of(lambda: pts_m.count()),
    "cand": best_of(lambda: cand_df.count()),
    "full": best_of(lambda: full_df.count()),
}
print("DIAG_RESULT " + json.dumps(out))
"""


def run_one(cpus: int, variant: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), variant, SF_DIR],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("DIAG_RESULT "):
            return json.loads(line[len("DIAG_RESULT "):])
    raise RuntimeError(f"no result cpus={cpus} variant={variant}:\n"
                       f"{p.stdout[-1500:]}\n{p.stderr[-1500:]}")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "r06_diag_cell_cover.json")
    sys.path.insert(0, REPO)
    from bench import PROBE_REF_SEC, make_host_probe
    probe = make_host_probe()

    variants = [v.strip() for v in os.environ.get(
        "SPARK_GRAFT_DIAG_VARIANTS", "base,shuffle128,nocoalesce"
    ).split(",") if v.strip()]
    runs = []
    for rep in range(REPS):
        for variant in variants:
            widths = (8, 32) if rep % 2 == 0 else (32, 8)
            for cpus in widths:
                ratio = round(probe() / PROBE_REF_SEC, 2)
                res = run_one(cpus, variant)
                res.update(cpus=cpus, variant=variant, rep=rep,
                           probe_ratio=ratio)
                runs.append(res)
                print(json.dumps(res), flush=True)

    best: dict[tuple, dict[str, float]] = {}
    for r in runs:
        key = (r["variant"], r["cpus"])
        cur = best.setdefault(key, {})
        for phase in ("scan", "cand", "full"):
            cur[phase] = min(cur.get(phase, float("inf")), r[phase])
    summary = {}
    for variant in variants:
        row = {}
        for phase in ("scan", "cand", "full"):
            t8 = best[(variant, 8)][phase]
            t32 = best[(variant, 32)][phase]
            row[phase] = {"t8": t8, "t32": t32,
                          "speedup": round(t8 / max(t32, 1e-9), 2)}
        summary[variant] = row

    record = {"sf_dir": SF_DIR, "reps": REPS, "runs": runs, "summary": summary}
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
