"""Interleaved fresh-JVM A/B of two repo checkouts on the same queries.

Purpose (round-6 verdict item 1): attribute the r5 `embed_neardup` and
`raster_zonal_join` timing multiples — burst-stamped in BENCH_r05 — to
either the host or the similarity-kernel consolidation (552a143). The
only trustworthy comparison on this drifting shared VM is SAME-WINDOW
and INTERLEAVED: each (repo, query) run is its own subprocess with
cwd=<repo> (executors import the package by cwd — sys.path alone is not
enough), pairs alternate old/new order per repetition so slow drift
cancels, and a bare-kernel host probe is stamped before every
subprocess so bursts are visible in the record instead of silently
skewing it.

Usage:
    python BENCH/ab_compare.py <old_repo> <new_repo> [out.json]

Writes per-run timings, probe ratios, and per-query medians-of-best to
the output JSON (default BENCH/r06_ab_embed_zonal.json).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAIRS = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "3"))
QUERIES = ["embed_neardup", "raster_zonal_join"]

# Runs inside each subprocess (cwd = the repo under test). Reproduces
# the exact bench.py shapes: the registered embed_neardup union at
# sf0.1, and the uncached-plan zonal join over 256 cached 'm' images.
RUNNER = r"""
import json, sys, time
name, sf_dir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
from tiff_to_geojson_csv_json_format_converter_spark.plans.session import get_spark
spark = get_spark(app_name="ab", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 1000, numPartitions=cpus).selectExpr("sum(id)").collect()
spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()
if name == "embed_neardup":
    from tiff_to_geojson_csv_json_format_converter_spark.plans import entry_queries
    q = entry_queries.queries()["embed_neardup"]
    fn = lambda: q(spark, sf_dir).count()
elif name == "raster_zonal_join":
    from tiff_to_geojson_csv_json_format_converter_spark.operators import extract, zonal
    from tiff_to_geojson_csv_json_format_converter_spark.sources import synth
    images = synth.images_df(spark, "m", n_images=256,
                             num_partitions=cpus * 2).cache()
    images.count()
    extract.extract_points(images.limit(8)).count()
    fn = lambda: zonal.zonal_stats(
        extract.extract_points(images, valid_only=True),
        [synth.GOLDEN_DELHI_RING], "poly_0000").count()
else:
    raise SystemExit(f"unknown query {name}")
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    fn()
    runs.append(round(time.perf_counter() - t0, 3))
print("AB_RESULT " + json.dumps({"query": name, "best": min(runs), "runs": runs}))
"""


def run_one(repo: str, query: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, query, SF_DIR, str(CPUS)],
        cwd=repo, capture_output=True, text=True, timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"no result from {repo} / {query}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    old_repo = os.path.abspath(sys.argv[1])
    new_repo = os.path.abspath(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        HERE, "r06_ab_embed_zonal.json")

    sys.path.insert(0, REPO)
    from bench import PROBE_REF_SEC, make_host_probe
    probe = make_host_probe()

    runs: list[dict] = []
    for query in QUERIES:
        for pair in range(PAIRS):
            order = [old_repo, new_repo] if pair % 2 == 0 else [new_repo, old_repo]
            for repo in order:
                ratio = round(probe() / PROBE_REF_SEC, 2)
                t0 = time.time()
                res = run_one(repo, query)
                res.update(repo=repo, pair=pair,
                           probe_ratio=ratio, wall=round(time.time() - t0, 1))
                runs.append(res)
                print(json.dumps(res), flush=True)

    summary: dict[str, dict] = {}
    for query in QUERIES:
        by_repo: dict[str, list[float]] = {}
        for r in runs:
            if r["query"] == query:
                by_repo.setdefault(r["repo"], []).append(r["best"])
        # key by FULL path: basenames collide for the natural worktree
        # layout (/tmp/old/repo vs ~/copies/repo), which would silently
        # merge both sides into one list and report new_over_old = 1.0
        med_old = statistics.median(by_repo[old_repo])
        med_new = statistics.median(by_repo[new_repo])
        summary[query] = {
            "median_best_old": round(med_old, 3),
            "median_best_new": round(med_new, 3),
            "new_over_old": round(med_new / med_old, 3),
            "bests_old": by_repo[old_repo],
            "bests_new": by_repo[new_repo],
        }

    record = {
        "purpose": "attribute r5 embed_neardup/raster_zonal_join timings: "
                   "pre-consolidation (2109636) vs HEAD, interleaved fresh JVMs",
        "sf_dir": SF_DIR, "cpus": CPUS, "pairs": PAIRS,
        "old_repo": old_repo, "new_repo": new_repo,
        "runs": runs, "summary": summary,
        "probe_ratios": [r["probe_ratio"] for r in runs],
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
