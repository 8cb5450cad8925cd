#!/usr/bin/env python
"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Extras include the BASELINE.json target metrics: pixel-to-coordinate
extraction rows/sec and spatial-join+tile images/sec on the synthetic
image+caption table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "affine_extract",
    "stride_sample",
    "tile_assign",
    "zonal_stats_box",
    "zonal_stats_pentagon",
    "knn",
    "catalog_rollup",
    "dedup_exact",
    "ngram_jaccard",
    "ann_brute_topk",
    "events_hourly",
    # round-2 operators
    "cell_cover_join",
    "zonal_stats_union",
    "multi_root_scan",
    # round-3 operators
    "embed_neardup_blocked",
]


def bench_blocked_cosine(spark, cpus: int) -> dict:
    """Blocked-Gram-matrix near-dup at a corpus size where the
    single-broadcast strategy would need a >= 2 GB driver collect +
    broadcast (rows x dim x 8 bytes of int64-quantized vectors): proof
    the blocked path runs where the broadcast one cannot. The corpus is
    generated DISTRIBUTED (seeded per-row rng, 20 planted duplicate
    pairs); the timed window includes generation, quantization, the
    block shuffle, and every block-pair matmul. The planted-pair count
    is asserted, so this is a correctness check at scale too."""
    import numpy as np
    import pandas as pd

    from tiff_to_geojson_csv_json_format_converter_spark.operators import similarity

    # corpus SHAPE matters: the >=2 GB-broadcast claim scales with
    # rows x dim, but the pairwise matmul work scales with rows^2 x dim
    # — so a wide-dim / few-rows corpus proves "past any sane single
    # broadcast" at ~7x less compute than the square shape, keeping this
    # entry a bench line instead of the suite's dominant cost
    nvec = int(os.environ.get("SPARK_GRAFT_BLOCKED_ROWS", "2048"))
    dim = int(os.environ.get("SPARK_GRAFT_BLOCKED_DIM", "131072"))
    n_blocks = int(os.environ.get("SPARK_GRAFT_BLOCKED_B", "2"))
    planted = 20

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                # last `planted` ids replay an early seed -> exact dup pairs
                seed = int(i) if i < nvec - planted else int(i) - (nvec - planted)
                vecs.append(
                    np.random.default_rng(seed).normal(size=dim).astype(np.float32)
                )
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    corpus = spark.range(nvec, numPartitions=cpus).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    )
    # single run, reported OUTSIDE the suite total: this entry is a
    # capability proof (the blocked path RUNS where a broadcast cannot),
    # not a steady-state operator timing — the sf0.1-scale timing of the
    # same operator is the embed_neardup_blocked suite entry. On this
    # sandbox the wall is host-bound, not plan-bound: the VM lazy-pages
    # fresh memory at ~50 MB/s and its shuffle path moves ~25-100 MB/s
    # (measured via phase decomposition; disk itself does 2.3 GB/s), so
    # ~2-4 GB of corpus movement costs ~60-130 s regardless of plan
    # shape. See PLANS.md 'blocked cosine' for the full breakdown.
    t0 = time.perf_counter()
    n_pairs = similarity.cosine_pairs_blocked(
        corpus, threshold_e6=999_000, n_blocks=n_blocks
    ).count()
    dt = time.perf_counter() - t0
    if n_pairs != planted:
        raise AssertionError(f"blocked near-dup found {n_pairs} pairs, expected {planted}")
    return {
        "sec": round(dt, 3),
        "corpus_rows": nvec,
        "dim": dim,
        "n_blocks": n_blocks,
        "quantized_corpus_gb": round(nvec * dim * 8 / 1e9, 2),
        "pairs_found": n_pairs,
    }


def bench_ivf_distributed(spark, sf_dir: str) -> dict:
    """Production-shape IVF (distributed full-corpus k-means trainer,
    n_probe << n_centroids) timed at bench scale, with measured
    recall@5 against the exact brute-force top-k — the
    quality-vs-throughput number an ANN deployment actually tracks."""
    from pyspark.sql import functions as F

    from tiff_to_geojson_csv_json_format_converter_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = 5
    t0 = time.perf_counter()
    ivf = similarity.ivf_topk(
        emb, k=k, n_centroids=16, n_probe=4, train="distributed", kmeans_iters=2
    ).select("query_id", "neighbor_id").cache()
    n_ivf = ivf.count()
    dt = time.perf_counter() - t0
    truth = similarity.brute_topk(emb, k=k).select("query_id", "neighbor_id").cache()
    n_truth = truth.count()
    hits = ivf.join(truth, ["query_id", "neighbor_id"]).count()
    ivf.unpersist()
    # recall/probe curve: the accuracy-throughput dial (n_probe ->
    # fraction of lists scanned); n_probe == n_centroids is exact by
    # construction and is the driver-checked mode
    curve = {}
    for np_ in (2, 8, 16):
        cand = similarity.ivf_topk(
            emb, k=k, n_centroids=16, n_probe=np_, train="distributed",
            kmeans_iters=2,
        ).select("query_id", "neighbor_id")
        curve[f"recall_at_5_probe{np_}"] = round(
            cand.join(truth, ["query_id", "neighbor_id"]).count() / max(n_truth, 1), 4
        )
    truth.unpersist()
    return {
        "sec": round(dt, 3),
        "recall_at_5": round(hits / max(n_truth, 1), 4),
        **curve,
        "ivf_pairs": n_ivf,
        "truth_pairs": n_truth,
        "n_probe": 4,
        "n_centroids": 16,
        "train": "distributed",
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "256"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from tiff_to_geojson_csv_json_format_converter_spark.operators import extract, zonal
    from tiff_to_geojson_csv_json_format_converter_spark.plans import entry_queries
    from tiff_to_geojson_csv_json_format_converter_spark.plans.session import get_spark
    from tiff_to_geojson_csv_json_format_converter_spark.sources import synth

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session once (JVM codegen, python workers, file listing) so
    # per-query timings measure the queries, not cold-start constants
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()
    spark.range(0, 1000, numPartitions=cpus).selectExpr("sum(id)").collect()

    qs = entry_queries.queries()
    timings: dict[str, float] = {}
    total = 0.0

    def best_of(fn, reps: int = 2) -> float:
        """Steady-state wall-clock: run twice, keep the min. This host is
        a noisy shared VM (identical runs vary up to 6x); the first run
        additionally pays codegen + cache materialization. The min of two
        back-to-back runs is the reproducible number a quiet cluster
        would show."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in HEADLINE:
        dt = best_of(lambda: qs[name](spark, sf_dir).count())
        timings[name] = round(dt, 3)
        total += dt

    # BASELINE.json target metrics on the synthetic image+caption table.
    # Scale "m" sizes (64/256 px) so decode+transform dominates, not
    # per-image overhead; generation is materialized OUTSIDE the timed
    # window; points are extracted once then queried (the realistic shape).
    images = synth.images_df(spark, "m", n_images=n_images, num_partitions=cpus * 2)
    images = images.cache()
    n_imgs = images.count()
    total_px = images.selectExpr("sum(w * h * band_count)").collect()[0][0]

    extract.extract_points(images.limit(8)).count()  # warm python workers
    n_pts = extract.extract_points(images, valid_only=True).count()
    t_extract = best_of(lambda: extract.extract_points(images, valid_only=True).count())
    timings["raster_extract"] = round(t_extract, 3)
    total += t_extract

    # end-to-end spatial join: decode -> clip -> zonal agg in ONE plan
    # (no materialization in between — the plan a user actually runs)
    t_zonal = best_of(
        lambda: zonal.zonal_stats(
            extract.extract_points(images, valid_only=True),
            [synth.GOLDEN_DELHI_RING], "poly_0000",
        ).count()
    )
    timings["raster_zonal_join"] = round(t_zonal, 3)
    total += t_zonal

    # the scale-shaped fused variants (partial agg inside the Arrow pass)
    timings["raster_tile_fused"] = round(
        best_of(lambda: extract.extract_tile_partials(images, 12).count()), 3
    )
    total += timings["raster_tile_fused"]

    t_zf = best_of(
        lambda: zonal.zonal_stats_fused(images, [synth.GOLDEN_DELHI_RING], "poly_0000").count()
    )
    timings["raster_zonal_fused"] = round(t_zf, 3)
    total += t_zf
    images.unpersist()

    blocked_info = None
    if os.environ.get("SPARK_GRAFT_BENCH_BLOCKED", "1") != "0":
        # capability proof, NOT part of the suite total (see its docstring):
        # reported in the extras as cosine_blocked
        blocked_info = bench_blocked_cosine(spark, cpus)

    ivf_info = None
    if os.environ.get("SPARK_GRAFT_BENCH_IVF", "1") != "0":
        ivf_info = bench_ivf_distributed(spark, sf_dir)
        timings["ann_ivf_distributed"] = ivf_info["sec"]
        total += ivf_info["sec"]
    out = {
        "metric": "headline query suite wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "methodology": "per-query best-of-2 back-to-back runs (steady state on a noisy shared host)",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "bench_images": n_imgs,
        "bench_pixels": int(total_px),
        "extract_rows_per_sec": int(n_pts / t_extract),
        "extract_pixels_per_sec": int(total_px / t_extract),
        "spatial_join_images_per_sec": round(n_imgs / t_zonal, 2),
        "spatial_join_fused_images_per_sec": round(n_imgs / t_zf, 2),
    }
    if blocked_info is not None:
        out["cosine_blocked"] = blocked_info
    if ivf_info is not None:
        out["ann_ivf_recall_at_5"] = ivf_info["recall_at_5"]
        out["ann_ivf_distributed"] = ivf_info
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
