"""A2: multi-root candidate search with glob patterns and caps.

Reference semantics (test2.py:45-89, ``get_slope_data_direct``):

1. an ordered list of candidate data roots; roots that do not exist are
   silently skipped,
2. per root, a ladder of glob patterns (``*.tif``, ``*.tiff``,
   ``*slope*.tif*``, ``{layer}*.tif*``) whose matches are unioned,
3. the union is deduplicated with ``list(set(...))`` (a file matching
   several patterns is kept once),
4. a global head cap (``slope_files[:5]``) bounds the work.

The reference's cap runs over an UNORDERED set, so which 5 files survive
is nondeterministic run-to-run. The engine fixes that deliberately:
matches are ordered by (root priority, path) before any cap, making the
result a pure function of the catalog. The fix is load-bearing for the
resumability story — a re-run after failure must pick the same files.

Spark-first shape: the "filesystem" is a catalog DataFrame (root, path)
— at 10^12-file scale a directory listing is itself a distributed table
(an Iceberg file manifest, an inventory dump). Roots and patterns are
tiny and broadcast; matching is a broadcast LIKE-join and the caps are
map-side-limited window row_numbers, so the whole operator is one
shuffle (the per-root window) or zero (global cap only, via sort+limit
which Spark executes as a TakeOrdered without a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["glob_to_like", "multi_root_scan"]


def glob_to_like(pattern: str) -> str:
    """Translate a shell glob to a SQL LIKE pattern.

    ``*`` -> ``%``, ``?`` -> ``_``; literal ``%``/``_`` are escaped with
    backslash (both Spark and DuckDB accept ``ESCAPE '\\'`` semantics by
    default for backslash in LIKE via the explicit escape we emit).
    """
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def multi_root_hits(
    catalog: DataFrame,
    roots: list[str],
    patterns: list[str],
    *,
    root_col: str = "root",
    path_col: str = "path",
) -> DataFrame:
    """The match stage of :func:`multi_root_scan` alone: the deduplicated
    (root_priority, root, path) hit set for ANY pattern in the ladder —
    factored out so several cap policies over the SAME roots can share
    one join+dedup (checkpoint the result and pass it back via
    ``hits=``; a narrower pattern's hit set is this frame filtered by
    that pattern's LIKE, since dedup commutes with the row filter)."""
    spark = catalog.sparkSession
    roots_df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(roots)], "root_priority int, root string"
    )
    likes = [F.col(path_col).like(glob_to_like(p)) for p in patterns]
    match = likes[0]
    for l in likes[1:]:
        match = match | l
    return (
        catalog.join(F.broadcast(roots_df), catalog[root_col] == roots_df["root"])
        .filter(match)
        .select("root_priority", roots_df["root"].alias("root"), F.col(path_col).alias("path"))
        # a file matching several patterns appears once (test2.py:78 set())
        .dropDuplicates(["root", "path"])
    )


def multi_root_scan(
    catalog: DataFrame,
    roots: list[str],
    patterns: list[str],
    *,
    per_root_cap: int | None = None,
    cap: int | None = 5,
    root_col: str = "root",
    path_col: str = "path",
    hits: DataFrame | None = None,
) -> DataFrame:
    """Search ``roots`` (in priority order) for paths matching ANY glob in
    ``patterns``; dedupe; apply per-root and global caps deterministically.

    Returns (root_priority, root, path) sorted by (root_priority, path),
    capped. Nonexistent roots contribute nothing (they simply have no
    catalog rows — the reference's ``os.path.exists`` skip).

    ``hits``: a precomputed :func:`multi_root_hits` frame (same roots,
    superset-or-equal patterns already applied) to reuse across several
    cap policies without re-running the match join.
    """
    if not roots or not patterns:
        # no roots to search, or an empty pattern ladder = zero matches
        # (the reference's glob loop simply finds nothing)
        return catalog.sparkSession.createDataFrame(
            [], "root_priority int, root string, path string"
        )
    if hits is None:
        hits = multi_root_hits(catalog, roots, patterns,
                               root_col=root_col, path_col=path_col)
    if per_root_cap is not None:
        w = Window.partitionBy("root").orderBy("path")
        hits = (
            hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= per_root_cap)
            .drop("rn")
        )
    hits = hits.orderBy("root_priority", "path")
    if cap is not None:
        hits = hits.limit(cap)  # test2.py:89 [:5], made deterministic
    return hits
