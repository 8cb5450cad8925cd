"""Config-driven layer-pattern matching with a fallback ladder.

Engine re-expression of the reference's dynamic pattern system
(layer_pattern_manager.py:116-154 ``test_pattern`` + the shipped
layer_patterns_config.json): a JSON config of

    {"layer_pattern_config": {category: {search_term: [match_terms]}},
     "fallback_patterns": [...], "case_sensitive": false}

resolves a requested layer name against the available layers with the
reference's exact priority order:

    category order -> search_term order -> available-layer order ->
    match_term order, then the fallback patterns (fallback order ->
    available-layer order).

Two surfaces:

- ``match_layer``: the driver-side single-request function, loop-for-
  loop faithful to the reference (used for HTTP-endpoint parity).
- ``match_layers``: the distributed operator — requests x patterns x
  available as BROADCAST contains-joins (patterns and the layer catalog
  are tiny; the request table is the big side and never shuffles), with
  the priority resolved by one min(struct(...)) aggregation. The same
  semantics as the reference loop, as one Catalyst plan.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CONFIG = {
    "layer_pattern_config": {
        "location_patterns": {},
        "terrain_patterns": {},
        "data_type_patterns": {},
        "temporal_patterns": {},
        "resolution_patterns": {},
    },
    "fallback_patterns": ["mosaic", "composite"],
    "exact_match_priority": True,
    "case_sensitive": False,
}


def load_config(source=None) -> dict:
    """Config from a dict, a JSON file path, or the defaults; add/remove
    helpers below mirror the reference's management utility."""
    if source is None:
        return json.loads(json.dumps(DEFAULT_CONFIG))
    if isinstance(source, dict):
        return source
    with open(source) as f:
        return json.load(f)


def add_pattern(config: dict, category: str, search_term: str, matches: list[str]) -> dict:
    config.setdefault("layer_pattern_config", {}).setdefault(category, {})[search_term] = list(matches)
    return config


def remove_pattern(config: dict, category: str, search_term: str) -> dict:
    config.get("layer_pattern_config", {}).get(category, {}).pop(search_term, None)
    return config


def add_fallback(config: dict, pattern: str) -> dict:
    fb = config.setdefault("fallback_patterns", [])
    if pattern not in fb:
        fb.append(pattern)
    return config


def remove_fallback(config: dict, pattern: str) -> dict:
    if pattern in config.get("fallback_patterns", []):
        config["fallback_patterns"].remove(pattern)
    return config


def pattern_rows(config: dict) -> list[tuple]:
    """Flatten the config into priority-ordered rows
    ``(group_prio, term_idx, search_term|None, match_term)`` — the total
    order the reference's nested loops realize. Fallback rows carry
    search_term=None (they apply to every request) and group priorities
    AFTER every configured pattern, so a configured match always wins."""
    rows: list[tuple] = []
    g = 0
    for category in config.get("layer_pattern_config", {}).values():
        for search_term, matches in category.items():
            for t, m in enumerate(matches):
                rows.append((g, t, search_term, m))
            g += 1
    for fb in config.get("fallback_patterns", []):
        rows.append((g, 0, None, fb))
        g += 1
    return rows


def match_layer(config: dict, requested_layer: str, available_layers: list[str]) -> str | None:
    """Reference-faithful single-request resolution
    (layer_pattern_manager.py:116-154)."""
    case_sensitive = config.get("case_sensitive", False)
    req = requested_layer if case_sensitive else requested_layer.lower()
    avail_norm = available_layers if case_sensitive else [a.lower() for a in available_layers]
    for category in config.get("layer_pattern_config", {}).values():
        for search_term, matches in category.items():
            if (search_term if case_sensitive else search_term.lower()) in req:
                for i, a in enumerate(avail_norm):
                    for m in matches:
                        if (m if case_sensitive else m.lower()) in a:
                            return available_layers[i]
    for fb in config.get("fallback_patterns", []):
        for i, a in enumerate(avail_norm):
            if (fb if case_sensitive else fb.lower()) in a:
                return available_layers[i]
    return None


def match_layers(requests: DataFrame, available_layers: list[str], config: dict,
                 request_col: str = "requested_layer") -> DataFrame:
    """Distributed resolution: one matched layer per request row (rows
    with no match are dropped, the reference's None).

    Plan: requests (big, never shuffled beyond its scan) x broadcast
    pattern rows (contains-join on the request side) x broadcast layer
    catalog (contains-join on the layer side), then ONE groupBy picking
    min(struct(group_prio, layer_idx, term_idx, layer_name)) — the
    reference's quadruple-nested loop as a single priority aggregate."""
    spark = requests.sparkSession
    case_sensitive = config.get("case_sensitive", False)
    norm = (lambda c: c) if case_sensitive else F.lower
    pats = spark.createDataFrame(
        pattern_rows(config),
        "group_prio int, term_idx int, search_term string, match_term string",
    )
    avail = spark.createDataFrame(
        [(i, a) for i, a in enumerate(available_layers)],
        "layer_idx int, layer_name string",
    )
    req_cond = F.col("search_term").isNull() | norm(F.col(request_col)).contains(
        norm(F.col("search_term"))
    )
    layer_cond = norm(F.col("layer_name")).contains(norm(F.col("match_term")))
    cand = (
        requests.join(F.broadcast(pats), req_cond)
        .join(F.broadcast(avail), layer_cond)
    )
    key_cols = [c for c in requests.columns]
    best = F.min(
        F.struct("group_prio", "layer_idx", "term_idx", "layer_name")
    ).alias("best")
    return (
        cand.groupBy(*key_cols).agg(best)
        .select(*key_cols, F.col("best.layer_name").alias("matched_layer"))
    )
