"""Text-analysis operators for the documents table (training-data ops).

EVERYTHING here is pure built-in Catalyst expressions (whole-stage
codegen; no Python in any hot path): token counting, quality scoring,
language-ID marker scoring, and the rolling-hash document fingerprint
(dual 31-bit Horner chains folded with ``aggregate`` over the char
codes — JVM-side, and exactly mirrored by the DuckDB SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed marker lexicons (deterministic; mirrored in the SQL oracle)
LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "qry": ("query", "filter", "join", "scan"),
    "dat": ("data", "row", "column", "table"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in")

TOKEN_REGEX = "[a-z]+|[0-9]+"  # BPE-ish word/number pieces (portable RE2/Java)


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + regex-piece token count (B-ops analog for
    documents; all JVM-side)."""
    t = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.size(F.split(t, " ")).cast("long")
    ).withColumn(
        "re_tokens", F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, alpha ratio, space ratio, stopword ratio,
    mean token length — scaled to exact integers (x1e6, floor) so results
    are engine-portable bit-for-bit."""
    t = F.col(text_col)
    length = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, "[^a-z]", "")).cast("double")
    spaces = F.length(t) - F.length(F.regexp_replace(t, " ", ""))
    words = F.split(t, " ")
    stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("double")
    nw = F.size(words).cast("double")
    return (
        df.withColumn("n_len", F.length(t).cast("long"))
        .withColumn("alpha_ratio_e6", F.floor(alpha / length * 1e6).cast("long"))
        .withColumn("space_ratio_e6", F.floor(spaces.cast("double") / length * 1e6).cast("long"))
        .withColumn("stop_ratio_e6", F.floor(stop / nw * 1e6).cast("long"))
        .withColumn("mean_tok_len_e6", F.floor((length - spaces.cast("double")) / nw * 1e6).cast("long"))
    )


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language/domain ID: count marker hits per class over
    whitespace tokens, argmax with fixed class order tie-break."""
    words = F.split(F.lower(F.col(text_col)), " ")

    def marker_count(markers):
        return F.size(F.filter(words, lambda w: w.isin(*markers))).cast("long")

    scores = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    df = df
    for lang, score in scores.items():
        df = df.withColumn(f"score_{lang}", score)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = F.lit("und")
    for la in reversed(langs):  # earlier classes win ties
        pred = F.when(F.col(f"score_{la}") == best, F.lit(la)).otherwise(pred)
    return df.withColumn("pred_lang", F.when(best <= 0, F.lit("und")).otherwise(pred))


_FP_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne)
_FP_BASES = (131, 257)  # two independent Horner chains -> 62-bit pack


def _horner_col(text_col: str, base: int):
    """One 31-bit rolling polynomial hash over the text's code points,
    entirely in Catalyst built-ins (sequence -> transform(ascii) ->
    aggregate). h*base+c stays < 2^39, so plain BIGINT arithmetic is
    exact and identical in every engine. Empty text hashes to 0
    (sequence(1,0) would be DESCENDING in Spark, hence the guard)."""
    return F.expr(
        f"CASE WHEN length({text_col}) = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"aggregate(transform(sequence(1, length({text_col})), i -> ascii(substr({text_col}, i, 1))), "
        f"CAST(0 AS BIGINT), (h, c) -> (h * {base} + c) % {_FP_MOD}) END"
    )


def fingerprint_col(text_col: str = "text"):
    """62-bit rolling-hash document fingerprint: two independent 31-bit
    Horner chains (bases {131, 257}, mod 2^31-1) packed as
    ``h1 * 2^31 + h2``. No Python anywhere — the whole computation is
    whole-stage-codegen JVM expressions, and the identical fold is
    expressible in ANSI SQL (the DuckDB oracle runs it via list_reduce).

    Replaces the reference's per-document content hashing
    (willOnlyStoreValidPoints.py-era dedup-by-content semantics) with an
    order-sensitive rolling hash suitable for shard-stable dedup keys."""
    h1 = _horner_col(text_col, _FP_BASES[0])
    h2 = _horner_col(text_col, _FP_BASES[1])
    return (h1 * F.lit(2_147_483_648) + h2).cast("long")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_col(text_col))
