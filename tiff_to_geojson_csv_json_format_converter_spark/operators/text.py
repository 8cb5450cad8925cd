"""Text-analysis operators for the documents table (training-data ops).

Everything here except the fingerprint UDF is pure built-in Catalyst
expressions (whole-stage codegen, no Python in the hot path): token
counting, quality scoring, language-ID marker scoring. The rolling-hash
fingerprint is an Arrow-batched pandas UDF (vectorized numpy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def fingerprint_udf():
    """Rolling polynomial document fingerprint mod 2^61-1 (vectorized:
    per-batch numpy over the char codes; Python touches batches, not rows)."""

    @F.pandas_udf(LongType())
    def fp(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            codes = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8)
            h = 0
            for c in codes.astype(np.uint64):
                h = (h * _FP_BASE + int(c)) % _FP_MOD
            out[i] = h
        return pd.Series(out)

    return fp


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_udf()(F.col(text_col)))
