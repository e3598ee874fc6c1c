"""Text analysis operators: token counting, quality scoring,
language-ID — the per-document featurization layer of a training-data
pipeline. Pure column expressions (one narrow projection, no shuffle,
no UDF): at 100 TB this runs at parquet-scan speed with full
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lintdb_spark import params
from lintdb_spark.functions.text import words

_PUNCT_RE = "[.,!?;:]"


def text_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, punct_ratio, quality_score).

    quality_score = min(1, n_tokens/100) * (1 - punct_ratio): longer
    docs with little punctuation-noise score higher. Deterministic and
    oracle-matched; a real pipeline would plug its own formula in here.
    """
    w = words("text")
    n_tokens = F.size(w)
    n_chars = F.length("text")
    no_space = F.length(F.regexp_replace(F.col("text"), " ", ""))
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), _PUNCT_RE, ""))
    # zero-guard: an empty document has n_chars=0, and x/0 raises
    # DIVIDE_BY_ZERO under Spark 4 ANSI mode. Mirrored in the oracle SQL.
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(n_punct / n_chars)
    return documents.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(no_space / n_tokens, params.ROUND).alias("avg_token_len"),
        F.round(punct_ratio, params.ROUND).alias("punct_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (F.lit(1.0) - punct_ratio),
            params.ROUND,
        ).alias("quality_score"),
    )


def _stop_count(text_col, lang: str):
    stop = params.STOPWORDS[lang]
    lowered = F.split(F.lower(text_col), " ")
    return F.size(F.filter(lowered, lambda t: t.isin(*stop)))


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID over {en, de, fr, es} with fixed
    tie-break order en > de > fr > es. (doc_id, pred_lang,
    n_stopwords). A scale pipeline would swap in char-n-gram models;
    the operator shape (narrow projection) is identical."""
    c = F.col(text_col)
    en, de, fr, es = (_stop_count(c, l) for l in ("en", "de", "fr", "es"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return documents.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.greatest(en, de, fr, es).cast("bigint").alias("n_stopwords"),
    )
