"""Text primitives shared by the dedup / text-analysis operators.

All JVM-side (split / transform / element_at / md5 / conv) — no Python
UDFs. Hashing is md5-based because md5 is bit-identical across Spark
and DuckDB, which makes minhash/simhash signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def analyze_standard(text: Column | str) -> Column:
    """'standard' analyzer: lowercase, strip punctuation, whitespace
    split, drop empties. The reference declares an analyzer parameter
    on text fields but never implements one (lintdb/schema/Schema.h:17)
    — this is the Spark build's working version, used for token-level
    text postings (MatchQuery)."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " ")
    return F.filter(F.split(cleaned, " +"), lambda t: t != "")


def words(text: Column | str) -> Column:
    """Whitespace tokenization (single-space split, matching DuckDB
    string_split(text, ' '))."""
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def word_trigrams(words_col: Column) -> Column:
    """1-based sliding word 3-grams: trigram i = words[i..i+2],
    i in 1..max(len-2, 1). Mirrors the oracle's
    ``concat_ws(' ', w[i], w[i+1], w[i+2])``.

    try_element_at (not element_at) so documents with <3 words yield a
    short-gram instead of ARRAY_INDEX_OUT_OF_BOUNDS under Spark 4 ANSI
    mode — NULLs are skipped by concat_ws, matching the DuckDB oracle's
    NULL-skipping concat_ws exactly."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words_col) - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(words_col, i),
            F.try_element_at(words_col, i + 1),
            F.try_element_at(words_col, i + 2),
        ),
    )


def hash60(s: Column) -> Column:
    """First 15 hex chars of md5 -> unsigned 60-bit BIGINT.
    Portable: DuckDB `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def hash32(s: Column) -> Column:
    """First 8 hex chars of md5 -> 32-bit BIGINT (for simhash bits)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


# Universal-hash family over the Mersenne prime 2^31-1: one md5 per
# value, then perm_i(h) = (a_i*h + b_i) mod p with a_i, b_i derived
# from the perm index. a < p and h < p keep a*h < 2^62 (no bigint
# overflow). Same formula is emitted into the DuckDB oracle SQL.
MINHASH_PRIME = 2_147_483_647
MINHASH_A_MULT = 1_103_515_245
MINHASH_B_MULT = 12_345


def base_hash31(s: Column) -> Column:
    """md5-derived 31-bit base hash: hash60(s) mod p."""
    return hash60(s) % MINHASH_PRIME


def perm_hash(perm: Column, h31: Column) -> Column:
    """(a_perm * h + b_perm) mod p — the cheap per-permutation hash.
    All operands widened to BIGINT up front: a < p and h < p keep the
    product under 2^62 (no overflow under ANSI mode)."""
    p1 = perm.cast("bigint") + 1
    a = (F.lit(MINHASH_A_MULT).cast("bigint") * p1) % MINHASH_PRIME
    b = (F.lit(MINHASH_B_MULT).cast("bigint") * p1) % MINHASH_PRIME
    return (a * h31.cast("bigint") + b) % MINHASH_PRIME


def analyze_standard_py(text: str) -> list[str]:
    """Driver/python-side twin of ``analyze_standard`` — THE single
    place the standard analyzer's tokenization lives outside the JVM
    expression (Index query analysis and bm25 query analysis both call
    this; keep the regex in lockstep with analyze_standard above)."""
    import re

    return [t for t in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if t]
