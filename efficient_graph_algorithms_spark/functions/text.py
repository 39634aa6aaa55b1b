"""Text-analysis operators for a training-data pipeline over a
``documents(doc_id, text, lang, source, n_chars)`` table.

Every operator here is a pure column expression (JVM-side, whole-stage
codegen — no Python in the hot path) and has an exactly-equivalent
DuckDB SQL form used as its correctness oracle:

- token_count     whitespace tokenization
- lang_id         stopword-hit n-gram heuristic (en/de/fr)
- quality_score   length / punctuation / stopword-ratio composite
- fingerprint     portable 60-bit content hash of normalized text

Number-producing operators round at OUT_DECIMALS so Spark/DuckDB float
results hash identically in the driver's order-insensitive comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col

OUT_DECIMALS = 6

# stopword markers per language, matched as whole words on lowercased text
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "la", "les", "est"],
}
_EN_STOP = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def _marker_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


# GPT-2-style pre-tokenizer shape, restricted to constructs with
# identical semantics in Java regex AND RE2 (no lookahead, no \p
# classes): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs. Both engines match alternations
# leftmost-first, so counts agree exactly.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword-boundary token count (the LLM-pipeline cost
    estimator): number of BPE_ISH_PATTERN matches. Whitespace runs are
    not tokens (they fold into the following token's optional space)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.regexp_count(low, F.lit(_marker_pattern(words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; ties resolve en > de > fr;
    'und' (unknown) when no marker hits at all."""
    s = lang_scores(text)
    best = F.greatest(s["en"], s["de"], s["fr"])
    return (
        F.when(best == 0, F.lit("und"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for nonnegative longs: (a - a%b)/b.
    a - a%b is an exact multiple of b, so the double division is exact
    (inputs stay far below 2^53)."""
    return ((a - (a % b)) / b).cast("long")


def quality_score(text: Column) -> Column:
    """Composite quality in [0, 1000] (integer "milli" scale): length
    saturation (40%), alphanumeric ratio (30%), English-stopword ratio
    saturation (30%). Pure integer arithmetic end-to-end so the value
    is EXACTLY reproducible in any engine — no float rounding
    boundaries."""
    t = F.trim(text)
    n = F.length(t).cast("long")
    alnum = F.length(F.regexp_replace(t, r"[^A-Za-z0-9 ]", "")).cast("long")
    toks = token_count(t)
    stop_hits = F.regexp_count(F.lower(t), F.lit(_marker_pattern(_EN_STOP))).cast("long")
    len_t = F.least(F.lit(1000).cast("long"), n * 2)
    alnum_t = F.when(n > 0, _idiv(alnum * 1000, n)).otherwise(F.lit(0).cast("long"))
    stop_t = F.least(
        F.lit(1000).cast("long"),
        F.when(toks > 0, _idiv(stop_hits * 5000, toks)).otherwise(F.lit(0).cast("long")),
    )
    return _idiv(len_t * 4 + alnum_t * 3 + stop_t * 3, F.lit(10).cast("long"))


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase form used for fingerprint/dedup."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint60(text: Column) -> Column:
    """Portable 60-bit content fingerprint (same value in DuckDB via
    ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return md5_60bit_col(normalized_text(text))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments (must stay in lockstep with the columns above)
# ---------------------------------------------------------------------------

def duck_token_count(expr: str) -> str:
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({expr}), '\\s+')) END"
    )


def duck_bpe_token_count(expr: str) -> str:
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def duck_marker_count(expr: str, words: list[str]) -> str:
    pat = _marker_pattern(words)
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def duck_lang_id(expr: str) -> str:
    en = duck_marker_count(expr, LANG_MARKERS["en"])
    de = duck_marker_count(expr, LANG_MARKERS["de"])
    fr = duck_marker_count(expr, LANG_MARKERS["fr"])
    return (
        f"CASE WHEN greatest({en},{de},{fr}) = 0 THEN 'und' "
        f"WHEN {en} = greatest({en},{de},{fr}) THEN 'en' "
        f"WHEN {de} = greatest({en},{de},{fr}) THEN 'de' ELSE 'fr' END"
    )


def duck_quality_score(expr: str) -> str:
    t = f"trim({expr})"
    n = f"len({t})::BIGINT"
    alnum = f"len(regexp_replace({t}, '[^A-Za-z0-9 ]', '', 'g'))::BIGINT"
    toks = f"({duck_token_count(expr)})::BIGINT"
    stops = f"({duck_marker_count(expr, _EN_STOP)})::BIGINT"
    len_t = f"least(1000, {n} * 2)"
    alnum_t = f"(CASE WHEN {n} > 0 THEN ({alnum} * 1000) // {n} ELSE 0 END)"
    stop_t = f"least(1000, CASE WHEN {toks} > 0 THEN ({stops} * 5000) // {toks} ELSE 0 END)"
    return f"((({len_t}) * 4 + {alnum_t} * 3 + {stop_t} * 3) // 10)::BIGINT"


def duck_normalized_text(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


def duck_fingerprint60(expr: str) -> str:
    return f"(('0x' || substr(md5({duck_normalized_text(expr)}), 1, 15))::BIGINT)"
