"""Text-analysis operators for training-data curation — language-ID,
quality scoring, token counting, document fingerprinting, all PURE
COLUMN EXPRESSIONS (JVM-side, whole-stage codegen; zero Python in the
hot path) with bit-identical DuckDB SQL twins for the driver's
correctness oracle.

The reference has no text surface (SURVEY.md §2.8 — its scalar
functions are purely geometric); these are the engine-side extensions
a 100 TB corpus pipeline needs. Every function here is a map over the
documents table: no shuffle, no UDF, scales linearly with input
splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

M31 = (1 << 31) - 1

# tiny per-language stopword profiles for the n-gram/stopword-vote
# heuristic (deterministic; ties break by profile order)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "des"),
    "es": ("el", "la", "los", "y", "es", "una", "que", "de"),
}


def _word_hits_sql(text_expr: str, words: tuple[str, ...], engine: str) -> str:
    """COUNT of whitespace tokens of ``lower(text_expr)`` that are in
    ``words`` (occurrences, not distinct)."""
    lst = ", ".join(f"'{w}'" for w in words)
    if engine == "spark":
        return f"size(filter(split(lower({text_expr}), ' '), w -> w IN ({lst})))"
    return f"len(list_filter(string_split(lower({text_expr}), ' '), w -> w IN ({lst})))"


def language_id_sql(text_expr: str, engine: str) -> str:
    """Argmax-of-stopword-hits classifier as one scalar expression —
    deterministic, identical in both engines (greatest-so-far chain
    with first-wins tie-break in profile order)."""
    langs = list(LANG_PROFILES)
    hits = [_word_hits_sql(text_expr, LANG_PROFILES[lg], engine) for lg in langs]
    # best = lang of the maximal hit count, first profile wins ties
    expr = f"'{langs[-1]}'"
    best = hits[-1]
    for lg, h in zip(reversed(langs[:-1]), reversed(hits[:-1])):
        expr = f"CASE WHEN ({h}) >= ({best}) THEN '{lg}' ELSE {expr} END"
        best = f"CASE WHEN ({h}) >= ({best}) THEN ({h}) ELSE ({best}) END"
    return expr


def token_count_sql(text_expr: str, engine: str) -> str:
    """Whitespace token count (empty text → 0)."""
    if engine == "spark":
        return (
            f"CASE WHEN length({text_expr}) = 0 THEN 0L "
            f"ELSE CAST(size(split({text_expr}, ' ')) AS BIGINT) END"
        )
    return (
        f"CASE WHEN length({text_expr}) = 0 THEN 0 "
        f"ELSE CAST(len(string_split({text_expr}, ' ')) AS BIGINT) END"
    )


def quality_score_sql(text_expr: str, engine: str) -> str:
    """Integer-exact quality features folded into one score ×1000:
    stopword ratio (en profile) and mean token length band — a
    deterministic stand-in for the usual length/punct/stopword
    composite, chosen so both engines compute the identical BIGINT."""
    hits = _word_hits_sql(text_expr, LANG_PROFILES["en"], engine)
    toks = token_count_sql(text_expr, engine)
    # one floor-division (int `/` semantics differ between engines;
    # floor of the identical IEEE double division does not)
    return (
        f"CAST(CASE WHEN ({toks}) = 0 THEN 0 ELSE "
        f"floor(CAST(1000 * ({hits}) + length({text_expr}) AS DOUBLE) / ({toks})) "
        f"END AS BIGINT)"
    )


# fingerprint_sql materializes one index per character: cap it so a
# 1 MB document cannot allocate a 10⁶-element engine array per row.
# 64 KiB of prefix is far past any realistic hash-collision need and
# keeps the per-row allocation bounded (identical cap in BOTH engines
# so the driver oracle stays bit-identical).
FINGERPRINT_MAX_CHARS = 65_536


def fingerprint_sql(text_expr: str, engine: str) -> str:
    """Rolling polynomial hash of the document's first
    ``FINGERPRINT_MAX_CHARS`` characters:
    h ← (h·131 + ascii(char)) mod (2³¹−1). Order-sensitive (a true
    rolling fingerprint, not a bag hash); every intermediate < 2³⁹ so
    no BIGINT overflow under ANSI mode in either engine. The prefix
    cap bounds the per-row index-array allocation (documents beyond
    the cap fingerprint their prefix — a documented, deterministic
    bound, not a truncation bug)."""
    cap = FINGERPRINT_MAX_CHARS
    if engine == "spark":
        return (
            f"aggregate(sequence(1, least(length({text_expr}), {cap})), 0L, "
            f"(acc, i) -> (acc * 131 + CAST(ascii(substr({text_expr}, i, 1)) AS BIGINT)) % {M31})"
        )
    return (
        f"list_reduce(list_prepend(0, list_transform(range(1, least(length({text_expr}), {cap}) + 1), "
        f"i -> CAST(ascii(substr({text_expr}, CAST(i AS INTEGER), 1)) AS BIGINT))), "
        f"(acc, x) -> (acc * 131 + x) % {M31})"
    )


def _col(sql: str) -> Column:
    return F.expr(sql)


def analyze_documents(df: DataFrame, text: str = "text") -> DataFrame:
    """One map adding the full text-analysis column set:
    ``lang_id``, ``n_tokens``, ``quality``, ``fingerprint``."""
    return (
        df.withColumn("lang_id", _col(language_id_sql(text, "spark")))
        .withColumn("n_tokens", _col(token_count_sql(text, "spark")))
        .withColumn("quality", _col(quality_score_sql(text, "spark")))
        .withColumn("fingerprint", _col(fingerprint_sql(text, "spark")))
    )
