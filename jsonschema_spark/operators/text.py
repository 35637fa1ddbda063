"""Text analysis for training-data pipelines: language ID (stopword n-gram
heuristic), quality scoring, token counting, document fingerprinting.

Everything is built-in expressions — splits, regexes, higher-order array
functions — so the hot path stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import normalize_text, shingles, tokens

__all__ = ["token_count", "quality_features", "lang_id", "fingerprint", "STOPWORDS", "PII_PATTERNS", "redact_pii", "domain_stats"]

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para", "en", "que"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality metrics: lengths, punct/digit/space ratios, word stats."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(t)
    n_tokens = token_count(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    mean_wlen = F.when(n_tokens > 0, (F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n_tokens)).otherwise(F.lit(0.0))
    en_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"])))
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (punct.cast("double") / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (digits.cast("double") / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        mean_wlen.alias("mean_word_len"),
        (en_stop.cast("double") / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts.

    Ties and zero-hit docs return 'und' (undetermined)."""
    toks = tokens(F.col(text_col))

    def _member(words):
        return lambda x: x.isin(*words)

    scores = {
        lang: F.size(F.filter(toks, _member(words))) for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # deterministic tie-break: language order as declared
    for lang in reversed(list(STOPWORDS)):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(F.col(id_col).alias("id"), pred.alias("pred_lang"))


def fingerprint(df: DataFrame, id_col: str, text_col: str, *, n: int = 3, keep: int = 4) -> DataFrame:
    """Content fingerprint: the `keep` smallest shingle hashes, concatenated.

    A min-k sketch — robust to small edits, portable (md5-based) so oracle
    engines can reproduce it."""
    sh = shingles(F.col(text_col), n)
    hashed = F.array_sort(F.transform(sh, lambda x: F.md5(x)))
    return df.select(
        F.col(id_col).alias("id"),
        F.concat_ws("", F.slice(hashed, 1, keep)).alias("fingerprint"),
    )


# PII patterns deliberately restricted to the regex subset with IDENTICAL
# semantics in Java regex and RE2-family engines (no lookaround, no
# backreferences) so redaction is oracle-expressible anywhere.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+[0-9][0-9 -]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    *,
    kinds: tuple[str, ...] = ("email", "url", "phone"),
    replacement: str = "[REDACTED]",
    out_col: str | None = None,
    count_cols: bool = True,
) -> DataFrame:
    """Redact PII-shaped spans from a text column; optionally count matches.

    Training-data curation op: chained `regexp_replace` (JVM, codegen'd,
    narrow — no shuffle, no Python) with per-kind match counts computed on
    the ORIGINAL text for reporting/filtering. Order matters: url before
    email would eat mailto-less addresses embedded in URLs, so counts are
    taken per kind independently, then replacements apply in `kinds` order.
    """
    out_col = out_col or text_col
    cur: Column = F.col(text_col)
    counts = []
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        if count_cols:
            counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, replacement)
    return df.select("*", *counts).withColumn(out_col, cur)


def domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus domain-frequency analysis: (domain, n_urls, n_docs) for every
    host appearing in an http(s) URL in `text_col` — the aggregation that
    feeds domain allow/blocklists in web-crawl curation (URL counts and
    document reach per domain).

    JVM-side: regexp_extract_all pulls URLs, the host is a second
    regexp_extract (lowered to lowercase), and the only exchange is the
    partial-aggregated groupBy on the (small-domain-cardinality) host key.
    The regexes stay in the lookaround-free subset shared by Java regex and
    RE2-family engines, so the whole operator is oracle-expressible.
    """
    urls = F.expr(
        f"regexp_extract_all({text_col}, 'https?://[^\\\\s]+', 0)"
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode(urls).alias("url"))
    domain = F.lower(F.regexp_extract(F.col("url"), r"https?://([^/\s:]+)", 1))
    return (
        exploded.select("id", domain.alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("id").alias("n_docs"),
        )
    )
