"""Classic web-corpus heuristic filters: the C4 line/document rules
(Raffel et al. 2020, "Exploring the Limits of Transfer Learning", §2.2)
and the Gopher document-quality rules (Rae et al. 2021, "Scaling Language
Models", Table A1).

Beyond-reference training-data operators (the reference validator has no
corpus-filter surface; this extends the SURVEY §2.7 dataset-check family).

Every signal is a single narrow projection over built-in expressions —
splits, `rlike`, higher-order array functions — so the hot path stays in
whole-stage codegen: no Python, no shuffle, no explode. At 10^12 docs the
cost is one pass over the text column; filters compose with `.filter(keep)`
so Catalyst can push the resulting predicate next to the scan.

Regexes are restricted to the Java∩RE2 subset (no lookaround, no
backreferences) so the exact rule chain replays in any oracle engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "C4_TERMINAL_LINE_RE",
    "GOPHER_REQUIRED_WORDS",
    "c4_line_filter",
    "gopher_quality",
    "compression_ratio",
]

# A line survives C4 iff it ends in terminal punctuation (., !, ?, or a
# closing quote after one). Whitespace after the terminal mark is tolerated.
C4_TERMINAL_LINE_RE = r'[.!?"]\s*$'

# Gopher's "must contain at least 2 of these" stopword rule (Table A1).
GOPHER_REQUIRED_WORDS: list[str] = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _lines(text: Column) -> Column:
    return F.split(text, r"\n")


def _fence(keep: Column) -> Column:
    """AND a vacuously-true nondeterministic term onto a keep flag.

    PushPredicateThroughNonJoin substitutes alias definitions into a
    predicate and pushes it through every deterministic Project — so a
    caller's `.filter("keep")` lands at the bottom of the chain with the
    ENTIRE signal expression stack inlined (staging undone — no CSE inside
    a Filter condition; observed 40%+ of web_pipeline's runtime). The rule
    refuses nondeterministic predicates, so this term pins the filter right
    above the Project that computes `keep`, which is then evaluated ONCE
    from the staged arrays. `monotonically_increasing_id()` is never
    negative, so the flag's VALUE is unchanged and engine-portable oracles
    replay it (NOT `isNotNull` — nullability simplification folds that to
    TRUE and the fence vanishes; no rule reasons about the id's sign).

    Callers should apply source-table predicates (partition pruning, id
    ranges) BEFORE the operator — those still reach the scan; only
    predicates over the operator's own derived signals are fenced, and
    those could never be pushed to the scan anyway."""
    return keep & (F.monotonically_increasing_id() >= 0)


def _wstrip(col: Column) -> Column:
    # regex whitespace strip — F.trim only removes ASCII spaces, which
    # miscounts words on tab/newline-padded text (split('\s+') emits an
    # empty leading token)
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _line_words(line: Column) -> Column:
    t = _wstrip(line)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4's cleaning pass as one projection.

    Line rules: keep only lines that end in terminal punctuation AND carry
    at least `min_words_per_line` words. Document rules: drop the doc if
    the retained text has fewer than `min_sentences` sentence-final marks,
    mentions "lorem ipsum", or contains a curly brace (code marker).

    Returns (id, text, n_lines, n_lines_kept, n_sentences, keep) where
    `text` is the retained line-joined text. Filtering is the caller's
    `.filter("keep")` so audits can inspect near-misses.
    """
    # stage line/kept-line arrays as attributes: inline, every reuse of the
    # array re-runs the regex line filter (HOF lambdas defeat CSE, and
    # CollapseProject declines to merge the stages precisely because the
    # expressions are non-cheap) — the same trap repetition.py:52 documents
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col).alias("id"), t.alias("__t"), _lines(t).alias("__lines")
    )
    kept = staged.select(
        "id",
        "__t",
        "__lines",
        F.filter(
            F.col("__lines"),
            lambda ln: _wstrip(ln).rlike(C4_TERMINAL_LINE_RE)
            & (_line_words(ln) >= min_words_per_line),
        ).alias("__kept"),
    ).select(
        "id",
        "__t",
        "__lines",
        "__kept",
        F.array_join(F.transform(F.col("__kept"), _wstrip), "\n").alias("__ktext"),
    )
    kept_text = F.col("__ktext")
    # sentence-final marks in the retained text
    n_sent = F.length(kept_text) - F.length(F.regexp_replace(kept_text, r"[.!?]", ""))
    keep = (
        (n_sent >= min_sentences)
        & ~F.lower(F.col("__t")).contains("lorem ipsum")
        & ~F.col("__t").contains("{")
    )
    sig = kept.select(
        "id",
        kept_text.alias("text"),
        F.size(F.col("__lines")).cast("bigint").alias("n_lines"),
        F.size(F.col("__kept")).cast("bigint").alias("n_lines_kept"),
        n_sent.cast("bigint").alias("n_sentences"),
        _fence(keep).alias("keep"),
    )
    return sig


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_required_stopwords: int = 2,
    keep_text: bool = False,
) -> DataFrame:
    """Gopher Table-A1 document-quality rules as one projection.

    Signals: word count bounds, mean word length bounds, symbol-to-word
    ratio (# and ellipsis), fraction of bullet-started lines, fraction of
    ellipsis-ended lines, fraction of words with an alphabetic character,
    and presence of >= `min_required_stopwords` distinct required words.

    Returns one row per doc with every signal plus the composite `keep`, so
    per-rule ablations are a `.groupBy` away.
    """
    # stage text, word array, line array, and the normalized word array as
    # attributes before the HOF-heavy signal expressions: inline, the split
    # and per-word regex transforms are re-evaluated once PER SIGNAL (HOF
    # lambdas defeat CSE — repetition.py:52's trap), which made this
    # projection ~4x slower than its staged form
    t0 = F.col(text_col)
    ts0 = _wstrip(t0)
    staged = df.select(
        F.col(id_col).alias("id"),
        t0.alias("__t"),
        ts0.alias("__ts"),
        F.split(ts0, r"\s+").alias("__words"),
        _lines(t0).alias("__lines"),
    ).select(
        "id",
        "__t",
        "__ts",
        "__words",
        "__lines",
        F.transform(
            F.col("__words"), lambda w: F.lower(F.regexp_replace(w, r"[^A-Za-z]", ""))
        ).alias("__lower_words"),
    )
    t = F.col("__t")
    words = F.col("__words")
    lines = F.col("__lines")
    n_words = F.when(F.length(F.col("__ts")) == 0, F.lit(0)).otherwise(F.size(words))
    n_words_d = F.greatest(n_words, F.lit(1)).cast("double")

    total_word_chars = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    mean_wlen = total_word_chars.cast("double") / n_words_d

    # symbols: '#' occurrences + ellipses ('...' runs or U+2026), per word
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    no_ellipsis = F.regexp_replace(F.regexp_replace(t, r"\.\.\.", ""), "…", "")
    # each removed ASCII ellipsis drops 3 chars, each U+2026 drops 1; count both
    n_ellipsis = (
        (F.length(F.regexp_replace(t, "…", "")) - F.length(no_ellipsis)) / F.lit(3)
        + (F.length(t) - F.length(F.regexp_replace(t, "…", "")))
    ).cast("long")
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words_d

    n_lines_d = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda ln: _wstrip(ln).rlike(r"^[-*•]"))).cast("double")
        / n_lines_d
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda ln: _wstrip(ln).rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / n_lines_d
    )

    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))).cast("double") / n_words_d
    )

    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
            lambda s: F.array_contains(F.col("__lower_words"), s),
        )
    )

    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wlen >= min_mean_word_len)
        & (mean_wlen <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_required_stopwords)
    )
    sig = staged.select(
        "id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.cast("bigint").alias("stop_hits"),
        _fence(keep).alias("keep"),
        # keep_text lets pipeline composers stay single-pass: without it a
        # downstream `input.join(signals, id)` re-evaluates the whole
        # upstream chain on BOTH join sides (Spark does not CSE across a
        # self-join), which doubled web_pipeline's regex work.
        *([t.alias("text")] if keep_text else []),
    )
    return sig


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, *, level: int = 6
) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio) — zlib DEFLATE compressibility of
    the UTF-8 text. Highly repetitive/boilerplate documents compress far
    below natural prose (~0.3-0.5), so a low ratio is a drop signal in the
    Gopher/RedPajama-v2 signal family, complementary to the exact n-gram
    repetition fractions in operators/repetition.py (DEFLATE catches long-
    range and approximate repetition those miss).

    This is the one deliberately-Python operator in the text surface:
    DEFLATE is not expressible in SQL/Column algebra, so it runs as an
    Arrow-batched pandas_udf (one Python call per ~10k-row batch, zero
    per-row overhead) — the same honest fallback tier the multimodal
    decoders use, except the codec here is stdlib so nothing is stubbed.
    Narrow projection: no shuffle, scales embarrassingly. Deterministic for
    a fixed zlib level (output LENGTH is stable across zlib builds in
    practice; pin level, don't compare across zlib majors).
    """
    @F.pandas_udf("int")
    def _clen(s: pd.Series) -> pd.Series:
        import zlib

        return s.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    # stage the UDF result once — Python UDF calls are not CSE'd, so
    # referencing _clen(...) twice would compress every doc twice
    staged = df.select(
        F.col(id_col).alias("id"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        _clen(F.col(text_col)).alias("n_compressed"),
    )
    return staged.select(
        "id",
        "n_bytes",
        "n_compressed",
        F.when(
            F.col("n_bytes") > 0,
            F.round(F.col("n_compressed").cast("double") / F.col("n_bytes"), 6),
        ).otherwise(F.lit(None).cast("double")).alias("ratio"),
    )
