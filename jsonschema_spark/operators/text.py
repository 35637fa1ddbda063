"""Text analysis for training-data pipelines: language ID (stopword n-gram
heuristic), quality scoring, token counting, document fingerprinting.

Everything is built-in expressions — splits, regexes, higher-order array
functions — so the hot path stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import normalize_text, shingles, tokens

__all__ = ["encoding_quality", "MOJIBAKE_MARKERS", "token_count", "BPE_PRETOKEN_RE", "bpe_token_count", "quality_features", "lang_id", "fingerprint", "STOPWORDS", "PII_PATTERNS", "redact_pii", "domain_stats", "canonicalize_url", "url_dedup", "tfidf_keywords", "CLEAN_RULES", "clean_text", "HTML_RULES", "strip_html", "pmi_collocations"]

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


# GPT-2-style pretokenizer in the Java∩RE2 subset: English contractions,
# space-prefixed letter runs, digit runs, punctuation runs. The original
# GPT-2 pattern's trailing-whitespace branches (`\s+(?!\S)|\s+`) need
# lookahead RE2 lacks — dropping them only removes whitespace pretokens,
# which a TOKEN count excludes anyway. Both engines use leftmost-first
# alternation, so the contraction branch wins over the punct branch at an
# apostrophe in both.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: the number of GPT-2 pretokenizer segments.

    A byte-pair encoder splits text at exactly these boundaries before
    merging, so the pretoken count is a cheap, model-free lower bound on the
    true BPE token count — the right granularity for packing budgets,
    per-source token accounting, and length filters when the real tokenizer
    is too expensive to run in the scan. Pure JVM regexp_count projection."""
    return F.regexp_count(col, F.lit(BPE_PRETOKEN_RE))


def quality_features(
    df: DataFrame, id_col: str, text_col: str, *, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-doc quality metrics: lengths, punct/digit/space ratios, word stats.

    keep_cols carries extra input columns through the projection so pipeline
    composers can filter on the signals WITHOUT semi-joining back to the
    input — `input.join(signals, id)` re-evaluates the whole upstream DAG on
    both join sides (no cross-join CSE), which doubled curate_corpus's
    dedup stage."""
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
        *[F.col(c) for c in keep_cols],
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


def canonicalize_url(col: Column) -> Column:
    """SURT-style URL canonicalization (the key under which web-crawl
    pipelines dedup by URL): strip the fragment, drop tracking params
    (utm_*, fbclid, gclid), lowercase scheme and host, remove the scheme's
    default port (:80 http / :443 https), and trim trailing slashes off the
    path. One projection of chained regexp ops — the regexes stay in the
    lookaround-free subset shared by Java regex and RE2-family engines so
    DuckDB oracles replay the exact rule."""
    u = F.regexp_replace(col, r"#.*$", "")
    u = F.regexp_replace(u, r"(utm_[a-z]+|fbclid|gclid)=[^&]*&?", "")
    u = F.regexp_replace(u, r"[?&]+$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(scheme == "http", F.regexp_replace(hostport, r":80$", "")).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$", 1)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    return F.concat(scheme, F.lit("://"), host, path, F.when(query == "?", F.lit("")).otherwise(query))


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level dedup: (id, canonical_url, group_size, keep) where keep
    marks the lowest id per canonical URL — the crawl-frontier dedup that
    runs BEFORE any content fetch/compare.

    Scale: canonicalization is a narrow projection; the group roll-up is one
    map-side-combining groupBy on the canonical key carrying (min_id, count)
    — 2 small columns — and the verdict re-join is a shuffle hash join on the
    same key, so the exchange never carries payloads and reuses the
    partitioning. No window function (a per-group window would sort every
    group; min-id semantics only need the commutative agg)."""
    canon = df.select(F.col(id_col).alias("id"), canonicalize_url(F.col(url_col)).alias("canonical_url"))
    groups = canon.groupBy("canonical_url").agg(
        F.min("id").alias("__keep_id"), F.count(F.lit(1)).alias("group_size")
    )
    return canon.join(groups, "canonical_url").select(
        "id",
        "canonical_url",
        F.col("group_size").cast("long").alias("group_size"),
        (F.col("id") == F.col("__keep_id")).alias("keep"),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    top_k: int = 3,
    vocab_size: int = 65536,
) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF
    (tfidf = tf · (ln((N+1)/(df+1)) + 1), sklearn's smooth-idf): the corpus
    analytics that feeds topic routing / near-dup triage. Returns
    (id, term, rank, tfidf), rank 1..top_k per doc, ties broken
    (tfidf DESC, term ASC).

    Scale: ONE explode feeds both aggregates — per-(doc,term) counts
    (map-side combining) and document frequency (countDistinct over the
    already-deduped (doc,term) relation, so no second pass over raw
    tokens). The IDF relation is capped at `vocab_size` terms by
    (df DESC, term ASC) TakeOrdered — no global sort — and broadcast back;
    tail terms outside the cap are dropped from keyword candidacy
    (documented contract: at 10^12 docs the long tail is hapax noise, and
    the cap bounds the broadcast). The final per-doc top-k is a window over
    groups bounded by per-doc vocabulary, never corpus size."""
    from jsonschema_spark.operators.dedup import tokens as _tokens

    pairs = (
        df.select(F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    dfreq = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(vocab_size)
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.log((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)))
            + F.lit(1.0)
        ).alias("idf"),
    )
    scored = pairs.join(F.broadcast(idf), "term").select(
        "id", "term", (F.col("tf").cast("double") * F.col("idf")).alias("tfidf")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("id", "term", F.col("rank").cast("long").alias("rank"), "tfidf")
    )


# Cleaning rules (order matters): each is (java/RE2-shared pattern, repl).
# \x{...} escapes parse identically in Java regex and RE2, keeping the
# operator oracle-expressible.
CLEAN_RULES: list[tuple[str, str]] = [
    # control chars except \t \n (and \r normalized to \n first)
    (r"\r\n?", "\n"),
    (r"[\x{00}-\x{08}\x{0B}-\x{1F}\x{7F}]", ""),
    # zero-width space/joiners + BOM
    (r"[\x{200B}-\x{200D}\x{FEFF}]", ""),
    # horizontal whitespace runs -> one space
    (r"[ \t]+", " "),
    # spaces hugging newlines
    (r" ?\n ?", "\n"),
    # 3+ blank-line runs -> one blank line
    (r"\n{3,}", "\n\n"),
]


def clean_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pre-tokenization text normalization: CRLF → LF, strip control and
    zero-width characters, collapse horizontal whitespace, tidy newline
    runs, trim. Returns (id, text, n_before, n_after). One narrow projection
    of chained regexp_replace — zero shuffle, zero Python; every pattern is
    in the Java-regex ∩ RE2 subset so an external engine replays the exact
    rule chain."""
    cleaned = F.col(text_col)
    for pat, repl in CLEAN_RULES:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    cleaned = F.trim(cleaned)
    return df.select(
        F.col(id_col).alias("id"),
        cleaned.alias("text"),
        F.length(F.col(text_col)).cast("long").alias("n_before"),
        F.length(cleaned).cast("long").alias("n_after"),
    )


# HTML → text rules (order matters). Script/style/comment bodies go first
# (non-greedy dotall blocks), then bare tags, then a single entity-decode
# pass with &amp; LAST so "&amp;lt;" decodes to the literal "&lt;". All
# patterns are in the Java-regex ∩ RE2 subset ((?is) flags, non-greedy
# quantifiers — no lookaround) so any oracle engine replays the chain.
HTML_RULES: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
]


def strip_html(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Markup removal for crawled pages: drop script/style/comment blocks,
    strip tags, decode the common entities, collapse whitespace. Returns
    (id, text, n_before, n_after). One chained-regexp projection — zero
    shuffle, zero Python; at 10^12 docs this is a pure map stage that
    pipelines with whatever filter follows it."""
    cleaned = F.col(text_col)
    for pat, repl in HTML_RULES:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    cleaned = F.trim(cleaned)
    return df.select(
        F.col(id_col).alias("id"),
        cleaned.alias("text"),
        F.length(F.col(text_col)).cast("long").alias("n_before"),
        F.length(cleaned).cast("long").alias("n_after"),
    )


# Fixed-string mojibake markers: UTF-8 bytes of common punctuation/accents
# re-decoded as Latin-1/cp1252 -- the classic double-encoding signature
# (ftfy's core heuristic, reduced to the high-frequency cases so counting
# stays a fixed-string scan both engines implement identically). Defined via
# escapes: each marker is UTF-8(char) decoded as cp1252.
MOJIBAKE_MARKERS = [
    "\u00e2\u20ac\u2122",  # \u2019 right single quote re-decoded
    "\u00e2\u20ac\u0153",  # \u201c left double quote re-decoded
    "\u00e2\u20ac\u201c",  # \u2013 en dash re-decoded
    "\u00c3\u00a9",          # \u00e9 e-acute re-decoded
    "\u00c3\u00a8",          # \u00e8 e-grave re-decoded
    "\u00c3\u00bc",          # \u00fc u-umlaut re-decoded
    "\u00c3\u00b6",          # \u00f6 o-umlaut re-decoded
]

_REPLACEMENT = "\ufffd"


def _count_fixed(col: Column, needle: str) -> Column:
    """Occurrences of a fixed string:
    (len - len(replace(s, needle, ''))) / len(needle) -- exact integer
    arithmetic, no regex engine differences across Spark/DuckDB."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def encoding_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mojibake / encoding-damage detector: (id, n_replacement, n_mojibake,
    n_ctrl, ascii_ratio, enc_ok) per document.

    - n_replacement: U+FFFD replacement characters (a decoder already gave up)
    - n_mojibake: occurrences of the classic UTF-8-as-Latin-1 double-encoding
      digraphs (MOJIBAKE_MARKERS) -- fixed-string counts, no regex
    - n_ctrl: C0 control characters other than tab/newline/carriage-return
    - ascii_ratio: printable-ASCII chars / total chars (1.0 for empty text)
    - enc_ok: no damage markers and ascii_ratio >= 0.6 (multilingual text is
      legitimately non-ASCII; the low bar only catches binary-in-text)

    Pure narrow projection -- fixed-string scans and one regexp_replace diff
    per class, zero shuffle, zero Python; pipelines with downstream filters
    at any scale.
    """
    t = F.col(text_col)
    n_repl = _count_fixed(t, _REPLACEMENT)
    n_moji = None
    for m in MOJIBAKE_MARKERS:
        c = _count_fixed(t, m)
        n_moji = c if n_moji is None else (n_moji + c)
    n_ctrl = (
        F.length(t)
        - F.length(F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))
    ).cast("long")
    n_ascii = F.length(F.regexp_replace(t, "[^\\x20-\\x7e]", ""))
    ascii_ratio = F.round(
        F.when(F.length(t) > 0, n_ascii.cast("double") / F.length(t)).otherwise(
            F.lit(1.0)
        ),
        6,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_repl.alias("n_replacement"),
        n_moji.cast("long").alias("n_mojibake"),
        n_ctrl.alias("n_ctrl"),
        ascii_ratio.alias("ascii_ratio"),
        (
            (n_repl == 0) & (n_moji == 0) & (n_ctrl == 0) & (ascii_ratio >= 0.6)
        ).alias("enc_ok"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information: (w1, w2, c_pair,
    c_w1, c_w2, pmi_ratio) for adjacent token pairs whose co-occurrence
    beats independence — the corpus-analytics primitive behind phrase
    detection (word2vec phrase pass), tokenizer-merge candidates, and
    boilerplate phrase mining.

    ``pmi_ratio`` is the LIKELIHOOD RATIO p(ab)/(p(a)p(b)) =
    c_ab·N_uni²/(c_a·c_b·N_bi) rather than its log: monotone in PMI, but
    free of the cross-engine libm divergence a ln() would add to the
    oracle contract; snapped to the 1e-6 grid, with (w1, w2) tiebreak so
    the top-k cut is deterministic in every engine.

    Scale shape: token arrays staged once per doc; ONE explode feeds the
    unigram counts, one zip_with-shifted explode feeds the bigram counts
    (both map-side-combining groupBys on the token key); the two
    unigram-attach joins are key-partitioned on bare tokens + counts; the
    corpus totals ride in as broadcast one-row relations; top-k is a
    TakeOrdered (per-partition heads + driver merge of k·P candidates),
    never a global sort. ``min_count`` prunes the hapax tail BEFORE the
    joins, which is what keeps the bigram relation bounded in practice.
    """
    from jsonschema_spark.operators.dedup import tokens

    staged = docs.select(tokens(F.col(text_col)).alias("__toks"))
    uni = (
        staged.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    shifted = F.slice(
        F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(0))
    )
    bi = (
        staged.select(
            F.explode(
                F.filter(
                    F.zip_with(
                        F.col("__toks"),
                        shifted,
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    ),
                    lambda p: p["w2"].isNotNull(),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= F.lit(int(min_count)))
    )
    n_uni = uni.agg(F.sum("c_w").alias("__nu"))
    n_bi_src = staged.select(
        F.greatest(F.size("__toks") - 1, F.lit(0)).alias("__nb_doc")
    )
    n_bi = n_bi_src.agg(F.sum("__nb_doc").alias("__nb"))
    joined = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    ratio = (
        F.col("c_pair").cast("double")
        * F.col("__nu").cast("double")
        * F.col("__nu").cast("double")
        / (
            F.col("c_w1").cast("double")
            * F.col("c_w2").cast("double")
            * F.col("__nb").cast("double")
        )
    )
    snapped = F.floor(ratio * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)
    return (
        joined.select("w1", "w2", "c_pair", "c_w1", "c_w2", snapped.alias("pmi_ratio"))
        .orderBy(F.col("pmi_ratio").desc(), "w1", "w2")
        .limit(int(top_k))
    )


def token_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document lexical diversity: (id, n_tokens, n_types,
    type_token_ratio, token_entropy) — TTR and Shannon entropy (nats) of
    the token frequency distribution, the standard repetition/diversity
    signals next to the Gopher ratios.

    Scale: one explode feeds ONE (id, term) count aggregate (map-side
    combining), then a per-id roll-up computing n = Σc, types = count(*),
    entropy = ln(n) - Σ(c·ln c)/n — the algebraically-stable form needing
    only Σc and Σ(c·ln c). Both aggregates partial map-side; the id-level
    roll-up reuses the (id, term) exchange's id clustering. Doubles are
    snapped (nudge-then-floor): the Σ(c·ln c) term-sum order differs
    between engines, but per-doc sums over ≤ thousands of terms keep the
    discrepancy ~1e-12 relative — far inside the 1e-6 grid.
    """
    from jsonschema_spark.operators.dedup import tokens as _tokens

    pairs = (
        df.select(
            F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("term")
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = pairs.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "_clogc"
        ),
    )
    n = F.col("n_tokens").cast("double")
    ttr = F.col("n_types").cast("double") / n
    ent = F.log(n) - F.col("_clogc") / n
    return per.select(
        "id",
        "n_tokens",
        "n_types",
        (F.floor(ttr * 1e6 + F.lit(1e-6)) / 1e6).alias("type_token_ratio"),
        (F.floor(ent * 1e6 + F.lit(1e-6)) / 1e6).alias("token_entropy"),
    )
