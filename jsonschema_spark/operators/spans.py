"""Span-axis operators: salted repartition, span-sequence equality vs a
reference table, explode helpers (north rule per-row invariant: span-sequence
equality on (kind, text, media_ref, order)).

Skew note: media-heavy documents make *span work* (explode / per-span UDFs)
skewed even when doc_id itself is uniform. ``salted_repartition`` spreads rows
by ``xxhash64(doc_id, salt)`` so one straggler partition doesn't gate the
stage (SURVEY §4.2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "salted_repartition",
    "span_sequence_digest",
    "span_sequence_mismatches",
    "explode_spans",
    "span_length_stats",
    "span_interleave_stats",
    "span_transition_matrix",
    "interleaved_token_set",
    "canonicalize_spans",
    "media_context_pairs",
    "media_ref_stats",
    "interleaved_doc_filter",
    "span_lang_consistency",
]


def salted_repartition(df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Repartition by hash(key, salt) — explicit, north-rule mandated.

    The salt is a ROW-CONTENT hash (all columns), not
    monotonically_increasing_id: a task retry after a lost shuffle re-salts
    every row identically, so the shuffle is deterministic end-to-end."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    out = salted.repartition(num_partitions, F.xxhash64(F.col(key), F.col("__salt")))
    return out.drop("__salt")


def explode_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, pos, kind, text, media_ref, offset) — one row per span."""
    return df.select(
        "doc_id", F.posexplode(spans_col).alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def span_sequence_digest(spans_col) -> Column:
    """Order-sensitive 64-bit digest of (kind, text, media_ref) per span.

    One ``xxhash64`` over the projected ``array<struct>`` — Spark's hash
    expressions recurse into arrays/structs natively (element order feeds the
    running seed, so the digest IS order-sensitive), which keeps the whole
    digest a single JVM expression instead of a per-span interpreted lambda
    fold (measured ~3x cheaper on the events-derived spans at sf0.1).
    Collision odds 2^-64 per doc; the reference's uniqueItems uses the same
    hash-then-compare shape (unique_items.go hashJSONValue). NULL fields map
    to a \\x00 sentinel BEFORE hashing — Spark's hash skips NULL values, which
    would make [a, NULL, b] collide with [a, b]; a literal "\\x00" payload
    would collide with NULL, accepted and documented. A NULL spans array
    digests to NULL (never equal under ``!=``-style comparison, matching
    whole-array equality semantics). ``offset`` is intentionally excluded:
    the north-rule invariant is (kind, text, media_ref, order)."""
    col = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    projected = F.transform(
        col,
        lambda s: F.struct(
            F.coalesce(s["kind"], F.lit("\x00")).alias("kind"),
            F.coalesce(s["text"], F.lit("\x00")).alias("text"),
            F.coalesce(s["media_ref"], F.lit("\x00")).alias("media_ref"),
        ),
    )
    return F.when(col.isNotNull(), F.xxhash64(projected))


def span_sequence_mismatches(
    docs: DataFrame,
    reference: DataFrame,
    *,
    detail: bool = False,
) -> DataFrame:
    """Docs whose span sequence differs from the reference's for the same doc_id.

    Fast path: each side is reduced to (doc_id, 64-bit order-sensitive
    digest, span count) BEFORE the join, so the doc_id exchange carries
    ~20 B/row instead of full span arrays — at 10^12 docs with media-heavy
    span payloads that is the difference between a 20 TB shuffle and a
    sub-TB one. ``detail=True`` digest-prefilters the same way, then
    re-joins the full payloads (posexplode on (doc_id, pos)) ONLY for the
    mismatched doc_ids and reports the first differing position per doc.
    """
    left = docs.select(
        "doc_id",
        span_sequence_digest("spans").alias("__dig"),
        F.size("spans").alias("n_spans"),
    )
    right = reference.select(
        "doc_id",
        span_sequence_digest("spans").alias("__ref_dig"),
        F.size("spans").alias("n_ref_spans"),
    )
    mismatched = (
        left.join(right, "doc_id", "inner")
        # plain != so a NULL spans array on either side never reports a
        # mismatch — identical to whole-array equality under ~(a == b)
        .filter(F.col("__dig") != F.col("__ref_dig"))
        .select("doc_id", "n_spans", "n_ref_spans")
    )
    if not detail:
        return mismatched

    bad_ids = mismatched.select("doc_id")
    l = explode_spans(docs.join(bad_ids, "doc_id", "left_semi")).withColumnRenamed(
        "kind", "kind_l"
    ).withColumnRenamed("text", "text_l").withColumnRenamed("media_ref", "media_ref_l").drop("offset")
    r = explode_spans(reference.join(bad_ids, "doc_id", "left_semi")).withColumnRenamed(
        "kind", "kind_r"
    ).withColumnRenamed("text", "text_r").withColumnRenamed("media_ref", "media_ref_r").drop("offset")
    j = l.join(r, ["doc_id", "pos"], "full_outer")
    diff = j.filter(
        ~(
            F.col("kind_l").eqNullSafe(F.col("kind_r"))
            & F.col("text_l").eqNullSafe(F.col("text_r"))
            & F.col("media_ref_l").eqNullSafe(F.col("media_ref_r"))
        )
    )
    return diff.groupBy("doc_id").agg(F.min("pos").alias("first_mismatch_pos"), F.count(F.lit(1)).alias("n_mismatched_spans"))


def span_length_stats(docs: DataFrame) -> DataFrame:
    """Per-doc span-count distribution inputs for the KS drift check."""
    return docs.select("doc_id", F.size("spans").alias("span_count"))


def _kind_transitions(kinds: Column) -> Column:
    """array<struct<from_kind,to_kind>> of adjacent kind pairs, via the
    zip_with shifted-view single pass (zip_with pads the shorter side with
    NULL, so the tail pair carries to_kind=NULL and is filtered out)."""
    shifted = F.slice(kinds, 2, F.greatest(F.size(kinds) - 1, F.lit(0)))
    pairs = F.zip_with(
        kinds,
        shifted,
        lambda a, b: F.struct(a.alias("from_kind"), b.alias("to_kind")),
    )
    return F.filter(pairs, lambda p: p["to_kind"].isNotNull())


def span_interleave_stats(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-doc interleaving shape of a text+media span sequence: span counts
    by kind, the number of maximal same-kind runs, and the media fraction.

    The run count is the canonical "how interleaved is this document"
    signal for multimodal batch prep — a doc whose 40 media spans sit in
    one contiguous block packs (and resamples) very differently from 40
    singleton images threaded through text, yet both have the same
    media_frac. Everything is ONE narrow projection over the spans array
    (the kind array is staged once, then reused by every signal — HOF
    lambda bodies defeat CSE, the repo-wide staging rule): no explode, no
    shuffle, no Python, so the operator rides the same scan as validation
    at any corpus size.

    media_frac uses the engine-portable nudge-then-floor 1e-6 snap
    (``round()`` has engine-divergent decimal-tie semantics).
    """
    staged = docs.withColumn(
        "__kinds", F.transform(F.col(spans_col), lambda x: x["kind"])
    )
    n = F.size("__kinds")
    n_media = F.size(F.filter(F.col("__kinds"), lambda k: k == F.lit("media")))
    changes = F.size(
        F.filter(
            _kind_transitions(F.col("__kinds")),
            lambda p: p["from_kind"] != p["to_kind"],
        )
    )
    n_runs = F.when(n == 0, F.lit(0)).otherwise(changes + 1)
    media_frac = F.when(
        n > 0,
        F.floor(n_media.cast("double") / n.cast("double") * F.lit(1e6) + F.lit(1e-6))
        / F.lit(1e6),
    )
    return staged.select(
        "doc_id",
        n.cast("bigint").alias("n_spans"),
        (n - n_media).cast("bigint").alias("n_text"),
        n_media.cast("bigint").alias("n_media"),
        n_runs.cast("bigint").alias("n_runs"),
        media_frac.alias("media_frac"),
    )


def span_transition_matrix(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Corpus-level (from_kind, to_kind, cnt) counts of adjacent span-kind
    pairs — the transition table behind interleaving drift checks (a corpus
    whose text→media rate shifts between snapshots changed its layout even
    if per-kind totals held, which PSI on kind frequencies cannot see).

    Plan: per-doc transition pairs are built row-locally (zip_with shifted
    views — no per-doc window, no posexplode of raw spans), then ONE
    explode feeds ONE map-side-combining groupBy whose output is bounded by
    |kinds|² rows regardless of corpus size."""
    staged = docs.select(
        _kind_transitions(
            F.transform(F.col(spans_col), lambda x: x["kind"])
        ).alias("__trans")
    )
    return (
        staged.select(F.explode("__trans").alias("p"))
        .groupBy(
            F.col("p.from_kind").alias("from_kind"),
            F.col("p.to_kind").alias("to_kind"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def interleaved_token_set(spans_col, *, shingle_n: int = 3) -> Column:
    """Distinct MULTIMODAL token set of an interleaved span sequence: every
    text span contributes its word ``shingle_n``-gram shingles (prefixed
    ``t:``), every media span contributes its reference (prefixed ``m:``) —
    the set a MinHash/LSH near-dup pass should hash when "the same document"
    means same prose AND same attached media, not just same flat text (two
    docs with identical captions around different images are different
    training examples; flat-text dedup collapses them).

    The prefixes keep the two modalities from colliding in hash space; the
    whole construction is row-local (transform → flatten → array_distinct,
    shingles via the zip_with shifted-view single pass) so it rides the scan
    with no explode, no shuffle, no Python. Feed the result to
    ``dedup.minhash_fold`` + ``dedup.lsh_candidate_pairs`` for the bucketed
    scale path. NULL/empty text spans and NULL media refs contribute
    nothing.
    """
    from jsonschema_spark.operators.dedup import shingles

    col = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    empty = F.array().cast("array<string>")
    per_span = F.transform(
        col,
        lambda x: F.when(
            (x["kind"] == F.lit("text")) & (F.length(F.trim(x["text"])) > 0),
            F.transform(
                shingles(x["text"], shingle_n), lambda s: F.concat(F.lit("t:"), s)
            ),
        )
        .when(
            (x["kind"] == F.lit("media")) & x["media_ref"].isNotNull(),
            F.array(F.concat(F.lit("m:"), x["media_ref"])),
        )
        .otherwise(empty),
    )
    return F.array_distinct(F.flatten(per_span))


def canonicalize_spans(
    docs: DataFrame,
    *,
    spans_col: str = "spans",
    joiner: str = " ",
) -> DataFrame:
    """Canonical interleaved layout: merge maximal runs of adjacent text
    spans, keep media spans atomic, rebuild offsets as the linearized
    character position.

    Interleaved docs accumulate fragmentation upstream (HTML extraction
    emits one text span per DOM node; OCR emits one per line): 40 adjacent
    text spans around one image is the same TRAINING example as one merged
    span, but it defeats span-count drift baselines, inflates packing cost
    models, and makes span-sequence equality vs a cleanly-extracted
    reference fail spuriously. Canonicalization is the fix the rest of the
    suite assumes: after it, two extractions of the same document agree
    span-for-span.

    Rules: adjacent ``kind='text'`` spans merge into one span whose text is
    the run's texts joined by `joiner`; ``media`` spans never merge (two
    identical images side by side are two images); offsets are rebuilt as
    the running linearized cost — a text span costs ``length(text)+1``
    (payload + separator), a media span costs 1 (one placeholder token) —
    so offset is where the span starts if you rendered the doc as one
    stream. First span is at offset 0.

    Entirely row-local — no explode, no shuffle, no Python. Every
    intermediate array (kinds/texts/refs, head indices, merged runs, costs)
    is STAGED as its own column before the lambda that consumes it: HOF
    lambda bodies get no CSE, so the inline form re-evaluates the whole
    upstream tree per element per fold step (the `costs`-inside-`merged`-
    inside-offset-fold nesting measured 20× slower than everything else in
    the bench before staging — the multiplicative re-evaluation trap
    documented at operators/repetition.py:54). CollapseProject keeps
    non-cheap aliases referenced more than once, so the staging survives
    optimization. Offsets are a single running-sum fold (O(S) passes;
    per-step array append keeps it O(S²) worst-case on S = spans-per-doc,
    which is bounded by document structure, not corpus size).

    Returns the input frame with `spans_col` replaced by the canonical
    array (same span struct shape: kind, text, media_ref, offset:int);
    all other columns pass through.
    """
    col = F.col(spans_col)
    tmp = [f"__cs_{x}" for x in ("k", "t", "r", "h", "m", "c")]
    k_c, t_c, r_c, h_c, m_c, c_c = tmp
    st = (
        docs.withColumn(k_c, F.transform(col, lambda s: s["kind"]))
        .withColumn(t_c, F.transform(col, lambda s: F.coalesce(s["text"], F.lit(""))))
        .withColumn(r_c, F.transform(col, lambda s: s["media_ref"]))
    )
    kinds, texts, refs = F.col(k_c), F.col(t_c), F.col(r_c)
    n = F.size(kinds)

    # 1-based head indices: a span starts a canonical run iff it is media,
    # first, or follows a non-text span (only text merges).
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    st = st.withColumn(
        h_c,
        F.filter(
            idx,
            lambda i: (F.element_at(kinds, i) == F.lit("media"))
            | (i == F.lit(1))
            | (F.element_at(kinds, i - 1) != F.lit("text")),
        ),
    )

    def _run_len(i):
        # distance from head i to the next non-text span (kinds are binary
        # here; array_position finds the first 'media' after i).
        nxt = F.array_position(
            F.slice(kinds, i + 1, F.greatest(n - i, F.lit(0))), "media"
        )
        return F.when(nxt == 0, n - i + 1).otherwise(nxt)

    st = st.withColumn(
        m_c,
        F.transform(
            F.col(h_c),
            lambda i: F.when(
                F.element_at(kinds, i) == F.lit("media"),
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.element_at(refs, i).alias("media_ref"),
                ),
            ).otherwise(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.array_join(
                        F.slice(texts, i, _run_len(i).cast("int")), joiner
                    ).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                )
            ),
        ),
    )
    st = st.withColumn(
        c_c,
        F.transform(
            F.col(m_c),
            lambda m: F.when(m["kind"] == "media", F.lit(1)).otherwise(
                F.length(m["text"]) + F.lit(1)
            ),
        ),
    )
    # offsets: one running-sum fold over the staged costs — acc carries
    # (offsets-so-far, running total); offset of span j is the total of
    # costs[0..j-1].
    offsets = F.aggregate(
        F.col(c_c),
        F.struct(
            F.array().cast("array<int>").alias("a"), F.lit(0).alias("s")
        ),
        lambda acc, c: F.struct(
            F.concat(acc["a"], F.array(acc["s"].cast("int"))).alias("a"),
            (acc["s"] + c).alias("s"),
        ),
        lambda acc: acc["a"],
    )
    with_offsets = F.zip_with(
        F.col(m_c),
        offsets,
        lambda m, o: F.struct(
            m["kind"].alias("kind"),
            m["text"].alias("text"),
            m["media_ref"].alias("media_ref"),
            o.alias("offset"),
        ),
    )
    return st.withColumn(spans_col, with_offsets).drop(*tmp)


def media_context_pairs(
    docs: DataFrame, *, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, media_ref, pos, text_before, text_after) — one row per media
    span, paired with the nearest NON-NULL text span on each side.

    This is the interleaved-docs operation multimodal pipelines are built
    on (MMC4/OBELICS-style image-text pairing): an image's training caption
    is the prose around it in document order, which only the interleaved
    layout preserves — a flat (images, text) table can't reconstruct it.
    `pos` is the 1-based span index so downstream joins can recover layout.

    Row-local construction: staged kinds/context arrays (HOF lambda bodies
    get no CSE — see canonicalize_spans), per-media lookup via
    filter-first-non-null over prefix/suffix slices (O(S) per media span,
    S bounded by document structure), then ONE explode into the pair rows.
    Docs with no media spans emit nothing.
    """
    col = F.col(spans_col)
    st = (
        docs.withColumn("__mc_k", F.transform(col, lambda s: s["kind"]))
        .withColumn(
            "__mc_t",
            F.transform(
                col,
                lambda s: F.when(s["kind"] == F.lit("text"), s["text"]),
            ),
        )
        .withColumn("__mc_r", F.transform(col, lambda s: s["media_ref"]))
    )
    kinds, tk, refs = F.col("__mc_k"), F.col("__mc_t"), F.col("__mc_r")
    n = F.size(kinds)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    mpos = F.filter(idx, lambda i: F.element_at(kinds, i) == F.lit("media"))

    def _first_nonnull(arr):
        return F.get(F.filter(arr, lambda x: x.isNotNull()), 0)

    pairs = F.transform(
        mpos,
        lambda i: F.struct(
            F.element_at(refs, i).alias("media_ref"),
            i.alias("pos"),
            _first_nonnull(F.reverse(F.slice(tk, 1, (i - 1).cast("int")))).alias(
                "text_before"
            ),
            _first_nonnull(
                F.slice(tk, i + 1, F.greatest(n - i, F.lit(0)).cast("int"))
            ).alias("text_after"),
        ),
    )
    return (
        st.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(
            id_col,
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.pos").alias("pos"),
            F.col("p.text_before").alias("text_before"),
            F.col("p.text_after").alias("text_after"),
        )
    )


def media_ref_stats(
    docs: DataFrame,
    *,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    max_docs: int = 10,
) -> DataFrame:
    """(media_ref, n_docs, n_occurrences, flagged) — corpus-wide media
    usage; `flagged` marks refs appearing in more than `max_docs` distinct
    documents (the OBELICS rule: an image recurring across many documents
    is a logo / banner / tracking pixel, not content — drop it from every
    doc rather than pairing it with captions).

    Scale shape: one explode of the (tiny) per-doc media-ref list, then a
    two-level exact aggregation — groupBy (ref, doc) with map-side partial
    counting, then groupBy ref — so the distinct-doc count never builds a
    per-ref set; both exchanges carry bare (ref, doc | ref) keys + counts.
    """
    col = F.col(spans_col)
    refs = F.filter(
        F.transform(
            col,
            lambda s: F.when(s["kind"] == F.lit("media"), s["media_ref"]),
        ),
        lambda x: x.isNotNull(),
    )
    per_doc = (
        docs.select(F.col(id_col).alias("__doc"), F.explode(refs).alias("media_ref"))
        .groupBy("media_ref", "__doc")
        .agg(F.count(F.lit(1)).alias("__occ"))
    )
    return (
        per_doc.groupBy("media_ref")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__occ").alias("n_occurrences"),
        )
        .withColumn("flagged", F.col("n_docs") > F.lit(int(max_docs)))
    )


def interleaved_doc_filter(
    docs: DataFrame,
    *,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    max_media: int = 30,
    max_media_frac: float = 0.5,
    min_text_chars: int = 200,
) -> DataFrame:
    """OBELICS-style document rules for interleaved corpora: per-doc signal
    columns plus a composite ``keep`` — (id, n_spans, n_media, text_chars,
    media_frac, r_too_many_media, r_media_heavy, r_too_little_text, keep).

    Interleaved curation needs layout rules the flat-text heuristics (C4/
    Gopher) can't express: a gallery page with 80 images and one caption,
    or a media-dominated doc with almost no prose, trains nothing useful —
    OBELICS bounds images per doc and the image/text balance before the
    quality pass. Every rule keeps its own column (same convention as
    gopher_quality) so per-rule ablations are a groupBy away.

    One narrow projection: the kind array and per-span text lengths are
    STAGED before the fold lambdas (repo-wide no-CSE rule), media_frac
    uses the engine-portable nudge-then-floor 1e-6 snap. No explode, no
    shuffle, no Python — rides the scan.
    """
    col = F.col(spans_col)
    st = docs.withColumn(
        "__if_k", F.transform(col, lambda x: x["kind"])
    ).withColumn(
        "__if_tl",
        F.transform(
            col,
            lambda x: F.when(
                x["kind"] == F.lit("text"), F.length(F.coalesce(x["text"], F.lit("")))
            ).otherwise(F.lit(0)),
        ),
    )
    n = F.size("__if_k")
    n_media = F.size(F.filter(F.col("__if_k"), lambda k: k == F.lit("media")))
    text_chars = F.aggregate(F.col("__if_tl"), F.lit(0), lambda a, x: a + x)
    media_frac = F.when(
        n > 0,
        F.floor(n_media.cast("double") / n.cast("double") * F.lit(1e6) + F.lit(1e-6))
        / F.lit(1e6),
    ).otherwise(F.lit(0.0))
    r_many = n_media > F.lit(int(max_media))
    r_heavy = media_frac > F.lit(float(max_media_frac))
    r_text = text_chars < F.lit(int(min_text_chars))
    return st.select(
        F.col(id_col),
        n.cast("bigint").alias("n_spans"),
        n_media.cast("bigint").alias("n_media"),
        text_chars.cast("bigint").alias("text_chars"),
        media_frac.alias("media_frac"),
        r_many.alias("r_too_many_media"),
        r_heavy.alias("r_media_heavy"),
        r_text.alias("r_too_little_text"),
        (~r_many & ~r_heavy & ~r_text).alias("keep"),
    )


def span_lang_consistency(
    docs: DataFrame, *, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc language mixture over the interleaved layout: (id,
    n_text_spans, n_lang_spans, n_langs, majority_lang, mixed) where each
    non-empty text span gets the stopword-argmax language prediction
    (text.lang_id's exact rule, applied per span) and `mixed` flags docs
    whose spans disagree — the doc-level lang-id hides exactly this (a
    half-English half-German page argmaxes to one of them and the mixture
    is gone, but span-level curation wants it surfaced or split).

    Tie rules are pinned cross-engine: per-span prediction breaks score
    ties by STOPWORDS declaration order (first declared wins — same as
    lang_id); the majority vote breaks count ties by lexicographically
    LARGEST language (struct-max semantics). 'und' spans (no stopword
    hits) count toward n_text_spans but never toward the vote.

    Row-local: per-span token arrays ride inside one transform, the vote
    is an O(L²) fold over the ≤|languages| distinct predictions. No
    explode, no shuffle, no Python.
    """
    from jsonschema_spark.operators.dedup import tokens
    from jsonschema_spark.operators.text import STOPWORDS

    col = F.col(spans_col)

    def _member(words):
        return lambda x: x.isin(*words)

    def _pred(text):
        toks = tokens(text)
        scores = {
            lang: F.size(F.filter(toks, _member(words)))
            for lang, words in STOPWORDS.items()
        }
        best = F.greatest(*scores.values())
        pred = F.lit("und")
        for lang in reversed(list(STOPWORDS)):
            pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
                pred
            )
        return pred

    st = docs.withColumn(
        "__slc_p",
        F.transform(
            F.filter(
                col,
                lambda x: (x["kind"] == F.lit("text"))
                & (F.length(F.trim(F.coalesce(x["text"], F.lit("")))) > 0),
            ),
            lambda x: _pred(x["text"]),
        ),
    )
    preds = F.col("__slc_p")
    voting = F.filter(preds, lambda p: p != F.lit("und"))
    st = st.withColumn("__slc_v", voting)
    voting = F.col("__slc_v")
    distinct = F.array_distinct(voting)
    counted = F.transform(
        distinct,
        lambda l: F.struct(
            F.size(F.filter(voting, lambda p: p == l)).alias("c"), l.alias("lang")
        ),
    )
    top = F.array_max(counted)
    return st.select(
        F.col(id_col),
        F.size(preds).cast("bigint").alias("n_text_spans"),
        F.size(voting).cast("bigint").alias("n_lang_spans"),
        F.size(distinct).cast("bigint").alias("n_langs"),
        F.when(F.size(voting) > 0, top["lang"]).alias("majority_lang"),
        (F.size(distinct) > 1).alias("mixed"),
    ).drop("__slc_p", "__slc_v")
