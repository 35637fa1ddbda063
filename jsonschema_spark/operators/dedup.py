"""Deduplication operators for training-data pipelines.

All hot paths are pure built-in expressions (JVM, codegen'd):

- exact: hash-groupBy on normalized text (map-side partial agg → minimal
  shuffle).
- n-gram Jaccard: token shingles via ``sequence`` + ``transform`` (no explode)
  with blocking keys to bound the candidate self-join.
- MinHash + LSH: k hash functions as md5(seed || shingle) minima (portable —
  the same family is expressible in any engine for oracles), banded into
  buckets; candidate pairs only within buckets — the scale path that avoids
  the O(n²) self-join entirely.
- SimHash: 64-bit sign-aggregated token hashes via xxhash64; hamming-near
  pairs bucket on band substrings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "exact_duplicate_groups",
    "shingles",
    "minhash_signature",
    "minhash_fold",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "md5_hash60",
    "simhash_near_pairs",
    "duplicate_clusters",
    "select_representatives",
    "dedup_corpus",
    "dedup_against",
    "window_hashes",
    "window_dup_stats",
    "substring_dedup",
    "winnow_fingerprints",
    "winnow_dup_stats",
]


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace — the dedup equivalence key."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_hash, cnt, min_id) for exact-duplicate groups (cnt > 1)."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("id").alias("keep_id"))
        .filter(F.col("cnt") > 1)
    )


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles of a text column — built by zipping
    n shifted copies of the token array (no explode, no shuffle).

    The naive ``transform(sequence(0, S-n), i -> concat_ws(slice(toks, i, n)))``
    is O(S·n) array copies and measured 7× slower; ``zip_with`` over shifted
    views is a single pass."""
    toks = tokens(col)
    if n <= 1:
        return F.array_distinct(toks)
    acc = toks
    for i in range(1, n):
        # zip_with pads the shorter (shifted) side with NULL; concat_ws skips
        # NULLs, so the trailing partial shingles are dropped by the slice
        shifted = F.slice(toks, i + 1, F.size(toks))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(acc, 1, F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.array_distinct(full)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Positional (non-distinct) word n-grams of a TOKEN-ARRAY column, via
    the same zip_with-over-shifted-views single pass as shingles(). Pass a
    STAGED attribute (not tokens(...) inline) — every reference to `toks`
    here evaluates the column expression once per row, so handing in a raw
    split(regexp(...)) would tokenize the text O(n) times. Docs shorter
    than n words yield an empty array."""
    if n <= 1:
        return toks
    acc = toks
    for i in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, i + 1, F.size(toks)), lambda a, b: F.concat_ws(" ", a, b)
        )
    full = F.slice(acc, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(F.size(toks) >= n, full).otherwise(F.array().cast("array<string>"))


def minhash_signature(df: DataFrame, id_col: str, text_col: str, *, k: int = 8, shingle_n: int = 3) -> DataFrame:
    """(id, sig: array<string> length k) MinHash signatures.

    Hash family: md5("seed:shingle") minima (portable — the same family is
    expressible in any engine for oracles). All k minima are folded in ONE
    traversal of the shingle array (aggregate + zip_with/least) so the
    shingle pipeline is evaluated once, not k times — measured 6× over the
    per-seed array_min form at k=8."""
    sh = shingles(F.col(text_col), shingle_n)
    return df.select(F.col(id_col).alias("id"), minhash_fold(sh, k).alias("sig"))


def minhash_fold(token_set: Column, k: int) -> Column:
    """MinHash signature (array<string> length k) of an ARBITRARY string-set
    column — the same md5("seed:token") single-traversal fold
    `minhash_signature` uses, factored out so non-text token universes
    (interleaved span sets, URL sets, feature bags) reuse the identical
    engine-portable hash family. An empty set folds to the k-sentinel
    signature (U+FFFF), which never collides with a real md5 band bucket."""
    zero = F.array(*[F.lit("￿") for _ in range(k)])
    return F.aggregate(
        token_set,
        zero,
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[F.md5(F.concat(F.lit(f"{s}:"), x)) for s in range(k)]),
            lambda a, b: F.least(a, b),
        ),
    )


def _band_buckets(sig_df: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bucket) — one row per (doc, band): the band's signature
    rows hashed into a bucket key. A single explode over a compile-time
    struct array; no shuffle."""
    return sig_df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    sig_df: DataFrame, *, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(id_a, id_b, est_jaccard) for pairs sharing ≥1 LSH band bucket.

    Scale path: the self-join is on (band, bucket) — only docs in the same
    bucket ever meet; bucket sizes are bounded by near-duplicate cluster
    sizes, not corpus size.

    Caching contract: the (large) signature relation is persisted only for
    the duration of this call — the (small, deduped) pair result is
    materialized eagerly into its own cache and the signatures are released
    before returning, so a long-lived session running many dedup batches
    does not accumulate cached signature relations. Callers may `unpersist()`
    the returned relation when done; if its cache is evicted it recomputes
    from the signature lineage. At warehouse scale you'd write signatures to
    a table and run matching as a second job — same two-phase shape.
    """
    # Signatures feed three plan branches (bucket explode + both join sides);
    # persist so the expensive text→shingle→minhash pipeline runs once.
    sig_df = sig_df.persist()

    buckets = _band_buckets(sig_df, bands, rows_per_band)

    # dedupe candidate pairs on bare ids FIRST (a pair sharing several bands
    # would otherwise be shuffled once per band, dragging both signatures
    # through the exchange), then re-attach signatures with two slim joins
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    pair_ids = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = pair_ids.join(
        sig_df.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(sig_df.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    est = F.aggregate(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size("sig_a")
    out = pairs.select("id_a", "id_b", est.alias("est_jaccard")).persist()
    out.count()  # materialize the small pair cache while signatures are hot
    sig_df.unpersist()  # release the big signature cache before returning
    return out


def containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    min_containment: float = 0.8,
) -> DataFrame:
    """(id_a, id_b, containment_a, containment_b) for candidate pairs:
    containment_a = |A∩B| / |A| over distinct token shingles (and
    symmetrically for B), keeping pairs where EITHER direction clears
    `min_containment`.

    The asymmetric near-dup signal Jaccard misses: a short document quoted
    wholesale inside a long one has Jaccard ≈ |A|/|B| (tiny) but
    containment_a ≈ 1. Like `ngram_jaccard_pairs`, this is a VERIFIER —
    candidates come from `lsh_candidate_pairs` (or any bare-id pair
    relation), so the shingle payloads join only to the candidate set and
    the corpus is never self-joined. Containments are rounded to 6 decimals
    BEFORE thresholding so row membership matches across engines."""
    sh = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh"))
    joined = (
        pairs.select("id_a", "id_b")
        .join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    ca = F.round(inter / F.size("sh_a"), 6)
    cb = F.round(inter / F.size("sh_b"), 6)
    return (
        joined.select(
            "id_a", "id_b", ca.alias("containment_a"), cb.alias("containment_b")
        )
        .filter(F.greatest("containment_a", "containment_b") >= min_containment)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    block_prefix_chars: int = 16,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs blocked by a text prefix key.

    Blocking bounds the self-join; at web scale prefer lsh_candidate_pairs
    (this operator is the exact verifier for LSH candidates).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
        F.substring(normalize_text(F.col(text_col)), 1, block_prefix_chars).alias("block"),
    )
    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "block")
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "block")
    pairs = a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter.cast("double") / union).alias("jaccard")
    return pairs.select("id_a", "id_b", jac).filter(F.col("jaccard") >= min_jaccard)


def md5_hash60(col: Column) -> Column:
    """Engine-portable 60-bit token hash: first 15 hex chars of md5 as an
    integer. Expressible in any engine with md5 (DuckDB:
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``) so SimHash built on it
    can be oracle-verified; xxhash64 stays the default fast path."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 64, hash_fn=None
) -> DataFrame:
    """(id, simhash: bigint) SimHash over tokens (bit votes).

    ``hash_fn`` maps a token Column to a BIGINT hash Column; default
    xxhash64 (fastest JVM path). Pass ``md5_hash60`` with ``bits=60`` for an
    engine-portable family a SQL oracle can recompute."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    toks = F.array_distinct(tokens(F.col(text_col)))

    # ONE traversal of the token array: fold a 64-slot vote vector
    # (zip_with over per-token bit signs) instead of 64 independent
    # aggregates, each of which would re-tokenize and re-hash the text
    hashed = F.transform(toks, lambda t: hash_fn(t))
    zero = F.expr(f"array_repeat(0, {bits})")
    votes = F.aggregate(
        hashed,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda i: F.when(F.bit_get(h, i) == 1, 1).otherwise(-1),
            ),
            lambda a, b: a + b,
        ),
    )
    # stage the vote vector ONCE, then reconstruct the bits in one SQL
    # expression: referencing the fold per bit would lean on runtime
    # subexpression reuse, and building 64 Columns costs ~300 py4j
    # round-trips of driver time per construction
    votes_df = df.select(F.col(id_col).alias("id"), votes.alias("__votes"))
    terms = " + ".join(
        f"(CASE WHEN element_at(__votes, {i + 1}) > 0 "
        f"THEN CAST({2**i if i < 63 else -(2**63)} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    )
    return votes_df.select("id", F.expr(terms).alias("simhash"))


def simhash_near_pairs(sim_df: DataFrame, *, band_bits: int = 16, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs: bucket on 16-bit bands (pigeonhole: ≤3 differing bits ⇒
    at least one of 4 bands identical), verify hamming distance ≤ max."""
    bands = [
        F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1)).alias(f"b{i}")
        for i in range(64 // band_bits)
    ]
    with_bands = sim_df.select("id", "simhash", *bands)
    pairs = None
    for i in range(64 // band_bits):
        a = with_bands.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), F.col(f"b{i}").alias("band"))
        b = with_bands.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), F.col(f"b{i}").alias("band"))
        p = a.join(b, "band").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "h_a", "h_b")
        pairs = p if pairs is None else pairs.unionAll(p)
    pairs = pairs.distinct()
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(F.col("hamming") <= max_hamming)


def _star_contract_components(edges: DataFrame, max_iters: int) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") → (id, cluster_id).

    Converges in O(log n) rounds regardless of component DIAMETER — the
    scale path for chain-shaped pair graphs where min-label propagation
    needs O(diameter) rounds. Each half-round is a groupBy(min) + an
    id-keyed join + distinct; no collect_list, so high-degree hub nodes
    never materialize their neighborhood in one task."""

    def _signature(e: DataFrame) -> tuple:
        # bit_xor: order-independent set signature that cannot overflow
        # under ANSI arithmetic (edges are distinct rows)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    # orient (a > b) and drop self-loops; `edges` arrives as (src, dst)
    cur = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = _signature(cur)
    for _ in range(max_iters):
        # large-star: every node u links its strictly-larger neighbors to
        # min(Γ(u) ∪ {u}) — symmetric neighborhoods
        sym = cur.select("a", "b").unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        m = F.least(F.col("a"), F.col("mn"))
        ls = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), m.alias("b"))  # (v, m): v > u ≥ m
            .distinct()
        )
        # small-star: under (a > b) orientation, node a links its smaller
        # neighbors (and itself) to m = min(Γ≤(a) ∪ {a}) = min(b's)
        mins2 = ls.groupBy("a").agg(F.min("b").alias("mn"))
        ss_self = mins2.select(F.col("a"), F.col("mn").alias("b"))
        ss_nb = (
            ls.join(mins2, "a")
            .filter(F.col("b") != F.col("mn"))
            .select(F.col("b").alias("a"), F.col("mn").alias("b"))
        )
        cur = (
            ss_self.unionByName(ss_nb)
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _signature(cur)
        if new_sig == sig:
            # fixed point: a star forest rooted at each component minimum
            roots = cur.select(F.col("b").alias("id"), F.col("b").alias("cluster_id"))
            leaves = cur.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
            return roots.unionByName(leaves).groupBy("id").agg(
                F.min("cluster_id").alias("cluster_id")
            )
        sig = new_sig
    raise RuntimeError(
        f"star contraction did not converge in {max_iters} rounds "
        "(expected O(log n)); raise max_iters"
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iters: int = 12,
    algorithm: str = "propagation",
) -> DataFrame:
    """Connected components over a candidate-pair edge list → (id, cluster_id)
    where cluster_id is the minimum doc id reachable from `id`.

    This is the step that turns pairwise near-dup evidence (LSH / SimHash /
    n-gram Jaccard pairs) into dedup GROUPS: keep min-id per cluster, drop
    the rest. Two algorithms:

    - ``propagation`` (default): min-label propagation — each round every
      node adopts the minimum label in its closed neighborhood; one shuffle
      per round (edges ⋈ labels on src, then groupBy id with a map-side
      partial min), no driver-side graph state. Converges in O(component
      diameter) rounds — near-dup graphs are unions of near-cliques (every
      LSH bucket contributes a clique), so the diameter is small in
      practice (2-4). Cheapest per round.
    - ``star``: alternating large-star/small-star contraction — O(log n)
      rounds regardless of diameter, for adversarially chain-shaped graphs.
      Heavier per round (two half-rounds, each groupBy + join + distinct).

    Both fail CLOSED with RuntimeError on non-convergence rather than
    returning partial clusters, and truncate lineage per round with
    `localCheckpoint` (the classic iterative-DataFrame trap: without it the
    plan doubles per iteration). At warehouse scale the loops run
    unchanged: all relations are id-keyed and bounded by
    #docs-that-appear-in-any-pair, AQE coalesces the shrinking per-round
    shuffles, and the iteration count depends on cluster shape, not corpus
    size.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if algorithm == "star":
        return _star_contract_components(edges, max_iters)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm {algorithm!r} (propagation|star)")
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iters):
            prop = sym.join(labels.withColumnRenamed("id", "src"), "src").select(
                F.col("dst").alias("id"), "label", F.lit(False).alias("__is_old")
            )
            # convergence detection rides the SAME groupBy as the label
            # update: the old label travels through the union tagged
            # __is_old, so `changed` needs no second join+shuffle per round
            # (labels are monotonically non-increasing, so changed ⇔
            # new < old). The follow-up count reads the checkpointed rows
            # with a limit-1 short-circuit — two jobs/round become one
            # shuffle job plus a cheap scan.
            new_labels = (
                prop.unionByName(labels.withColumn("__is_old", F.lit(True)))
                .groupBy("id")
                .agg(
                    F.min("label").alias("label"),
                    F.min(F.when(F.col("__is_old"), F.col("label"))).alias("__old"),
                )
                .withColumn("__changed", F.col("label") < F.col("__old"))
                .localCheckpoint(eager=True)
            )
            changed = new_labels.filter("__changed").limit(1).count()
            labels = new_labels.select("id", "label")
            if changed == 0:
                return labels.select("id", F.col("label").alias("cluster_id"))
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds; "
            "the pair graph has a component with diameter > max_iters "
            "(raise max_iters, or use algorithm='star' — O(log n) rounds)"
        )
    finally:
        sym.unpersist()


def select_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    *,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """(cluster_id, rep_id, size) — the member each duplicate cluster KEEPS,
    chosen by highest score with ties broken to the lowest id.

    Production pipelines keep the BEST version of a near-duplicate group
    (longest text, highest quality score), not the lowest-id one —
    `dedup_corpus`'s min-id rule is the deterministic default; this is the
    quality-aware alternative. `scores` is any (id, score) relation
    (`quality_features`, `perplexity`, `length(text)`), joined id-keyed so
    only (id, cluster, score) triples move — never payloads.

    Scale shape: one exchange on cluster_id; both window functions
    (row_number for the argmax, count for the size) share that partitioning
    and its sort, and cluster sizes are duplicate-group sizes — bounded and
    tiny relative to the corpus. Clusters only contain pair-involved ids,
    so the windowed relation is bounded by the duplicate count.
    """
    from pyspark.sql import Window

    scored = clusters.select(
        F.col(id_col).alias("__id"), F.col(cluster_col).alias("__cl")
    ).join(
        scores.select(F.col(id_col).alias("__id"), F.col(score_col).alias("__sc")),
        "__id",
    )
    w = Window.partitionBy("__cl")
    wr = w.orderBy(F.col("__sc").desc(), F.col("__id").asc())
    return (
        scored.select(
            "__cl",
            "__id",
            F.row_number().over(wr).alias("__rk"),
            F.count(F.lit(1)).over(w).alias("size"),
        )
        .filter(F.col("__rk") == 1)
        .select(
            F.col("__cl").alias(cluster_col),
            F.col("__id").alias("rep_id"),
            "size",
        )
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end corpus deduplication: the composition a training pipeline
    actually runs. Returns the RETAINED rows of ``df`` unchanged.

    1. exact pass — keep the min-id row per normalized-text group (cheap
       hash groupBy; removes the mass of byte-identical copies BEFORE the
       LSH machinery, so signature cost is paid only for distinct texts);
    2. near-dup pass — MinHash signatures → banded LSH candidate pairs
       (est_jaccard ≥ threshold) → connected components → keep the min-id
       representative of each cluster.

    Both drop-sets are id-only relations bounded by the duplicate count;
    the final filters are id-keyed semi/anti joins that never move text
    payloads through an exchange.
    """
    norm = df.select(
        F.col(id_col).alias("id"), F.md5(normalize_text(F.col(text_col))).alias("text_hash")
    )
    keep_exact = norm.groupBy("text_hash").agg(F.min("id").alias(id_col)).select(id_col)
    survivors = df.join(keep_exact, id_col, "left_semi")

    sig = minhash_signature(survivors, id_col, text_col, k=k, shingle_n=shingle_n)
    pairs = lsh_candidate_pairs(sig, bands=bands, rows_per_band=rows_per_band).filter(
        F.col("est_jaccard") >= jaccard_threshold
    )
    clusters = duplicate_clusters(pairs)
    drop_near = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return survivors.join(drop_near, id_col, "left_anti")


def dedup_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
    report: bool = False,
) -> DataFrame:
    """Incremental deduplication of a NEW batch against an EXISTING corpus —
    the step a continuously-crawling pipeline runs on every ingest: drop new
    documents that duplicate something already kept, never re-deduping the
    reference against itself.

    1. exact pass — md5(normalized text) of the new batch joined against the
       distinct reference hash set (16 B/row through the exchange; at scale
       the reference hash relation is a precomputed table, and a bloom
       filter built from it can pre-filter the scan);
    2. near pass — MinHash signatures on BOTH sides, banded LSH buckets,
       new×ref joined only within (band, bucket) — never new×new or ref×ref
       — candidate pairs deduped on bare ids before signatures are
       re-attached for the est_jaccard ≥ threshold verification.

    Reference signatures/hashes depend only on ``ref_df``: a production
    deployment computes them once per corpus snapshot and reuses them across
    every incoming batch (write ``minhash_signature(ref)`` to a table keyed
    by the snapshot id). Both joins are key-partitioned on (band, bucket) /
    text_hash, so the plan co-partitions rather than broadcasting when the
    reference corpus is large; Spark's AQE flips to broadcast automatically
    when the reference side is small.

    Returns the surviving rows of ``new_df`` unchanged, or with
    ``report=True`` a per-document verdict relation
    ``(id, status ∈ {kept, exact_dup, near_dup}, match_id)`` where
    ``match_id`` is the smallest matching reference id (NULL for kept).
    """
    norm = F.md5(normalize_text(F.col(text_col)))
    ref_hashes = (
        ref_df.select(norm.alias("text_hash"), F.col(id_col).alias("__rid"))
        .groupBy("text_hash")
        .agg(F.min("__rid").alias("match_id"))
    )
    new_hashed = new_df.select(F.col(id_col).alias("id"), norm.alias("text_hash"))
    # ref_hashes is distinct per hash, so this inner join emits ≤1 row per new id
    exact_hits = new_hashed.join(ref_hashes, "text_hash").select("id", "match_id")

    survivors = new_df.join(
        exact_hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )

    sig_new = minhash_signature(survivors, id_col, text_col, k=k, shingle_n=shingle_n).persist()
    sig_ref = minhash_signature(ref_df, id_col, text_col, k=k, shingle_n=shingle_n).persist()
    nb = _band_buckets(sig_new, bands, rows_per_band).select(
        F.col("id").alias("nid"), "band", "bucket"
    )
    rb = _band_buckets(sig_ref, bands, rows_per_band).select(
        F.col("id").alias("rid"), "band", "bucket"
    )
    # bare-id candidate dedup first (a pair sharing several bands would drag
    # both signatures through the exchange once per band otherwise)
    cand = nb.join(rb, ["band", "bucket"]).select("nid", "rid").distinct()
    scored = cand.join(
        sig_new.select(F.col("id").alias("nid"), F.col("sig").alias("sig_n")), "nid"
    ).join(sig_ref.select(F.col("id").alias("rid"), F.col("sig").alias("sig_r")), "rid")
    est = F.aggregate(
        F.zip_with(F.col("sig_n"), F.col("sig_r"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size("sig_n")
    near_hits = (
        scored.filter(est >= F.lit(jaccard_threshold))
        .groupBy("nid")
        .agg(F.min("rid").alias("match_id"))
        .select(F.col("nid").alias("id"), "match_id")
        .persist()
    )
    near_hits.count()  # materialize the small hit cache while signatures are hot
    sig_new.unpersist()
    sig_ref.unpersist()

    if not report:
        return survivors.join(
            near_hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )

    kept = (
        survivors.select(F.col(id_col).alias("id"))
        .join(near_hits.select("id"), "id", "left_anti")
        .select(
            "id",
            F.lit("kept").alias("status"),
            F.lit(None).cast(dict(exact_hits.dtypes)["match_id"]).alias("match_id"),
        )
    )
    return (
        exact_hits.select("id", F.lit("exact_dup").alias("status"), "match_id")
        .unionByName(near_hits.select("id", F.lit("near_dup").alias("status"), "match_id"))
        .unionByName(kept)
    )


def window_hashes(col: Column, k: int = 8) -> Column:
    """Distinct md5 hashes of every rolling k-token window of a text column.
    Windows come from ``word_ngrams``' zip_with-over-shifted-views single
    pass (the ``sequence`` + ``slice`` form is O(S·k) array copies — measured
    6× slower at k=8 on the documents table). Docs with fewer than k tokens
    produce an empty array. md5 keeps the family engine-portable so DuckDB
    oracles can replay it verbatim. NOTE: evaluates the tokenizer per
    word_ngrams reference — pass through `window_dup_stats` (which stages
    the token array) on anything bigger than a unit test."""
    return F.array_distinct(F.transform(word_ngrams(tokens(col), k), lambda g: F.md5(g)))


def window_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_docs: int = 2,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """ExactSubstr-style duplicated-window statistics per document (the
    token-window analogue of Lee et al.'s exact-substring dedup, at the
    granularity the repo's other dedup ops use: a window is duplicated when
    its hash occurs in >= `min_docs` DISTINCT documents).

    Returns (id, n_windows, n_dup, dup_frac, keep) for EVERY input doc —
    docs shorter than k tokens have zero windows, dup_frac 0.0, keep=true.

    Scale: the exchange carries (id, 16-byte window hash) pairs only — text
    payloads never shuffle. The corpus count is one map-side-combining
    groupBy on the hash; the per-doc rollup joins counts back on the hash
    key and aggregates (count, sum) in a second map-side-combining groupBy.
    No self-join, no pair materialization — per-doc output stays linear in
    corpus size no matter how hot a boilerplate window is (contrast a
    pair-producing design, which is quadratic in the hottest window)."""
    staged = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    grams = F.array_distinct(F.transform(word_ngrams(F.col("__toks"), k), lambda g: F.md5(g)))
    exploded = staged.select("id", grams.alias("__w")).select(
        "id", F.explode("__w").alias("wh")
    )
    counts = exploded.groupBy("wh").agg(F.countDistinct("id").alias("docs_with"))
    scored = (
        exploded.join(counts, "wh")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("docs_with") >= min_docs).cast("long")).alias("n_dup"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    frac = F.coalesce(F.col("n_dup"), F.lit(0)).cast("double") / F.greatest(
        F.coalesce(F.col("n_windows"), F.lit(0)), F.lit(1)
    )
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
        frac.alias("dup_frac"),
        (frac < max_dup_frac).alias("keep"),
    )


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicated-window REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"), at token-
    window granularity: a k-token rolling window whose hash occurs >=
    `min_count` times anywhere in the corpus is a duplicate; its FIRST
    occurrence in (id, pos) order is canonical and kept, every other
    occurrence is removed from the rebuilt text (a token goes iff ANY
    non-canonical duplicated window covers it).

    Returns (id, clean_text, n_tokens, n_removed) for EVERY input doc;
    docs shorter than k tokens pass through unchanged.

    Scale shape: the hash-keyed exchange carries (id, pos, 16-byte window
    hash) rows ONLY — the window rank (canonical = row_number 1 in
    (id, pos) order) and the occurrence count ride the same sort, so there
    is no counts-then-rejoin second exchange on the hash key. Flagged
    positions collapse to a bounded int array per doc (<= windows-per-doc)
    before the ONE payload exchange: the id-keyed join that re-attaches
    flags to the token arrays (broadcast when the flagged side is small,
    co-partitioned sort-merge otherwise). The rebuild is a row-local
    filter-with-index over the token array, O(tokens × flagged-windows)
    per row — fine while flagged windows per doc are sparse (the normal
    case); a fully-duplicated pathological doc degrades to O(T²)
    row-locally without widening any exchange.

    Reference analogue: none (training-data pipeline extension, task spec).
    """
    staged = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    grams = F.transform(word_ngrams(F.col("__toks"), k), lambda g: F.md5(g))
    occ = staged.select("id", F.posexplode(grams).alias("pos0", "wh")).select(
        "id", (F.col("pos0") + 1).alias("pos"), "wh"
    )
    wo = Window.partitionBy("wh").orderBy("id", "pos")
    wa = Window.partitionBy("wh")
    flagged = (
        occ.withColumn("__rn", F.row_number().over(wo))
        .withColumn("__cnt", F.count(F.lit(1)).over(wa))
        .where((F.col("__cnt") >= min_count) & (F.col("__rn") > 1))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__fp"))
    )
    rebuilt = staged.join(flagged, "id", "left").withColumn(
        "__fp", F.coalesce(F.col("__fp"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__fp"), lambda p: (p >= i + 2 - F.lit(k)) & (p <= i + 1)
        ),
    )
    return rebuilt.select(
        "id",
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every k-token gram, then keep the minimum hash of each w-gram
    sliding window — the deterministic local-minima subset that GUARANTEES
    any shared token run of length >= w+k-1 leaves at least one common
    fingerprint, while shrinking the per-doc fingerprint set ~w/2× versus
    shipping every gram (the scale lever: the corpus-matching exchange
    carries the winnowed subset, not all grams).

    Returns the exploded (id, fp) relation, fp = md5 hex (lexicographic
    rolling min — portable, oracle-replayable). Built row-locally in ONE
    projection: gram hashes via the zip_with single pass, the rolling min
    via w-1 chained zip_with/least folds over shifted views (least skips
    the NULL padding, and the final slice keeps full windows only). Docs
    with fewer than k+w-1 tokens produce no fingerprints."""
    staged = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    hashes = F.transform(word_ngrams(F.col("__toks"), k), lambda g: F.md5(g))
    staged = staged.select("id", hashes.alias("__h"))
    acc = F.col("__h")
    for i in range(1, w):
        acc = F.zip_with(
            acc, F.slice(F.col("__h"), i + 1, F.size("__h")), lambda a, b: F.least(a, b)
        )
    fps = F.array_distinct(
        F.slice(acc, 1, F.greatest(F.size("__h") - (w - 1), F.lit(0)))
    )
    return staged.select("id", F.explode(fps).alias("fp"))


def winnow_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    w: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc duplicated-fingerprint stats over the winnowed set:
    (id, n_fps, n_shared) where n_shared counts this doc's fingerprints
    that occur in >= `min_docs` distinct docs. Same linear two-groupBy
    shape as `window_dup_stats`, but the exchange carries the winnowed
    subset (~2/(w+1) of all grams) — the guarantee above says no shared
    run of >= w+k-1 tokens is missed by the thinning."""
    exploded = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    counts = exploded.groupBy("fp").agg(F.countDistinct("id").alias("docs_with"))
    scored = (
        exploded.join(counts, "fp")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum((F.col("docs_with") >= min_docs).cast("long")).alias("n_shared"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("n_fps"), F.lit(0)).cast("long").alias("n_fps"),
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
    )
