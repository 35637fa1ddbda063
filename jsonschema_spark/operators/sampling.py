"""Deterministic hash-based sampling and splitting for training pipelines.

Every operator keys on a uniform [0,1) fraction derived from md5 of the row
key — no RNG state, so assignments are reproducible across runs, engines
(oracle-expressible in any SQL engine with md5), cluster sizes, and input
partitionings, and a document keeps its split when the corpus around it
changes (the property `df.sample()` / `rand()` cannot give). All hot paths
are pure narrow projections/filters: zero shuffle, trivially scale-safe.

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_fraction",
    "hash_split",
    "leakage_safe_split",
    "split_thresholds",
    "stratified_sample",
    "deterministic_sample_n",
    "shard_order",
    "quantile_buckets",
    "bucket_by_thresholds",
    "group_quota",
    "mixture_sample",
    "temperature_sample",
    "weighted_sample_topk",
]


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0,1) from the first 60 bits of md5(salt || key).

    60 bits (15 hex digits) keeps the integer exactly representable in a
    double in every engine; distinct salts give independent fractions for
    layered decisions (split vs. subsample) on the same key."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / float(1 << 60)


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    *,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (e.g. train/val/test) by hash range.

    `fractions` must sum to 1 (±1e-9); assignment is by cumulative
    thresholds over hash_fraction(key), so splits are disjoint, exhaustive,
    and stable under corpus growth. Pure projection — no shuffle, no RNG.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    frac = hash_fraction(F.col(key), salt)
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        expr = (F.when if expr is None else expr.when)(frac < F.lit(cum), F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, float]]:
    """(name, cumulative-threshold) pairs in declaration order — exposed so
    oracles/other engines compare against the EXACT same doubles (0.8 + 0.1
    is not the literal 0.9 in IEEE arithmetic)."""
    out: list[tuple[str, float]] = []
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, cum))
    out.append((names[-1], 1.0))
    return out


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fraction: float | dict[str, float],
    *,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    A float applies one rate everywhere; a dict maps stratum value → rate
    (strata not in the dict are dropped). Rates are inlined as a literal
    CASE — the strata domain is schema-level metadata (languages, sources),
    never corpus-scale, so no join is needed and the filter stays a narrow
    codegen'd predicate the scan can evaluate."""
    frac = hash_fraction(F.col(key), salt)
    if isinstance(fraction, dict):
        rate = None
        for val, r in fraction.items():
            branch = F.when(F.col(strata_col) == F.lit(val), F.lit(float(r)))
            rate = branch if rate is None else rate.when(
                F.col(strata_col) == F.lit(val), F.lit(float(r))
            )
        rate = rate.otherwise(F.lit(0.0))
    else:
        rate = F.lit(float(fraction))
    return df.filter(frac < rate)


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws u = hash_fraction(key, salt) and scores ln(u) / w; the k
    highest-scoring rows are the sample, which is exactly a sequential
    weighted draw-without-replacement (the exponential-race construction —
    Efraimidis & Spirakis 2006). Rows with NULL or non-positive weight are
    excluded. Output: (key, weight_col), deterministic across runs, engines,
    and partitionings.

    Physically a TakeOrdered (per-partition top-k + merge of k·P
    candidates), never a global sort; the score is a narrow projection the
    scan evaluates. The score column is NOT emitted: ln() is libm-bound and
    engines may disagree in the last ulp, but the ORDERING is stable because
    md5-derived scores are ~uniformly spaced many orders of magnitude wider
    than 1-ulp noise; exact ties break on the key."""
    w = F.col(weight_col).cast("double")
    score = F.log(hash_fraction(F.col(key), salt)) / w
    return (
        df.filter(w > 0)
        .select(F.col(key), F.col(weight_col), score.alias("__score"))
        .orderBy(F.desc("__score"), key)
        .limit(int(k))
        .drop("__score")
    )


def deterministic_sample_n(df: DataFrame, key: str, n: int, *, salt: str = "") -> DataFrame:
    """Exactly-n deterministic sample: the n rows with the smallest hash
    fractions (ties broken by key). Physically a TakeOrdered (per-partition
    top-n + driver merge of n·P candidates), not a global sort — fine for
    n up to millions; for larger n use hash_split/stratified_sample."""
    return (
        df.withColumn("__hf", hash_fraction(F.col(key), salt))
        .orderBy("__hf", key)
        .limit(n)
        .drop("__hf")
    )


def shard_order(
    df: DataFrame,
    key: str,
    *,
    n_shards: int,
    salt: str = "shard",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training output: every row gets a
    shard in [0, n_shards) and a position within its shard, both derived
    ONLY from md5(salt || key) — so the training order is reproducible
    across runs, engines, cluster sizes, and input partitionings, and can
    be re-derived for any row without re-running the job (the property
    `orderBy(rand())` cannot give). Writing the result partitioned by
    `shard` and sorted by `pos` yields the shuffled corpus the trainer
    streams shard-by-shard.

    Shard = 60-bit md5 integer mod n_shards (exact integer arithmetic, no
    doubles); position = row_number over (shard, ordered by the full md5
    hex — lowercase-hex string order is engine-portable — with the key as
    tiebreak for md5-collision determinism). Scale shape: one exchange on
    shard; each shard sorts corpus/n_shards rows, which is the inherent
    cost of materializing an explicit order — pick n_shards so a shard fits
    the executor sort budget (10^12 docs / 10^5 shards = 10^7 rows/shard).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    staged = df.withColumn("__h", h).withColumn(
        shard_col,
        F.pmod(F.conv(F.substring(F.col("__h"), 1, 15), 16, 10).cast("bigint"), F.lit(n_shards)),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(key))
    return staged.withColumn(pos_col, F.row_number().over(w)).drop("__h")


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    by: str,
    *,
    n_buckets: int = 3,
    labels: list[str] | None = None,
    id_col: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact per-group quantile bucketing (CCNet head/middle/tail): rank
    rows within each `by` group by `value_col` and cut into `n_buckets`
    equal-count buckets via ntile. CCNet buckets crawl docs into perplexity
    terciles per language and trains/filters per bucket; this is that cut.

    Ties are broken by `id_col` (pass it — without a unique tiebreaker the
    within-group order of equal values is engine-dependent and the cut
    points land differently). Standard SQL ntile semantics: bucket sizes
    differ by at most 1, larger buckets first — identical in Spark/DuckDB/
    Trino, so the whole operator is oracle-expressible.

    Scale note: one exchange hash-partitioned on the group key plus a
    per-group sort. Groups here are schema-level strata (languages,
    sources) whose per-group row counts at 100 TB exceed a partition, so
    for production-scale corpora use `bucket_by_thresholds` (aggregate
    approximate cut points, broadcast them back — no global sort); this
    exact form is the verifier and the small-strata path.
    """
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(f"need exactly {n_buckets} labels, got {len(labels)}")
    from pyspark.sql.window import Window

    order = [F.col(value_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    tile = F.ntile(n_buckets).over(Window.partitionBy(by).orderBy(*order))
    if labels is not None:
        bucket = F.element_at(F.array(*[F.lit(s) for s in labels]), tile)
    else:
        bucket = tile
    return df.withColumn(bucket_col, bucket)


def bucket_by_thresholds(
    df: DataFrame,
    value_col: str,
    by: str,
    *,
    n_buckets: int = 3,
    labels: list[str] | None = None,
    accuracy: int = 10000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Scale path for quantile_buckets: per-group approximate cut points
    (one map-side-combining aggregation of GK sketches), broadcast back and
    compared in a narrow projection — no per-group sort, no row ever
    leaves its partition except the tiny sketch merge.

    Bucket sizes are approximate (within the sketch accuracy) and rows
    equal to a cut point all land in the lower bucket, so this is NOT
    row-identical to the exact ntile form on tied values — tests pin
    agreement on separated data and bounded skew on ties."""
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(f"need exactly {n_buckets} labels, got {len(labels)}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.groupBy(by).agg(
        F.percentile_approx(value_col, probs, accuracy).alias("__cuts")
    )
    joined = df.join(F.broadcast(cuts), by)
    # index of the first cut point >= value, else the last bucket
    tile = F.lit(n_buckets) - F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, c: acc + (F.col(value_col) <= c).cast("int"),
    )
    if labels is not None:
        bucket = F.element_at(F.array(*[F.lit(s) for s in labels]), tile)
    else:
        bucket = tile
    return joined.withColumn(bucket_col, bucket).drop("__cuts")


def group_quota(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: str,
    *,
    n: int,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-group quota sampling: keep the top-`n` rows of every group by
    (score DESC, id ASC — deterministic tiebreak). The curation step that
    caps hot domains / sources so no single origin dominates a training mix.

    Scale: exact top-n per group WITHOUT sorting whole groups on one task.
    Phase 1 splits each group into `salt_buckets` hash buckets of the id and
    ranks inside (group, bucket) — a group's global top-n rows each win
    their own bucket's top-n, so the survivor set (≤ n·salt_buckets per
    group, regardless of group size) provably contains the answer. Phase 2
    re-ranks the survivors per group. A billion-row hot domain costs two
    bounded window sorts instead of one 10^9-row sort on a single key; both
    exchanges carry (id, group, score) only."""
    w_id = F.col(id_col)
    bucket = F.pmod(F.xxhash64(w_id.cast("string")), F.lit(salt_buckets))
    slim = df.select(
        w_id.alias("id"),
        F.col(group_col).alias("grp"),
        F.col(score_col).alias("score"),
        bucket.alias("__b"),
    )
    from pyspark.sql import Window

    local = Window.partitionBy("grp", "__b").orderBy(F.desc("score"), F.asc("id"))
    survivors = (
        slim.withColumn("__r", F.row_number().over(local))
        .filter(F.col("__r") <= n)
        .drop("__r", "__b")
    )
    final = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("id"))
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= n)
        .select(
            "id",
            F.col("grp").alias(group_col),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    targets: dict[str, float],
    out_frac: float,
    *,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixture resampling (Pile/Dolma-style source
    mixing): keep a hash-selected subset sized ~`out_frac` of the corpus
    whose group proportions follow `targets` (renormalized over the groups
    present). Per group, the keep fraction is
    ``least(1, (t_g / Σt) · (out_frac · N_total) / n_g)`` — groups short of
    their quota keep everything they have (single-pass semantics: leftover
    quota is NOT redistributed; water-filling is a driver-side loop over the
    tiny per-group plan if a caller needs it). Groups absent from `targets`
    are dropped.

    Scale: group counts are ONE map-side-combining groupBy; the per-group
    plan (a few rows) broadcasts back onto the corpus, and membership is the
    same md5 hash-range rule as every sampler here — no RNG, no shuffle of
    payloads, stable under corpus growth of OTHER groups (a doc's fate
    changes only when its own group's count or target changes). The keep
    fractions are computed entirely in JVM double arithmetic (no Python
    float round-trip), so an external SQL engine replaying the same
    expression gets bit-identical thresholds; dyadic-rational targets make
    the Σt fold exact in any summation order."""
    t_map = F.create_map(
        *[l for k, v in sorted(targets.items()) for l in (F.lit(k), F.lit(float(v)))]
    )
    base = df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
    counts = (
        base.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_g"))
        .withColumn("t_g", F.coalesce(F.element_at(t_map, F.col("grp")), F.lit(0.0)))
    )
    tot = counts.agg(F.sum("n_g").alias("n_total"), F.sum("t_g").alias("t_sum"))
    plan = counts.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.least(
            F.lit(1.0),
            F.col("t_g")
            / F.col("t_sum")
            * (F.lit(float(out_frac)) * F.col("n_total"))
            / F.col("n_g"),
        ).alias("frac"),
    )
    kept = base.join(F.broadcast(plan), "grp").filter(
        hash_fraction(F.col("id"), salt) < F.col("frac")
    )
    return kept.select("id", "grp")


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    alpha: float = 0.5,
    out_frac: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture resampling (the mT5/UL2 multilingual
    recipe): target share of group g ∝ p_g^alpha, renormalized — alpha<1
    flattens the distribution (upweights tail groups), alpha=1 keeps natural
    proportions, alpha=0 is uniform-over-groups. Unlike `mixture_sample`,
    the targets come FROM the data, so no target dict is supplied.

    frac_g = least(1, (n_g^alpha / Σ_h n_h^alpha) · out_frac · N / n_g)
    (p_g^alpha renormalized equals n_g^alpha renormalized — the N^alpha
    factor cancels). Same scale shape as mixture_sample: one
    map-side-combining groupBy to the per-group plan, broadcast back, md5
    hash-range membership — no RNG, no payload shuffle, a doc's fate
    depends only on its own group's count.

    Cross-engine determinism: alpha=0.5 is evaluated as sqrt (correctly
    rounded in IEEE-754, bit-identical in every engine); other alphas go
    through pow, where engines may differ in the last ulp — with the md5
    fraction's 2^-60 granularity a membership flip needs a doc's hash
    within ~2^-53 of the threshold (probability ~1e-12 per million docs),
    the same documented tolerance as mixture_sample's non-dyadic case."""
    base = df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
    counts = base.groupBy("grp").agg(F.count(F.lit(1)).alias("n_g"))
    if alpha == 0.5:
        pw = F.sqrt(F.col("n_g").cast("double"))
    else:
        pw = F.pow(F.col("n_g").cast("double"), F.lit(float(alpha)))
    counts = counts.withColumn("t_g", pw)
    tot = counts.agg(F.sum("n_g").alias("n_total"), F.sum("t_g").alias("t_sum"))
    plan = counts.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.least(
            F.lit(1.0),
            F.col("t_g")
            / F.col("t_sum")
            * (F.lit(float(out_frac)) * F.col("n_total"))
            / F.col("n_g"),
        ).alias("frac"),
    )
    kept = base.join(F.broadcast(plan), "grp").filter(
        hash_fraction(F.col("id"), salt) < F.col("frac")
    )
    return kept.select("id", "grp")


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    cluster_id_col: str = "cluster_id",
    salt: str = "split",
    split_col: str = "split",
    key_col: str = "split_key",
) -> DataFrame:
    """Group-disjoint train/val/test: every member of a near-duplicate
    cluster gets the split of its CLUSTER id, so near-dups never straddle
    train and test — the eval-leakage failure mode a per-doc hash_split
    cannot prevent (a test doc whose near-copy sits in train leaks the
    answer; Lee et al. 2022 measure the inflation this causes).

    `clusters` is the (id, cluster_id) relation from
    ``dedup.duplicate_clusters`` (only docs that ARE in some duplicate
    cluster appear); docs absent from it key on their own id. The split
    key is exposed as `key_col` so downstream audits can verify
    group-coherence directly.

    Plan: one left join on the doc id (clusters carries two bare-id
    columns — key-partitioned at scale, broadcastable when the dup set is
    small) followed by the same pure-projection md5 hash-range assignment
    as hash_split: no RNG, no extra shuffle, membership stable under
    corpus growth.
    """
    cl = clusters.select(
        F.col("id").alias(id_col), F.col(cluster_id_col).alias("__lss_c")
    )
    keyed = (
        docs.join(cl, id_col, "left")
        .withColumn(
            key_col,
            F.coalesce(F.col("__lss_c").cast("string"), F.col(id_col).cast("string")),
        )
        .drop("__lss_c")
    )
    return hash_split(keyed, key_col, fractions, salt=salt, split_col=split_col)
