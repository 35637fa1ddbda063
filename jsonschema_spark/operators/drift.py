"""Distribution-drift checks (north rule: KS on span-length, PSI on kind
frequencies).

Both are computed *distributively* — the only driver-side value is the final
scalar:

- KS: per-value (or per-bucket) counts → cumulative ECDFs via a window over
  the tiny aggregated relation → max |ΔECDF|. At 10^12 rows use ``n_buckets``
  so the windowed relation is bounded (the groupBy shuffles pre-aggregated
  partials only).
- PSI: two frequency vectors full-outer-joined on category with epsilon
  clipping, Σ (p−q)·ln(p/q).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_statistic", "psi", "chi2_statistic", "js_divergence", "wasserstein_1", "embedding_centroid_drift", "embedding_mmd_drift"]

_EPS = 1e-6


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    n_buckets: int | None = 1024,
    exact: bool = False,
) -> DataFrame:
    """One row: (ks:double).

    DEFAULT is the bucketed ECDF (n_buckets=1024): the windowed relation is
    bounded at n_buckets rows regardless of input size, so the single-task
    cumulative window is O(n_buckets) — the only mode that survives 10^12
    rows. Pass exact=True (small/known cardinality only) for the per-distinct-
    value ECDF, whose window funnels every distinct value through one task."""
    if exact:
        n_buckets = None
    d = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(value_col).cast("double").alias("v"), F.col(group_col).alias("g")
    ).filter(F.col("v").isNotNull())

    if n_buckets is not None:
        # bucketed ECDF: bounded-cardinality aggregate, scale-safe
        bounds = d.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        d = d.crossJoin(F.broadcast(bounds)).withColumn(
            "v",
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / n_buckets + 1e-300)),
            ).cast("double"),
        ).select("v", "g")

    per_value = d.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = per_value.select(
        (F.sum("ca").over(w)).alias("cum_a"),
        (F.sum("cb").over(w)).alias("cum_b"),
    )
    totals = per_value.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    return (
        ecdf.crossJoin(F.broadcast(totals))
        .select(F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")).alias("d"))
        .agg(F.max("d").alias("ks"))
    )


def psi(
    df: DataFrame,
    category_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row: (psi:double). Population Stability Index between two groups."""
    base = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(category_col).alias("cat"), F.col(group_col).alias("g")
    )
    freqs = base.groupBy("cat").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    totals = freqs.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    return (
        freqs.crossJoin(F.broadcast(totals))
        .select(
            F.greatest(F.col("ca") / F.col("na"), F.lit(_EPS)).alias("p"),
            F.greatest(F.col("cb") / F.col("nb"), F.lit(_EPS)).alias("q"),
        )
        .select(((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("term"))
        .agg(F.sum("term").alias("psi"))
    )


def _freqs(
    df: DataFrame, category_col: str, group_col: str, group_a: str, group_b: str
) -> DataFrame:
    """Per-category counts for the two groups — ONE map-side-combining
    groupBy; everything downstream operates on the tiny aggregated relation."""
    return (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .select(F.col(category_col).alias("cat"), F.col(group_col).alias("g"))
        .groupBy("cat")
        .agg(
            F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
        )
    )


def chi2_statistic(
    df: DataFrame,
    category_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row: (chi2:double, dof:long). Two-sample chi-square test of
    homogeneity over a categorical column (reference check family:
    kind-frequency drift, SURVEY §2.7) — complements PSI with a statistic
    whose null distribution is known, so a pipeline can alert on a p-value
    threshold instead of a rule-of-thumb PSI cut.

    chi2 = Σ_cells (observed − expected)² / expected over the 2×C table,
    expected_cell = row_total · col_total / N; dof = C − 1. Same shape as
    :func:`psi`: one partial-agg groupBy to a C-row relation, broadcast
    totals, scalar out — no scale hazard at any corpus size."""
    freqs = _freqs(df, category_col, group_col, group_a, group_b)
    totals = freqs.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    cells = freqs.crossJoin(F.broadcast(totals)).select(
        (F.col("ca") + F.col("cb")).alias("rt"),
        (F.col("na") + F.col("nb")).alias("n"),
        "ca",
        "cb",
        "na",
        "nb",
    )
    term = (
        F.pow(F.col("ca") - F.col("rt") * F.col("na") / F.col("n"), 2)
        / (F.col("rt") * F.col("na") / F.col("n"))
        + F.pow(F.col("cb") - F.col("rt") * F.col("nb") / F.col("n"), 2)
        / (F.col("rt") * F.col("nb") / F.col("n"))
    )
    return cells.agg(
        F.sum(term).alias("chi2"), (F.count(F.lit(1)) - F.lit(1)).alias("dof")
    )


def js_divergence(
    df: DataFrame,
    category_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row: (js:double). Jensen–Shannon divergence (natural log, so the
    bound is ln 2) between the two groups' categorical distributions.

    Symmetric and bounded where KL/PSI are unbounded under disjoint support,
    so it is the robust choice for alerting on kind-frequency drift between
    snapshots that may introduce brand-new categories. Epsilon-clipped like
    :func:`psi`; same single-groupBy plan."""
    freqs = _freqs(df, category_col, group_col, group_a, group_b)
    totals = freqs.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    pq = freqs.crossJoin(F.broadcast(totals)).select(
        F.greatest(F.col("ca") / F.col("na"), F.lit(_EPS)).alias("p"),
        F.greatest(F.col("cb") / F.col("nb"), F.lit(_EPS)).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = 0.5 * F.col("p") * F.log(F.col("p") / m) + 0.5 * F.col("q") * F.log(
        F.col("q") / m
    )
    return pq.agg(F.sum(term).alias("js"))


def wasserstein_1(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """One row: (w1:double). Bucketed 1-Wasserstein (earth-mover's) distance
    between two numeric distributions: W1 = ∫|CDF_a − CDF_b| ≈
    Σ_buckets |ΔECDF| · bucket_width.

    Where KS reports only the WORST CDF gap, W1 integrates the gap in the
    value's own units ("the span-length distribution moved by ~3 tokens on
    average") — the number a data-quality gate can threshold meaningfully.
    Same scale posture as the bucketed :func:`ks_statistic`: the windowed
    cumulative runs over an n_buckets-row aggregate, never the data."""
    d = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .select(F.col(value_col).cast("double").alias("v"), F.col(group_col).alias("g"))
        .filter(F.col("v").isNotNull())
    )
    bounds = d.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / n_buckets
    bucketed = (
        d.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("v") - F.col("lo")) / (width + 1e-300)),
            )
            .cast("double")
            .alias("v"),
            "g",
            width.alias("w"),
        )
    )
    per_value = bucketed.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
        F.first("w").alias("w"),
    )
    # The ECDF relation holds OCCUPIED buckets only; the CDF gap is constant
    # across the empty stretch that follows each one, so each step must be
    # weighted by its run length (lead(v) − v buckets), not by one bucket —
    # otherwise sparse distributions (integer-valued columns, heavy tails)
    # lose most of the integral. KS is immune (max over a constant stretch);
    # W1 is exactly the kind of statistic this silently corrupts. After the
    # last occupied bucket both CDFs are 1, so it contributes nothing.
    cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nxt = Window.orderBy("v")
    ecdf = per_value.select(
        F.sum("ca").over(cum).alias("cum_a"),
        F.sum("cb").over(cum).alias("cum_b"),
        (F.coalesce(F.lead("v").over(nxt), F.col("v")) - F.col("v")).alias("run"),
        "w",
    )
    totals = per_value.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    return (
        ecdf.crossJoin(F.broadcast(totals))
        .select(
            (
                F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb"))
                * F.col("run")
                * F.col("w")
            ).alias("term")
        )
        .agg(F.sum("term").alias("w1"))
    )


def embedding_centroid_drift(
    df: DataFrame, emb_col: str, cohort_col: str
) -> DataFrame:
    """Pairwise cohort centroid cosine — distribution drift in EMBEDDING
    space, which the scalar drift family (KS/PSI/JS/W1 over lengths and
    kinds) cannot see: a corpus whose topic mix shifts between sources or
    snapshots moves its mean vector long before any length histogram moves.
    Returns (cohort_a, cohort_b, n_a, n_b, centroid_cosine) for every
    unordered cohort pair; a cosine well under 1 flags the pair.

    Scale shape: one posexplode feeds a map-side-combining groupBy whose
    output is |cohorts|·d rows — the explode amplifies rows d× but the
    shuffle carries only the tiny (cohort, dim) sums. Mean vectors are
    reassembled as ORDERED arrays (array_sort on the dim index) so the
    final dot products are row-local left-to-right folds with identical
    evaluation order in every engine (same convention as the cosine
    near-dup family); elements cast to double BEFORE any arithmetic
    (float32 folds diverge from double-first oracles — repo-wide rule).
    The pair join runs over the |cohorts|-row centroid relation. Snapped
    1e-6 nudge-then-floor.
    """
    from jsonschema_spark.operators.simsearch import _dot

    ex = df.select(
        F.col(cohort_col).alias("cohort"),
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("i", "v"),
    )
    sums = ex.groupBy("cohort", "i").agg(
        F.sum("v").alias("s"), F.count("v").alias("c")
    )
    means = sums.groupBy("cohort").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "s", "c"))),
            lambda x: x["s"] / x["c"],
        ).alias("m"),
        F.max("c").alias("n"),
    )
    a = means.select(
        F.col("cohort").alias("cohort_a"), F.col("m").alias("ma"), F.col("n").alias("n_a")
    )
    b = means.select(
        F.col("cohort").alias("cohort_b"), F.col("m").alias("mb"), F.col("n").alias("n_b")
    )
    pairs = a.join(b, F.col("cohort_a") < F.col("cohort_b"))
    cos = _dot(F.col("ma"), F.col("mb")) / (
        F.sqrt(_dot(F.col("ma"), F.col("ma"))) * F.sqrt(_dot(F.col("mb"), F.col("mb")))
    )
    snapped = F.floor(cos * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)
    return pairs.select(
        "cohort_a", "cohort_b", "n_a", "n_b", snapped.alias("centroid_cosine")
    )


def embedding_mmd_drift(
    df: DataFrame, emb_col: str, cohort_col: str, *, method: str = "column"
) -> DataFrame:
    """Pairwise cohort MMD² under the degree-2 polynomial kernel
    k(x,y) = (x·y)² — SECOND-moment drift in embedding space. The kernel
    mean embedding of k is the second-moment matrix C = E[xxᵀ], so
    MMD²(A,B) = ‖C_A − C_B‖²_F exactly: it catches covariance/shape shift
    (a cohort that spreads, collapses, or rotates around an unmoved mean)
    that `embedding_centroid_drift`'s first moment cannot see, with no
    transcendental functions — every step is +/·, so the DuckDB oracle
    reproduces it to float precision and the usual 1e-6 nudge-then-floor
    snap closes the gap. Returns (cohort_a, cohort_b, n_a, n_b, mmd2) for
    every unordered cohort pair.

    Two physical strategies, one semantics (parity-tested):

    - method="column" (default): double posexplode → one map-side-
      combining groupBy. The generate stage amplifies rows d² per input
      row, but the exchange carries only |cohorts|·d² summed cells —
      right for moderate d where whole-stage codegen keeps the fold in
      the JVM.
    - method="arrow": `mapInPandas` folds each Arrow batch to its d×d
      partial Gram matrix with one BLAS syrk-shaped `X.T @ X` — the
      per-ROW d² amplification becomes per-BATCH, which is the 100 TB
      shape when d² row generation would dominate CPU. The exchange is
      identical (per-batch cells, map-side-combined).

    Elements are cast to double BEFORE any arithmetic (repo-wide rule:
    float32 folds diverge from double-first oracles).
    """
    src = df.where(
        F.col(cohort_col).isNotNull() & F.col(emb_col).isNotNull()
    ).select(
        F.col(cohort_col).alias("cohort"),
        F.col(emb_col).cast("array<double>").alias("e"),
    )
    if method == "column":
        e1 = src.select("cohort", "e", F.posexplode("e").alias("i", "vi"))
        e2 = e1.select("cohort", "i", "vi", F.posexplode("e").alias("j", "vj"))
        cells = e2.groupBy("cohort", "i", "j").agg(
            F.sum(F.col("vi") * F.col("vj")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    elif method == "arrow":
        cohort_type = src.schema["cohort"].dataType.simpleString()
        out_schema = (
            f"cohort {cohort_type}, i int, j int, s double, c bigint"
        )

        def fold(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                for cohort, grp in pdf.groupby("cohort", sort=False):
                    x = np.asarray(list(grp["e"]), dtype=np.float64)
                    gram = x.T @ x
                    d = gram.shape[0]
                    ii, jj = np.indices((d, d))
                    yield pd.DataFrame(
                        {
                            "cohort": cohort,
                            "i": ii.ravel().astype("int32"),
                            "j": jj.ravel().astype("int32"),
                            "s": gram.ravel(),
                            "c": np.int64(len(grp)),
                        }
                    )

        cells = (
            src.mapInPandas(fold, out_schema)
            .groupBy("cohort", "i", "j")
            .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
        )
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown method {method!r}")
    return _mmd_from_cells(cells)


def _mmd_from_cells(cells: DataFrame) -> DataFrame:
    m = F.col("s") / F.col("c")
    a = cells.select(
        F.col("cohort").alias("cohort_a"), "i", "j",
        m.alias("ma"), F.col("c").alias("ca"),
    )
    b = cells.select(
        F.col("cohort").alias("cohort_b"), "i", "j",
        m.alias("mb"), F.col("c").alias("cb"),
    )
    pairs = a.join(b, ["i", "j"]).where(F.col("cohort_a") < F.col("cohort_b"))
    agg = pairs.groupBy("cohort_a", "cohort_b").agg(
        F.max("ca").alias("n_a"),
        F.max("cb").alias("n_b"),
        F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))).alias("_m2"),
    )
    snapped = F.floor(F.col("_m2") * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(
        1000000.0
    )
    return agg.select("cohort_a", "cohort_b", "n_a", "n_b", snapped.alias("mmd2"))
