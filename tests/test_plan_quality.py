"""Physical-plan quality gates — the scale properties the engine claims must
be visible in `.explain` output, not just asserted in prose (100 TB design
rules: pruned scans, narrow validation, broadcast dims, zero per-row Python
outside the declared residue)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_validation_is_narrow_and_pruned(spark):
    """Constraint evaluation: one codegen stage, no Exchange, pruned scan."""
    from jsonschema_spark.queries import kw_numeric_lineitem

    df = kw_numeric_lineitem(spark, "/root/testdata/sf0.001")
    p = _plan(df)
    assert "Exchange" not in p, "validation projection must not shuffle"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    read = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_shipdate" not in read and "l_comment" not in read, f"scan not pruned: {read}"


def test_flagship_validation_no_shuffle_no_python(spark):
    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.synth import DOCS_SCHEMA, SynthConfig, make_docs

    docs, _, _ = make_docs(spark, SynthConfig(n_docs=50, seed=1))
    p = _plan(validate_dataframe(docs, DOCS_SCHEMA))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_referential_join_broadcasts_catalog(spark):
    from jsonschema_spark.queries import referential_events_suppliers

    p = _plan(referential_events_suppliers(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p[:500]


def test_variant_path_parses_once_and_stays_jvm(spark):
    from jsonschema_spark.queries import validate_props_json

    p = _plan(validate_props_json(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("parseJson") == 1, f"JSON parsed {p.count('parseJson')}x per row"


def test_variant_dynamic_object_keywords_stay_jvm(spark):
    """patternProperties / propertyNames / additionalProperties / min-max
    Properties over VariantType must ride the map<string,variant> key
    enumeration, not the Arrow UDF fallback."""
    from jsonschema_spark.queries import variant_dynamic_objects

    p = _plan(variant_dynamic_objects(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("parseJson") == 1, f"JSON parsed {p.count('parseJson')}x per row"


def test_content_lowering_stays_jvm_no_shuffle(spark):
    """Content-vocabulary decode-and-validate (base64 + JSON + contentSchema)
    must lower to try_to_binary/try_parse_json — no Python, no Exchange."""
    from jsonschema_spark.queries import content_validate_props

    p = _plan(content_validate_props(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_recursive_unroll_stays_narrow(spark):
    """$dynamicRef static unrolling compiles to one narrow projection."""
    from jsonschema_spark.queries import kw_recursive_tree_events

    p = _plan(kw_recursive_tree_events(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_predicate_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey")
    )
    p = _plan(df)
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_quantity" in pushed, f"filter not pushed: {pushed}"


def test_dedup_agg_has_partial_aggregation(spark):
    """Exact dedup groupBy must map-side combine (partial_ before Exchange)."""
    from jsonschema_spark.queries import dedup_exact_text_docs

    p = _plan(dedup_exact_text_docs(spark, "/root/testdata/sf0.001"))
    assert "partial_" in p, "no map-side partial aggregation"


def test_semdedup_assignment_is_projection_no_python(spark):
    """SemDeDup: centroid assignment must be a narrow projection over the
    compile-time centroid literal — no crossJoin row amplification against
    the centroid relation, no per-vector window sort, fully JVM-side."""
    from jsonschema_spark.queries import semantic_dedup_embeddings

    p = _plan(semantic_dedup_embeddings(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p, "assignment must not rank per-vector"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_ivf_assignment_no_row_amplification(spark):
    """IVF: corpus cell assignment must not crossJoin the centroid relation
    (n_cells× row amplification) — the only joins allowed are the cell-pruned
    candidate join and result assembly."""
    from jsonschema_spark.queries import ivf_topk_embeddings

    p = _plan(ivf_topk_embeddings(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_span_mismatch_join_exchanges_digests_not_arrays(spark):
    """Span-sequence equality: the doc_id comparison join must exchange
    64-bit digests, never the span payload arrays (the arrays dominate the
    exchange at media-heavy scale)."""
    from jsonschema_spark.operators.spans import span_sequence_mismatches
    from jsonschema_spark.synth import SynthConfig, make_docs

    import re

    docs, ref, _ = make_docs(spark, SynthConfig(n_docs=200, seed=7))
    qe = span_sequence_mismatches(docs, ref)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = qe.explainString(mode)
    # every Exchange boundary's Input schema must be free of the spans array
    # (`(?<!_)spans#` so the n_spans count column doesn't false-positive)
    for section in re.split(r"\n\(\d+\) ", p):
        if section.startswith(("Exchange", "BroadcastExchange")):
            inputs = "".join(re.findall(r"Input \[\d+\]: \[[^\]]*\]", section))
            assert not re.search(r"(?<![_a-zA-Z])spans#", inputs), (
                f"span payload crosses an exchange: {section.splitlines()[0]}: {inputs}"
            )
    assert "xxhash64" in p, "digest comparison missing from the plan"


def test_lsh_verify_broadcasts_vectors(spark):
    """Embedding near-dup: candidate pairs carry bare ids through the only
    pair exchange; the unit-vector re-attach joins must broadcast the vector
    relation (pairs ⋈ payload via hash lookup) — a sort-merge there would
    shuffle vector payloads per pair."""
    from jsonschema_spark.queries import cosine_near_dup_lsh

    p = _plan(cosine_near_dup_lsh(spark, "/root/testdata/sf0.001"))
    assert "SortMergeJoin" not in p, "vector re-attach must not shuffle payloads"
    assert p.count("BroadcastHashJoin") >= 3  # band-bucket join + 2 re-attach joins


def test_perplexity_model_join_broadcasts(spark):
    """LM scoring: the vocabulary join must broadcast and the per-doc agg
    must combine map-side."""
    from jsonschema_spark.queries import perplexity_docs

    p = _plan(perplexity_docs(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "partial_" in p, "no map-side partial aggregation"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_clean_boilerplate_stays_jvm(spark):
    from jsonschema_spark.queries import clean_boilerplate_docs

    p = _plan(clean_boilerplate_docs(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_quality_model_scoring_broadcasts_weights_no_python(spark):
    """NB quality scorer: the weight-table join must broadcast (the hashing
    trick bounds the model; a shuffle join here would re-exchange every
    token row) and the whole train+score pipeline stays JVM-side."""
    from jsonschema_spark.queries import quality_model_docs

    p = _plan(quality_model_docs(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p, p[:800]
    assert "SortMergeJoin" not in p, "weights join must not sort-merge"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_kmeans_assignment_is_single_projection(spark):
    """k-means cell assignment: compile-time centroid literals, no join, no
    window, no Python — one narrow projection however many cells."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.simsearch import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    model = [(i, [0.01 * (i + j) for j in range(64)], 1.0) for i in range(8)]
    p = _plan(kmeans_assign(emb, model))
    assert "Join" not in p and "Exchange" not in p and "Window" not in p, p[:800]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_proto_prune_no_crossjoin_no_python(spark):
    """Prototypicality pruning: assignment is a literal-fold projection (no
    centroid join), the only exchange is the per-cell rank window."""
    from jsonschema_spark.queries import proto_prune_embeddings

    p = _plan(proto_prune_embeddings(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_auc_window_runs_on_bounded_histogram(spark):
    """Bucketed AUC: the global-order window must consume the aggregated
    histogram (post-groupBy), never the raw scored rows — visible as the
    Window sitting above a HashAggregate, with no Python anywhere."""
    from jsonschema_spark.queries import quality_auc_docs

    df = quality_auc_docs(spark, "/root/testdata/sf0.001")
    p = _plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    w = p.index("Window")
    assert "HashAggregate" in p[w:], "Window must sit on the bucket histogram"


def test_temperature_sample_broadcasts_plan_no_payload_shuffle(spark):
    from jsonschema_spark.queries import temperature_sample_docs

    p = _plan(temperature_sample_docs(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p, p[:500]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pack_stats_single_exchange_integer_arith(spark):
    """pack_stats: one shuffle (the shard groupBy) and everything after it
    operates on <= n_shards rows."""
    from jsonschema_spark.queries import pack_stats_docs

    p = _plan(pack_stats_docs(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # shard groupBy + the final single-row agg: at most 2 exchanges
    assert p.count("Exchange") <= 3, f"too many exchanges:\n{p[:800]}"


def test_encoding_quality_is_pure_projection(spark):
    from jsonschema_spark.queries import encoding_quality_docs

    p = _plan(encoding_quality_docs(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in p, "encoding_quality must not shuffle"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_robust_outliers_single_scan_histogram_no_python(spark):
    """Everything past the one long-form histogram scan must run over the
    bounded distinct-value relation: tiny stats relations broadcast-join
    back (never SMJ), no Python, and the final plan reads the persisted
    histogram (InMemoryTableScan), not the parquet table again."""
    from jsonschema_spark.queries import outliers_robust_lineitem

    df = outliers_robust_lineitem(spark, "/root/testdata/sf0.001")
    p = _plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "SortMergeJoin" not in p, "stats relations must broadcast, not SMJ"
    assert "InMemoryTableScan" in p or "Scan parquet" not in p


def test_leakage_split_assignment_is_projection_after_one_join(spark):
    """Past the cluster computation, the split itself must add NO shuffle:
    keying + hash-range assignment are a projection on top of the id join."""
    from jsonschema_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame([(1, 1), (2, 1)], "id long, cluster_id long")
    out = leakage_safe_split(docs, clusters, {"train": 0.9, "test": 0.1})
    p = _plan(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # exactly the join's exchanges; the split adds none (projection only)
    joined = docs.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    )
    assert p.count("Exchange") <= _plan(joined).count("Exchange")


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The bucketized range join must plan as an equi-join on block id —
    never BroadcastNestedLoopJoin or CartesianProduct (the big-big trap
    the operator exists to avoid)."""
    from jsonschema_spark.queries import range_window_stats_events

    p = _plan(range_window_stats_events(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, (
        p[:800]
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_weighted_sample_is_take_ordered_not_global_sort(spark):
    """A-ES top-k must be TakeOrdered (per-partition top-k + merge), never a
    full Exchange rangepartitioning + Sort."""
    from jsonschema_spark.queries import weighted_sample_docs

    p = _plan(weighted_sample_docs(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in p, p[:800]
    assert "rangepartitioning" not in p, "global sort leaked into the sample"


def test_key_candidates_single_aggregation_pass(spark):
    """Multi-column exact distinct must ride ONE Expand + aggregate — not
    one scan per column."""
    from jsonschema_spark.queries import key_candidates_orders

    p = _plan(key_candidates_orders(spark, "/root/testdata/sf0.001"))
    assert p.count("Scan parquet") <= 1, (
        "profiling re-scanned the table per column"
    )
    # one Expand; two exchanges is the canonical multi-distinct shape
    # (hash on the expanded distinct keys w/ partial dedup, then the final
    # single-partition merge of 13 counters) — anything more means a
    # per-column re-aggregation leaked in
    assert p.count("Expand") == 1 and p.count("Exchange") <= 2
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_triangle_census_no_payload_no_cartesian(spark):
    """Wedge enumeration and closing must be equi-joins on ids; never a
    cross product, never Python."""
    from jsonschema_spark.queries import triangles_copurchase_parts

    p = _plan(triangles_copurchase_parts(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_hll_build_is_one_aggregation_no_python(spark):
    from jsonschema_spark.operators.sketches import hll_build

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    p = _plan(hll_build(o, "o_custkey"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # one partial+final hash aggregate pair over ONE exchange
    assert p.count("Exchange") == 1, p[:800]
    # the exchange carries (reg, rho) ints only — never the key column
    seg = p.split("Exchange")[1].splitlines()[0]
    assert "o_custkey" not in seg


def test_cms_join_size_reads_sketches_not_tables_twice(spark):
    from jsonschema_spark.queries import cms_join_size_orders

    p = _plan(cms_join_size_orders(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p  # the single-row crossJoin lowers to BNLJ


def test_entity_blocking_joins_on_block_key(spark):
    from jsonschema_spark.operators.linkage import blocked_entity_matches

    df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    p = _plan(blocked_entity_matches(df, "p_name"))
    # candidate generation must key on bk — visible as a join whose keys
    # include the blocking column, with no nested-loop fallback
    assert "bk" in p and "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


class TestPartitionPruning:
    """The 100 TB layout story: date-partitioned parquet + predicates that
    reach the scan as PartitionFilters (static) and as a runtime DPP filter
    (join against a filtered dim). Written to .scratch once per session."""

    @staticmethod
    def _partitioned(spark):
        import os

        base = ".scratch/events_by_day"
        if not os.path.exists(base):
            ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            (
                ev.withColumn("day", F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(base)
            )
        return spark.read.parquet(base)

    def test_static_partition_pruning(self, spark):
        ev = self._partitioned(spark)
        days = sorted(r["day"] for r in ev.select("day").distinct().collect())
        target = days[len(days) // 2]
        p = (
            ev.where(F.col("day") == F.lit(target))
            .groupBy("event_type")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [" in p
        seg = p.split("PartitionFilters: [")[1].split("]")[0]
        assert "day" in seg, f"day predicate did not reach the scan: {seg}"

    def test_dynamic_partition_pruning_from_dim_join(self, spark):
        ev = self._partitioned(spark)
        days = sorted(r["day"] for r in ev.select("day").distinct().collect())
        dim = spark.createDataFrame(
            [(d, "keep" if i < 2 else "drop") for i, d in enumerate(days)],
            "day date, flag string",
        )
        joined = ev.join(dim.where(F.col("flag") == "keep"), "day").groupBy(
            "event_type"
        ).count()
        p = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in p.lower(), (
            "filtered dim join should induce runtime partition pruning"
        )


def test_kmv_prefilter_broadcasts_thresholds_no_python(spark):
    """KMV build: the approx-count threshold side must broadcast (the scan
    never shuffles raw rows before the filter), and the whole sketch stays
    JVM-side."""
    from jsonschema_spark.queries import kmv_daily_events

    p = _plan(kmv_daily_events(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p, p[:500]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_mmd_column_path_no_python_no_cartesian(spark):
    """MMD cells: generate → map-side-combined aggregation; the pair join
    runs on the tiny cell relation, never a cartesian over rows."""
    from jsonschema_spark.queries import mmd_drift_embeddings

    p = _plan(mmd_drift_embeddings(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_compaction_plan_single_sort_exchange_on_manifest(spark):
    """Compaction: one window sort per partition key over the manifest
    relation; integer DIV binning, no Python."""
    from jsonschema_spark.queries import compaction_plan_events

    p = _plan(compaction_plan_events(spark, "/root/testdata/sf0.001"))
    assert "Window" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_cdc_apply_broadcasts_touched_keys(spark):
    """CDC merge: the base table's anti-join against the touched-key set
    must broadcast the (tiny) key side — the base is never shuffled."""
    from jsonschema_spark.queries import cdc_apply_events

    p = _plan(cdc_apply_events(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p, p[:500]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_threshold_pick_windows_run_on_bounded_histogram(spark):
    """Operating-point sweep: the only Window sorts run over the ≤1024-row
    score histogram, never data; no Python."""
    from jsonschema_spark.queries import quality_threshold_docs

    p = _plan(quality_threshold_docs(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_kmv_overlap_reads_sketches_broadcast_only(spark):
    """Sketch-only overlap: the membership joins and estimate aggregation
    run over ≤k-row relations; no cartesian, no Python."""
    from jsonschema_spark.queries import kmv_overlap_keys

    p = _plan(kmv_overlap_keys(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_interval_union_single_exchange_on_key(spark):
    """Gaps-and-islands: both windows and the island groupBy share ONE
    hash partitioning on the key — exactly one exchange of interval rows
    (plus the tiny final summary exchange)."""
    from jsonschema_spark.queries import interval_coverage_events

    p = _plan(interval_coverage_events(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the two stacked Windows must not introduce separate exchanges
    assert p.count("Exchange hashpartitioning(user_id") <= 2, p[:800]


def test_kw_format_is_pure_projection_no_python(spark):
    """format (uuid/date/ipv4) lowers to rlike Columns: no Exchange, no
    Python, and the scan reads only the key column (everything else is
    derived)."""
    from jsonschema_spark.queries import kw_format_customer

    p = _plan(kw_format_customer(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in p, "format validation must not shuffle"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    read = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "c_name" not in read and "c_acctbal" not in read, f"scan not pruned: {read}"


def test_kw_array_keyword_queries_single_exchange(spark):
    """The spans-based keyword queries (prefixItems/maxItems, contains,
    unevaluatedItems) build docs with ONE groupBy on user_id; the keyword
    evaluation itself is a higher-order-function projection that must add
    no further exchange and no Python."""
    from jsonschema_spark.queries import (
        kw_contains_spans,
        kw_prefix_maxitems_spans,
        kw_unevaluated_items_spans,
    )

    for q in (kw_prefix_maxitems_spans, kw_contains_spans, kw_unevaluated_items_spans):
        p = _plan(q(spark, "/root/testdata/sf0.001"))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, q.__name__
        assert p.count("Exchange hashpartitioning(user_id") <= 1, (q.__name__, p[:800])


def test_kw_dependent_required_is_pure_projection(spark):
    from jsonschema_spark.queries import kw_dependent_required_events

    p = _plan(kw_dependent_required_events(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_violations_delta_joins_bare_keys_no_python(spark):
    """Snapshot diff: one full-outer join on the violation identity tuple —
    no cartesian, no Python, and no payload columns through the exchange
    (both sides project to the join key + a 1-literal presence marker)."""
    from jsonschema_spark.queries import violations_delta_docs

    p = _plan(violations_delta_docs(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "FullOuter" in p or "full_outer" in p.lower(), p[:600]
