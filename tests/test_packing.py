"""Document packing (concat-then-chunk, sharded)."""

import pytest
from pyspark.sql import functions as F


def test_pack_semantics_single_shard(spark):
    """With one shard the stream chunks exactly: budget 10, docs of 4
    tokens each → starts 0,4,8,12,... → packs 0,0,0,1,1,2..."""
    from jsonschema_spark.operators.packing import pack_documents

    df = spark.createDataFrame([(i, 4) for i in range(8)], "doc_id: bigint, tokens: bigint")
    out = pack_documents(df, "doc_id", "tokens", budget=10, n_shards=1)
    got = {r["doc_id"]: (r["pack_id"], r["tok_offset"]) for r in out.collect()}
    assert got == {0: (0, 0), 1: (0, 4), 2: (0, 8), 3: (1, 2), 4: (1, 6),
                   5: (2, 0), 6: (2, 4), 7: (2, 8)}


def test_pack_stable_under_repartition(spark):
    """Assignment depends on data, not Spark task layout."""
    from jsonschema_spark.operators.packing import pack_documents

    df = spark.createDataFrame([(i, 3 + i % 5) for i in range(200)], "doc_id: bigint, tokens: bigint")
    a = {r["doc_id"]: (r["shard"], r["pack_id"], r["tok_offset"])
         for r in pack_documents(df, "doc_id", "tokens", budget=64, n_shards=4).collect()}
    b = {r["doc_id"]: (r["shard"], r["pack_id"], r["tok_offset"])
         for r in pack_documents(df.repartition(7), "doc_id", "tokens", budget=64, n_shards=4).collect()}
    assert a == b


def test_pack_rejects_bad_budget(spark):
    from jsonschema_spark.operators.packing import pack_documents

    df = spark.createDataFrame([(1, 1)], "doc_id: bigint, tokens: bigint")
    with pytest.raises(ValueError, match="positive"):
        pack_documents(df, "doc_id", "tokens", budget=0)


def test_pack_one_exchange_only(spark):
    """The only shuffle is the shard window exchange."""
    from jsonschema_spark.operators.packing import pack_documents

    df = spark.createDataFrame([(1, 1)], "doc_id: bigint, tokens: bigint")
    p = pack_documents(df, "doc_id", "tokens", budget=8)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pack_invariants_property(spark):
    """Property check over random corpora: offsets stay inside the budget,
    pack ids are dense per shard, and the running-sum reconstruction holds."""
    from hypothesis import given, settings, strategies as st

    from jsonschema_spark.operators.packing import pack_documents

    @settings(max_examples=10, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
        budget=st.integers(min_value=1, max_value=50),
    )
    def check(toks, budget):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(toks)], "doc_id: bigint, tokens: bigint"
        )
        rows = pack_documents(df, "doc_id", "tokens", budget=budget, n_shards=3).collect()
        assert len(rows) == len(toks)
        by_shard: dict = {}
        for r in rows:
            assert 0 <= r["tok_offset"] < budget
            by_shard.setdefault(r["shard"], []).append(r)
        for members in by_shard.values():
            members.sort(key=lambda r: r["doc_id"])
            running = 0
            for r in members:
                assert r["pack_id"] == running // budget
                assert r["tok_offset"] == running % budget
                running += r["tokens"]

    check()
