"""Property-based parity for the round-4-final operators: prototype_prune
invariants, bucketed-AUC parity with a per-pair Python reference, and
temperature_sample membership/target laws on hypothesis-generated inputs."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------- prototype_prune laws ---------------------------


@given(
    n=st.integers(min_value=4, max_value=40),
    num=st.integers(min_value=0, max_value=3),
    den=st.integers(min_value=3, max_value=5),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_prototype_prune_counts_and_ranks(spark, n, num, den, seed):
    from jsonschema_spark.operators.pruning import prototype_prune

    rows = [
        (i, [math.sin(seed + 0.37 * i + j) for j in range(4)]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prototype_prune(emb, n_cells=min(4, n), drop_num=num, drop_den=den).collect()
    assert len(out) == n  # one row per input, nothing lost or duplicated
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    for items in by_cell.values():
        cnt = len(items)
        drop_n = (cnt * num) // den
        dropped = sorted(r["proto_rank"] for r in items if not r["kept"])
        assert dropped == list(range(1, drop_n + 1))  # exactly the top ranks
        ranks = sorted(r["proto_rank"] for r in items)
        assert ranks == list(range(1, cnt + 1))  # dense ranks, no gaps
        ordered = sorted(items, key=lambda r: r["proto_rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["proto"], -a["id"]) >= (b["proto"], -b["id"])


# ------------------------------ bucketed AUC --------------------------------


def _py_auc(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for q in neg:
            num += 1.0 if p > q else (0.5 if p == q else 0.0)
    return num / (len(pos) * len(neg))


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=-400, max_value=400), st.booleans()),
        min_size=4,
        max_size=60,
    ),
    seed=st.integers(min_value=0, max_value=100),
)
@settings(**_SETTINGS)
def test_auc_matches_python_reference_on_grid_scores(spark, data, seed):
    """Scores on exact 0.125 grid points make bucketing lossless, so the
    bucketed AUC must equal the exact pairwise Mann-Whitney value."""
    from jsonschema_spark.operators.quality_model import binary_auc_bucketed

    pairs = [(k * 0.125, y) for k, y in data]
    want = _py_auc(pairs)
    if want is None:  # single-class input: AUC undefined, Spark yields NULL
        return
    df = spark.createDataFrame(pairs, "score double, pos boolean")
    row = binary_auc_bucketed(df, "score", "pos").collect()[0]
    assert abs(row["auc"] - want) <= 1e-6
    assert row["n_pos"] == sum(1 for _, y in pairs if y)
    assert row["n_neg"] == sum(1 for _, y in pairs if not y)


# --------------------------- temperature_sample -----------------------------


def _hash_frac(key, salt):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=4),
    out_frac=st.sampled_from([0.25, 0.5, 0.75]),
)
@settings(**_SETTINGS)
def test_temperature_sample_membership_matches_python(spark, sizes, out_frac):
    """Every kept id satisfies the md5 hash-range rule against the sqrt-share
    fraction computed in Python — and every id that satisfies it is kept."""
    from jsonschema_spark.operators.sampling import temperature_sample

    rows = []
    i = 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((i, f"g{g}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {
        r["id"]
        for r in temperature_sample(
            df, "doc_id", "lang", alpha=0.5, out_frac=out_frac
        ).collect()
    }
    n_total = sum(sizes)
    t_sum = sum(math.sqrt(n) for n in sizes)
    fracs = {
        f"g{g}": min(1.0, math.sqrt(n) / t_sum * (out_frac * n_total) / n)
        for g, n in enumerate(sizes)
    }
    want = {i for i, (did, grp) in enumerate(rows) if _hash_frac(did, "temp") < fracs[grp]}
    assert kept == want


# ----------------------- shard_order / representatives ----------------------


@given(
    n=st.integers(min_value=1, max_value=120),
    n_shards=st.integers(min_value=1, max_value=9),
    extra=st.integers(min_value=0, max_value=40),
)
@settings(**_SETTINGS)
def test_shard_order_partition_laws(spark, n, n_shards, extra):
    """Laws: (a) every row appears exactly once with a dense 1..n_s position
    per shard; (b) a row's SHARD never changes when the corpus grows (only
    positions within a shard may shift); (c) shard agrees with the md5 rule."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.sampling import shard_order

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    out = shard_order(df, "doc_id", n_shards=n_shards).collect()
    assert len(out) == n
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    for r in out:
        h = hashlib.md5(f"shard{r['doc_id']}".encode()).hexdigest()
        assert r["shard"] == int(h[:15], 16) % n_shards
    if extra:
        grown = spark.range(n + extra).select(F.col("id").alias("doc_id"))
        g = {r["doc_id"]: r["shard"] for r in shard_order(grown, "doc_id", n_shards=n_shards).collect()}
        for r in out:
            assert g[r["doc_id"]] == r["shard"]


@given(
    n=st.integers(min_value=2, max_value=60),
    n_clusters=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_select_representatives_laws(spark, n, n_clusters, seed):
    """Laws: one rep per cluster; the rep is a member; size counts members;
    the rep maximizes (score, -id) within its cluster."""
    from jsonschema_spark.operators.dedup import select_representatives

    members = [(i, i % n_clusters) for i in range(n)]
    scores = [(i, float((seed + 7 * i) % 5)) for i in range(n)]
    clusters = spark.createDataFrame(members, "id long, cluster_id long")
    sc = spark.createDataFrame(scores, "id long, score double")
    out = select_representatives(clusters, sc).collect()
    got = {r["cluster_id"]: (r["rep_id"], r["size"]) for r in out}
    score_of = dict(scores)
    expect = {}
    for i, c in members:
        cur = expect.get(c)
        cand = (score_of[i], -i)
        if cur is None or cand > (score_of[cur], -cur):
            expect[c] = i
    sizes = {}
    for _, c in members:
        sizes[c] = sizes.get(c, 0) + 1
    assert got == {c: (rep, sizes[c]) for c, rep in expect.items()}
