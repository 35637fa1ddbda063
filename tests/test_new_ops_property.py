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
