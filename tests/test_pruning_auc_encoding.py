"""Unit tests for the round-4 additions: prototypicality pruning
(operators/pruning.py), bucketed binary AUC (operators/quality_model.py),
and the encoding-damage detector (operators/text.encoding_quality)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ----------------------------- prototype_prune ------------------------------


def _vec(angle: float) -> list[float]:
    return [math.cos(angle), math.sin(angle)]


def test_prototype_prune_drops_exact_quarter_per_cell(spark):
    from jsonschema_spark.operators.pruning import prototype_prune

    # two well-separated clusters on the unit circle; centroids are the two
    # lowest-id vectors (one per cluster by construction)
    rows = []
    for i in range(8):  # cluster around angle 0, ids 0..7
        rows.append((i, _vec(0.02 * i)))
    for i in range(8):  # cluster around angle pi/2, ids 100..107
        rows.append((100 + i, _vec(math.pi / 2 + 0.02 * i)))
    # make id=1 the second centroid candidate? no: fit takes the 2 lowest ids
    # (0 and 1) which are both in cluster A -- craft instead: id 0 in A, id 1 in B
    rows = [(0, _vec(0.0)), (1, _vec(math.pi / 2))] + [
        (10 + i, _vec(0.03 * (i + 1))) for i in range(7)
    ] + [(100 + i, _vec(math.pi / 2 + 0.03 * (i + 1))) for i in range(7)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prototype_prune(emb, n_cells=2, drop_num=1, drop_den=4).collect()

    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    assert set(by_cell) == {0, 1}
    for cell, items in by_cell.items():
        cnt = len(items)
        assert cnt == 8
        dropped = [r for r in items if not r["kept"]]
        assert len(dropped) == cnt // 4  # exact integer cut
        # dropped items are exactly the lowest proto_rank values
        assert sorted(r["proto_rank"] for r in dropped) == list(
            range(1, cnt // 4 + 1)
        )
        # ranking is by descending prototypicality
        ordered = sorted(items, key=lambda r: r["proto_rank"])
        protos = [r["proto"] for r in ordered]
        assert protos == sorted(protos, reverse=True)


def test_prototype_prune_plan_has_no_crossjoin(spark):
    from jsonschema_spark.operators.pruning import prototype_prune

    emb = spark.createDataFrame(
        [(i, _vec(0.1 * i)) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    plan = prototype_prune(emb, n_cells=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


# --------------------------- binary_auc_bucketed ----------------------------


def _exact_auc(pairs: list[tuple[float, bool]]) -> float:
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    num = 0.0
    for p in pos:
        for n in neg:
            if p > n:
                num += 1.0
            elif p == n:
                num += 0.5
    return num / (len(pos) * len(neg))


def test_auc_matches_exact_on_separated_scores(spark):
    from jsonschema_spark.operators.quality_model import binary_auc_bucketed

    # scores on exact 0.125 grid points => bucketing is lossless
    pairs = [(float(i) * 0.125, i % 3 != 0) for i in range(-40, 40)]
    df = spark.createDataFrame(pairs, "score double, pos boolean")
    row = binary_auc_bucketed(df, "score", "pos").collect()[0]
    assert row["n_pos"] + row["n_neg"] == len(pairs)
    assert row["auc"] == pytest.approx(_exact_auc(pairs), abs=1e-6)


def test_auc_perfect_and_inverted(spark):
    from jsonschema_spark.operators.quality_model import binary_auc_bucketed

    pairs = [(float(i), i >= 0) for i in range(-20, 20)]
    df = spark.createDataFrame(pairs, "score double, pos boolean")
    assert binary_auc_bucketed(df, "score", "pos").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(s, not y) for s, y in pairs], "score double, pos boolean"
    )
    assert binary_auc_bucketed(inv, "score", "pos").collect()[0]["auc"] == 0.0


def test_auc_ties_give_half_credit(spark):
    from jsonschema_spark.operators.quality_model import binary_auc_bucketed

    # every score identical -> AUC is exactly 0.5 regardless of labels
    pairs = [(1.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(pairs, "score double, pos boolean")
    assert binary_auc_bucketed(df, "score", "pos").collect()[0]["auc"] == 0.5


# ----------------------------- encoding_quality -----------------------------


def test_encoding_quality_counts(spark):
    from jsonschema_spark.operators.text import MOJIBAKE_MARKERS, encoding_quality

    moji = MOJIBAKE_MARKERS[0]
    rows = [
        (1, "clean ascii text"),
        (2, f"bad {moji} quote {moji} twice"),
        (3, "lost � char"),
        (4, "ctrl" + chr(1) + chr(2) + "chars"),
        (5, "tab\tand\nnewline ok"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in encoding_quality(df, "doc_id", "text").collect()}

    assert out[1]["enc_ok"] and out[1]["n_mojibake"] == 0
    assert out[2]["n_mojibake"] == 2 and not out[2]["enc_ok"]
    assert out[3]["n_replacement"] == 1 and not out[3]["enc_ok"]
    assert out[4]["n_ctrl"] == 2 and not out[4]["enc_ok"]
    assert out[5]["n_ctrl"] == 0 and out[5]["enc_ok"]  # tab/newline exempt
    assert out[6]["ascii_ratio"] == 1.0 and out[6]["enc_ok"]  # empty text


def test_encoding_quality_ascii_ratio(spark):
    from jsonschema_spark.operators.text import encoding_quality

    df = spark.createDataFrame(
        [(1, "abéé")], "doc_id long, text string"
    )  # 2 ascii of 4 chars
    r = encoding_quality(df, "doc_id", "text").collect()[0]
    assert r["ascii_ratio"] == 0.5
    assert not r["enc_ok"]  # 0.5 < 0.6
