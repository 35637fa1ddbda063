"""Property-based parity: the Spark session/as-of operators vs a direct
pure-Python reference implementation over random event streams."""

from __future__ import annotations

from datetime import datetime, timedelta

from jsonschema_spark.operators.sessions import asof_attribute, sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)
EPOCH = datetime(1970, 1, 1)
DDL = "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double"
GAP_S = 10


def _us(dt: datetime) -> int:
    return (dt - EPOCH) // timedelta(microseconds=1)


def _mk_rows(offsets):
    # offsets: list of (user, seconds, kind-index); event_id = position
    kinds = ["click", "view", "error"]
    return [
        (i, T0 + timedelta(seconds=s), u, kinds[k], 1.0)
        for i, (u, s, k) in enumerate(offsets)
    ]


def _ref_sessionize(rows):
    by_user: dict = {}
    for eid, ts, u, _k, v in rows:
        by_user.setdefault(u, []).append((_us(ts), eid, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for us, _eid, v in evs:
            if prev is None or us - prev > GAP_S * 1_000_000:
                seq += 1
                out[(u, seq)] = [0, us, us, 0.0]
            cell = out[(u, seq)]
            cell[0] += 1
            cell[2] = us
            cell[3] = round(cell[3] + v, 6)
            prev = us
    return {k: tuple(v) for k, v in out.items()}


def _ref_asof(rows):
    by_user: dict = {}
    for eid, ts, u, k, _v in rows:
        if k in ("click", "view"):
            by_user.setdefault(u, []).append((_us(ts), int(k == "click"), eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        last = None
        for us, is_click, eid in evs:
            if is_click:
                out[eid] = (last[1], us - last[0]) if last else (None, None)
            else:
                last = (us, eid)
    return out


def test_sessionize_matches_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    ev = st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=120),
        st.integers(min_value=0, max_value=2),
    )

    @settings(max_examples=8, deadline=None)
    @given(offsets=st.lists(ev, min_size=1, max_size=40))
    def check(offsets):
        rows = _mk_rows(offsets)
        got = {
            (r["user_id"], r["session_seq"]): (
                r["n_events"], r["start_us"], r["end_us"], r["total_value"],
            )
            for r in sessionize(
                spark.createDataFrame(rows, DDL), gap_seconds=GAP_S, value_col="value"
            ).collect()
        }
        assert got == _ref_sessionize(rows)

    check()


def test_asof_matches_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    ev = st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=120),
        st.integers(min_value=0, max_value=2),
    )

    @settings(max_examples=8, deadline=None)
    @given(offsets=st.lists(ev, min_size=1, max_size=40))
    def check(offsets):
        rows = _mk_rows(offsets)
        got = {
            r["left_id"]: (r["right_id"], r["gap_us"])
            for r in asof_attribute(spark.createDataFrame(rows, DDL)).collect()
        }
        assert got == _ref_asof(rows)

    check()
