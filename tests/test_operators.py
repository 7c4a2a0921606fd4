"""Operator-equivalence and property tests: the pandas escape hatch
must agree with the JVM path; salted aggregation must equal direct
aggregation; sessionize must satisfy its invariants on arbitrary
inputs (Hypothesis)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.pandas_ops import (
    sessionize_applyinpandas,
    zscore_pandas_udf,
)
from data_engineering_user_session_analysis_spark.operators.sessionize import sessionize
from data_engineering_user_session_analysis_spark.operators.skew import salted_agg
from data_engineering_user_session_analysis_spark.sources.events import load_events


def test_applyinpandas_sessionize_equals_window(spark, sf_small):
    ev = load_events(spark, sf_small)
    jvm = sessionize(ev, order_cols=("event_id",)).select(
        "event_id", "session_seq", "session_id"
    )
    py = sessionize_applyinpandas(ev).select("event_id", "session_seq", "session_id")
    assert jvm.exceptAll(py).count() == 0
    assert py.exceptAll(jvm).count() == 0


def test_salted_agg_equals_direct(spark, sf_small):
    ev = load_events(spark, sf_small)
    direct = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        F.max("ts").alias("last_ts"),
    )
    salted = salted_agg(
        ev,
        ["user_id"],
        {"n": ("count", "event_id"), "v": ("sum", F.col("value").cast("decimal(18,2)")), "last_ts": ("max", "ts")},
        buckets=8,
    )
    assert direct.exceptAll(salted).count() == 0
    assert salted.exceptAll(direct).count() == 0


def test_zscore_pandas_udf_runs(spark, sf_small):
    out = zscore_pandas_udf(load_events(spark, sf_small).limit(100))
    rows = out.select("value", "value_centered_batch").collect()
    assert len(rows) == 100
    assert all(r.value_centered_batch is not None for r in rows)


def _py_sessionize(events: list[tuple[int, datetime.datetime]], gap: int = 1800):
    """Pure-Python reference: second-truncated gap semantics."""
    out = {}
    by_user: dict[int, list[tuple[int, datetime.datetime]]] = {}
    for eid, ts in events:
        by_user.setdefault(eid % 5, []).append((eid, ts))
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e[1], e[0]))
        seq = 0
        prev = None
        for eid, ts in evs:
            secs = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp())
            if prev is None or secs - prev > gap:
                seq += 1
            out[eid] = (user, seq)
            prev = secs
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.datetimes(
                min_value=datetime.datetime(2024, 1, 1),
                max_value=datetime.datetime(2024, 3, 1),
            ),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda e: e[0],
    )
)
def test_sessionize_property(spark, events):
    expected = _py_sessionize(events)
    df = spark.createDataFrame(
        [(eid, ts, eid % 5) for eid, ts in events],
        "event_id long, ts timestamp, user_id long",
    )
    got = {
        r.event_id: (r.user_id, r.session_seq)
        for r in sessionize(df, order_cols=("event_id",)).collect()
    }
    assert got == expected
