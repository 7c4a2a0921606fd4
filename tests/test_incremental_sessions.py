"""Incremental sessionization == batch sessionization, exactly.

The contract (operators/incremental_sessions.py): replaying days in
ascending order through ``advance_sessions`` and concatenating the
closed-session emissions plus ``finalize_sessions`` produces the
SAME rows — ids, ordinals, timestamps, aggregates, first/last event
types — as ``session_rollup(sessionize(all_events))`` over the full
history in one pass.  Fixture data barely crosses midnight (sf0.01
has one boundary pair), so the boundary cases are pinned on a
synthetic corpus built to cross it in every way that matters:
in-gap crossing (stitch), exactly-at-gap crossing (stitch — strict->
rule), just-over-gap crossing (close + reopen), multi-day absence
(close + reopen with correct ordinal), and a session spanning THREE
days (stitch twice).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.incremental_sessions import (
    advance_sessions,
    finalize_sessions,
)
from data_engineering_user_session_analysis_spark.operators.sessionize import (
    session_rollup,
    sessionize,
)
from data_engineering_user_session_analysis_spark.sources.events import load_events

GAP = 1800


def _replay(spark, events, tmp, gap_seconds=GAP):
    """Drive the incremental operator one calendar day at a time,
    round-tripping state through parquet exactly as a daily job
    would.  (NOT localCheckpoint: chaining eager localCheckpoints
    across daily steps pins every step's blocks and degrades from
    ~2 s/day to 16+ s/day by day 15 — measured; the state-table
    write/read is both the production pattern and the flat-cost
    one.)"""
    import os

    days = [
        r["d"]
        for r in events.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()
    ]
    state = None
    for i, d in enumerate(days):
        day = events.filter(F.to_date("ts") == F.lit(d))
        closed, state = advance_sessions(day, state, gap_seconds=gap_seconds)
        closed.write.mode("append").parquet(os.path.join(tmp, "closed"))
        sp = os.path.join(tmp, f"state_{i}")
        state.write.mode("overwrite").parquet(sp)
        state = spark.read.parquet(sp)
    return finalize_sessions(state).unionByName(
        spark.read.parquet(os.path.join(tmp, "closed"))
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: (t[0], t[1])
    )


def _assert_equal(incremental, batch):
    inc, bat = _rows(incremental), _rows(batch)
    assert len(inc) == len(bat)
    assert inc == bat


def test_incremental_equals_batch_on_fixture(spark, sf_small, tmp_path):
    ev = load_events(spark, sf_small)
    batch = session_rollup(sessionize(ev, order_cols=("event_id",)))
    _assert_equal(_replay(spark, ev, str(tmp_path)), batch)


def _mk_events(spark, rows):
    """rows: (user_id, iso_ts, event_id, event_type, value)"""
    data = [
        (u, dt.datetime.fromisoformat(ts), e, et, float(v))
        for (u, ts, e, et, v) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )


def test_midnight_boundary_cases(spark, tmp_path):
    ev = _mk_events(
        spark,
        [
            # u1: one session crossing midnight inside the gap
            (1, "2024-03-01 23:50:00", 1, "view", 1.0),
            (1, "2024-03-02 00:10:00", 2, "purchase", 2.5),
            # u2: crossing at EXACTLY the gap -> still one session
            # (strict-> rule: delta > gap opens, delta == gap extends)
            (2, "2024-03-01 23:45:00", 3, "view", 1.0),
            (2, "2024-03-02 00:15:00", 4, "click", 0.0),
            # u3: crossing just OVER the gap -> close + reopen as -2
            (3, "2024-03-01 23:45:00", 5, "view", 1.0),
            (3, "2024-03-02 00:15:01", 6, "view", 1.0),
            # u4: absent a full day between sessions -> ordinal 2 on return
            (4, "2024-03-01 12:00:00", 7, "view", 3.0),
            (4, "2024-03-03 12:00:00", 8, "view", 4.0),
            # u5: ONE session spanning three days (stitched twice)
            (5, "2024-03-01 23:59:00", 9, "view", 1.0),
            (5, "2024-03-02 00:20:00", 10, "click", 1.0),
            (5, "2024-03-02 23:55:00", 11, "view", 1.0),  # same day, new session
            (5, "2024-03-03 00:05:00", 12, "purchase", 9.0),
        ],
    )
    batch = session_rollup(sessionize(ev, order_cols=("event_id",)))
    inc = _replay(spark, ev, str(tmp_path))
    _assert_equal(inc, batch)

    # spot-check the semantics the fixtures can't see: u1 has ONE
    # session spanning both days with the purchase flag set ...
    got = {r["session_id"]: r for r in inc.collect()}
    assert got["1-1"]["number_of_events"] == 2
    assert got["1-1"]["is_purchase"] == 1
    assert got["1-1"]["session_duration_seconds"] == 1200
    # ... u2 stitches at exactly the gap, u3 does not
    assert got["2-1"]["number_of_events"] == 2
    assert "3-2" in got and got["3-1"]["number_of_events"] == 1
    # ... u4's return session carries ordinal 2 across the absent day
    assert "4-2" in got
    # ... u5's second session crosses the second midnight stitched
    assert got["5-1"]["number_of_events"] == 2
    assert got["5-2"]["number_of_events"] == 2
    assert got["5-2"]["is_purchase"] == 1


def _sql_replay(spark, events, tmp, gap_seconds=GAP):
    """Drive the SQL-template replay the way the registry row does:
    date-partitioned lake, then replay_sessions_sql."""
    import os

    from data_engineering_user_session_analysis_spark.operators.incremental_sessions import (
        replay_sessions_sql,
    )

    lake = os.path.join(tmp, "lake")
    events.withColumn("_d", F.to_date("ts")).repartition("_d").write.partitionBy(
        "_d"
    ).parquet(lake)
    return replay_sessions_sql(
        spark, lake, os.path.join(tmp, "steps"), gap_seconds=gap_seconds
    )


def test_sql_replay_equals_dataframe_replay(spark, tmp_path):
    """The SQL step template (VERDICT r13 #5) is the SAME logical
    step as advance_sessions — pinned bit-identical on the corpus
    built to cross midnight every way that matters, and against the
    batch rollup (the ground truth both replays must equal)."""
    ev = _mk_events(
        spark,
        [
            (1, "2024-03-01 23:50:00", 1, "view", 1.0),
            (1, "2024-03-02 00:10:00", 2, "purchase", 2.5),
            (2, "2024-03-01 23:45:00", 3, "view", 1.0),
            (2, "2024-03-02 00:15:00", 4, "click", 0.0),
            (3, "2024-03-01 23:45:00", 5, "view", 1.0),
            (3, "2024-03-02 00:15:01", 6, "view", 1.0),
            (4, "2024-03-01 12:00:00", 7, "view", 3.0),
            (4, "2024-03-03 12:00:00", 8, "view", 4.0),
            (5, "2024-03-01 23:59:00", 9, "view", 1.0),
            (5, "2024-03-02 00:20:00", 10, "click", 1.0),
            (5, "2024-03-02 23:55:00", 11, "view", 1.0),
            (5, "2024-03-03 00:05:00", 12, "purchase", 9.0),
            # null-user rows: one NULL partition, midnight-stitched
            (None, "2024-03-01 23:58:00", 13, "view", 1.0),
            (None, "2024-03-02 00:05:00", 14, "click", 2.0),
        ],
    )
    sql_replay = _sql_replay(spark, ev, str(tmp_path / "sql"))
    df_replay = _replay(spark, ev, str(tmp_path / "df"))
    batch = session_rollup(sessionize(ev, order_cols=("event_id",)))
    # names + types (nullability differs trivially: _replay's closed
    # rows round-trip through an append-mode parquet dir, which makes
    # every field nullable)
    assert [(f.name, f.dataType) for f in sql_replay.schema.fields] == [
        (f.name, f.dataType) for f in df_replay.schema.fields
    ]

    # None-safe row compare (the fixture's NULL user_id breaks the
    # shared _assert_equal's (user, session) tuple sort)
    def rows(df):
        return sorted((tuple(r) for r in df.collect()), key=str)

    assert rows(sql_replay) == rows(df_replay)
    assert rows(sql_replay) == rows(batch)


def test_sql_replay_equals_batch_on_fixture(spark, sf_small, tmp_path):
    ev = load_events(spark, sf_small)
    batch = session_rollup(sessionize(ev, order_cols=("event_id",)))
    _assert_equal(_sql_replay(spark, ev, str(tmp_path)), batch)


def test_incremental_replay_property(spark, tmp_path_factory):
    """Property pin for the r14 seeded-carry formulation: ANY event
    stream, split at calendar-day boundaries and replayed through
    advance_sessions, must equal batch sessionization of the union —
    hot users (id = eid % 3) force carries, merges, multi-session
    days, and user-absent days across the 3-day window."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**6),
                st.datetimes(
                    min_value=dt.datetime(2024, 1, 1),
                    max_value=dt.datetime(2024, 1, 4),
                ),
                st.sampled_from(["view", "click", "purchase"]),
                st.integers(min_value=0, max_value=9999),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda e: e[0],
        )
    )
    def run(events):
        df = spark.createDataFrame(
            [
                (eid % 3, ts, eid, et, cents / 100.0)
                for (eid, ts, et, cents) in events
            ],
            "user_id long, ts timestamp, event_id long, "
            "event_type string, value double",
        )
        batch = session_rollup(sessionize(df, order_cols=("event_id",)))
        days = sorted(
            r["d"]
            for r in df.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        state = None
        closed_frames = []
        for d in days:
            closed, state = advance_sessions(
                df.filter(F.to_date("ts") == F.lit(d)), state
            )
            closed_frames.append(closed)
        inc = finalize_sessions(state)
        for c in closed_frames:
            inc = inc.unionByName(c)
        assert sorted(map(tuple, inc.collect())) == sorted(
            map(tuple, batch.collect())
        )

    run()


def test_step_sql_validates_spliced_identifiers():
    """Column names and the purchase literal are spliced into the
    step template — exotic values must fail loudly, not reach SQL."""
    import pytest

    from data_engineering_user_session_analysis_spark.operators.incremental_sessions import (
        incremental_step_sql,
    )

    with pytest.raises(ValueError, match="column name"):
        incremental_step_sql("t", None, user_col="user; DROP TABLE x")
    with pytest.raises(ValueError, match="purchase"):
        incremental_step_sql("t", None, purchase_value="a'b")


def test_sql_step_plan_has_one_exchange(spark, tmp_path):
    """The seeded-carry formulation's scale claim: a mid-replay step
    is scan -> ONE hash(user) exchange -> window chain -> agg ->
    project.  The rollup groupBy (user, seq) and the open/closed
    window both reuse the exchange via the subset rule — a second
    Exchange in this plan means a formulation regression."""
    import os

    from data_engineering_user_session_analysis_spark.operators.incremental_sessions import (
        incremental_step_sql,
    )

    ev = _mk_events(
        spark,
        [
            (1, "2024-03-01 23:50:00", 1, "view", 1.0),
            (1, "2024-03-02 00:10:00", 2, "purchase", 2.5),
        ],
    )
    lake = str(tmp_path / "lake")
    ev.withColumn("_d", F.to_date("ts")).repartition("_d").write.partitionBy(
        "_d"
    ).parquet(lake)
    days = sorted(
        p.split("=", 1)[1] for p in os.listdir(lake) if p.startswith("_d=")
    )
    s0 = str(tmp_path / "s0")
    spark.sql(
        incremental_step_sql(f"parquet.`{lake}/_d={days[0]}`", None)
    ).write.parquet(s0)
    step = spark.sql(
        incremental_step_sql(
            f"parquet.`{lake}/_d={days[1]}`",
            f"(SELECT * FROM parquet.`{s0}` WHERE _is_open)",
        )
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_closed_sessions_never_reemitted(spark, tmp_path):
    """Each session id is emitted exactly once across the whole replay
    (closed means closed — a downstream sink can append blindly)."""
    ev = _mk_events(
        spark,
        [
            (1, "2024-03-01 10:00:00", 1, "view", 1.0),
            (1, "2024-03-01 11:00:00", 2, "view", 1.0),
            (1, "2024-03-02 09:00:00", 3, "view", 1.0),
            (1, "2024-03-03 09:00:00", 4, "view", 1.0),
        ],
    )
    inc = _replay(spark, ev, str(tmp_path))
    ids = [r["session_id"] for r in inc.collect()]
    assert len(ids) == len(set(ids)) == 4


def test_incremental_plan_is_user_partitioned(spark):
    """The daily step must stay O(day + active users): its physical
    plan may shuffle on the user key but must not contain a cartesian
    or nested-loop join against state."""
    ev = _mk_events(spark, [(1, "2024-03-01 10:00:00", 1, "view", 1.0)])
    closed, state = advance_sessions(ev, None)
    day2 = _mk_events(spark, [(1, "2024-03-02 10:00:00", 2, "view", 1.0)])
    closed2, _ = advance_sessions(day2, state)
    plan = closed2._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the r14 seeded-carry formulation: the whole step reuses ONE
    # hash(user) exchange (the rollup agg and the open/closed window
    # ride it via the subset rule) — and no joins at all
    raw, _ = advance_sessions(day2, state, materialize_partials=False)
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert raw_plan.count("Exchange") == 1, raw_plan
    assert "Join" not in raw_plan, raw_plan


def test_run_incremental_sessions_job(spark, sf_small, tmp_path):
    """The job verb end-to-end over a real partitioned lake: replaying
    `job sessions <ds>` for every day then finalizing the last state
    equals batch sessionization of the whole lake; re-running the
    last day is idempotent (same outputs, no duplicates)."""
    import os

    from data_engineering_user_session_analysis_spark.jobs.batch_job import (
        build_lake,
        run_incremental_sessions,
    )

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "serving")
    build_lake(spark, sf_small, lake)
    ev = load_events(spark, sf_small)
    days = sorted(
        r["d"]
        for r in ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().collect()
    )[:6]
    for ds in days:
        report = run_incremental_sessions(spark, lake, ds, out)
        assert report["open"] > 0
    rerun = run_incremental_sessions(spark, lake, days[-1], out)  # idempotent
    assert rerun == report

    closed = spark.read.parquet(os.path.join(out, "session_closed"))
    state = spark.read.parquet(os.path.join(out, "session_state", f"ds={days[-1]}"))
    inc = finalize_sessions(state).unionByName(
        closed.drop("ds") if "ds" in closed.columns else closed
    )
    batch = session_rollup(
        sessionize(
            ev.filter(F.date_format("ts", "yyyy-MM-dd") <= days[-1]),
            order_cols=("event_id",),
        )
    )
    _assert_equal(inc, batch)


def test_late_data_replay_from_affected_day(spark, tmp_path):
    """Late-landing data recovery: when an event lands late in an
    already-processed day K, replaying the verbs from K forward (each
    run overwrites its own closed/state partitions) converges to the
    batch result over the corrected history — no day-1 restart."""
    import os

    from data_engineering_user_session_analysis_spark.jobs.batch_job import (
        run_incremental_sessions,
    )

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "serving")
    base_rows = [
        (1, "2024-03-01 10:00:00", 1, "view", 1.0),
        (1, "2024-03-02 23:55:00", 2, "view", 1.0),
        (1, "2024-03-03 00:10:00", 3, "view", 1.0),  # stitches into day-2 session
        (2, "2024-03-01 09:00:00", 4, "view", 1.0),
        (2, "2024-03-03 09:00:00", 5, "view", 1.0),
    ]
    late_row = (2, "2024-03-02 09:00:00", 6, "purchase", 5.0)  # lands late in day 2

    def _write_lake(rows):
        _mk_events(spark, rows).withColumn(
            "date", F.date_format("ts", "yyyy-MM-dd")
        ).write.mode("overwrite").partitionBy("date").parquet(lake)

    days = ("2024-03-01", "2024-03-02", "2024-03-03")
    _write_lake(base_rows)
    for ds in days:
        run_incremental_sessions(spark, lake, ds, out)

    # the late event arrives; day 2 and everything after replays
    _write_lake(base_rows + [late_row])
    for ds in days[1:]:
        run_incremental_sessions(spark, lake, ds, out)

    closed = spark.read.parquet(os.path.join(out, "session_closed")).drop("ds")
    state = spark.read.parquet(os.path.join(out, "session_state", f"ds={days[-1]}"))
    inc = finalize_sessions(state).unionByName(closed)
    batch = session_rollup(
        sessionize(_mk_events(spark, base_rows + [late_row]), order_cols=("event_id",))
    )
    _assert_equal(inc, batch)
    # the late purchase is now inside user 2's day-2 session
    got = {r["session_id"]: r for r in inc.collect()}
    assert got["2-2"]["is_purchase"] == 1


def test_null_user_rows_match_batch(spark, tmp_path):
    """Null-key events group into one window partition in batch
    sessionization (`sessionize` windows over user_id), so the
    incremental fold must stitch them identically across midnight.
    The pre-round-7 join-based fold diverged here (inner-join merge
    flags never matched null keys, so a null-key carry could neither
    stitch nor close); the window-based fold inherits the batch
    semantics by construction.  Production verbs still quarantine
    null keys — this pins the OPERATOR contract: incremental == batch
    on any input."""
    rows = [
        # null user: one session crossing midnight inside the gap
        (None, "2024-03-01 23:50:00", 1, "view", 1.0),
        (None, "2024-03-02 00:05:00", 2, "purchase", 2.0),
        # and a later same-day session after the gap
        (None, "2024-03-02 10:00:00", 3, "view", 0.5),
        # a normal user for contrast
        (7, "2024-03-01 12:00:00", 4, "view", 1.0),
    ]
    data = [
        (u, dt.datetime.fromisoformat(ts), e, et, float(v))
        for (u, ts, e, et, v) in rows
    ]
    ev = spark.createDataFrame(
        data,
        "user_id long, ts timestamp, event_id long, event_type string, value double",
    )
    batch = session_rollup(sessionize(ev, order_cols=("event_id",)))
    inc = _replay(spark, ev, str(tmp_path))
    a = {tuple(r) for r in batch.collect()}
    b = {tuple(r) for r in inc.collect()}
    assert a == b and len(a) == 3  # null crossing session, null later session, u7


def test_materialize_dir_equals_checkpoint_replay(spark, sf_small, tmp_path):
    """The one-job-per-day materialize_dir path (the bench replay's
    shape: combined fold written once, closed AND state derived as
    filters over the parquet) must produce the exact same stitched
    result as the checkpoint + explicit-state-write replay."""
    import os

    ev = load_events(spark, sf_small)
    batch = session_rollup(sessionize(ev, order_cols=("event_id",)))
    days = [
        r["d"]
        for r in ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()
    ]
    state, closed_frames = None, []
    for i, d in enumerate(days):
        closed, state = advance_sessions(
            ev.filter(F.to_date("ts") == F.lit(d)),
            state,
            materialize_dir=os.path.join(str(tmp_path), f"step_{i}"),
        )
        closed_frames.append(closed)
    # state must already be parquet-backed: no window/exchange in its
    # plan, just a scan + filter (that is the point of the fold-in)
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan
    from functools import reduce

    inc = reduce(lambda a, b: a.unionByName(b), closed_frames).unionByName(
        finalize_sessions(state)
    )
    _assert_equal(inc, batch)


def test_replay_day_scan_is_partition_pruned(spark, tmp_path):
    """The r16 replay reads the lake through ONE partition-aware
    relation and repoints each day with a filter on the partition
    column — that is only a win if the day scan actually PRUNES back
    to the one directory at planning.  Pin the PartitionFilters on
    the exact construction the replay loop uses (schema-pinned lake
    read, string partition column, equality filter)."""
    import os

    from pyspark.sql import types as T

    ev = _mk_events(
        spark,
        [
            (1, "2024-03-01 10:00:00", 1, "view", 1.0),
            (1, "2024-03-02 10:00:00", 2, "view", 1.0),
            (1, "2024-03-03 10:00:00", 3, "view", 1.0),
        ],
    )
    lake = str(tmp_path / "lake")
    ev.withColumn("_d", F.to_date("ts")).repartition("_d").write.partitionBy(
        "_d"
    ).parquet(lake)
    days = sorted(
        p.split("=", 1)[1] for p in os.listdir(lake) if p.startswith("_d=")
    )
    day_schema = spark.read.parquet(f"{lake}/_d={days[0]}").schema
    lake_df = spark.read.schema(
        T.StructType(list(day_schema) + [T.StructField("_d", T.StringType())])
    ).parquet(lake)
    one_day = lake_df.filter(F.col("_d") == days[1])
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert days[1] in plan, plan
    # the pruned scan must read exactly the one day's rows
    assert one_day.count() == 1
    assert one_day.select("event_id").collect()[0][0] == 2


def test_sql_replay_ofrows_fallback_equal(spark, tmp_path, monkeypatch):
    """replay_sessions_sql parses its two constant step texts once and
    re-analyzes them per day through Spark's own Dataset.ofRows entry;
    if that internal entry is unavailable the loop must degrade to the
    public spark.sql path with IDENTICAL output.  Force the fallback
    by making the probe fail and compare replays row-for-row."""
    from data_engineering_user_session_analysis_spark.operators import (
        incremental_sessions as inc,
    )

    ev = _mk_events(
        spark,
        [
            (1, "2024-03-01 23:50:00", 1, "view", 1.0),
            (1, "2024-03-02 00:10:00", 2, "purchase", 2.5),
            (2, "2024-03-01 12:00:00", 3, "view", 1.0),
            (2, "2024-03-03 12:00:00", 4, "click", 0.0),
        ],
    )
    fast = _sql_replay(spark, ev, str(tmp_path / "fast"))
    fast_rows = sorted((tuple(r) for r in fast.collect()), key=str)

    class _BoomDataFrame:
        def __call__(self, *a, **k):
            raise RuntimeError("probe disabled: force spark.sql fallback")

    monkeypatch.setattr(inc, "DataFrame", _BoomDataFrame())
    slow = _sql_replay(spark, ev, str(tmp_path / "slow"))
    slow_rows = sorted((tuple(r) for r in slow.collect()), key=str)
    assert fast_rows == slow_rows
