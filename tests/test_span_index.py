"""Persistent span-hash index pins (operators/span_index.py): the
day-by-day replay-parity contract against the batch operator,
idempotent day re-runs, frozen geometry, crashed-day exclusion via
the marker protocol, the incremental stats twin, and the bucketed
no-stored-side-shuffle plan shape."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.index_lifecycle import (
    marker_complete_days,
    retract_day_marker,
    shard_indexed,
)
from data_engineering_user_session_analysis_spark.operators.span_dedup import (
    _flagged_occurrences,
    duplicated_span_stats,
    positional_window_hashes,
)
from data_engineering_user_session_analysis_spark.operators.span_index import (
    append_shard_to_span_index,
    ensure_span_index_table,
    incremental_span_occurrences,
    incremental_span_stats,
)

W = 5

# Three "days" with: a span shared across day1/day3 (cross-day dup), a
# within-day dup pair in day2, a three-way hash spanning all days, a
# day2<->day3-only shared span (the crashed-day test's sentinel), pure
# singletons, and a too-short doc.
SHARED13 = "p q r s t u v"
SHARED123 = "k l m n o"
SHARED23 = "f g h i j zz"
DAYS = [
    (
        "2026-01-01",
        {
            1: "a1 b1 c1 d1 e1 " + SHARED13 + " w1 x1",
            2: "a2 b2 c2 d2 e2 g2 h2 " + SHARED123,
            3: "solo3 only3 here3 nothing3 shared3 at3 all3",
        },
    ),
    (
        "2026-01-02",
        {
            4: "dup4 dup4b dup4c dup4d dup4e tail4",
            5: "dup4 dup4b dup4c dup4d dup4e tail5",
            6: SHARED23 + " m6 n6 o6 " + SHARED123,
            7: "short doc",
        },
    ),
    (
        "2026-01-03",
        {
            8: "z8 y8 " + SHARED13 + " x8 " + SHARED123,
            9: "m9 n9 " + SHARED23 + " q9 r9",
            10: "alone10 forever10 nothing10 doubled10 here10 ten10",
        },
    ),
]
ALL_TEXTS = {d: t for _, day in DAYS for d, t in day.items()}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _occ_set(df):
    return {(r.doc_id, r.pos, r.wh) for r in df.collect()}


def _batch_set(spark, texts, sample_mod=None, min_docs=2):
    wh = positional_window_hashes(
        _docs(spark, texts), window=W, sample_mod=sample_mod
    )
    return _occ_set(_flagged_occurrences(wh, "doc_id", min_docs))


def _replay(spark, idx_path, sample_mod=None, min_docs=2):
    """Append day k, probe day k with before_ds=k + complete days —
    the module's documented operational loop.  Returns (per-day flag
    sets, their union)."""
    per_day = []
    for ds, texts in DAYS:
        docs = _docs(spark, texts)
        append_shard_to_span_index(
            docs, idx_path, ds, window=W, sample_mod=sample_mod
        )
        occ = incremental_span_occurrences(
            docs,
            idx_path,
            before_ds=ds,
            only_ds=marker_complete_days(idx_path),
            min_docs=min_docs,
        )
        per_day.append(_occ_set(occ))
    return per_day, set().union(*per_day)


def test_replay_union_matches_batch(spark, tmp_path):
    idx = str(tmp_path / "idx")
    per_day, union = _replay(spark, idx)
    assert union == _batch_set(spark, ALL_TEXTS)
    # non-vacuous: cross-day flags exist, and day-3's probe flags the
    # STORED day-1 occurrences of the newly-colliding span
    assert union, "fixture produced no duplicated spans"
    assert any(d == 1 for d, _p, _w in per_day[2]), (
        "day-3 probe must emit stored day-1 occurrences of the "
        "day1/day3 shared span"
    )


def test_replay_union_matches_batch_sampled(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _, union = _replay(spark, idx, sample_mod=2)
    batch = _batch_set(spark, ALL_TEXTS, sample_mod=2)
    assert union == batch
    # the sample is a strict subset of the full surface here
    assert batch < _batch_set(spark, ALL_TEXTS)


def test_replay_union_matches_batch_min_docs_3(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _, union = _replay(spark, idx, min_docs=3)
    batch = _batch_set(spark, ALL_TEXTS, min_docs=3)
    assert union == batch
    # only the three-way span survives min_docs=3
    assert union and union < _batch_set(spark, ALL_TEXTS)


def test_day_rerun_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _replay(spark, idx)
    name = ensure_span_index_table(spark, idx)
    before = spark.table(name).count()
    ds2, texts2 = DAYS[1]
    append_shard_to_span_index(_docs(spark, texts2), idx, ds2, window=W)
    assert spark.table(name).count() == before
    # and a re-probe of the last day is unchanged
    ds3, texts3 = DAYS[2]
    occ = incremental_span_occurrences(
        _docs(spark, texts3),
        idx,
        before_ds=ds3,
        only_ds=marker_complete_days(idx),
    )
    assert _occ_set(occ) == {
        x for x in _batch_set(spark, ALL_TEXTS) if _day3_visible(x)
    }


def _day3_visible(occ):
    """Batch-flagged occurrences the day-3 probe is contracted to
    emit: occurrences of hashes that day 3 itself carries (hashes
    absent from day 3 were flagged by earlier probes)."""
    day3_ids = set(DAYS[2][1])
    hashes_day3 = {
        w
        for d, _p, w in _BATCH_CACHE["set"]
        if d in day3_ids
    }
    return occ[2] in hashes_day3


_BATCH_CACHE: dict = {}


@pytest.fixture(autouse=True)
def _fill_batch_cache(spark):
    if "set" not in _BATCH_CACHE:
        _BATCH_CACHE["set"] = _batch_set(spark, ALL_TEXTS)
    yield


def test_frozen_geometry_wins_over_caller_args(spark, tmp_path):
    idx = str(tmp_path / "idx")
    ds1, texts1 = DAYS[0]
    append_shard_to_span_index(_docs(spark, texts1), idx, ds1, window=W)
    name = ensure_span_index_table(spark, idx)
    rows_w5 = spark.table(name).filter(F.col("ds") == ds1).count()
    # re-run the day with a DIFFERENT window argument: stored params
    # must win, so the row count (one per window start) is unchanged
    append_shard_to_span_index(_docs(spark, texts1), idx, ds1, window=3)
    assert spark.table(name).filter(F.col("ds") == ds1).count() == rows_w5
    # and a wrong id column fails loudly on both paths
    with pytest.raises(ValueError, match="id column"):
        append_shard_to_span_index(
            _docs(spark, texts1).withColumnRenamed("doc_id", "id2"),
            idx,
            ds1,
            id_col="id2",
        )
    with pytest.raises(ValueError, match="id column"):
        incremental_span_occurrences(
            _docs(spark, texts1).withColumnRenamed("doc_id", "id2"),
            idx,
            id_col="id2",
        )


def test_crashed_day_is_excluded_by_markers(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _replay(spark, idx)
    ds2 = DAYS[1][0]
    assert shard_indexed(idx, ds2)
    retract_day_marker(idx, ds2)
    assert not shard_indexed(idx, ds2)
    assert ds2 not in marker_complete_days(idx)
    # day-3 re-probe scoped to complete days no longer sees day 2:
    # the day2<->day3-only shared span (docs 6 and 9) must drop out,
    # while the day1/day3 span stays flagged
    ds3, texts3 = DAYS[2]
    occ = _occ_set(
        incremental_span_occurrences(
            _docs(spark, texts3),
            idx,
            before_ds=ds3,
            only_ds=marker_complete_days(idx),
        )
    )
    assert not any(d == 6 for d, _p, _w in occ)
    assert not any(d == 9 for d, _p, _w in occ)
    assert any(d == 1 for d, _p, _w in occ)


def test_incremental_stats_match_batch_on_final_day(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _replay(spark, idx)
    ds3, texts3 = DAYS[2]
    inc = {
        r.doc_id: r.asDict()
        for r in incremental_span_stats(
            _docs(spark, texts3),
            idx,
            before_ds=ds3,
            only_ds=marker_complete_days(idx),
        ).collect()
    }
    batch = {
        r.doc_id: r.asDict()
        for r in duplicated_span_stats(_docs(spark, ALL_TEXTS), window=W)
        .filter(F.col("doc_id").isin(list(texts3)))
        .collect()
    }
    assert inc == batch
    assert inc, "final-day stats fixture is vacuous"


def test_probe_plan_keeps_stored_side_bucketed(spark, tmp_path):
    """The scale claim, pinned: the stored side of the probe's
    semi-join is a bucketed scan with NO exchange above it — only the
    day's hash set is shuffled.  Forced to SMJ (broadcast disabled)
    so the pin exercises the large-probe path; the planner's
    DisableUnnecessaryBucketedScan cost rule is bypassed explicitly
    because at fixture sizes it reverts to a plain scan even where
    the layout wins at scale."""
    idx = str(tmp_path / "idx")
    _replay(spark, idx)
    ds3, texts3 = DAYS[2]
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        occ = incremental_span_occurrences(
            _docs(spark, texts3),
            idx,
            before_ds=ds3,
            only_ds=marker_complete_days(idx),
        )
        plan = occ._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "Bucketed: true" in plan, plan
    # the index scan must not sit under an Exchange: every stored-side
    # line between the SortMergeJoin and the FileScan is exchange-free
    scan_lines = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "span_idx_" in ln
    ]
    assert scan_lines, plan
    join_side = plan[: plan.index(scan_lines[0])]
    stored_branch = join_side[join_side.rindex("Join") :]
    assert "Exchange" not in stored_branch, plan


def test_cli_span_index_verb(spark, sf_small, tmp_path, monkeypatch, capsys):
    """``job span-index <ds> <index_path> [docs_path]`` — the daily
    maintenance verb: appends the shard, probes against stored days,
    prints a report, and stamps the day's completeness marker."""
    from data_engineering_user_session_analysis_spark.jobs.batch_job import main
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    shards = []
    for k in range(2):
        p = str(tmp_path / f"shard{k}")
        docs.filter(F.col("doc_id") % 2 == k).write.parquet(p)
        shards.append(p)
    monkeypatch.setenv("SPAN_WINDOW", "15")
    main(["job", "span-index", "2026-01-01", idx, shards[0]])
    main(["job", "span-index", "2026-01-02", idx, shards[1]])
    out = capsys.readouterr().out
    assert "'flagged_docs'" in out and "'complete_days': 2" in out
    assert marker_complete_days(idx) == ["2026-01-01", "2026-01-02"]


def test_probe_evaluates_window_kernel_once(spark, tmp_path):
    """The probe consumes the day's Arrow window kernel TWICE (the
    semi-join's hash set and the occurrence union).  The kernel
    output is lazily localCheckpointed, so the probe's executed plan
    carries ZERO ArrowEvalPython nodes — both consumers read the one
    materialized RDD (the registry-wide double-kernel audit's fix,
    applied here by construction)."""
    idx = str(tmp_path / "idx")
    ds1, texts1 = DAYS[0]
    append_shard_to_span_index(_docs(spark, texts1), idx, ds1, window=W)
    occ = incremental_span_occurrences(_docs(spark, texts1), idx, before_ds=ds1)
    plan = occ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_compaction_preserves_probe_results(spark, tmp_path):
    """compact_span_index folds every complete day into one partition
    (named for the max folded ds) behind the two-rename swap: a new
    day's probe returns the IDENTICAL flagged set before and after,
    file and partition counts drop, and the watermark closes folded
    days against re-appends (a re-append would double-count rows now
    living in the compacted partition)."""
    import pytest

    from data_engineering_user_session_analysis_spark.operators.span_index import (
        compact_span_index,
    )

    idx = str(tmp_path / "idx")
    # append days 1 and 2 only; day 3 is the post-compaction probe.
    # n_buckets=4 so each fixture day fills all its bucket files and
    # the fold's file-count reduction (2 days x 4 -> 4) is strict
    for ds, texts in DAYS[:2]:
        append_shard_to_span_index(
            _docs(spark, texts), idx, ds, window=W, n_buckets=4
        )
    ds3, texts3 = DAYS[2]
    probe = lambda: _occ_set(  # noqa: E731
        incremental_span_occurrences(
            _docs(spark, texts3),
            idx,
            before_ds=ds3,
            only_ds=marker_complete_days(idx),
        )
    )
    stats_probe = lambda: {  # noqa: E731
        r.doc_id: r.asDict()
        for r in incremental_span_stats(
            _docs(spark, texts3),
            idx,
            before_ds=ds3,
            only_ds=marker_complete_days(idx),
        ).collect()
    }
    before = probe()
    stats_before = stats_probe()
    report = compact_span_index(spark, idx)
    assert report["status"] == "compacted"
    assert report["partitions_before"] == 2 and report["partitions_after"] == 1
    # file counts at fixture sizes depend on the writer's task layout;
    # the unit pin is structural (one partition dir, <= files) — the
    # strict n_days x buckets -> buckets reduction is measured at
    # density in the spanindex1m stress coda
    assert report["files_after"] <= report["files_before"]
    assert [
        p
        for p in sorted(os.listdir(os.path.join(idx, "buckets")))
        if p.startswith("ds=")
    ] == [f"ds={DAYS[1][0]}"]
    assert report["into_ds"] == DAYS[1][0]
    assert marker_complete_days(idx) == [DAYS[1][0]]
    assert probe() == before
    # the summary sidecar folds with the buckets: the stats probe
    # (which reads summaries, not occurrences) is bit-identical too
    assert stats_probe() == stats_before
    # the watermark closes folded days, re-running either raises
    for ds, texts in DAYS[:2]:
        with pytest.raises(ValueError, match="folded"):
            append_shard_to_span_index(_docs(spark, texts), idx, ds, window=W)
    # but a NEW day appends + probes normally, and the replay union
    # still matches the batch set over all three days
    append_shard_to_span_index(_docs(spark, texts3), idx, ds3, window=W)
    assert marker_complete_days(idx) == [DAYS[1][0], ds3]
    # direct parity vs the batch operator across the compaction: the
    # probe corpus is (stored days 1-2 ∪ new day 3) = the full
    # fixture, so the probe — before AND after folding — must equal
    # the full-corpus batch set restricted to hashes day 3 carries
    assert before == {
        x for x in _batch_set(spark, ALL_TEXTS) if _day3_visible(x)
    }


def test_stats_run_from_summary_sidecar_not_occurrences(spark, tmp_path):
    """The stats probe's scale cap (VERDICT r13 #2), pinned two ways:
    (a) the executed plan scans the SUMMARY table and never touches
    the occurrence buckets; (b) a hot hash stored in many documents
    contributes exactly ONE summary row per day, so the probe's
    stored-side input is independent of occurrence multiplicity."""
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        ensure_span_summary_table,
    )

    idx = str(tmp_path / "idx")
    # day 1: a boilerplate 5-token window pasted into 40 docs
    hot = "h1 h2 h3 h4 h5"
    texts1 = {i: hot + f" u{i}a u{i}b u{i}c" for i in range(100, 140)}
    append_shard_to_span_index(
        _docs(spark, texts1), idx, "2026-03-01", window=W
    )
    # one summary row for the hot hash, despite 40 stored occurrences
    sum_name = ensure_span_summary_table(spark, idx)
    hot_rows = (
        spark.table(sum_name).filter(F.col("n_docs") >= 40).collect()
    )
    assert len(hot_rows) == 1
    assert hot_rows[0]["min_id"] == 100 and hot_rows[0]["max_id"] == 139
    # day 2 carries the hash once: stats flag its 5 tokens, and the
    # plan reads summaries only
    day2 = _docs(spark, {500: hot + " t1 t2 t3 t4"})
    stats = incremental_span_stats(day2, idx, before_ds="2026-03-02")
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "span_sum_" in plan, plan
    assert "span_idx_" not in plan, plan
    rows = {r.doc_id: r.asDict() for r in stats.collect()}
    assert set(rows) == {500}
    assert rows[500]["dup_tokens"] == 5 and rows[500]["n_dup_windows"] == 1


def test_stats_summary_and_occurrence_paths_agree(spark, tmp_path):
    """Bit-parity between the two stats routes: the summary-sidecar
    path (min_docs=2) must return exactly what the occurrence
    fallback computes on the same replay state — including within-day
    dups, cross-day dups, and the single-doc-across-days NON-dup."""
    idx = str(tmp_path / "idx")
    for ds, texts in DAYS[:2]:
        append_shard_to_span_index(_docs(spark, texts), idx, ds, window=W)
    ds3, texts3 = DAYS[2]
    day3 = _docs(spark, texts3)
    kw = dict(before_ds=ds3, only_ds=marker_complete_days(idx))
    via_summary = {
        r.doc_id: r.asDict()
        for r in incremental_span_stats(day3, idx, **kw).collect()
    }
    # force the occurrence fallback through the public API: min_docs=3
    # uses it, but for parity at min_docs=2 recompute from occurrences
    from data_engineering_user_session_analysis_spark.operators.span_dedup import (
        _coverage_stats,
    )

    occ = incremental_span_occurrences(day3, idx, **kw)
    own = occ.join(day3.select("doc_id"), "doc_id", "left_semi")
    via_occurrences = {
        r.doc_id: r.asDict()
        for r in _coverage_stats(own, day3, "text", "doc_id", W).collect()
    }
    assert via_summary == via_occurrences
    assert via_summary, "parity fixture is vacuous"


def test_rolling_monthly_compaction(spark, tmp_path):
    """VERDICT r13 #6: granularity='month' folds closing days into
    per-month super-partitions, keeps days at/after before_ds
    individual and re-runnable, and a SECOND rolling pass re-folds
    only the month that changed — already-folded months are carried
    over by hardlink, bit-untouched (pinned via inode identity).
    Probe outputs (occurrences AND summary-path stats) are identical
    across both folds."""
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        compact_span_index,
    )

    idx = str(tmp_path / "idx")
    glue = "c1 c2 c3 c4 c5"  # cross-month duplicated span
    months = {
        "2026-01-01": {1: glue + " ja1 ja2 ja3", 2: "jb1 jb2 jb3 jb4 jb5 jb6"},
        "2026-01-02": {3: "jc1 jc2 " + glue, 4: "jd1 jd2 jd3 jd4 jd5"},
        "2026-02-01": {5: "fa1 fa2 fa3 " + glue, 6: "fb1 fb2 fb3 fb4 fb5"},
        "2026-02-02": {7: "fc1 fc2 fc3 fc4 fc5", 8: glue + " fd1 fd2 fd3"},
        "2026-03-01": {9: "ma1 ma2 " + glue + " ma3"},
    }
    for ds, texts in months.items():
        append_shard_to_span_index(_docs(spark, texts), idx, ds, window=W)
    probe_text = "x1 x2 " + glue + " x3 x4"
    probe_day = _docs(spark, {100: probe_text})

    def probes(before_ds="2026-03-02"):
        kw = dict(before_ds=before_ds, only_ds=marker_complete_days(idx))
        occ = _occ_set(incremental_span_occurrences(probe_day, idx, **kw))
        stats = {
            r.doc_id: r.asDict()
            for r in incremental_span_stats(probe_day, idx, **kw).collect()
        }
        return occ, stats

    def batch_expected(stored_texts):
        """What the probe must return when the scoped stored days ARE
        ``stored_texts``: the batch operator over (stored ∪ probe
        doc), occurrences filtered to the probe day's hashes, stats
        restricted to the probe doc."""
        union = {**stored_texts, 100: probe_text}
        ph = {
            r.wh
            for r in positional_window_hashes(probe_day, window=W)
            .select("wh")
            .collect()
        }
        occ = {t for t in _batch_set(spark, union) if t[2] in ph}
        stats = {
            r.doc_id: r.asDict()
            for r in duplicated_span_stats(_docs(spark, union), window=W)
            .filter(F.col("doc_id") == 100)
            .collect()
        }
        return occ, stats

    before = probes()
    assert before[0], "rolling fixture is vacuous"
    report = compact_span_index(
        spark, idx, before_ds="2026-03-01", granularity="month"
    )
    assert report["status"] == "compacted"
    assert report["folded_days"] == [
        "2026-01-01", "2026-01-02", "2026-02-01", "2026-02-02",
    ]
    assert [(f["into_ds"], f["days"]) for f in report["folds"]] == [
        ("2026-01-02", ["2026-01-01", "2026-01-02"]),
        ("2026-02-02", ["2026-02-01", "2026-02-02"]),
    ]
    assert report["compacted_through"] == "2026-02-02"
    assert report["partitions_before"] == 5 and report["partitions_after"] == 3
    assert marker_complete_days(idx) == [
        "2026-01-02", "2026-02-02", "2026-03-01",
    ]
    assert probes() == before
    # the open window stays re-runnable; folded days are closed
    append_shard_to_span_index(
        _docs(spark, months["2026-03-01"]), idx, "2026-03-01", window=W
    )
    with pytest.raises(ValueError, match="folded"):
        append_shard_to_span_index(
            _docs(spark, months["2026-01-01"]), idx, "2026-01-01", window=W
        )
    # record an inode inside the January fold: the second pass must
    # carry it by hardlink, not rewrite it
    jan_dir = os.path.join(idx, "buckets", "ds=2026-01-02")
    jan_inodes = {
        f: os.stat(os.path.join(jan_dir, f)).st_ino
        for f in os.listdir(jan_dir)
        if f.endswith(".parquet")
    }
    assert jan_inodes
    # month 3 gains a second day; a marker-less (crashed) day sits in
    # the NEW open window and must survive the swap untouched
    append_shard_to_span_index(
        _docs(spark, {11: "na1 na2 na3 na4 na5 na6"}), idx, "2026-03-02", window=W
    )
    append_shard_to_span_index(
        _docs(spark, {12: "ob1 ob2 ob3 ob4 ob5"}), idx, "2026-04-05", window=W
    )
    os.remove(os.path.join(idx, "buckets", "ds=2026-04-05", "_SUCCESS"))
    report2 = compact_span_index(
        spark, idx, before_ds="2026-04-01", granularity="month"
    )
    assert [(f["into_ds"], f["days"]) for f in report2["folds"]] == [
        ("2026-03-02", ["2026-03-01", "2026-03-02"])
    ]
    assert report2["compacted_through"] == "2026-03-02"
    assert {
        f: os.stat(os.path.join(jan_dir, f)).st_ino
        for f in os.listdir(jan_dir)
        if f.endswith(".parquet")
    } == jan_inodes, "already-folded month was rewritten, not carried"
    crashed = os.path.join(idx, "buckets", "ds=2026-04-05")
    assert os.path.isdir(crashed) and not os.path.exists(
        os.path.join(crashed, "_SUCCESS")
    )
    assert marker_complete_days(idx) == ["2026-01-02", "2026-02-02", "2026-03-02"]
    # the logical corpus grew (2026-03-02's doc is now stored), so the
    # post-fold probe is checked against the batch operator over the
    # complete days' texts — the replay-parity contract itself
    after = probes(before_ds="2026-05-01")
    assert after == batch_expected(
        {**{d: t for _, day in months.items() for d, t in day.items()},
         11: "na1 na2 na3 na4 na5 na6"}
    )
    # a marker-less day BELOW the prospective watermark still blocks:
    # folding May would advance the watermark past the crashed April
    # day, silently locking out its re-run — refuse instead
    for ds in ("2026-05-01", "2026-05-02"):
        append_shard_to_span_index(
            _docs(spark, {20: "pa1 pa2 pa3 pa4 pa5 " + ds}), idx, ds, window=W
        )
    with pytest.raises(RuntimeError, match="incomplete"):
        compact_span_index(
            spark, idx, before_ds="2026-06-01", granularity="month"
        )


def test_compaction_noop_on_single_day(spark, tmp_path):
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        compact_span_index,
    )

    idx = str(tmp_path / "idx")
    ds1, texts1 = DAYS[0]
    append_shard_to_span_index(_docs(spark, texts1), idx, ds1, window=W)
    assert compact_span_index(spark, idx)["status"] == "noop"


def test_daily_span_index_step(spark, tmp_path):
    """run_span_index_step (the daily pipeline's third index family):
    day 1 builds the index; day 2's shard carrying a span pasted from
    a day-1 doc gets flagged against the STORED corpus; with
    max_dup_span_frac set the over-threshold ids land in an
    idempotent span_flags/ds=<ds> partition; a day-2 re-run replaces
    (not duplicates) its rows."""
    from data_engineering_user_session_analysis_spark.jobs.batch_job import run_span_index_step

    out = str(tmp_path / "serving")
    d1 = {1: "w1 w2 " + SHARED13 + " w3 w4 w5 w6 w7 w8",
          2: "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"}
    # doc 11: mostly the day-1 span (coverage 7/10 > 0.6); doc 12
    # clean; doc 13 shares only the span's first 5-token window —
    # coverage 5/14 < 0.6, UNDER threshold but with dup spans, so the
    # all-docs vs flagged-only report keys diverge (ADVICE r13)
    d2 = {11: SHARED13 + " t1 t2 t3",
          12: "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12",
          13: "p q r s t x1 x2 x3 x4 x5 x6 x7 x8 x9"}
    paths = []
    for k, texts in ((1, d1), (2, d2)):
        p = str(tmp_path / f"shard{k}")
        _docs(spark, texts).write.parquet(p)
        paths.append(p)
    r1 = run_span_index_step(
        spark, paths[0], out, "2024-01-01", window=W, max_dup_span_frac=0.6
    )
    assert r1["shard_docs"] == 2 and r1["flagged_over_threshold"] == 0
    r2 = run_span_index_step(
        spark, paths[1], out, "2024-01-02", window=W, max_dup_span_frac=0.6
    )
    assert r2["flagged_over_threshold"] == 1
    assert r2["complete_days"] == 2
    # report-key semantics (ADVICE r13): dup_tokens is ALWAYS the
    # all-docs aggregate; the flagged-only sum has its own key.  Doc
    # 11 carries 7 dup tokens (flagged), doc 13 carries 5 (under
    # threshold) — the two keys must diverge here.
    assert r2["docs_with_dup_spans"] == 2
    assert r2["dup_tokens"] == 12
    assert r2["flagged_dup_tokens"] == 7
    flags = spark.read.parquet(os.path.join(out, "span_flags", "ds=2024-01-02"))
    rows = {r.doc_id: r.asDict() for r in flags.collect()}
    assert set(rows) == {11}
    assert rows[11]["dup_tokens"] == 7  # the full pasted span
    # idempotent re-run: same flags, no duplicate index rows
    r2b = run_span_index_step(
        spark, paths[1], out, "2024-01-02", window=W, max_dup_span_frac=0.6
    )
    assert r2b["flagged_over_threshold"] == 1
    name = ensure_span_index_table(spark, os.path.join(out, "span_index"))
    per_day = {
        r["ds"]: r["n"]
        for r in spark.table(name).groupBy("ds").count().withColumnRenamed("count", "n").collect()
    }
    assert set(per_day) == {"2024-01-01", "2024-01-02"}
    # stored geometry wins on re-runs: day-2 row count unchanged
    assert per_day["2024-01-02"] == sum(
        max(len(t.split()) - W + 1, 0) for t in d2.values()
    )


def test_compaction_refuses_to_fold_past_incomplete_day(spark, tmp_path):
    """ADVICE r13 (medium): a crashed (marker-less) partial day at or
    below the fold target would be silently dropped by the rebuild
    swap AND permanently locked out by the compacted_through
    watermark.  The fold must refuse instead; re-running the day's
    append clears the block."""
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        compact_span_index,
    )

    idx = str(tmp_path / "idx")
    for ds, texts in DAYS:
        append_shard_to_span_index(_docs(spark, texts), idx, ds, window=W)
    # simulate a crash that left day 1 partially written: files
    # present, completeness marker missing (days 2 and 3 complete, so
    # the fold itself would proceed — past the hole)
    os.remove(os.path.join(idx, "buckets", f"ds={DAYS[0][0]}", "_SUCCESS"))
    with pytest.raises(RuntimeError, match="incomplete"):
        compact_span_index(spark, idx)
    # the refusal left the live index untouched
    assert marker_complete_days(idx) == [DAYS[1][0], DAYS[2][0]]
    # re-running the day's append (stamps the marker) unblocks the fold
    append_shard_to_span_index(_docs(spark, DAYS[0][1]), idx, DAYS[0][0], window=W)
    report = compact_span_index(spark, idx)
    assert report["status"] == "compacted"
    assert report["folded_days"] == [d for d, _ in DAYS]


def test_ddl_spliced_parts_are_validated(spark, tmp_path):
    """ADVICE r13: the external-table DDL splices the index location
    and the stored id column name/type — a quoted path or an exotic
    column type must fail loudly before reaching the SQL text."""
    ds1, texts1 = DAYS[0]
    # location containing a quote: refused before any DDL runs
    bad_path = str(tmp_path / "i'x")
    with pytest.raises(ValueError, match="not expressible"):
        append_shard_to_span_index(_docs(spark, texts1), bad_path, ds1, window=W)
    # id column of a type outside the DDL allowlist (double)
    docs_bad = spark.createDataFrame(
        [(1.5, "a b c d e f g")], "doc_id double, text string"
    )
    with pytest.raises(ValueError, match="id column type"):
        append_shard_to_span_index(
            docs_bad, str(tmp_path / "idx2"), ds1, window=W
        )


def test_marker_written_last_and_success_present(spark, tmp_path):
    idx = str(tmp_path / "idx")
    ds1, texts1 = DAYS[0]
    append_shard_to_span_index(_docs(spark, texts1), idx, ds1, window=W)
    assert os.path.exists(os.path.join(idx, "buckets", f"ds={ds1}", "_SUCCESS"))
    assert marker_complete_days(idx) == [ds1]


def test_carried_days_below_watermark_stay_rerunnable(spark, tmp_path):
    """ADVICE r14: closure is tracked PER PARTITION
    (compacted_days.json), not by the single compacted_through
    watermark — a marker-complete lone-day month the fold merely
    carried by hardlink sits below the watermark with its partition
    intact, and its re-run (a data-correction replay) must not be
    locked out.  Folded days still refuse; a record-less legacy index
    keeps the conservative watermark semantics."""
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        compact_span_index,
    )

    idx = str(tmp_path / "idx")
    # lone-day January (will be carried), two-day March (will fold to
    # 2026-03-02 — ABOVE January), open April day
    jan = {1: "ja1 jb1 jc1 jd1 je1 " + SHARED13}
    march = {
        4: "ma4 mb4 mc4 md4 me4 " + SHARED123,
        5: "na5 nb5 nc5 nd5 ne5 " + SHARED123,
    }
    april = {8: "z8 y8 " + SHARED13 + " x8 " + SHARED123}
    append_shard_to_span_index(_docs(spark, jan), idx, "2026-01-15", window=W)
    append_shard_to_span_index(
        _docs(spark, {4: march[4]}), idx, "2026-03-01", window=W
    )
    append_shard_to_span_index(
        _docs(spark, {5: march[5]}), idx, "2026-03-02", window=W
    )
    append_shard_to_span_index(_docs(spark, april), idx, "2026-04-01", window=W)
    probe_docs = _docs(spark, {99: SHARED13 + " " + SHARED123})
    probe = lambda: _occ_set(  # noqa: E731
        incremental_span_occurrences(
            probe_docs, idx, before_ds="2026-05-01",
            only_ds=marker_complete_days(idx),
        )
    )
    before = probe()
    assert before, "fixture is vacuous"
    report = compact_span_index(
        spark, idx, before_ds="2026-04-01", granularity="month"
    )
    assert report["compacted_through"] == "2026-03-02"
    assert report["folded_days"] == ["2026-03-01", "2026-03-02"]
    # January (2026-01-15 < 2026-03-02) was carried, not folded: its
    # re-append is a partition-scoped replace of its own rows —
    # allowed, and idempotent (the probe set is unchanged)
    append_shard_to_span_index(_docs(spark, jan), idx, "2026-01-15", window=W)
    assert probe() == before
    # the folded days (fold target included) stay closed
    for ds, texts in (("2026-03-01", {4: march[4]}), ("2026-03-02", {5: march[5]})):
        with pytest.raises(ValueError, match="folded"):
            append_shard_to_span_index(_docs(spark, texts), idx, ds, window=W)
    # the open day above the watermark is untouched by all of this
    append_shard_to_span_index(_docs(spark, april), idx, "2026-04-01", window=W)
    assert probe() == before

    # legacy fallback: with only the pre-record watermark on disk
    # (compacted_days.json absent), which days historical folds
    # absorbed is unrecoverable — everything at or below the
    # watermark stays conservatively closed
    os.remove(os.path.join(idx, "compacted_days.json"))
    with pytest.raises(ValueError, match="folded"):
        append_shard_to_span_index(_docs(spark, jan), idx, "2026-01-15", window=W)
    # and the NEXT new-code fold preserves that conservatism as the
    # record's floor (April folds alone as a lone-day month -> noop;
    # grow April so a real fold runs)
    append_shard_to_span_index(
        _docs(spark, {9: "ap9 aq9 ar9 as9 at9 au9"}), idx, "2026-04-02", window=W
    )
    report2 = compact_span_index(
        spark, idx, before_ds="2026-05-01", granularity="month"
    )
    assert report2["folded_days"] == ["2026-04-01", "2026-04-02"]
    with pytest.raises(ValueError, match="folded"):
        # below the legacy floor, still closed
        append_shard_to_span_index(_docs(spark, jan), idx, "2026-01-15", window=W)
    with pytest.raises(ValueError, match="folded"):
        # newly folded day, closed by the per-day record
        append_shard_to_span_index(_docs(spark, april), idx, "2026-04-01", window=W)


def test_incremental_span_positions_matches_batch_pick(spark, tmp_path):
    """incremental_span_positions (VERDICT r14 #2): replaying the
    3-day fixture, each day's record must equal the batch operator's
    flagged-occurrence set + canonical pick over the FULL corpus,
    restricted to that day's docs — for every day whose stored
    prefix ∪ day covers all occurrences of the day's hashes.  Day 3
    (stored = days 1-2, union = full corpus) is the exact-parity day;
    keep flags there must match remove_duplicated_spans' pick."""
    from pyspark.sql import Window as W_

    from data_engineering_user_session_analysis_spark.operators.span_index import (
        incremental_span_positions,
    )

    idx = str(tmp_path / "idx")
    for ds, texts in DAYS[:2]:
        append_shard_to_span_index(_docs(spark, texts), idx, ds, window=W)
    ds3, texts3 = DAYS[2]
    append_shard_to_span_index(_docs(spark, texts3), idx, ds3, window=W)
    got = {
        (r.doc_id, r.pos, r.wh, r.keep)
        for r in incremental_span_positions(
            _docs(spark, texts3),
            idx,
            before_ds=ds3,
            only_ds=marker_complete_days(idx),
        ).collect()
    }
    # batch expectation: flag + canonical pick over the full corpus,
    # restricted to day-3 docs (the same computation
    # remove_duplicated_spans performs before its rewrite kernel)
    wh = positional_window_hashes(_docs(spark, ALL_TEXTS), window=W)
    occ = _flagged_occurrences(wh, "doc_id", 2)
    w_h = W_.partitionBy("wh")
    picked = occ.withColumn(
        "_c", F.min(F.struct(F.col("doc_id"), F.col("pos"))).over(w_h)
    ).select(
        "doc_id", "pos", "wh",
        ((F.col("doc_id") == F.col("_c.doc_id"))
         & (F.col("pos") == F.col("_c.pos"))).alias("keep"),
    )
    want = {
        (r.doc_id, r.pos, r.wh, r.keep)
        for r in picked.filter(F.col("doc_id").isin(list(texts3))).collect()
    }
    assert got == want
    # day-3 docs carry higher ids than every earlier occurrence, so
    # all their duplicated anchors are non-canonical (removals)
    assert got and all(not k for _, _, _, k in got)
    # the KEEP case: a day-4 pair duplicated only WITHIN the arriving
    # day — the smaller (doc_id, pos) occurrence is canonical and
    # keeps its copy; the other is excised
    day4 = {
        20: "q20a q20b q20c q20d q20e tailA",
        21: "q20a q20b q20c q20d q20e tailB",
    }
    append_shard_to_span_index(_docs(spark, day4), idx, "2026-01-04", window=W)
    got4 = {
        (r.doc_id, r.pos, r.keep)
        for r in incremental_span_positions(
            _docs(spark, day4),
            idx,
            before_ds="2026-01-04",
            only_ds=marker_complete_days(idx),
        ).collect()
    }
    assert got4 == {(20, 0, True), (21, 0, False)}


def test_probe_plan_stays_bucketed_after_compaction(spark, tmp_path):
    """VERDICT r14 #1, the layout half of the adjudication: the r14
    stress saw the post-fold occurrence probe 3-4x slower and could
    not say whether the folded layout had lost bucket alignment
    (real) or the fold's ~40M-row rewrite had evicted the page cache
    (bias).  This pins the layout side on a FOLDED index: after a
    rolling monthly fold AND after the full fold, the stored side of
    the probe's semi-join is still a bucketed scan with no exchange
    above it — identical assertions to the pre-fold pin.  With the
    plan pinned, any residual post-fold slowdown in the stress is
    measurement bias by elimination (the warm-paired probes there
    adjudicate it directly)."""
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        compact_span_index,
    )

    idx = str(tmp_path / "idx")
    _replay(spark, idx)
    ds3, texts3 = DAYS[2]
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}

    def stored_plan_is_bucketed() -> None:
        occ = incremental_span_occurrences(
            _docs(spark, texts3),
            idx,
            before_ds="2026-02-01",
            only_ds=marker_complete_days(idx),
        )
        plan = occ._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        scan_lines = [
            ln
            for ln in plan.splitlines()
            if "FileScan parquet" in ln and "span_idx_" in ln
        ]
        assert scan_lines, plan
        join_side = plan[: plan.index(scan_lines[0])]
        stored_branch = join_side[join_side.rindex("Join"):]
        assert "Exchange" not in stored_branch, plan

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # rolling fold: January's three fixture days -> one partition
        rep = compact_span_index(
            spark, idx, before_ds="2026-02-01", granularity="month"
        )
        assert rep["status"] == "compacted"
        stored_plan_is_bucketed()
        # full fold over the folded layout (idempotent here — one
        # partition left -> noop is fine; add a day so it folds again)
        append_shard_to_span_index(
            _docs(spark, {30: "pf1 pf2 pf3 pf4 pf5 pf6"}), idx,
            "2026-01-31", window=W,
        )
        rep2 = compact_span_index(spark, idx)
        assert rep2["status"] == "compacted"
        stored_plan_is_bucketed()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_positions_probe_adds_no_hash_shuffle_over_occurrences(spark, tmp_path):
    """The positions probe's scale contract (docstring): the
    canonical pick rides the SAME hash(wh)-partitioned window the
    min_docs=2 dup flag uses, so relative to the occurrence probe the
    positions plan adds only the O(day) id semi-join — the number of
    hash(wh) exchanges is IDENTICAL, and both Window nodes stack on
    one wh sort."""
    import re

    from data_engineering_user_session_analysis_spark.operators.span_index import (
        incremental_span_positions,
    )

    idx = str(tmp_path / "idx")
    ds1, texts1 = DAYS[0]
    append_shard_to_span_index(_docs(spark, texts1), idx, ds1, window=W)
    day2 = _docs(spark, DAYS[1][1])
    occ_plan = (
        incremental_span_occurrences(day2, idx, before_ds="2026-01-02")
        ._jdf.queryExecution().executedPlan().toString()
    )
    pos_plan = (
        incremental_span_positions(day2, idx, before_ds="2026-01-02")
        ._jdf.queryExecution().executedPlan().toString()
    )
    wh_ex = re.compile(r"Exchange hashpartitioning\(wh#")
    assert len(wh_ex.findall(pos_plan)) == len(wh_ex.findall(occ_plan))
    # the flag window and the canonical window both present, no
    # third: 2 Window nodes in positions vs 1 in occurrences
    assert pos_plan.count("Window [") == 2
    assert occ_plan.count("Window [") == 1


def test_positions_rewrite_property(spark, tmp_path_factory):
    """Property pin for the round-15 rewrite record: for ANY small
    corpus split into two days, rewriting day-2's docs from
    `incremental_span_positions` (day 2 probed against stored day 1)
    must equal the batch `remove_duplicated_spans` over the FULL
    corpus restricted to day-2 docs.  Random token streams drawn from
    a tiny alphabet force heavy window collisions: cross-day dups,
    within-day dups, canonical keeps on either side, and docs below
    the window length (no rows)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_engineering_user_session_analysis_spark.operators.span_dedup import (
        remove_duplicated_spans,
        rewrite_docs_from_spans,
    )
    from data_engineering_user_session_analysis_spark.operators.span_index import (
        incremental_span_positions,
    )

    W2 = 3
    token = st.sampled_from(["aa", "bb", "cc"])

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.lists(token, min_size=1, max_size=9).map(" ".join),
            min_size=2,
            max_size=8,
        ),
        st.data(),
    )
    def run(texts, data):
        docs = {i: t for i, t in enumerate(texts)}
        split = data.draw(
            st.integers(min_value=1, max_value=len(texts) - 1), label="split"
        )
        day1 = {i: t for i, t in docs.items() if i < split}
        day2 = {i: t for i, t in docs.items() if i >= split}
        idx = str(tmp_path_factory.mktemp("prop") / "idx")
        append_shard_to_span_index(
            _docs(spark, day1), idx, "2026-01-01", window=W2
        )
        append_shard_to_span_index(
            _docs(spark, day2), idx, "2026-01-02", window=W2
        )
        pos = incremental_span_positions(
            _docs(spark, day2),
            idx,
            before_ds="2026-01-02",
            only_ds=marker_complete_days(idx),
        )
        got = {
            r.doc_id: (r.text, r.n_removed_tokens)
            for r in rewrite_docs_from_spans(
                _docs(spark, day2), pos, window=W2
            ).collect()
        }
        want = {
            r.doc_id: (r.text, r.n_removed_tokens)
            for r in remove_duplicated_spans(
                _docs(spark, docs), window=W2
            ).collect()
            if r.doc_id >= split
        }
        assert got == want

    run()
