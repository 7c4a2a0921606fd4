"""SCD2 merge: dimension history under successive update batches."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.scd import scd2_merge

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)

SCHEMA = "custkey long, segment string, valid_from timestamp, valid_to timestamp"


def test_scd2_two_batches(spark):
    history = spark.createDataFrame(
        [(1, "BUILDING", T0, None), (2, "MACHINERY", T0, None)], SCHEMA
    )
    # batch 1: customer 1 changes segment, customer 3 appears,
    # customer 2 update is a no-op (same value)
    updates1 = spark.createDataFrame(
        [(1, "AUTOMOBILE", T1), (2, "MACHINERY", T1), (3, "HOUSEHOLD", T1)],
        "custkey long, segment string, change_ts timestamp",
    )
    h1 = scd2_merge(history, updates1, "custkey", ["segment"])
    rows = {(r.custkey, r.segment, r.valid_from, r.valid_to) for r in h1.collect()}
    assert rows == {
        (1, "BUILDING", T0, T1),
        (1, "AUTOMOBILE", T1, None),
        (2, "MACHINERY", T0, None),  # no-op update: row untouched
        (3, "HOUSEHOLD", T1, None),
    }

    # batch 2: customer 1 changes again -> three versions total
    updates2 = spark.createDataFrame(
        [(1, "FURNITURE", T2)], "custkey long, segment string, change_ts timestamp"
    )
    h2 = scd2_merge(h1, updates2, "custkey", ["segment"])
    c1 = sorted(
        [(r.segment, r.valid_from, r.valid_to) for r in h2.filter("custkey = 1").collect()],
        key=lambda t: t[1],
    )
    assert c1 == [
        ("BUILDING", T0, T1),
        ("AUTOMOBILE", T1, T2),
        ("FURNITURE", T2, None),
    ]
    # exactly one open row per key
    opens = h2.filter(F.col("valid_to").isNull()).groupBy("custkey").count()
    assert opens.filter("count != 1").count() == 0
