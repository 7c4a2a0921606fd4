"""Pins for the stress bench's clone-growth methodology.

The scale evidence in STRESS_sf1_r{N}.json is only as good as the
inflated tables it runs on: if the per-shard key shifts broke join
integrity (clone orders losing their lineitems or their customer),
every relational stress timing would measure a different — easier —
join. These tests build a 3-replica clone set at sf0.001 and check
the invariants the methodology claims:

- row counts scale exactly by the replica count;
- key spaces of distinct shards are disjoint (no accidental merges);
- every clone order joins to exactly its clone customer and exactly
  its source order's lineitem fanout (per-order join cardinality is
  replica-invariant);
- file count scales with data (a clone table inheriting its source's
  2-file layout would serialize downstream scans — the artifact the
  builder explicitly repartitions away).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import stress_bench as sb

REPLICAS = 3


@pytest.fixture(scope="module")
def clone_dir(spark, sf_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clone_tpch"))
    for table, shifts in sb.TPCH_SHIFTS.items():
        sb._build_clone_table(
            spark,
            os.path.join(sf_small, f"{table}.parquet"),
            os.path.join(out, f"{table}.parquet"),
            shifts,
            REPLICAS,
        )
    return out


def test_clone_row_counts_scale_exactly(spark, sf_small, clone_dir):
    for table in sb.TPCH_SHIFTS:
        base = spark.read.parquet(os.path.join(sf_small, f"{table}.parquet")).count()
        grown = spark.read.parquet(os.path.join(clone_dir, f"{table}.parquet")).count()
        assert grown == REPLICAS * base, table


def test_clone_shards_have_disjoint_key_spaces(spark, sf_small, clone_dir):
    orders = spark.read.parquet(os.path.join(clone_dir, "orders.parquet"))
    step = sb.TPCH_SHIFTS["orders"]["o_orderkey"]
    # every shard contributes exactly the base count, and the same key
    # never appears twice (disjointness == total distinct preserved)
    base = spark.read.parquet(os.path.join(sf_small, "orders.parquet")).count()
    per_shard = (
        orders.groupBy((F.col("o_orderkey") / step).cast("long").alias("shard"))
        .count()
        .collect()
    )
    assert len(per_shard) == REPLICAS
    assert all(r["count"] == base for r in per_shard)
    assert orders.select("o_orderkey").distinct().count() == REPLICAS * base


def test_clone_join_cardinality_is_replica_invariant(spark, sf_small, clone_dir):
    """Each clone order keeps exactly its source's lineitem fanout and
    exactly one customer — the join work per order is unchanged, so a
    stress timing measures MORE of the same join, not a different one."""
    li = spark.read.parquet(os.path.join(clone_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(clone_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(clone_dir, "customer.parquet"))

    o_step = sb.TPCH_SHIFTS["orders"]["o_orderkey"]
    base_fanout = {
        r["l_orderkey"]: r["n"]
        for r in spark.read.parquet(os.path.join(sf_small, "lineitem.parquet"))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    grown_fanout = (
        li.groupBy("l_orderkey").agg(F.count("*").alias("n")).collect()
    )
    assert len(grown_fanout) == REPLICAS * len(base_fanout)
    for r in grown_fanout:
        assert r["n"] == base_fanout[r["l_orderkey"] % o_step], r

    # orders ⋈ customer: inner join loses no orders (every clone
    # custkey exists in the clone customer shard)
    matched = orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").count()
    assert matched == orders.count()


def test_clone_file_count_scales_with_replicas(spark, clone_dir):
    files = [
        f
        for f in os.listdir(os.path.join(clone_dir, "lineitem.parquet"))
        if f.endswith(".parquet")
    ]
    assert len(files) >= max(spark.sparkContext.defaultParallelism, REPLICAS)
