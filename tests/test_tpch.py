"""Anti-join coverage pins for the round-9 registry consolidation.

The `customers_no_orders` driver row was retired: the testdata
generator gives every customer at least one order, so the row was
permanently 0-row — both engines returning empty is a vacuous pass.
These pins keep the LeftAnti surface honestly covered:

* the anti-join SEMANTICS are checked non-vacuously (a date-window
  restriction leaves a strict subset of customers orderless, and the
  anti join must equal an independent left-join/null-filter witness);
* the registry PLAN coverage moved to `user_segments`, whose
  `subtract` now compiles to a LeftAnti join (and whose `intersect`
  to LeftSemi) — pinned here so a rewrite back to the exceptAll
  replicate-union form fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.queries.relational_queries import (
    user_segments,
)
from data_engineering_user_session_analysis_spark.queries.tpch_queries import (
    customers_no_orders,
)
from data_engineering_user_session_analysis_spark.sources.tables import load_table


def test_anti_join_non_vacuous(spark, sf_small):
    # documents why the registry row was retired: on this generator
    # the unrestricted NOT EXISTS is empty at every SF
    assert customers_no_orders(spark, sf_small).count() == 0

    customer = load_table(spark, sf_small, "customer")
    orders = load_table(spark, sf_small, "orders")
    o95 = orders.filter(F.year("o_orderdate") == 1995)

    anti = customer.join(
        o95, customer.c_custkey == o95.o_custkey, "left_anti"
    ).select("c_custkey")
    witness = (
        customer.join(
            o95.select("o_custkey").distinct(),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .filter(F.col("o_custkey").isNull())
        .select("c_custkey")
    )

    n_anti, n_cust = anti.count(), customer.count()
    assert 0 < n_anti < n_cust, (
        f"anti join must be non-vacuous AND non-total: {n_anti}/{n_cust}"
    )
    assert anti.subtract(witness).count() == 0
    assert witness.subtract(anti).count() == 0


def test_user_segments_plans_left_anti_and_semi(spark, sf_small):
    plan = (
        user_segments(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, "subtract must plan as a LeftAnti join"
    assert "LeftSemi" in plan, "intersect must plan as a LeftSemi join"


def test_late_shipment_semi_join_non_vacuous(spark, sf_small):
    """The retired `late_shipment_orders` registry row's semantics,
    pinned non-vacuously (round-10 consolidation, COVERAGE.md): the
    NON-EQUI correlated-EXISTS (left-semi with a range condition)
    must equal an independent witness — inner join on the same
    condition followed by a distinct on the order key — and must
    discriminate: some orders qualify, some do not."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.queries.tpch_queries import (
        late_shipment_orders,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    got = {
        (r.o_orderpriority, r.n_orders)
        for r in late_shipment_orders(spark, sf_small).collect()
    }

    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.date_add(orders.o_orderdate, 60)
    )
    witness = {
        (r.o_orderpriority, r.n_orders)
        for r in orders.join(li, cond)
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .collect()
    }
    assert got == witness
    # non-vacuous both ways: qualifying orders exist AND the predicate
    # excludes some orders (a semi-join that keeps everything or
    # nothing would pass any equality check vacuously)
    n_qualifying = sum(n for _, n in got)
    assert n_qualifying > 0
    assert n_qualifying < orders.count()
