"""Physical-plan audit helpers — the scale-shape checks as a library.

A query that returns the right rows can still be a 100 TB incident:
a lost filter pushdown re-reads every column of every file, an extra
exchange doubles shuffle volume, a range predicate that degrades to
BroadcastNestedLoopJoin goes quadratic.  `tests/test_plans.py` pins
these properties per query; this module is the same checks as a
reusable API so jobs and notebooks can assert their own plan shapes
(e.g. in CI against a production-sized catalog, where statistics —
and therefore join strategies — differ from the test fixtures).

All helpers inspect the EXECUTED plan string (post-AQE where
applicable) — the thing Spark actually runs, not the logical intent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: join operators that imply an O(|L|·|R|) comparison loop
_NON_EQUI_JOINS = ("BroadcastNestedLoopJoin", "CartesianProduct")


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of hash-partitioned shuffles in the plan.  Every one is
    a full write+read of its input across the cluster — the first
    number to check when a query is slower than it should be."""
    return executed_plan(df).count("Exchange hashpartitioning")


def count_scans(df: DataFrame, fmt: str = "parquet") -> int:
    """Number of file scans.  A logical input scanned twice means a
    DAG branch is being recomputed — cache/checkpoint it or restructure
    to a single pass."""
    return executed_plan(df).count(f"Scan {fmt}")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears inside a scan's PushedFilters list
    (e.g. ``"GreaterThan(value,100.0)"``).  A filter that does not
    reach the scan is evaluated after full-row materialization."""
    plan = executed_plan(df)
    return any(
        fragment in seg.split("]", 1)[0]
        for seg in plan.split("PushedFilters: [")[1:]
    )


def has_partition_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears inside a scan's PartitionFilters
    list — i.e. partition pruning is happening for that predicate."""
    plan = executed_plan(df)
    return any(
        fragment in seg.split("]", 1)[0]
        for seg in plan.split("PartitionFilters: [")[1:]
    )


def is_equi_join_only(df: DataFrame) -> bool:
    """True if no join in the plan degrades to a nested-loop or
    cartesian strategy.  (Intentional tiny-side BNLJ — e.g. a literal
    anchor set — should be asserted directly, not through this.)"""
    plan = executed_plan(df)
    return not any(op in plan for op in _NON_EQUI_JOINS)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans (the ``*(n)``
    markers in the plan string).  Wider/fewer spans mean more of the
    plan runs as generated JVM loops; a span break in a hot path
    usually marks a non-codegen expression (higher-order functions,
    python UDFs) worth hoisting out.  Note: under AQE the executed
    plan is not final until the first action — span counts on
    unexecuted AQE plans can be 0."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))
