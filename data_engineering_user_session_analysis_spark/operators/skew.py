"""Skew-mitigation: salted two-phase aggregation.

AQE's skew-join handling covers joins; for *aggregations* on heavily
skewed keys (one user with 10^8 events), a single reducer still owns
the hot key's partial state.  Spark's hash aggregation already does
map-side partial aggregation, which usually suffices — salting is the
explicit fallback when the number of distinct groups per partition is
so high that partial maps spill and the hot key's traffic still
concentrates.

``salted_agg`` spreads each key over ``buckets`` sub-keys, aggregates
partially per (key, salt), then merges partials per key — two small
shuffles instead of one hot one.  Only algebraic aggregates (sum,
count, min, max) merge losslessly; the API is restricted to those.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``aggs`` maps output column name -> (fn, input column) with fn in
    {sum, count, min, max}.  Result is identical to a direct
    ``groupBy(keys).agg(...)`` — pinned by the oracle of the query
    that uses it.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_PARTIAL)
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) not salt-safe: {unknown}")
    # Salt from a per-ROW source, not row content: a hot key made of
    # many IDENTICAL rows (the realistic skew case) must still spread
    # across buckets, and content-hash salting would put them all in
    # one.  Determinism of the salt is irrelevant — phase 2
    # re-aggregates per key, so any assignment merges to the same
    # result.
    salt = F.pmod(
        F.hash(F.monotonically_increasing_id(), F.spark_partition_id()),
        F.lit(buckets),
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _PARTIAL[fn](col).alias(f"_p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"_p_{name}").alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
