"""Named-query registry: the engine's user-facing query surface.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) an ANSI-SQL oracle string that DuckDB can run over
the same parquet tables.  The driver's correctness gate compares the
two at sf=0.01 (row-count + schema + order-insensitive value hash),
so every computed column is aliased identically on both sides, and
float aggregation goes through exact decimal partial sums before a
final cast to double (deterministic across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Import for side effects: each module registers its queries.
#
# The registry holds EXACTLY 50 entries — the driver's correctness
# gate records rows for the first 50 in registration order (round 1
# registered 65 and the tail was never driver-checked).  Overlapping
# round-1 entries were consolidated so every operator family keeps a
# checked row; COVERAGE.md maps each retired name to the surviving
# query that carries its coverage.  Registration order = reference
# surface first (sessions, relational core), extensions after.
from data_engineering_user_session_analysis_spark.queries import session_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import tpch_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import streaming_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import enrichment_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import relational_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import function_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import text_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import text_extended_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import dedup_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import similarity_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import multimodal_queries  # noqa: E402,F401
from data_engineering_user_session_analysis_spark.queries import sampling_queries  # noqa: E402,F401

assert len(QUERIES) == 50, (
    f"registry must stay at the 50-row driver cap, got {len(QUERIES)}: "
    "consolidate before adding (see COVERAGE.md)"
)
