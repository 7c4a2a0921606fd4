"""Custom stateful streaming — the ``applyInPandasWithState`` escape
hatch (SURVEY.md §2.8/§7.4: reserved for semantics ``session_window``
can't express; the reference's checkpointed stateful operator is
covered by the built-in, so this exists to prove the hatch).

``running_user_totals`` keeps per-user lifetime counters across
micro-batches (the state shape of a feature store's online
aggregates): arbitrary Python state per key, update-mode emission
every batch the key appears in.  State lives in the state store
(RocksDB under this engine's session conf), evicted only by timeout
policy — unlike ``session_window`` there is no watermark-driven
eviction unless a timeout is set, which is the cost of going custom.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Lifetime per-user counters, one emission per batch per active
    key (output mode: update)."""
    from data_engineering_user_session_analysis_spark.runtime import ensure_worker_imports

    ensure_worker_imports(events.sparkSession)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": pd.Series([total], dtype="float64"),
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
