#!/usr/bin/env python
"""Capture the distributed-CC convergence check's executed plan
(plans/r16/cc_convergence_check_{before,after}.txt).

The check runs inside ``_cc_rounds`` on an internal DataFrame, so the
capture instruments ``DataFrame.count`` and dumps the query execution
of every counted plan, keeping the convergence-check ones (the r16
form carries ``_prev``; the r15 form is a self-join of two label
tables on ``node``).  Run once per code version:

    python tools/capture_cc_check_plan.py plans/r16/cc_convergence_check_after.txt
    # git stash push -- .../operators/dedup.py && rerun for _before

A 64-node chain with ``driver_max_edges=0`` forces the distributed
regime; the plan SHAPE (join vs filter) is scale-independent.
"""
import sys

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import SparkSession

sys.path.insert(0, ".")


def main() -> None:
    out = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cc-check-plan-capture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_user_session_analysis_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
    )
    cls = type(pairs)
    captured: list = []
    orig = cls.count

    def recording(self):
        qe = self._jdf.queryExecution()
        captured.append(qe.toString())
        return orig(self)

    cls.count = recording
    try:
        dedup.connected_components(pairs, max_iter=25, driver_max_edges=0).collect()
    finally:
        cls.count = orig

    # the convergence checks are the counts whose plan touches labels:
    # r16 form references `_prev`, r15 form joins two label tables on
    # `node` — either way a Project/Join over `label`; the edge-count
    # probe plan has neither column
    checks = [p for p in captured if "_prev" in p or "label" in p]
    if not checks:
        raise SystemExit("no convergence-check count captured")
    with open(out, "w") as f:
        f.write(
            "convergence-check plan, first checked round (captured via an\n"
            "instrumented DataFrame.count inside _cc_rounds; 64-node chain,\n"
            "driver_max_edges=0 forces the distributed regime)\n\n"
        )
        f.write(checks[0])
        f.write("\n")
    print(f"wrote {out} ({len(checks)} check plans captured, kept first)")
    spark.stop()


if __name__ == "__main__":
    main()
