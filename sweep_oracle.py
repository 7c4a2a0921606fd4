#!/usr/bin/env python
"""Registry-wide DuckDB-oracle sweep at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01 and the per-round closing
sweep re-runs it at sf0.1 (COVERAGE.md).  This script extends the
"right answer, not just runs" claim one decade further (VERDICT r10
item 2): it runs every registry query on Spark AND its oracle SQL on
DuckDB over the same parquet decade (default the generated
``.testdata/sf1`` — see tools/gen_testdata.py) and records a per-query
status artifact.

Per query:
- ``pass``            spark vs oracle: rows + schema + exact values
- ``mismatch``        comparison ran, values differ (failure)
- ``rows_only``       no oracle SQL registered (streaming/iterative)
                      — spark ran, row count + schema recorded
- ``oracle_skipped``  oracle exceeded SWEEP_ORACLE_TIMEOUT_S (DuckDB
                      interrupted) or errored at this scale — spark
                      row count + schema recorded, note says why
- ``spark_error``     the engine itself failed (failure)

Probe-paired (VERDICT r10 item 6): a fixed-size CPU probe runs at
sweep start and end so timings are attributable under host steal.

Usage: python sweep_oracle.py [SF_DIR] [OUT_JSON]
Env:   SWEEP_ORACLE_TIMEOUT_S (default 600)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_probe() -> float:
    import numpy as np

    a = np.random.RandomState(0).randn(1500, 1500)
    t0 = time.perf_counter()
    for _ in range(6):
        a @ a
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".testdata/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SWEEP_sf1_r11.json"
    timeout_s = float(os.environ.get("SWEEP_ORACLE_TIMEOUT_S", "600"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import duckdb

    from data_engineering_user_session_analysis_spark import get_spark
    from data_engineering_user_session_analysis_spark.queries import ORACLE, QUERIES
    from tests.oracle_harness import compare, duckdb_conn

    _cpu_probe()  # warmup, discarded
    probe_start = _cpu_probe()

    spark = get_spark("sweep")
    con = duckdb_conn(sf_dir)
    con.execute("SET threads TO 16")
    con.execute("SET memory_limit = '48GB'")

    def run_oracle(sql: str):
        """fetchdf with an interrupt watchdog: DuckDB has no statement
        timeout, so a quadratic oracle at this decade is bounded by
        con.interrupt() from a timer thread."""
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()

    results: dict[str, dict] = {}
    for name in sorted(QUERIES):
        entry: dict = {"status": None, "spark_sec": None, "oracle_sec": None}
        t0 = time.perf_counter()
        try:
            spark_df = QUERIES[name](spark, sf_dir)
            spdf = spark_df.toPandas()
            entry["spark_sec"] = round(time.perf_counter() - t0, 3)
            entry["spark_rows"] = len(spdf)
            entry["columns"] = sorted(spdf.columns)
        except Exception as exc:
            entry["status"] = "spark_error"
            entry["error"] = repr(exc)[:500]
            results[name] = entry
            print(json.dumps({name: entry}), flush=True)
            continue
        if name not in ORACLE:
            entry["status"] = "rows_only"
            entry["note"] = "no oracle SQL registered (driver records the same weaker check)"
        else:
            t1 = time.perf_counter()
            try:
                oracle_pdf = run_oracle(ORACLE[name])
                entry["oracle_sec"] = round(time.perf_counter() - t1, 3)
                entry["oracle_rows"] = len(oracle_pdf)
                import pandas as pd

                problems = compare(name, spark_df, oracle_pdf)
                entry["status"] = "pass" if not problems else "mismatch"
                if problems:
                    entry["problems"] = problems[:5]
            except (duckdb.InterruptException, RuntimeError) as exc:
                entry["status"] = "oracle_skipped"
                entry["note"] = (
                    f"oracle interrupted/errored at sf{sf} after "
                    f"{round(time.perf_counter() - t1, 1)}s "
                    f"(timeout {timeout_s}s): {repr(exc)[:200]}; "
                    "spark rows+schema recorded"
                )
            except Exception as exc:
                entry["status"] = "oracle_skipped"
                entry["note"] = f"oracle error at sf{sf}: {repr(exc)[:300]}; spark rows+schema recorded"
        results[name] = entry
        print(json.dumps({name: {k: entry[k] for k in ('status', 'spark_sec', 'oracle_sec') if k in entry}}), flush=True)
        spark.catalog.clearCache()

    probe_end = _cpu_probe()
    statuses = [e["status"] for e in results.values()]
    data_provenance = (
        "tools/gen_testdata.py seed=42 (driver ships sf<=0.1; schema "
        "byte-identical, distributions measured from sf0.1)"
        if ".testdata" in sf_dir
        else "driver-shipped tables (/root/testdata)"
    )
    payload = {
        "sf": sf,
        "sf_dir": sf_dir,
        "data_provenance": data_provenance,
        "n_queries": len(results),
        "n_pass": statuses.count("pass"),
        "n_mismatch": statuses.count("mismatch"),
        "n_rows_only": statuses.count("rows_only"),
        "n_oracle_skipped": statuses.count("oracle_skipped"),
        "n_spark_error": statuses.count("spark_error"),
        "oracle_timeout_s": timeout_s,
        "cpu_probe_sec_start": probe_start,
        "cpu_probe_sec_end": probe_end,
        "total_spark_sec": round(
            sum(e["spark_sec"] or 0.0 for e in results.values()), 2
        ),
        "total_oracle_sec": round(
            sum(e["oracle_sec"] or 0.0 for e in results.values()), 2
        ),
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    compact = {k: v for k, v in payload.items() if k != "queries"}
    compact["mismatches"] = sorted(
        n for n, e in results.items() if e["status"] in ("mismatch", "spark_error")
    )
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
