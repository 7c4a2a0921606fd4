#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall-clock seconds.

Each query is forced with the `noop` sink — full computation, no
driver-side collection cost in the measurement.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OVERHEAD_FLOOR = 0.5  # sec: below in both rounds -> exempt
COMPUTE_BOUND = 2.0  # sec: at/above in either round -> normalized-only
NORM_HARD_BAR = 1.5  # normalized above this flags REGARDLESS of nominal


def gate_row(now_sec: float, prev_sec: float, norm: float, nominal: float) -> str:
    """Regression-gate verdict for one cross-round row — see the gate
    comment in main() for the three-class rationale (r11 measured 14
    false flags on sub-second rows; ADVICE r11 showed the global
    nominal floor masks compute-bound regressions on a faster box).

    VERDICT r13 #3: a row whose NOMINAL time improved cannot be a
    regression — r13's driver tail run produced four normalized-only
    flags (all nominally faster than r12, pure probe drift) that no
    one was around to adjudicate.  Such rows now self-adjudicate as
    ``auto_adjudicated_nominal_improved`` instead of flagging: both
    ratios stay in the artifact.

    ADVICE r14 bounds the self-adjudication: unlimited
    nominal-improved auto-pass re-opened exactly the masked-regression
    hole the normalized column exists for (a genuinely 1.5x-slower
    query on a 2x-faster box shows nominal ~0.75 and would merge
    silently).  Normalized above ``NORM_HARD_BAR`` therefore flags
    regardless of nominal — probe drift measured across rounds stays
    well inside 1.5x (the r13 drift flags sat at 1.26-1.41), so the
    band 1.25 < norm <= 1.5 remains the drift-absorbing
    auto-adjudication zone and anything past it demands a human."""
    if now_sec < OVERHEAD_FLOOR and prev_sec < OVERHEAD_FLOOR:
        return "exempt_overhead_bound"
    if max(now_sec, prev_sec) >= COMPUTE_BOUND:
        if norm > 1.25:
            if nominal > 1.0 or norm > NORM_HARD_BAR:
                return "flagged"
            return "auto_adjudicated_nominal_improved"
        return "ok"
    return "flagged" if norm > 1.25 and nominal > 1.1 else "ok"


GLOBAL_SHIFT_BAR = 1.15  # median nominal above this -> one global flag

# Keys allowed on the ONE stdout JSON line (round 16) — everything
# else (trials, probe series, shift decomposition, gate prose, family
# subtotals) lives only in the full-detail file.  The driver captures
# a bounded tail of stdout, and the unbounded r13/r14 lines truncated
# mid-JSON (`parsed: null`), losing two rounds of prev/now tables.
STDOUT_KEYS = (
    "metric",
    "value",
    "unit",
    "queries",
    "shared_r02_subtotal",
    "registry_queries",
    "full_registry_total",
    "ingest_events_per_sec",
    "corpus_prep_docs_per_sec",
    "cpu_probe_sec_start",
    "cpu_probe_sec_end",
    "flagged_normalized_gt_1_25",
    "context",
    "sf",
)


def cross_round_shift(ratios: "dict[str, dict]") -> dict:
    """Decompose cross-round drift into ONE global question plus
    per-row residuals (round 15).  The r15 battery produced six
    flagged rows across six unrelated families, all sharing the same
    ~1.2x nominal shift under a probe unit reading FASTER — the box
    was uniformly slower than the baseline round in a way the matmul
    probe does not track (AVX-bound vs JVM memory/IPC-bound work
    de-correlate under host steal).  Adjudicating that is one
    decision ("box or code?"), not six; the per-row gate should see
    ratios with the uniform component removed.

    The global shift estimator is the MEDIAN ratio across all
    comparable rows: a code change touches few rows, so the median is
    robust to it, while a box-state shift moves every row together.
    Correction is applied only in the slow direction
    (``max(median, 1.0)``): a uniformly FASTER box deflates nominal
    ratios, and dividing by a sub-1 median would manufacture flags
    for overhead-bound rows that cannot track box speed — the
    masked-regression direction is already covered by the probe
    normalization and the NORM_HARD_BAR.

    When the median itself exceeds ``GLOBAL_SHIFT_BAR`` the artifact
    carries ``global_shift_flagged`` — the single adjudication item
    replacing the correlated row flags.  Fewer than 10 comparable
    rows -> no correction (medians of tiny samples aren't robust).

    ``ratios``: name -> {nominal_ratio, normalized_ratio}.  Returns
    the medians, the correction divisors, and the flag."""
    noms = sorted(v["nominal_ratio"] for v in ratios.values())
    norms = sorted(v["normalized_ratio"] for v in ratios.values())
    if len(noms) < 10:
        return {
            "median_nominal": round(noms[len(noms) // 2], 4) if noms else None,
            "median_normalized": (
                round(norms[len(norms) // 2], 4) if norms else None
            ),
            "nominal_divisor": 1.0,
            "normalized_divisor": 1.0,
            "global_shift_flagged": False,
            "n_rows": len(noms),
        }
    med_nom = noms[len(noms) // 2]
    med_norm = norms[len(norms) // 2]
    return {
        "median_nominal": round(med_nom, 4),
        "median_normalized": round(med_norm, 4),
        "nominal_divisor": round(max(med_nom, 1.0), 4),
        "normalized_divisor": round(max(med_norm, 1.0), 4),
        "global_shift_flagged": med_nom > GLOBAL_SHIFT_BAR,
        "n_rows": len(noms),
    }


def probe_series_unit(series: list[dict], idx: int) -> float:
    """Box probe unit at row position idx+0.5: piecewise-linear
    between the bracketing probes of a run's ``cpu_probe_series``
    (``at_row`` = rows measured before that probe was taken)."""
    x = idx + 0.5
    pts = [(p["at_row"], p["sec"]) for p in series]
    if x <= pts[0][0]:
        return pts[0][1]
    if x >= pts[-1][0]:
        return pts[-1][1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x0 <= x <= x1:
            return y0 + (x - x0) / (x1 - x0) * (y1 - y0) if x1 > x0 else y0
    return pts[-1][1]


HEADLINE = [
    "session_rollup",
    "session_rollup_keyed",
    "user_level",
    "favorite_event_type",
    "daily_activity",
    "q1_pricing_summary",
    "top_customers",
    "q5_local_supplier_volume",
    "late_shipment_orders",
    "supplier_part_share",
    "doc_token_stats",
    "dedup_exact",
    "knn_brute_force",
    "ann_ivf_topk",
    "embedding_neardup",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "simhash_near_pairs",
    "session_event_attribution",
    "media_features",
    "lang_id",
    "doc_decontamination",
    "streaming_session_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from data_engineering_user_session_analysis_spark import get_spark
    from data_engineering_user_session_analysis_spark.queries import QUERIES
    from data_engineering_user_session_analysis_spark.queries import (
        text_extended_queries,
        tpch_queries,
    )

    # Retired-from-registry queries that stay in the HEADLINE /
    # shared-r02 sets: the cross-round subtotal is a like-for-like
    # yardstick, so a registry consolidation (late_shipment_orders ->
    # ann_cos_route round 10, lang_id -> doc_quality_scores round 12)
    # must not silently zero a shared row — the function is still
    # importable and is timed directly.
    RETIRED = {
        "late_shipment_orders": tpch_queries.late_shipment_orders,
        "lang_id": text_extended_queries.lang_id,
    }

    def _q(name):
        return QUERIES.get(name) or RETIRED[name]

    # Fixed-size CPU probe at run start and end: this box is a microVM
    # whose effective speed varies ~2.3x with host steal (measured,
    # STRESS_sf1_r10 d2 reruns) — a run-level speed reading in the
    # artifact lets cross-round comparisons attribute uniform drift to
    # the box instead of re-measuring by hand.
    def _cpu_probe() -> float:
        import numpy as _np

        a = _np.random.RandomState(0).randn(1500, 1500)
        t0 = time.perf_counter()
        for _ in range(6):
            a @ a
        return round(time.perf_counter() - t0, 3)

    _cpu_probe()  # first-touch/thread-pool warmup, discarded

    # Probe SERIES, not just endpoints: r11's gate interpolated two
    # endpoint probes by row position, and one mid-run 2.2x box-speed
    # step change flagged 14 unchanged sub-second rows (the step is
    # invisible to a 2-point linear model).  A probe every
    # PROBE_EVERY measured rows brackets each row by probes a few
    # seconds away, so a step change only distorts the one segment it
    # lands in.  Cost: ~10 probes x ~0.2s on a ~70s run.
    PROBE_EVERY = 8
    probe_series: list[dict] = []
    rows_measured = 0

    def _probe_mark() -> None:
        probe_series.append({"at_row": rows_measured, "sec": _cpu_probe()})

    _probe_mark()
    probe_start = probe_series[0]["sec"]

    spark = get_spark("bench")
    # JVM/codegen warmup on the smallest SF so per-query numbers
    # measure the plan, not first-call JIT.
    QUERIES["funnel"](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    def _clear_caches() -> None:
        # drop caches between queries: intra-query cache reuse stays
        # within a trial, but one query's cached intermediates must
        # not occupy memory (GC pressure) while another is timed.
        # localCheckpoint RDDs (the iterative CC query) are released
        # by the ContextCleaner only after their references are
        # GC'd — nudge both runtimes so the next timing starts clean.
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    timings: dict[str, float] = {}
    timings_min3: dict[str, float] = {}
    trials_log: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in QUERIES and name not in RETIRED:
            continue
        # best-of-N: the first run pays per-query planning/codegen
        # JIT (which at small SF can dominate) and later runs still
        # see multi-second host-load noise on a shared box — the min
        # of N is the stable estimate of the plan's actual cost.
        # Sub-second queries get 2 extra trials: their signal is the
        # most easily swamped by a single noisy window.  min-of-3 is
        # tracked separately: earlier rounds measured min-of-3, and
        # min over MORE trials is biased low, so the cross-round
        # shared subtotal must stay on the 3-trial protocol.
        # Every trial time is recorded (`trials`) so cross-round
        # drift can be attributed to host-load dispersion from the
        # artifact alone, without re-measuring by hand.
        best = float("inf")
        runs = 0
        trial_times: list[float] = []
        while runs < 5:
            t0 = time.perf_counter()
            _q(name)(spark, sf_dir).write.format("noop").mode("overwrite").save()
            trial_times.append(round(time.perf_counter() - t0, 4))
            best = min(best, trial_times[-1])
            runs += 1
            if runs == 3:
                timings_min3[name] = round(best, 4)
            if runs >= 3 and best >= 2.0:
                break
        timings_min3.setdefault(name, round(best, 4))
        timings[name] = round(best, 4)
        trials_log[name] = trial_times
        _clear_caches()
        rows_measured += 1
        if rows_measured % PROBE_EVERY == 0:
            _probe_mark()

    # Full-registry sweep (min-of-3: the r7 min-of-2 protocol left the
    # registry minimums carrying cold-JVM noise — first trials measured
    # 1.4-2x the second — which contaminated cross-round comparisons;
    # three trials puts every non-replay row on the same footing as the
    # shared-subtotal protocol).
    # Single-trial set: queries whose cost is a fixed orchestration
    # structure (the 30-day incremental replay runs ~90 deterministic
    # jobs — re-trialing measures the same structure twice and would
    # double the sweep's wall-clock for no added signal).
    # r14: the set is now EMPTY — the replay row dropped from ~24 s to
    # ~13 s (SQL-template step + one-shuffle formulation), so min-of-3
    # is affordable, and the single cold trial was the artifact that
    # made r14's battery record 29.7 s for a row whose warm cost is
    # ~13 s (the harness split then read a fake 16 s "operator" — pure
    # cold-vs-warm asymmetry, the same bias the r13 sweep work killed
    # with symmetric warm trials).
    single_trial: set = set()
    registry_timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        if name in timings:
            continue
        best = float("inf")
        trial_times = []
        for _ in range(1 if name in single_trial else 3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            trial_times.append(round(time.perf_counter() - t0, 4))
            best = min(best, trial_times[-1])
        registry_timings[name] = round(best, 4)
        trials_log[name] = trial_times
        _clear_caches()
        rows_measured += 1
        if rows_measured % PROBE_EVERY == 0:
            _probe_mark()

    if probe_series[-1]["at_row"] != rows_measured:
        _probe_mark()  # close the bracket after the last query row

    # End-to-end streaming ingest throughput (events/sec through
    # file-stream source -> enrichment -> partitioned parquet lake,
    # availableNow).  The reference's measured envelope is ~14 rec/s
    # end-to-end (BASELINE.md: producer-bound micro-batches); this
    # number is the same pipeline stage on the same event shape.
    import shutil
    import tempfile

    from data_engineering_user_session_analysis_spark.streaming.ingest_stream import (
        enrich_events,
        read_file_stream,
        write_lake_stream,
    )

    ingest_events_per_sec = None
    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        src = os.path.join(sf_dir, "events.parquet")
        n_events = spark.read.parquet(src).count()
        stream = enrich_events(read_file_stream(spark, src))
        t0 = time.perf_counter()
        q = write_lake_stream(
            stream,
            os.path.join(tmp, "lake"),
            os.path.join(tmp, "ckpt"),
            trigger_available_now=True,
        )
        q.awaitTermination()
        ingest_events_per_sec = round(n_events / (time.perf_counter() - t0), 1)
    except Exception as exc:
        # auxiliary metric — never fail the headline bench over it,
        # but a broken ingest path must not hide as a silent null
        print(f"WARN: ingest throughput metric failed: {exc!r}", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # Composed corpus-prep pipeline throughput (docs/sec through
    # scrub -> quality filter -> exact dedup -> near-dup cluster
    # dedup -> pack) — the LLM-training-data tier exercised
    # end-to-end rather than per-operator.
    corpus_prep_docs_per_sec = None
    try:
        from data_engineering_user_session_analysis_spark.pipelines.corpus_prep import (
            CorpusPrepConfig,
            prepare_corpus,
        )
        from data_engineering_user_session_analysis_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        t0 = time.perf_counter()
        result, _report = prepare_corpus(
            docs, config=CorpusPrepConfig(pack_budget=2048)
        )
        result.write.format("noop").mode("overwrite").save()
        corpus_prep_docs_per_sec = round(
            n_docs / (time.perf_counter() - t0), 1
        )
    except Exception as exc:
        print(f"WARN: corpus-prep throughput metric failed: {exc!r}", file=sys.stderr)
    spark.catalog.clearCache()

    # ---- harness/operator split for the incremental-replay row
    # (VERDICT r12 #3): session_rollup_incremental is a 30-day replay
    # whose cost is dominated by ~0.8 s/day of fixed per-day Spark
    # overhead (job launch, state parquet round-trip, plan time), not
    # operator work — at r12 it was 40% of the registry total and
    # drowned the other 49 rows' signal.  Measure the constant
    # directly: replay the SAME day count with ONE real event per day
    # (schema-identical sample of the actual table, so enrichment/
    # typing costs are included) — that run is ~pure harness, and
    # operator_sec = measured_total - harness_sec.  The registry row
    # keeps the raw total (cross-round comparability); the family
    # subtotal quotes operator_sec.
    incremental_replay_split = None
    try:
        from pyspark.sql import Window as _W
        from pyspark.sql import functions as F

        from data_engineering_user_session_analysis_spark.sources.events import load_events

        incr_total = registry_timings.get("session_rollup_incremental")
        if incr_total is not None:
            ev = load_events(spark, sf_dir)
            one_per_day = (
                ev.withColumn("_d", F.to_date("ts"))
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        _W.partitionBy("_d").orderBy("event_id")
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_d", "_rn")
            )
            tmp2 = tempfile.mkdtemp(prefix="bench_incr_split_")
            try:
                one_per_day.coalesce(1).write.parquet(
                    os.path.join(tmp2, "events.parquet")
                )
                n_days = spark.read.parquet(
                    os.path.join(tmp2, "events.parquet")
                ).count()
                _clear_caches()
                t0 = time.perf_counter()
                QUERIES["session_rollup_incremental"](spark, tmp2).write.format(
                    "noop"
                ).mode("overwrite").save()
                harness_sec = round(time.perf_counter() - t0, 4)
                incremental_replay_split = {
                    "total_sec": incr_total,
                    "harness_sec": harness_sec,
                    "operator_sec": round(max(incr_total - harness_sec, 0.0), 4),
                    "n_days": n_days,
                    "protocol": (
                        "harness = same-day-count replay over 1 real "
                        "event/day (schema-identical sample); operator "
                        "= total - harness"
                    ),
                }
            finally:
                shutil.rmtree(tmp2, ignore_errors=True)
    except Exception as exc:
        print(f"WARN: incremental replay split failed: {exc!r}", file=sys.stderr)
    spark.catalog.clearCache()

    probe_end = _cpu_probe()

    # ---- probe-normalized cross-round regression gate (VERDICT r10
    # #1, de-noised r12 per VERDICT r11 #2 + ADVICE).  Three rounds
    # running, nominal >1.25x rows had to be re-litigated by hand
    # against host steal (a microVM box whose effective speed swings
    # ~2.3x, measured).  The protocol does the arithmetic itself:
    # each row's cross-round nominal ratio is divided by the BOX
    # ratio at that row's position, where the box unit comes from the
    # per-segment PROBE SERIES (one probe every PROBE_EVERY rows —
    # r11's two-endpoint interpolation could not model a mid-run 2.2x
    # step change and flagged 14 unchanged rows).  Three row classes:
    #   - overhead-bound (< 0.5s min-of-N in BOTH rounds): EXEMPT —
    #     the box's measured +-35% dispersion exceeds any signal a
    #     sub-half-second row can carry; all 14 r11 false flags were
    #     in this class.
    #   - compute-bound (>= 2s in EITHER round): flagged on the
    #     NORMALIZED ratio alone — these rows scale with box speed,
    #     and the r11 nominal>1.1 floor would mask a real regression
    #     whenever the box got faster (a 40% slower query on a 40%
    #     faster box shows nominal ~0.93: ADVICE r11).
    #   - in between: both conditions (normalized>1.25 AND
    #     nominal>1.1) — partially overhead-bound rows don't fully
    #     track box speed, so a faster box must not manufacture
    #     flags out of unchanged nominal times (measured r11: nine
    #     rows at nominal 0.94-1.29 flagged purely by unit 0.74).
    # Anything still flagged gets one isolated fresh-JVM re-measure
    # as confirmation — the flag list bounds that task.
    # previous-round baseline: the committed BENCH_local.json (the
    # full-detail artifact each round commits) — overridable for
    # cross-comparing arbitrary runs
    prev_path = os.environ.get(
        "SPARK_GRAFT_BENCH_PREV",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
    )
    prev = None
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = None
    normalized: dict[str, dict] = {}
    flagged: list[str] = []
    auto_adjudicated: list[str] = []
    shift: "dict | None" = None
    all_now = {**timings, **registry_timings}
    order_now = list(all_now)  # insertion order == measurement order

    if (
        prev
        and prev.get("sf") == sf  # ratios are meaningless across scales
        and prev.get("cpu_probe_sec_start")
        and prev.get("cpu_probe_sec_end")
    ):
        prev_rows = {**prev.get("queries", {}), **prev.get("registry_queries", {})}
        order_prev = list(prev_rows)
        # r11-and-earlier artifacts carry only endpoint probes:
        # synthesize a 2-point series so the gate still runs.
        prev_series = prev.get("cpu_probe_series") or [
            {"at_row": 0, "sec": prev["cpu_probe_sec_start"]},
            {"at_row": len(order_prev), "sec": prev["cpu_probe_sec_end"]},
        ]

        # pass 1: raw ratios for every comparable row
        for name, now_sec in all_now.items():
            if name not in prev_rows or prev_rows[name] <= 0:
                continue
            prev_sec = prev_rows[name]
            nominal = now_sec / prev_sec
            unit_now = probe_series_unit(probe_series, order_now.index(name))
            unit_prev = probe_series_unit(prev_series, order_prev.index(name))
            unit = unit_now / unit_prev if unit_prev > 0 else 1.0
            norm = nominal / unit if unit > 0 else nominal
            normalized[name] = {
                "nominal_ratio": round(nominal, 4),
                "probe_unit_ratio": round(unit, 4),
                "normalized_ratio": round(norm, 4),
            }
        # pass 2 (round 15): estimate the uniform box-state shift from
        # the registry-wide medians, gate each row on SHIFT-CORRECTED
        # ratios, and surface the shift itself as one global flag —
        # see cross_round_shift
        shift = cross_round_shift(normalized)
        for name, v in normalized.items():
            now_sec = all_now[name]
            prev_sec = prev_rows[name]
            nom_rel = v["nominal_ratio"] / shift["nominal_divisor"]
            norm_rel = v["normalized_ratio"] / shift["normalized_divisor"]
            gate = gate_row(now_sec, prev_sec, norm_rel, nom_rel)
            v["shift_corrected"] = {
                "nominal_ratio": round(nom_rel, 4),
                "normalized_ratio": round(norm_rel, 4),
            }
            v["gate"] = gate
            if gate == "flagged":
                flagged.append(name)
            elif gate == "auto_adjudicated_nominal_improved":
                auto_adjudicated.append(name)

    total = round(sum(timings.values()), 4)
    # Like-for-like subtotal over the query set shared with the r02
    # bench, so cross-round comparisons don't require manual
    # arithmetic when new headline entries land.
    shared_r02 = [
        "session_rollup",
        "session_rollup_keyed",
        "user_level",
        "favorite_event_type",
        "daily_activity",
        "q1_pricing_summary",
        "top_customers",
        "q5_local_supplier_volume",
        "late_shipment_orders",
        "supplier_part_share",
        "doc_token_stats",
        "dedup_exact",
        "knn_brute_force",
        "ann_ivf_topk",
        "embedding_neardup",
        "dedup_minhash_lsh",
        "simhash_near_pairs",
        "media_features",
        "lang_id",
        "streaming_session_rollup",
    ]
    # min-of-3 on purpose: r02/r03 measured min-of-3, and min over
    # more trials is monotonically non-increasing — mixing protocols
    # would fake a speedup.  The headline per-query numbers (up to 5
    # trials for sub-2s queries) are reported separately above.
    shared_total = round(sum(timings_min3.get(n, 0.0) for n in shared_r02), 4)

    # Per-family subtotals over the whole 50-query registry, family =
    # defining module; a regression anywhere in the registry now moves
    # a recorded number instead of being invisible outside the
    # headline set.
    all_timings = {**timings, **registry_timings}
    family_subtotals: dict[str, float] = {}
    for name, secs in all_timings.items():
        # the incremental-replay row contributes its OPERATOR seconds
        # (split above): the 30-day fixed harness constant is not a
        # property of the session family's plans
        if (
            name == "session_rollup_incremental"
            and incremental_replay_split is not None
        ):
            secs = incremental_replay_split["operator_sec"]
        fam = _q(name).__module__.rsplit(".", 1)[-1].removesuffix("_queries")
        family_subtotals[fam] = round(family_subtotals.get(fam, 0.0) + secs, 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "shared_r02_subtotal": shared_total,
        "shared_r02_protocol": "min-of-3",
        "registry_queries": registry_timings,
        "registry_protocol": "min-of-3 (incremental replay included since r14)",
        "trials": trials_log,
        "full_registry_total": round(sum(all_timings.values()), 4),
        "family_subtotals": dict(sorted(family_subtotals.items())),
        "ingest_events_per_sec": ingest_events_per_sec,
        "corpus_prep_docs_per_sec": corpus_prep_docs_per_sec,
        "incremental_replay_split": incremental_replay_split,
        "cpu_probe_sec_start": probe_start,
        "cpu_probe_sec_end": probe_end,
        # per-segment box-speed series over the query rows (at_row =
        # rows measured before the probe); probe_end above is taken
        # AFTER the ingest/corpus metrics, bracketing the whole run
        "cpu_probe_series": probe_series,
        # per-row cross-round ratios, probe-normalized (see the gate
        # comment above): `flagged_normalized_gt_1_25` is the ONLY
        # list the round's attribution step needs to re-litigate
        "normalized_vs_prev": normalized,
        # the uniform box-state component of this round's drift, and
        # its one global flag (round 15, see cross_round_shift): per
        # -row gates run on shift-CORRECTED ratios so six correlated
        # box flags collapse into one adjudication item
        "cross_round_shift": shift,
        "flagged_normalized_gt_1_25": sorted(flagged),
        # normalized>1.25 rows whose NOMINAL time improved — recorded,
        # not flagged (VERDICT r13 #3: an improvement needs no judge)
        "auto_adjudicated_nominal_improved": sorted(auto_adjudicated),
        "regression_gate": (
            "per-segment probe series (every 8 rows); per-row ratios "
            "divided by the registry-median shift (slow direction "
            "only; median>1.15 raises ONE global_shift flag instead "
            "of N correlated row flags); rows <0.5s both rounds "
            "exempt (box dispersion > signal); rows >=2s either round "
            "flag on corrected normalized>1.25 alone UNLESS corrected "
            "nominal<=1.0 and corrected normalized<=1.5 "
            "(auto-adjudicated: improvement; >1.5 flags regardless — "
            "ADVICE r14); in-between rows need normalized>1.25 AND "
            "nominal>1.1"
        ),
        # which invocation produced this record: the closing battery
        # exports SPARK_GRAFT_BENCH_CONTEXT=closing_battery; a bare
        # driver/manual run reads "standalone".  When two artifacts
        # exist for one round, the battery's is canonical.
        "context": os.environ.get("SPARK_GRAFT_BENCH_CONTEXT", "standalone"),
        "sf": sf,
    }
    # The driver captures a bounded tail of stdout: round 6's `trials`
    # map grew the single line past that window and truncated the
    # committed artifact (BENCH_r06 `parsed: null`).  The FULL payload
    # is therefore written to a committed file — self-contained record
    # of every trial — while stdout carries a compact line (headline
    # minimums + subtotals, no per-trial arrays) that always fits.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
    )
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError as exc:
        print(f"WARN: could not write {out_path}: {exc!r}", file=sys.stderr)
    # The stdout line is ALLOWLISTED and bounded (round 16): the r06
    # fix dropped `trials`/`normalized_vs_prev`, but the line kept
    # growing with every probe/gate field (~3.6 KB by r15) and the
    # driver's bounded tail window truncated the r13/r14 artifacts
    # mid-line (`BENCH_r13/14.json parsed: null`), destroying two
    # rounds of prev/now comparisons.  Only the driver-contract keys
    # plus the per-query seconds and headline subtotals go to stdout
    # (~2 KB); the probe series, shift decomposition, gate prose and
    # family subtotals live in the full-detail file alone.  This line
    # is the bench's ONLY stdout output, so it is both the first and
    # the last line of the captured stream (see STDOUT_KEYS above).
    compact = {k: payload[k] for k in STDOUT_KEYS if k in payload}
    if incremental_replay_split is not None:
        # numbers only — the protocol prose stays in the detail file
        compact["incremental_replay_split"] = {
            k: incremental_replay_split[k]
            for k in ("total_sec", "harness_sec", "operator_sec", "n_days")
        }
    compact["full_detail_file"] = os.path.basename(out_path)
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
