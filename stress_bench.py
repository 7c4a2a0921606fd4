#!/usr/bin/env python
"""sf≈1 stress bench: inflate sf0.1 by 10 clone shards with disjoint
id spaces (the re-crawl scenario — every doc/vector gains 9 exact
clones, the hardest realistic load for near-dup pipelines), then run
the pair-generating queries and log their CANDIDATE counts alongside
wall time.  The scaling curve of candidates — not wall-clock alone —
is what predicts 100 TB behavior.

Embedding LSH applies the documented sizing rule (vector_lsh.py):
``planes = max(4, ceil(log2(N / 125)))`` so expected bucket size
stays ~125 and Σ bucket² stays near-linear as N grows; tables stay 8.

Usage: ``python stress_bench.py`` — prints one JSON line per scale
plus a summary line.  Output is committed as STRESS_sf1_r{N}.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICAS = 10
BASE = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/spark_graft_stress_sf1")

# disjoint id spaces per replica shard
SHIFTS = {
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(OUT, "_built.json")
    if os.path.exists(marker):
        return
    os.makedirs(OUT, exist_ok=True)
    # events.parquet carries TIMESTAMP(NANOS): surface as nano-longs
    # (the clone shards re-write them as plain longs; load_events
    # converts to TimestampType at the boundary either way)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table, shifts in SHIFTS.items():
        df = spark.read.parquet(os.path.join(BASE, f"{table}.parquet"))
        out = None
        for r in range(REPLICAS):
            rep = df
            for col, step in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * step))
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{table}.parquet"))
    with open(marker, "w") as fh:
        json.dump({"replicas": REPLICAS, "base": BASE}, fh)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def measure(spark, sf_dir: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_lsh_pairs,
        shingle_docs,
        simhash_fingerprints,
        simhash_pairs,
        simhash_value_candidate_pairs,
    )
    from data_engineering_user_session_analysis_spark.operators.sessionize import (
        session_rollup,
        sessionize,
    )
    from data_engineering_user_session_analysis_spark.operators.vector_lsh import (
        lsh_candidate_pairs,
        lsh_similarity_pairs,
    )
    from data_engineering_user_session_analysis_spark.sources.events import load_events
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    res: dict = {"label": label}

    ev = load_events(spark, sf_dir)
    res["n_events"] = ev.count()
    _, res["session_rollup_sec"] = timed(
        lambda: session_rollup(sessionize(ev, order_cols=("event_id",)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    docs = load_table(spark, sf_dir, "documents")
    res["n_docs"] = docs.count()
    sh = shingle_docs(docs).cache()
    sh.count()
    res["minhash_candidates"], res["minhash_candidates_sec"] = timed(
        lambda: minhash_candidate_pairs(sh).count()
    )
    res["minhash_pairs"], res["minhash_pairs_sec"] = timed(
        lambda: minhash_lsh_pairs(docs).count()
    )
    fp = simhash_fingerprints(docs).cache()
    fp.count()
    # Since r04 the engine enumerates SimHash candidates at the
    # distinct-fingerprint-value level (clone-robust).  The metric
    # lives under its OWN key: the doc-level `simhash_candidates`
    # series (r03: 674k base / 67.6M stress on this corpus) measured
    # a different quantity and is retired rather than silently
    # redefined — comparing the raw keys across rounds would read as
    # a massive spurious improvement.
    res["simhash_value_candidates"], res["simhash_value_candidates_sec"] = timed(
        lambda: simhash_value_candidate_pairs(fp).count()
    )
    res["simhash_pairs"], res["simhash_pairs_sec"] = timed(
        lambda: simhash_pairs(docs).count()
    )
    sh.unpersist()
    fp.unpersist()

    emb = load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    res["n_vectors"] = n_vec
    # sizing rule: keep expected bucket size ~125
    planes = max(4, math.ceil(math.log2(max(n_vec, 1) / 125)))
    res["lsh_planes"] = planes
    res["lsh_candidates"], res["lsh_candidates_sec"] = timed(
        lambda: lsh_candidate_pairs(emb, planes=planes).count()
    )
    res["embedding_neardup_pairs"], res["embedding_neardup_sec"] = timed(
        lambda: lsh_similarity_pairs(emb, planes=planes).count()
    )
    return res


def main() -> None:
    from data_engineering_user_session_analysis_spark import get_spark

    spark = get_spark("stress-bench")
    build(spark)
    base = measure(spark, BASE, "sf0.1")
    print(json.dumps(base))
    stress = measure(spark, OUT, f"sf1.0 ({REPLICAS}x clone shards)")
    print(json.dumps(stress))

    def ratio(k: str) -> float | None:
        try:
            return round(stress[k] / base[k], 2) if base[k] else None
        except (KeyError, ZeroDivisionError, TypeError):
            return None

    summary = {
        "metric": "stress_scaling_10x",
        "replicas": REPLICAS,
        "ratios": {
            k: ratio(k)
            for k in (
                "session_rollup_sec",
                "minhash_candidates",
                "minhash_pairs_sec",
                "simhash_value_candidates",
                "simhash_pairs_sec",
                "lsh_candidates",
                "embedding_neardup_sec",
            )
        },
        "base": base,
        "stress": stress,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
