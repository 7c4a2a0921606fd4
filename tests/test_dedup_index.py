"""Incremental MinHash index: probe output == full-batch pairs
restricted to the new shard, appends extend the probe surface, and
the index is never scanned for non-candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.dedup import minhash_lsh_pairs
from data_engineering_user_session_analysis_spark.operators.dedup_index import (
    append_to_minhash_index,
    incremental_neardup_pairs,
    write_minhash_index,
)
from data_engineering_user_session_analysis_spark.sources.tables import load_table

THRESHOLD = 0.5


def _norm(pairs_df):
    """Orientation-free pair set with exact jaccard values."""
    return {
        (frozenset((r.doc_a, r.doc_b)), r.intersection, round(r.jaccard, 9))
        for r in pairs_df.collect()
    }


def test_incremental_equals_batch_restriction(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    old = docs.filter(F.col("doc_id") <= median)
    new = docs.filter(F.col("doc_id") > median)
    assert old.count() > 0 and new.count() > 0

    idx = str(tmp_path / "minhash_index")
    write_minhash_index(old, idx)
    got = _norm(
        incremental_neardup_pairs(spark, new, idx, threshold=THRESHOLD)
    )

    full = minhash_lsh_pairs(docs, threshold=THRESHOLD)
    new_ids = {r.doc_id for r in new.collect()}
    want = {
        (ids, inter, jac)
        for (ids, inter, jac) in _norm(full)
        if ids & new_ids
    }
    assert got == want
    assert len(got) > 0, "fixture corpus has cross-shard near-dups"


def test_append_extends_probe_surface(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    old = docs.filter(F.col("doc_id") <= median)
    new = docs.filter(F.col("doc_id") > median)

    idx = str(tmp_path / "minhash_index")
    write_minhash_index(old, idx)
    append_to_minhash_index(new, idx)

    # a re-crawled clone of a NEW-shard doc must now hit the index
    clone_src = new.orderBy("doc_id").first()
    clone = spark.createDataFrame(
        [(9_000_000, clone_src.text)], "doc_id long, text string"
    )
    hits = incremental_neardup_pairs(spark, clone, idx, threshold=0.9)
    rows = hits.collect()
    assert any(
        r.doc_a == clone_src.doc_id and r.doc_b == 9_000_000 and r.jaccard == 1.0
        for r in rows
    ), rows


def test_incremental_vector_equals_batch_restriction(spark, sf_small, tmp_path):
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        incremental_vector_neardup,
        write_vector_index,
    )
    from data_engineering_user_session_analysis_spark.operators.vector_lsh import (
        lsh_similarity_pairs,
    )

    emb = load_table(spark, sf_small, "embeddings")
    median = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    old = emb.filter(F.col("vec_id") <= median)
    new = emb.filter(F.col("vec_id") > median)

    idx = str(tmp_path / "vector_index")
    write_vector_index(old, idx)
    got = {
        (frozenset((r.vec_a, r.vec_b)), round(r.cosine, 9))
        for r in incremental_vector_neardup(
            spark, new, idx, threshold=0.4
        ).collect()
    }
    new_ids = {r.vec_id for r in new.select("vec_id").collect()}
    want = {
        (frozenset((r.vec_a, r.vec_b)), round(r.cosine, 9))
        for r in lsh_similarity_pairs(emb, threshold=0.4).collect()
        if {r.vec_a, r.vec_b} & new_ids
    }
    assert got == want
    assert len(got) > 0, "fixture has cross-shard near-dup vectors"


def test_vector_shard_append_is_idempotent_and_probes_prior_days(
    spark, sf_small, tmp_path
):
    """The embedding twin of the ds-partitioned daily layout: a day's
    probe sees only PRIOR complete days (not its own rows), and a
    re-run of the same ds replaces exactly its own index rows."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        append_shard_to_vector_index,
        incremental_vector_neardup,
        vector_shard_indexed,
    )

    emb = load_table(spark, sf_small, "embeddings")
    median = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    day1 = emb.filter(F.col("vec_id") <= median)
    day2 = emb.filter(F.col("vec_id") > median)
    idx = str(tmp_path / "vector_index")
    append_shard_to_vector_index(day1, idx, "2024-01-01")
    assert vector_shard_indexed(idx, "2024-01-01")

    # day-2 probe BEFORE indexing day 2: prior-day hits only
    first = {
        (frozenset((r.vec_a, r.vec_b)), round(r.cosine, 9))
        for r in incremental_vector_neardup(
            spark, day2, idx, threshold=0.4, before_ds="2024-01-02"
        ).collect()
    }
    assert first, "fixture has cross-shard near-dup vectors"

    append_shard_to_vector_index(day2, idx, "2024-01-02")
    # re-run of day 2 (retry semantics): its own ds partition must be
    # invisible to its probe, so the result is unchanged — with the
    # flat append layout this self-hits every shard vector at cos 1.0
    append_shard_to_vector_index(day2, idx, "2024-01-02")
    rerun = {
        (frozenset((r.vec_a, r.vec_b)), round(r.cosine, 9))
        for r in incremental_vector_neardup(
            spark, day2, idx, threshold=0.4, before_ds="2024-01-02",
            only_ds=["2024-01-01"],
        ).collect()
    }
    assert rerun == first

    # a day-3 clone of a day-2 vector hits via the ds layout
    src = day2.orderBy("vec_id").first()
    clone = spark.createDataFrame(
        [(9_000_000, src.embedding)], "vec_id long, embedding array<double>"
    )
    hits = incremental_vector_neardup(
        spark, clone, idx, threshold=0.9, before_ds="2024-01-03"
    ).collect()
    assert any(
        r.vec_a == src.vec_id and r.vec_b == 9_000_000 and abs(r.cosine - 1.0) < 1e-9
        for r in hits
    ), hits


def test_rerun_retracts_completeness_marker_first(spark, sf_small, tmp_path):
    """A re-run must retract the day's completeness marker BEFORE
    rewriting anything: if it crashes mid-rewrite (simulated here as
    marker-retraction + sets-only write), the day reads as incomplete
    rather than serving mismatched sets/buckets under a stale
    _SUCCESS."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _retract_day_marker,
        append_shard_to_minhash_index,
        shard_indexed,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text").limit(20)
    idx = str(tmp_path / "idx")
    append_shard_to_minhash_index(docs, idx, "2024-01-01")
    assert shard_indexed(idx, "2024-01-01")
    # the re-run's first act (before any write): the old marker is gone
    _retract_day_marker(idx, "2024-01-01")
    assert not shard_indexed(idx, "2024-01-01")
    # and a completed re-run restores it
    append_shard_to_minhash_index(docs, idx, "2024-01-01")
    assert shard_indexed(idx, "2024-01-01")


def test_vector_index_geometry_is_frozen_and_shared(spark, sf_small, tmp_path):
    """STRESS r08 fix: the index geometry is sized at creation for the
    corpus it will GROW INTO (``target_n``) and persisted in
    ``params/``; every later append and probe buckets with the STORED
    geometry even when called with conflicting arguments — a clone
    planted across days can only hit at cos 1.0 if both days share
    one signature space."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        append_shard_to_vector_index,
        incremental_vector_neardup,
        vector_index_geometry,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    day1 = emb.orderBy("vec_id").limit(50)
    idx = str(tmp_path / "vec_idx")
    append_shard_to_vector_index(day1, idx, "2024-01-01", target_n=100_000)
    g = _read_vector_params(spark, idx)
    want = vector_index_geometry(100_000)
    assert (g["tables"], g["planes"]) == (want["tables"], want["planes"])
    # sized past the fixture default: the candidate budget at 100k
    # needs deeper buckets than planes=4
    assert g["planes"] > 4

    # a day-2 append called with a CONFLICTING explicit geometry must
    # still land in the stored one (stored params win) ...
    src = day1.first()
    clone = spark.createDataFrame(
        [(9_000_000, src.embedding)], "vec_id long, embedding array<double>"
    ).withColumn(
        # match the fixture element type: this shard is APPENDED into
        # vectors/, and a double-typed day would break the union scan
        "embedding",
        F.col("embedding").cast(day1.schema["embedding"].dataType),
    )
    append_shard_to_vector_index(clone, idx, "2024-01-02", planes=2, tables=2)
    # ... so a day-3 probe (also defaulting differently) finds the
    # planted cross-day clone at cosine 1.0
    hits = incremental_vector_neardup(
        spark, clone, idx, threshold=0.9, before_ds="2024-01-03"
    ).collect()
    assert any(
        r.vec_b == 9_000_000 and abs(r.cosine - 1.0) < 1e-9 for r in hits
    ), hits


def test_rebuild_vector_index_rebuckets_under_new_geometry(spark, sf_small, tmp_path):
    """The geometry-outgrown maintenance verb: rebuild re-buckets the
    whole ds-partitioned index under a target_n-sized geometry while
    preserving the per-day layout — prior days keep their completeness
    markers, cross-day probes still hit, and a post-rebuild append
    lands in the NEW geometry (stored params win)."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        append_shard_to_vector_index,
        incremental_vector_neardup,
        rebuild_vector_index,
        vector_index_geometry,
        vector_shard_indexed,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    median = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    day1 = emb.filter(F.col("vec_id") <= median)
    day2 = emb.filter(F.col("vec_id") > median)
    idx = str(tmp_path / "vec_idx")
    # built at the fixture default geometry (planes=4)
    append_shard_to_vector_index(day1, idx, "2024-01-01")
    append_shard_to_vector_index(day2, idx, "2024-01-02")
    before = {
        (frozenset((r.vec_a, r.vec_b)), round(r.cosine, 9))
        for r in incremental_vector_neardup(
            spark, day2, idx, threshold=0.4, before_ds="2024-01-02"
        ).collect()
    }
    assert before, "fixture has cross-shard near-dup vectors"

    rep = rebuild_vector_index(spark, idx, target_n=100_000)
    want = vector_index_geometry(100_000)
    assert rep["layout"] == "ds"
    assert rep["geometry"]["planes"] == want["planes"] > 4
    assert _read_vector_params(spark, idx)["planes"] == want["planes"]
    # the daily contract survives: completeness markers restored
    assert vector_shard_indexed(idx, "2024-01-01")
    assert vector_shard_indexed(idx, "2024-01-02")

    # exact clones (cos 1.0) are geometry-invariant: every clone pair
    # found before MUST still be found; deeper planes may shed
    # sub-threshold pairs (the documented recall trade)
    after = {
        (frozenset((r.vec_a, r.vec_b)), round(r.cosine, 9))
        for r in incremental_vector_neardup(
            spark, day2, idx, threshold=0.4, before_ds="2024-01-02"
        ).collect()
    }
    exact_before = {p for p in before if p[1] == 1.0}
    assert exact_before <= after

    # a post-rebuild day-3 clone probes + appends in the new geometry
    src = day2.orderBy("vec_id").first()
    clone = spark.createDataFrame(
        [(9_000_000, src.embedding)], "vec_id long, embedding array<double>"
    ).withColumn("embedding", F.col("embedding").cast(day2.schema["embedding"].dataType))
    hits = incremental_vector_neardup(
        spark, clone, idx, threshold=0.9, before_ds="2024-01-03"
    ).collect()
    assert any(
        r.vec_b == 9_000_000 and abs(r.cosine - 1.0) < 1e-9 for r in hits
    ), hits


def test_vector_index_outgrown_signal(spark, sf_small, tmp_path):
    """The geometry-outgrown check: under the design point the signal
    is quiet; once the indexed corpus passes target_n it trips — and
    a reindex with a bigger target clears it.  Legacy/fixture indexes
    without a declared design point report None (check disabled), not
    a spurious alarm."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        append_shard_to_vector_index,
        rebuild_vector_index,
        vector_index_outgrown,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    n = emb.count()
    idx = str(tmp_path / "vec_idx")
    append_shard_to_vector_index(emb, idx, "2024-01-01", target_n=n * 10)
    sig = vector_index_outgrown(spark, idx)
    assert sig == {"indexed_n": n, "target_n": n * 10, "outgrown": False}

    # grow past the design point: 10 more shards
    from pyspark.sql import functions as F

    for r in range(1, 11):
        shard = emb.withColumn("vec_id", F.col("vec_id") + r * 1_000_000)
        append_shard_to_vector_index(shard, idx, f"2024-01-{r + 1:02d}")
    sig = vector_index_outgrown(spark, idx)
    assert sig["indexed_n"] == n * 11 and sig["outgrown"] is True

    # the operational answer clears the signal
    rebuild_vector_index(spark, idx, target_n=n * 100)
    sig = vector_index_outgrown(spark, idx)
    assert sig["outgrown"] is False and sig["target_n"] == n * 100

    # no declared design point -> check disabled, never a false alarm
    idx2 = str(tmp_path / "vec_idx_legacy")
    append_shard_to_vector_index(emb, idx2, "2024-01-01")
    assert vector_index_outgrown(spark, idx2)["outgrown"] is None


def test_append_mode_on_fresh_path_persists_sized_geometry(spark, sf_small, tmp_path):
    """ADVICE r8 (medium): write_vector_index(mode='append',
    target_n=...) on a FRESH path must persist the geometry it
    actually bucketed with — otherwise later appends/probes fall back
    to module defaults and bucket in a disjoint signature space,
    silently missing every cross-write near-dup."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        incremental_vector_neardup,
        vector_index_geometry,
        write_vector_index,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    day1 = emb.orderBy("vec_id").limit(50)
    idx = str(tmp_path / "vec_idx_append_fresh")
    write_vector_index(day1, idx, mode="append", target_n=100_000)
    g = _read_vector_params(spark, idx)
    want = vector_index_geometry(100_000)
    assert g is not None, "fresh-path append must write params/"
    assert (g["tables"], g["planes"]) == (want["tables"], want["planes"])
    assert g["target_n"] == 100_000

    # a later default-argument append lands in the STORED geometry, so
    # a planted clone hits across the two writes at cosine 1.0
    src = day1.first()
    clone = spark.createDataFrame(
        [(9_000_000, src.embedding)], "vec_id long, embedding array<double>"
    ).withColumn(
        "embedding", F.col("embedding").cast(day1.schema["embedding"].dataType)
    )
    write_vector_index(clone, idx, mode="append")
    hits = incremental_vector_neardup(spark, clone, idx, threshold=0.9).collect()
    assert any(
        r.vec_b == 9_000_000 and abs(r.cosine - 1.0) < 1e-9 for r in hits
    ), hits


def test_rebuild_vector_index_preserves_stored_dim(spark, tmp_path):
    """ADVICE r8: a rebuild re-sizes (tables, planes) but must keep the
    STORED dim — dim defines the hash family and the vectors' matmul
    shape, so sizing the new geometry with the default dim would crash
    (or silently re-hash) an index built at a non-default dim."""
    import random

    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        incremental_vector_neardup,
        rebuild_vector_index,
        write_vector_index,
    )

    rng = random.Random(7)
    dim = 16
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "vec_idx_dim16")
    write_vector_index(emb, idx, dim=dim)
    assert _read_vector_params(spark, idx)["dim"] == dim

    rep = rebuild_vector_index(spark, idx, target_n=100_000)
    assert rep["geometry"]["dim"] == dim
    assert _read_vector_params(spark, idx)["dim"] == dim

    # the rebuilt index still probes: an exact clone hits at cos 1.0
    src = emb.first()
    clone = spark.createDataFrame(
        [(9_000_000, src.embedding)], "vec_id long, embedding array<double>"
    )
    hits = incremental_vector_neardup(
        spark, clone, idx, threshold=0.9, dim=dim
    ).collect()
    assert any(
        r.vec_b == 9_000_000 and abs(r.cosine - 1.0) < 1e-9 for r in hits
    ), hits


def test_rebuild_does_not_promote_incomplete_days(spark, sf_small, tmp_path):
    """ADVICE r8: the rebuild restores per-day _SUCCESS markers only
    for days that were complete BEFORE it ran — a crashed,
    partially-written day must stay invisible to probes until its own
    re-run, not get promoted to complete by an unrelated rebuild."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _retract_day_marker,
        append_shard_to_vector_index,
        rebuild_vector_index,
        vector_shard_indexed,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    median = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    day1 = emb.filter(F.col("vec_id") <= median)
    day2 = emb.filter(F.col("vec_id") > median)
    idx = str(tmp_path / "vec_idx_crash")
    append_shard_to_vector_index(day1, idx, "2024-01-01")
    append_shard_to_vector_index(day2, idx, "2024-01-02")
    # simulate a crashed day-2 re-run: marker retracted, rewrite never
    # finished
    _retract_day_marker(idx, "2024-01-02")
    assert not vector_shard_indexed(idx, "2024-01-02")

    rebuild_vector_index(spark, idx, target_n=100_000)
    assert vector_shard_indexed(idx, "2024-01-01")
    assert not vector_shard_indexed(idx, "2024-01-02"), (
        "rebuild must not promote a previously incomplete day"
    )
    # the day's own re-run is what restores it
    append_shard_to_vector_index(day2, idx, "2024-01-02")
    assert vector_shard_indexed(idx, "2024-01-02")


def test_vector_index_recall_sample_clone_exactness(spark, sf_small, tmp_path):
    """`vector_index_recall_sample` self-check at the structural
    endpoint: exact clones share signatures in EVERY table, so on a
    corpus whose only >= 0.999 pairs are clones, measured recall must
    be exactly 1.0 with every sampled clone's truth found — and the
    report must carry the stored geometry's prediction next to it."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        vector_index_recall_sample,
        write_vector_index,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    shift = 1_000_000
    clones = emb.withColumn("vec_id", F.col("vec_id") + shift)
    idx = str(tmp_path / "vector_index")
    write_vector_index(emb.unionByName(clones), idx)

    res = vector_index_recall_sample(spark, idx, threshold=0.999, sample_q=10)
    assert res["true_pairs"] >= res["sample_q"] > 0, res  # every vector has a clone
    assert res["recall_at_threshold"] == 1.0, res
    assert res["min_query_recall"] == 1.0, res
    assert res["tables"] > 0 and res["planes"] > 0
    assert 0.0 < res["predicted_recall_at_threshold"] <= 1.0


def test_vector_index_recall_sample_weak_threshold_honest(spark, sf_small, tmp_path):
    """At a weak threshold (0.4) the documented truth is that recall
    is LOW at fixture geometry (the sizing docstring calls holding
    recall there provably unaffordable) — the sensor must report that
    honestly rather than vacuously: measured recall within [0, 1],
    deterministic across runs, and None (not a fake 1.0) when the
    threshold yields no true pairs."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        vector_index_recall_sample,
        write_vector_index,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    idx = str(tmp_path / "vector_index")
    write_vector_index(emb, idx)

    a = vector_index_recall_sample(spark, idx, threshold=0.4, sample_q=12)
    b = vector_index_recall_sample(spark, idx, threshold=0.4, sample_q=12)
    drop = lambda d: {
        k: v for k, v in d.items()
        if k not in ("probe_sec", "truth_sec", "truth_cache")
    }
    assert drop(a) == drop(b)  # md5 sample + deterministic signatures
    assert a["true_pairs"] > 0
    assert 0.0 <= a["recall_at_threshold"] <= 1.0
    assert a["min_query_recall"] <= a["recall_at_threshold"] + 1e-9

    none_case = vector_index_recall_sample(spark, idx, threshold=1.0, sample_q=3)
    assert none_case["true_pairs"] == 0
    assert none_case["recall_at_threshold"] is None


def test_minhash_index_recall_sample_clone_exactness(spark, sf_small, tmp_path):
    """Text-index sensor at the structural endpoint: exact-clone docs
    have identical shingle sets, hence identical signatures in every
    band — on a corpus whose only Jaccard-1.0 pairs are clones, the
    sensor must measure exactly 1.0 at threshold 1.0, with the
    banding prediction reported alongside (it prices AT threshold:
    1-(1-1)^16 = 1.0 there too)."""
    from pyspark.sql import functions as F

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        minhash_index_recall_sample,
        write_minhash_index,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    shift = 1_000_000
    clones = docs.withColumn("doc_id", F.col("doc_id") + shift)
    idx = str(tmp_path / "minhash_index")
    write_minhash_index(docs.unionByName(clones), idx)

    res = minhash_index_recall_sample(spark, idx, threshold=1.0, sample_q=8)
    assert res["true_pairs"] >= res["sample_q"] > 0, res
    assert res["recall_at_threshold"] == 1.0, res
    assert res["min_query_recall"] == 1.0, res
    assert res["predicted_recall_at_threshold"] == 1.0
    assert res["bands"] == 16 and res["rows_per_band"] == 4


def test_minhash_index_recall_sample_deterministic_and_honest(
    spark, sf_small, tmp_path
):
    """Below the clone endpoint the sensor must be a real measurement:
    deterministic across runs (md5 sample, deterministic hashing),
    recall within [0, 1] with the per-query tail at or below the
    pair-weighted overall, and an honest None when the threshold
    yields no true pairs in the sample."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        minhash_index_recall_sample,
        write_minhash_index,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    idx = str(tmp_path / "minhash_index")
    write_minhash_index(docs, idx)

    a = minhash_index_recall_sample(spark, idx, threshold=0.3, sample_q=15)
    b = minhash_index_recall_sample(spark, idx, threshold=0.3, sample_q=15)
    drop = lambda d: {
        k: v for k, v in d.items()
        if k not in ("probe_sec", "truth_sec", "truth_cache")
    }
    assert drop(a) == drop(b)
    if a["true_pairs"]:
        assert 0.0 <= a["recall_at_threshold"] <= 1.0
        assert a["min_query_recall"] <= a["recall_at_threshold"] + 1e-9
    else:
        assert a["recall_at_threshold"] is None


def test_recall_sensors_exclude_crashed_days(spark, sf_small, tmp_path):
    """ADVICE r09: the sensors draw truth from the verify surface
    (vectors/sets) and candidates from buckets/, and the append path
    writes the verify surface FIRST — so a crashed day's rows used to
    enter the TRUTH while being structurally unfindable, deflating
    measured recall versus the production probe (which only consults
    marker-complete days).  Both sensors must scope truth AND
    candidates to marker-complete ds partitions: a day whose buckets
    never landed changes neither the measurement nor the corpus
    count."""
    import os
    import shutil

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        append_shard_to_minhash_index,
        append_shard_to_vector_index,
        minhash_index_recall_sample,
        vector_index_recall_sample,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    vidx = str(tmp_path / "vector_index")
    append_shard_to_vector_index(emb, vidx, "2024-01-01")
    append_shard_to_vector_index(
        emb.withColumn("vec_id", F.col("vec_id") + 1_000_000), vidx, "2024-01-02"
    )
    healthy = vector_index_recall_sample(spark, vidx, threshold=0.999, sample_q=10)
    assert healthy["recall_at_threshold"] == 1.0, healthy

    # day 3 crashes after its vectors land but before its buckets do:
    # a third clone of every vector exists in vectors/ with no probe
    # surface — unfindable by construction
    append_shard_to_vector_index(
        emb.withColumn("vec_id", F.col("vec_id") + 2_000_000), vidx, "2024-01-03"
    )
    shutil.rmtree(os.path.join(vidx, "buckets", "ds=2024-01-03"))
    crashed = vector_index_recall_sample(spark, vidx, threshold=0.999, sample_q=10)
    assert crashed["recall_at_threshold"] == 1.0, crashed
    assert crashed["n_vectors"] == healthy["n_vectors"]

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    didx = str(tmp_path / "minhash_index")
    append_shard_to_minhash_index(docs, didx, "2024-01-01")
    append_shard_to_minhash_index(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000), didx, "2024-01-02"
    )
    h = minhash_index_recall_sample(spark, didx, threshold=1.0, sample_q=8)
    assert h["recall_at_threshold"] == 1.0, h
    append_shard_to_minhash_index(
        docs.withColumn("doc_id", F.col("doc_id") + 2_000_000), didx, "2024-01-03"
    )
    shutil.rmtree(os.path.join(didx, "buckets", "ds=2024-01-03"))
    c = minhash_index_recall_sample(spark, didx, threshold=1.0, sample_q=8)
    assert c["recall_at_threshold"] == 1.0, c
    assert c["n_docs"] == h["n_docs"]


def test_vector_autotune_meets_target_where_geometry_fails(spark, tmp_path):
    """`vector_index_recall_autotune` on exactly the asymmetry VERDICT
    r09 named: an index whose frozen geometry (not the banding model)
    is the recall limit.  A deliberately starved build (1 table, 16
    planes) measures near-zero recall on a corpus of ~0.9-cosine
    variant pairs; the tuner must start from the stored geometry's
    measurement, jump to the inverse banding solve, escalate on the
    measured frontier, and terminate with measured recall >= target —
    with the final geometry actually LANDED in the index's params and
    the trail's predictions never shrinking."""
    import numpy as np

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        vector_index_recall_autotune,
        write_vector_index,
    )

    rng = np.random.RandomState(23)
    dim = 16
    base = rng.randn(300, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    for i in range(150):  # ~0.91-cosine variant of half the corpus
        u = rng.randn(dim)
        u /= np.linalg.norm(u)
        v = base[i] + 0.45 * u
        rows.append((10_000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "vec_weak")
    write_vector_index(emb, idx, dim=dim, tables=1, planes=16)

    res = vector_index_recall_autotune(
        spark, idx, threshold=0.85, recall_target=0.9, sample_q=25
    )
    first, last = res["steps"][0], res["steps"][-1]
    # the first step measures the STORED geometry (no rebuild)
    assert (first["tables"], first["planes"]) == (1, 16)
    assert first["rebuild_sec"] is None
    assert first["true_pairs"] > 0, res
    assert first["recall_at_threshold"] < 0.9, res
    # closed loop: measured (not predicted) recall meets the target
    assert res["met"] and res["recall_at_threshold"] >= 0.9, res
    assert len(res["steps"]) >= 2 and last["rebuild_sec"] is not None
    # the final geometry is what the index now stores
    stored = _read_vector_params(spark, idx)
    assert (stored["tables"], stored["planes"]) == (res["tables"], res["planes"])
    assert stored["dim"] == dim  # rebuilds never change the hash family
    # escalation only ever widens the banding prediction
    for a, b in zip(res["steps"], res["steps"][1:]):
        assert (
            b["predicted_recall_at_threshold"]
            >= a["predicted_recall_at_threshold"] - 1e-12
        )
    # truth is geometry-independent: same sample, same true pairs
    assert {s["true_pairs"] for s in res["steps"]} == {first["true_pairs"]}


def test_vector_autotune_honest_on_no_true_pairs(spark, sf_small, tmp_path):
    """Tuning against a sample with zero true pairs would be theater:
    the verb must return met=None WITHOUT rebuilding (stored geometry
    untouched) — the same no-vacuous-1.0 posture as the sensor."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        vector_index_recall_autotune,
        write_vector_index,
    )
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    idx = str(tmp_path / "vec_nopairs")
    write_vector_index(emb, idx)
    before = _read_vector_params(spark, idx)
    res = vector_index_recall_autotune(
        spark, idx, threshold=0.9999, recall_target=0.9, sample_q=5
    )
    assert res["met"] is None and len(res["steps"]) == 1
    assert res["recall_at_threshold"] is None
    assert _read_vector_params(spark, idx) == before


def test_minhash_geometry_for_recall_inverse_model():
    """The text-family inverse banding solve: prediction honors the
    target when feasible, deeper rows are preferred while the bands
    bill fits (precision-first), and infeasibility is reported."""
    import pytest

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        minhash_geometry_for_recall,
    )

    # a strong threshold affords the deepest rows within 64 bands
    strong = minhash_geometry_for_recall(0.7, recall_target=0.9)
    assert strong["feasible"] and strong["rows_per_band"] == 8
    assert strong["predicted_recall_at_threshold"] >= 0.9
    # a weak threshold sheds rows until the bands bill fits
    weak = minhash_geometry_for_recall(0.5, recall_target=0.9)
    assert weak["feasible"]
    assert weak["rows_per_band"] < strong["rows_per_band"]
    assert weak["predicted_recall_at_threshold"] >= 0.9
    assert weak["signature_hashes_per_doc"] == weak["bands"] * weak["rows_per_band"]
    # unaffordable with a rows floor: honest infeasibility
    bad = minhash_geometry_for_recall(0.2, recall_target=0.99, min_rows=3)
    assert not bad["feasible"]
    assert bad["rows_per_band"] == 3 and bad["bands"] == 64
    assert bad["predicted_recall_at_threshold"] < 0.99
    with pytest.raises(ValueError):
        minhash_geometry_for_recall(0.5, recall_target=1.5)
    with pytest.raises(ValueError):
        minhash_geometry_for_recall(1.0)


def test_minhash_index_geometry_frozen_and_rebuild_preserves_probe(
    spark, sf_small, tmp_path
):
    """The params contract, applied to the text family (round 10):
    the build freezes (bands, rows, shingle n); appends and probes
    read the stored geometry (caller defaults can no longer split the
    index into disjoint spaces); a re-banding rebuild preserves the
    ds layout, its completeness markers, and probe correctness."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_minhash_params,
        append_shard_to_minhash_index,
        incremental_neardup_pairs,
        minhash_index_recall_sample,
        rebuild_minhash_index,
        shard_indexed,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    idx = str(tmp_path / "minhash_custom")
    # day 1 freezes the default geometry + n
    append_shard_to_minhash_index(docs, idx, "2024-01-01", n=4)
    stored = _read_minhash_params(spark, idx)
    assert stored == {"bands": 16, "rows_per_band": 4, "n": 4}

    # a later append with DIFFERENT caller defaults must follow the
    # stored n=4 (a clone then matches at jaccard 1.0 — with a
    # mismatched n it would have disjoint shingle sets and J=0)
    src = docs.orderBy("doc_id").first()
    clone = spark.createDataFrame(
        [(9_000_000, src.text)], "doc_id long, text string"
    )
    hits = incremental_neardup_pairs(
        spark, clone, idx, threshold=0.9, before_ds="2024-01-02", n=3
    ).collect()
    assert any(
        r.doc_a == src.doc_id and r.jaccard == 1.0 for r in hits
    ), hits

    # re-band under an explicit geometry: params updated, markers
    # preserved, the same clone probe still hits
    rep = rebuild_minhash_index(spark, idx, {"bands": 24, "rows_per_band": 3})
    assert rep["layout"] == "ds" and rep["geometry"]["n"] == 4
    assert _read_minhash_params(spark, idx) == {
        "bands": 24, "rows_per_band": 3, "n": 4,
    }
    assert shard_indexed(idx, "2024-01-01")
    hits2 = incremental_neardup_pairs(
        spark, clone, idx, threshold=0.9, before_ds="2024-01-02"
    ).collect()
    assert any(r.doc_a == src.doc_id and r.jaccard == 1.0 for r in hits2)
    # the sensor reports the STORED geometry, not module constants
    sens = minhash_index_recall_sample(spark, idx, threshold=1.0, sample_q=3)
    assert (sens["bands"], sens["rows_per_band"]) == (24, 3)


def test_minhash_autotune_meets_target_where_geometry_fails(spark, tmp_path):
    """`minhash_index_recall_autotune` on the regime the fixed 16x4
    geometry cannot hold: prefix-variant pairs at Jaccard ~0.53-0.62
    against a 0.9 target at threshold 0.5 (the banding form predicts
    ~0.73-0.8 per pair there).  The tuner must measure the stored
    geometry first, jump to the inverse solve, and terminate with
    measured recall >= target, the final geometry landed in params/
    and predictions monotone along the trail."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_minhash_params,
        minhash_index_recall_autotune,
        write_minhash_index,
    )

    rows = []
    for i in range(150):
        toks = [f"d{i}w{j}" for j in range(42)]
        rows.append((i, " ".join(toks)))
        keep = 22 + (i * 7) % 6  # prefix fractions ~0.52-0.64
        rows.append((10_000 + i, " ".join(toks[:keep])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "minhash_tune")
    write_minhash_index(docs, idx)

    res = minhash_index_recall_autotune(
        spark, idx, threshold=0.5, recall_target=0.9, sample_q=25
    )
    first, last = res["steps"][0], res["steps"][-1]
    assert (first["bands"], first["rows_per_band"]) == (16, 4)
    assert first["rebuild_sec"] is None
    assert first["true_pairs"] > 0, res
    assert first["recall_at_threshold"] < 0.9, res
    assert res["met"] and res["recall_at_threshold"] >= 0.9, res
    assert len(res["steps"]) >= 2 and last["rebuild_sec"] is not None
    stored = _read_minhash_params(spark, idx)
    assert (stored["bands"], stored["rows_per_band"]) == (
        res["bands"], res["rows_per_band"],
    )
    for a, b in zip(res["steps"], res["steps"][1:]):
        assert (
            b["predicted_recall_at_threshold"]
            >= a["predicted_recall_at_threshold"] - 1e-12
        )
    assert {s["true_pairs"] for s in res["steps"]} == {first["true_pairs"]}


def test_vector_autotune_candidate_load_ceiling(spark, tmp_path):
    """ADVICE r10: the escalation ladder must consult expected
    candidate load.  With a ceiling below any load-increasing move,
    the tuner refuses the first rebuild, reports the refused geometry
    and its priced load, and leaves the stored geometry untouched —
    an honest exhausted=True instead of an O(N^2)-class geometry."""
    import numpy as np

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_vector_params,
        vector_index_recall_autotune,
        write_vector_index,
    )

    rng = np.random.RandomState(7)
    dim = 16
    base = rng.randn(120, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    for i in range(60):
        u = rng.randn(dim)
        u /= np.linalg.norm(u)
        v = base[i] + 0.45 * u
        rows.append((10_000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "vec_gated")
    write_vector_index(emb, idx, dim=dim, tables=1, planes=16)
    before = _read_vector_params(spark, idx)

    res = vector_index_recall_autotune(
        spark, idx, threshold=0.85, recall_target=0.9, sample_q=20,
        max_candidate_load=0.001,  # below any widening move's load
    )
    assert res["met"] is False and res["exhausted"] is True
    assert len(res["steps"]) == 1  # measured the stored geometry only
    gate = res["stopped_on_candidate_load"]
    assert gate is not None
    assert gate["max_candidate_load"] == 0.001
    assert gate["expected_candidate_load"] > 0.001
    assert set(gate["geometry"]) == {"tables", "planes"}
    assert _read_vector_params(spark, idx) == before  # no rebuild ran


def test_minhash_autotune_candidate_load_ceiling(spark, tmp_path):
    """The text twin: the priced load uses the background Jaccard
    backed out of the CURRENT buckets' measured collision rate, so
    the gate works without any closed-form false-positive model."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        _read_minhash_params,
        minhash_index_recall_autotune,
        write_minhash_index,
    )

    rows = []
    for i in range(100):
        toks = [f"d{i}w{j}" for j in range(42)]
        rows.append((i, " ".join(toks)))
        keep = 22 + (i * 7) % 6
        rows.append((10_000 + i, " ".join(toks[:keep])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "minhash_gated")
    write_minhash_index(docs, idx)
    before = _read_minhash_params(spark, idx)

    res = minhash_index_recall_autotune(
        spark, idx, threshold=0.5, recall_target=0.9, sample_q=20,
        max_candidate_load=1e-9,
    )
    assert res["met"] is False and res["exhausted"] is True
    assert len(res["steps"]) == 1
    gate = res["stopped_on_candidate_load"]
    assert gate is not None and gate["expected_candidate_load"] > 1e-9
    assert set(gate["geometry"]) == {"bands", "rows_per_band"}
    assert _read_minhash_params(spark, idx) == before


def test_rebuild_minhash_signs_per_day_not_cross_day(spark, tmp_path):
    """ADVICE r10: a doc_id present in multiple ds partitions (a
    re-ingested/updated doc) was signed PER DAY by the append path;
    the rebuild must reproduce exactly those per-day buckets, not one
    merged cross-day signature attached to every day.  Pin:
    rebuilding under the SAME geometry is bucket-for-bucket identical
    to the append-built index."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        append_shard_to_minhash_index,
        rebuild_minhash_index,
    )

    day1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    # doc_id 1 re-ingested on day 2 with DIFFERENT text: its day-2
    # signature must come from the day-2 shingles alone
    day2 = spark.createDataFrame(
        [(1, "totally different words entirely here now"),
         (3, "eight nine ten eleven twelve thirteen")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "minhash_multi_ds")
    append_shard_to_minhash_index(day1, idx, "2024-01-01")
    append_shard_to_minhash_index(day2, idx, "2024-01-02")

    import os

    def _bucket_set():
        df = spark.read.parquet(os.path.join(idx, "buckets"))
        return {
            (r.doc_id, str(r.ds), r.band, r.bucket) for r in df.collect()
        }

    before = _bucket_set()
    # the doc appears under both days with day-specific signatures
    assert {d for (i, d, b, k) in before if i == 1} == {
        "2024-01-01", "2024-01-02",
    }
    sigs_by_day = {
        d: {(b, k) for (i, dd, b, k) in before if i == 1 and dd == d}
        for d in ("2024-01-01", "2024-01-02")
    }
    assert sigs_by_day["2024-01-01"] != sigs_by_day["2024-01-02"]

    rep = rebuild_minhash_index(
        spark, idx, {"bands": 16, "rows_per_band": 4}
    )
    assert rep["layout"] == "ds"
    assert _bucket_set() == before  # bit-equivalent to the append path


def test_vector_recall_truth_cache(spark, tmp_path):
    """VERDICT r10 #5: exact truth was recomputed per sensor/tune
    invocation even on an unchanged corpus.  The truth is now cached
    under the index, CONTENT-keyed: a second call hits, an append
    invalidates (new key), and a rebuild — which never changes the
    verify surface — keeps the cache valid (so autotune's
    post-rebuild re-measures skip the expensive pass, which is where
    the 1M tune_sec actually went)."""
    import numpy as np

    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        append_to_vector_index,
        rebuild_vector_index,
        vector_index_recall_sample,
        write_vector_index,
    )

    rng = np.random.RandomState(5)
    dim = 16
    base = rng.randn(150, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(150)]
    for i in range(75):
        u = rng.randn(dim)
        u /= np.linalg.norm(u)
        rows.append((10_000 + i, [float(x) for x in (base[i] + 0.45 * u)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "vec_cache")
    write_vector_index(emb, idx, dim=dim)

    r1 = vector_index_recall_sample(spark, idx, threshold=0.85, sample_q=15)
    r2 = vector_index_recall_sample(spark, idx, threshold=0.85, sample_q=15)
    assert (r1["truth_cache"], r2["truth_cache"]) == ("miss", "hit")
    core = lambda r: {
        k: v for k, v in r.items()
        if k not in ("probe_sec", "truth_sec", "truth_cache")
    }
    assert core(r1) == core(r2)  # byte-identical measurement
    assert r1["true_pairs"] > 0

    # a DIFFERENT threshold is a different truth: its own key
    r3 = vector_index_recall_sample(spark, idx, threshold=0.5, sample_q=15)
    assert r3["truth_cache"] == "miss"

    # a rebuild keeps the cache valid (verify surface unchanged)
    rebuild_vector_index(spark, idx, geometry={"tables": 16, "planes": 6})
    r4 = vector_index_recall_sample(spark, idx, threshold=0.85, sample_q=15)
    assert r4["truth_cache"] == "hit"
    assert r4["true_pairs"] == r1["true_pairs"]

    # an append changes the corpus content: the key rolls, recompute
    extra = spark.createDataFrame(
        [(99_999, [float(x) for x in base[0]])],
        "vec_id long, embedding array<float>",
    )
    append_to_vector_index(extra, idx)
    r5 = vector_index_recall_sample(spark, idx, threshold=0.85, sample_q=15)
    assert r5["truth_cache"] == "miss"


def test_minhash_recall_truth_cache(spark, tmp_path):
    """Text twin of the vector truth-cache contract."""
    from data_engineering_user_session_analysis_spark.operators.dedup_index import (
        append_to_minhash_index,
        minhash_index_recall_sample,
        rebuild_minhash_index,
        write_minhash_index,
    )

    rows = []
    for i in range(80):
        toks = [f"d{i}w{j}" for j in range(30)]
        rows.append((i, " ".join(toks)))
        rows.append((10_000 + i, " ".join(toks[:20])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "minhash_cache")
    write_minhash_index(docs, idx)

    r1 = minhash_index_recall_sample(spark, idx, threshold=0.5, sample_q=12)
    r2 = minhash_index_recall_sample(spark, idx, threshold=0.5, sample_q=12)
    assert (r1["truth_cache"], r2["truth_cache"]) == ("miss", "hit")
    core = lambda r: {
        k: v for k, v in r.items()
        if k not in ("probe_sec", "truth_sec", "truth_cache")
    }
    assert core(r1) == core(r2)
    assert r1["true_pairs"] > 0

    rebuild_minhash_index(spark, idx, {"bands": 24, "rows_per_band": 3})
    r3 = minhash_index_recall_sample(spark, idx, threshold=0.5, sample_q=12)
    assert r3["truth_cache"] == "hit"
    assert r3["true_pairs"] == r1["true_pairs"]

    append_to_minhash_index(
        spark.createDataFrame(
            [(99_999, "completely new appended document text")],
            "doc_id long, text string",
        ),
        idx,
    )
    r4 = minhash_index_recall_sample(spark, idx, threshold=0.5, sample_q=12)
    assert r4["truth_cache"] == "miss"
