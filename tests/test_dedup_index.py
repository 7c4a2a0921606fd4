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
