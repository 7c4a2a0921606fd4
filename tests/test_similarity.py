"""Similarity-search quality: the approximate (IVF) path must track
the exact brute-force baseline."""

from __future__ import annotations

from data_engineering_user_session_analysis_spark.queries import QUERIES


def test_ann_recall_vs_brute_force(spark, sf_small):
    true3 = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["knn_brute_force"](spark, sf_small)
        .filter("rank <= 3")
        .collect()
    }
    ann3 = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_ivf_topk"](spark, sf_small).collect()
    }
    assert true3, "brute-force baseline empty"
    recall = len(true3 & ann3) / len(true3)
    # nprobe=2 over random (clusterless) embeddings: measured ~0.7
    # at sf0.01; the floor guards against the cell search degenerating.
    assert recall >= 0.45, f"ANN recall@3 collapsed: {recall:.3f}"


def test_label_centroids_math(spark, sf_small):
    """Centroid of each label == numpy mean of that label's vectors."""
    import numpy as np

    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype="float64"))
    got = {
        r.label: (np.array(r.centroid), r.n_vectors)
        for r in QUERIES["label_centroids"](spark, sf_small).collect()
    }
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        centroid, n = got[label]
        assert n == len(vecs)
        assert np.allclose(centroid, np.mean(vecs, axis=0), atol=1e-9)


def test_vector_lsh_recall_and_precision(spark, sf_small):
    """Hyperplane-LSH near-dup pairs: subset of (precision 1.0 vs)
    the all-pairs exact method, with usable recall at this weak
    threshold (cos>=0.4 pairs sit near 66°, the hard LSH regime)."""
    from data_engineering_user_session_analysis_spark.operators.vector_lsh import lsh_similarity_pairs
    from data_engineering_user_session_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["embedding_neardup"](spark, sf_small).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in lsh_similarity_pairs(emb, threshold=0.4).collect()
    }
    assert lsh <= exact, "LSH emitted a pair the exact method rejects"
    assert exact, "no exact pairs to measure against"
    recall = len(lsh) / len(exact)
    assert recall >= 0.3, f"LSH recall collapsed: {recall:.3f}"
