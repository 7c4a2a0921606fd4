"""Deterministic sampling / splitting / mixture operators
(operators/sampling.py): reproducibility is the contract — every pin
checks a property that a seed-based or partitioning-dependent sampler
would break."""

import hashlib

import pytest
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.sampling import (
    apply_mixture,
    deterministic_split,
    mixture_rates,
    sample_fraction,
    stratified_sample_by_rates,
    uniform_hash_unit,
    upsample_by_rate,
)

LANGS = ("en", "de", "fr", "ja")


@pytest.fixture()
def corpus(spark):
    return (
        spark.range(4000)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(F.array(*[F.lit(l) for l in LANGS]), (F.col("id") % 4 + 1).cast("int")).alias("lang"),
        )
        .cache()
    )


def _ref_unit(doc_id: int, salt: str) -> float:
    return int(hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8], 16) / 2**32


def test_uniform_hash_unit_matches_hashlib_reference(spark, corpus):
    """The unit hash is engine-portable: Spark's md5-prefix value must
    equal Python hashlib's byte for byte (the property that lets any
    engine reproduce the sample)."""
    rows = (
        corpus.limit(50)
        .select("doc_id", uniform_hash_unit("doc_id", "s").alias("u"))
        .collect()
    )
    for r in rows:
        assert abs(r.u - _ref_unit(r.doc_id, "s")) < 1e-12


def test_sample_fraction_is_deterministic_and_partitioning_invariant(corpus):
    a = {r.doc_id for r in sample_fraction(corpus, 0.3, salt="x").collect()}
    b = {
        r.doc_id
        for r in sample_fraction(corpus.repartition(17), 0.3, salt="x").collect()
    }
    assert a == b
    assert abs(len(a) / 4000 - 0.3) < 0.03
    # independence across salts: double-filter at 0.5/0.5 keeps ~25%
    both = sample_fraction(sample_fraction(corpus, 0.5, salt="s1"), 0.5, salt="s2")
    assert abs(both.count() / 4000 - 0.25) < 0.03


def test_deterministic_split_disjoint_cover_stable(corpus):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = deterministic_split(corpus, w, salt="sp")
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 4000  # covers every row exactly once
    for name, frac in w.items():
        assert abs(counts[name] / 4000 - frac) < 0.03
    # stability: adding new rows cannot move an old row's split
    grown = corpus.unionByName(
        corpus.select((F.col("doc_id") + 100_000).alias("doc_id"), "lang")
    )
    old = {(r.doc_id, r.split) for r in out.collect()}
    regrown = {
        (r.doc_id, r.split)
        for r in deterministic_split(grown, w, salt="sp").collect()
        if r.doc_id < 100_000
    }
    assert regrown == old


def test_stratified_rates_per_stratum(corpus):
    rates = {"en": 1.0, "de": 0.4, "fr": 0.0}
    out = stratified_sample_by_rates(corpus, rates, strata_col="lang")
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts.get("en") == 1000       # rate 1.0 keeps everything
    assert abs(counts.get("de", 0) / 1000 - 0.4) < 0.05
    assert "fr" not in counts             # explicit 0
    assert "ja" not in counts             # default_rate 0 drops unlisted


def test_upsample_by_rate_multiplicity(corpus):
    out = upsample_by_rate(corpus, 2.5, salt="e").cache()
    n = out.count()
    assert abs(n / 4000 - 2.5) < 0.1
    per_id = out.groupBy("doc_id").agg(F.count("*").alias("c"))
    assert per_id.filter((F.col("c") < 2) | (F.col("c") > 3)).count() == 0
    # deterministic: same call, same rows (including copy indexes)
    again = upsample_by_rate(corpus, 2.5, salt="e")
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    out.unpersist()
    # pure fractional rate
    assert abs(upsample_by_rate(corpus, 0.3, salt="e").count() / 4000 - 0.3) < 0.05


def test_mixture_rates_solves_binding_domain():
    plan = mixture_rates(
        available={"web": 1000.0, "code": 100.0},
        target_shares={"web": 0.5, "code": 0.5},
        max_repeat=2.0,
    )
    # code binds: T * 0.5 <= 100 * 2 -> T = 400
    assert plan["binding_domain"] == "code"
    assert plan["total"] == pytest.approx(400.0)
    assert plan["rates"]["code"] == pytest.approx(2.0)
    assert plan["rates"]["web"] == pytest.approx(0.2)
    with pytest.raises(ValueError):
        mixture_rates({"a": 1.0}, {"b": 1.0})


def test_apply_mixture_realizes_plan(corpus):
    # en abundant, ja scarce: mix 3:1 en:ja with repetition allowed
    plan = mixture_rates(
        available={"en": 1000.0, "ja": 200.0},
        target_shares={"en": 0.75, "ja": 0.25},
        max_repeat=2.0,
    )
    sub = corpus.filter(F.col("lang").isin("en", "ja")).filter(
        (F.col("lang") != "ja") | (F.col("doc_id") % 20 < 4)  # ja down to 200
    )
    out = apply_mixture(sub, plan["rates"], strata_col="lang").cache()
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    total = plan["total"]
    assert abs(counts["en"] / (0.75 * total) - 1) < 0.1
    assert abs(counts["ja"] / (0.25 * total) - 1) < 0.1
    assert set(counts) == {"en", "ja"}
    out.unpersist()


def test_apply_mixture_single_pass_equals_branch_form(corpus):
    """The r15 one-scan apply_mixture (CASE copy-index array +
    explode) must emit the EXACT row multiset of the r14 branch
    construction (down-branch ∪ one upsample_by_rate per up-stratum),
    copy indices included — same salts, same membership.  Covers all
    stratum classes: down (en 0.5), up-with-fraction (de 1.75),
    whole-copy up (fr 2.0), unlisted (ja dropped)."""
    rates = {"en": 0.5, "de": 1.75, "fr": 2.0}
    new = apply_mixture(corpus, rates, strata_col="lang", salt="mixture")

    down = {d: r for d, r in rates.items() if r <= 1.0}
    parts = [
        stratified_sample_by_rates(
            corpus, down, "lang", "doc_id", default_rate=0.0, salt="mixture"
        ).withColumn("copy", F.lit(0))
    ]
    for d, r in sorted({d: r for d, r in rates.items() if r > 1.0}.items()):
        parts.append(
            upsample_by_rate(
                corpus.filter(F.col("lang") == F.lit(d)),
                r,
                "doc_id",
                salt=f"mixture:{d}",
                copy_col="copy",
            )
        )
    old = parts[0]
    for p in parts[1:]:
        old = old.unionByName(p)

    key = lambda r: (r.lang, r.doc_id, r.copy)  # noqa: E731
    assert sorted(map(key, new.collect())) == sorted(map(key, old.collect()))
    assert new.count() > 0
    # single pass: exactly one source scan, still no Exchange
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Union" not in plan, plan


def test_sampling_plans_stay_map_side(corpus):
    """No shuffle anywhere: sampling must not add an Exchange (the
    100 TB property — a resample is a scan, never a redistribution)."""
    for df in (
        sample_fraction(corpus, 0.5),
        deterministic_split(corpus, {"a": 0.5, "b": 0.5}),
        stratified_sample_by_rates(corpus, {"en": 0.5}),
        upsample_by_rate(corpus, 1.5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_uniform_hash_unit_reproducible_in_duckdb():
    """Close the portability triangle: the DuckDB expression
    ``('0x' || substr(md5(id || ':salt'), 1, 8))::UBIGINT / 2^32``
    reproduces the unit hash byte for byte (Spark == hashlib is
    pinned above), so an external engine can audit or re-derive any
    sample/split this tier produced — no Spark required."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, ('0x' || substr(md5(i::VARCHAR || ':s'), 1, 8))::UBIGINT"
        " / 4294967296.0 AS u FROM range(200) t(i)"
    ).fetchall()
    assert len(rows) == 200
    for i, u in rows:
        assert abs(u - _ref_unit(i, "s")) < 1e-12
