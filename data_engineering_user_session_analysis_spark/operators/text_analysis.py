"""Text-analysis operators for corpus pipelines: language ID,
quality scoring, content fingerprinting, tokenizer accounting.

All pure Spark built-ins (split/filter/transform/regexp) — string
work stays inside whole-stage codegen; no Python in the hot path.
Heuristics are deliberately deterministic (no model weights) so the
DuckDB oracle can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword profiles (public common stopwords).
# Scoring = hit count over token occurrences; ties resolved by the
# declaration order below (a fixed priority chain, mirrored in SQL).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "de", "los", "que"),
    "fr": ("le", "la", "les", "des", "un"),
}

# BPE-ish pre-tokenizer: word pieces, digit runs, or single non-space
# symbols (the standard GPT-2-style pre-split shape, sans lookbehind
# so every regex engine agrees).
BPE_TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one `score_<lang>` column per profile: stopword hits over
    token occurrences."""
    toks = _tokens(text_col)

    def hit(words: tuple[str, ...]):
        # single-arg lambda: a 2-arg one would receive the element
        # INDEX as its second parameter (F.filter's (x, i) form).
        return lambda t: t.isin(*words)

    return df.withColumns(
        {
            f"score_{lang}": F.size(F.filter(toks, hit(words))).cast("long")
            for lang, words in LANG_PROFILES.items()
        }
    )


def predict_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax over profile scores with the fixed priority chain."""
    scored = lang_scores(df, text_col)
    langs = list(LANG_PROFILES)
    pred = F
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return scored.withColumn("predicted_lang", expr.otherwise(langs[-1]))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/diversity/stopword quality features + a composite score.

    The composite is a fixed linear blend evaluated in one expression
    order, so it is bit-deterministic across engines."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    n_types = F.size(F.array_distinct(toks)).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    ).cast("long")
    n_chars = F.length(text_col).cast("long")
    ttr = n_types / n_tokens.cast("double")
    stop_ratio = stop_hits / n_tokens.cast("double")
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens.cast("double")
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_types": n_types,
            "type_token_ratio": ttr,
            "stopword_ratio": stop_ratio,
            "mean_token_len": mean_tok_len,
            "quality_score": ttr * 0.5 + stop_ratio * 0.3 + mean_tok_len * 0.04,
        }
    )


def doc_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 5,
    mod: int = 8,
) -> DataFrame:
    """MOD-p content fingerprints (the winnowing-family sampling used
    for copy detection): hash every word `gram`-gram with md5, keep
    hashes ≡ 0 (mod `mod`) — a content-defined ~1/mod sample that is
    stable under document edits elsewhere.  One row per selected
    fingerprint."""
    toks = _tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - gram),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(gram)]),
    )
    hashed = F.transform(
        F.array_distinct(grams),
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    selected = F.array_sort(
        F.filter(hashed, lambda h: h % mod == 0)
    )
    return (
        df.filter(F.size(toks) >= gram)
        .select(F.col(id_col), F.explode(selected).alias("fingerprint"))
    )


def bpe_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer accounting with the BPE-ish pre-split regex."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
    return df.withColumns(
        {
            "n_bpe_tokens": F.size(pieces).cast("long"),
            "n_word_tokens": F.size(_tokens(text_col)).cast("long"),
        }
    )


def ngram_repetition_features(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Token-level duplicate-n-gram fractions — the n-gram half of the
    Gopher repetition-filter family (``scrubbing.repetition_signals``
    carries the line half, which is vacuous on single-line documents).

    For each ``n``: ``n_{n}grams`` = token n-gram occurrences and
    ``dup_{n}gram_frac`` = fraction of those occurrences that repeat
    an earlier-seen n-gram (occurrences minus distinct, over
    occurrences).  Entirely map-side array expressions inside
    whole-stage codegen — no shuffle, no Python — O(tokens) per
    document per n (``array_distinct`` is one hash pass), so the
    operator costs one corpus scan at any scale.  The fraction is a
    single IEEE division of two exact integers, so a SQL oracle
    replays it bit-for-bit.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    cols: dict[str, Column] = {}

    def _gram_at(n: int):
        # single-arg lambda via factory: a `n=n` default would make
        # F.transform pass the element INDEX as the second parameter
        return lambda i: F.concat_ws(
            " ", *[F.get(toks, i + j) for j in range(n)]
        )

    for n in ns:
        n_grams = F.greatest(n_tokens - (n - 1), F.lit(0))
        # guard: sequence(0, -k) would generate a DESCENDING range,
        # not an empty one, so short documents get an explicit empty
        # gram array
        grams = F.when(
            n_tokens >= n,
            F.transform(F.sequence(F.lit(0), n_tokens - n), _gram_at(n)),
        ).otherwise(F.array().cast("array<string>"))
        dup = n_grams - F.size(F.array_distinct(grams))
        cols[f"n_{n}grams"] = n_grams.cast("long")
        cols[f"dup_{n}gram_frac"] = dup / F.greatest(n_grams, F.lit(1)).cast(
            "double"
        )
    return df.withColumns(cols)
