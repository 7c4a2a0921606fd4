"""Exact-substring duplicate-span detection (the ExactSubstr dedup
family of Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"): find spans of >= `window` consecutive
tokens that occur verbatim in more than one document, and score each
document by how much of it is covered by such spans.

The reference corpus pipelines in this repo already carry DOCUMENT-
level dedup (exact digest groups, MinHash/LSH, SimHash); this is the
finer grain — a press-release paragraph pasted into thousands of
otherwise-distinct pages is invisible to document-level Jaccard but
is exactly what substring dedup removes.  The public algorithm uses
a corpus-wide suffix array; the distributed re-expression here is
the standard hashed-window form (every position starts one
`window`-token rolling window; windows are md5-keyed so equality is
exact up to 128-bit collisions), which shuffles one fixed-width row
per token position — the same O(total tokens) the suffix array pays,
but in Spark's shuffle machinery instead of a shared-memory sort.

Scale notes (100 TB):
* The window build is one Arrow kernel pass (map-only, no shuffle).
  A Catalyst ``transform(sequence(...), i -> md5(concat_ws(...)))``
  build hits the interpreted-HOF trap (outer ``split()`` re-evaluated
  per element — measured ~15x at 1M docs, see
  ``text_analysis.ngram_repetition_features``).
* The one big shuffle is the groupBy on the 32-hex-char window hash.
  `sample_mod` is the content-defined-chunking knob for corpora where
  even that is too much: keep only windows whose hash ≡ 0 (mod p) —
  the winnowing-style ~1/p sample `doc_fingerprints` uses, stable
  under edits elsewhere in the doc.  Detection then finds duplicated
  spans whose sampled anchor windows collide (recall is a function of
  span length: a duplicated span of L tokens carries ~(L-window+1)/p
  sampled anchors), and coverage becomes a lower bound.
* At the standard ``min_docs=2`` the cross-doc flag is evaluated IN
  the hash shuffle itself (``min(doc_id) != max(doc_id)`` per hash —
  a window aggregate, so the kernel lineage runs once); ``min_docs >
  2`` falls back to an exact count-distinct groupBy + broadcast LEFT
  SEMI join, which re-walks the kernel on the probe side.  The
  per-doc interval merge is then a single lag() window over
  (doc_id, pos) — one shuffle keyed by doc, O(dup windows) state.
* Skew: the min_docs=2 window flag has NO map-side partial
  aggregation — every occurrence of one window hash lands in a
  single task's window partition, so a hash carried by millions of
  documents (viral boilerplate pasted corpus-wide) concentrates in
  one task.  Deliberate trade: the groupBy+semi-join form DOES
  combine map-side but re-evaluates the Arrow kernel lineage on the
  probe side (measured 2.7x slower at 1M docs — detection 128.1 →
  81.8 s), and AQE's skew-join split does not apply to window
  exchanges.  For corpora where single-hash occurrence counts are
  extreme, route around it: the ``min_docs > 2`` groupBy fallback is
  the skew-safe (map-side-combined) detection form, and the
  persistent-index probe (``operators/span_index.py``) bounds the
  window input to O(day + matching stored occurrences) rather than
  O(corpus).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Production window length from the public ExactSubstr protocol
#: (50 tokens).  The registry row uses 15 because fixture documents
#: are 10-100 tokens; the operator takes it as a parameter.
EXACTSUBSTR_WINDOW = 50


def sample_mod_for_recall(
    target_recall: float,
    min_span_tokens: int,
    window: int = EXACTSUBSTR_WINDOW,
) -> int:
    """Largest ``sample_mod`` whose predicted detection recall for
    duplicated spans of >= ``min_span_tokens`` tokens meets
    ``target_recall`` — the actionable inverse of the winnowing
    knob, mirroring how the LSH/IVF families derive geometry from a
    recall target instead of asking the caller to guess.

    A span of L tokens carries ``a = L - window + 1`` anchor windows,
    each kept with probability 1/p under hash-value sampling, so
    predicted recall is ``1 - (1 - 1/p)^a``; solving for the largest
    integer p:  ``p <= 1 / (1 - (1 - t)^(1/a))``.  The prediction is
    MEASURED, not just derived: the 1M planted-span tier
    (STRESS_sf1_r13 ``spanrecall1m``) tracks it within ~3 points at
    every (p, L) on the {2,4,8} x {16..64} grid — e.g. target 0.9 at
    L=32/window=15 solves to p=8, whose measured recall was 0.897.

    Returns >= 1; 1 means no sampling meets the target (``x % 1 == 0``
    keeps every window, so the return value is always safe to pass as
    ``sample_mod``).  Recall for spans LONGER than ``min_span_tokens``
    is strictly higher; shorter spans are the documented casualties.
    """
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    anchors = min_span_tokens - window + 1
    if anchors < 1:
        raise ValueError(
            f"min_span_tokens={min_span_tokens} carries no {window}-token "
            "anchor windows — spans shorter than the window are invisible "
            "at any sampling rate"
        )
    miss = (1.0 - target_recall) ** (1.0 / anchors)
    if miss >= 1.0:
        return 1
    p = int(1.0 / (1.0 - miss))
    # float error guard: the closed form can land one off either way
    def _recall(q: int) -> float:
        return 1.0 - (1.0 - 1.0 / q) ** anchors

    while p > 1 and _recall(p) < target_recall:
        p -= 1
    while _recall(p + 1) >= target_recall:
        p += 1
    return max(p, 1)


def positional_window_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = EXACTSUBSTR_WINDOW,
    sample_mod: int | None = None,
) -> DataFrame:
    """One row per token position: ``(id_col, pos, wh)`` where `wh`
    is the md5 hex of the `window`-token gram starting at `pos`
    (0-based).  Unlike the shingle kernel this keeps POSITIONS and
    repeats — coverage math needs both.  Docs shorter than `window`
    tokens produce no rows.

    ``sample_mod``: keep only hashes whose leading-32-bit value is
    ≡ 0 (mod `sample_mod`) — the content-defined ~1/p sample for the
    scale path (see module docstring).  None keeps every window.
    """

    @F.pandas_udf("array<struct<pos: int, wh: string>>")
    def _wh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = t.split(" ")
            out.append(
                [
                    {
                        "pos": i,
                        "wh": hashlib.md5(
                            " ".join(toks[i : i + window]).encode("utf-8")
                        ).hexdigest(),
                    }
                    for i in range(len(toks) - window + 1)
                ]
            )
        return pd.Series(out)

    toks = F.split(F.col(text_col), " ")
    rows = (
        docs.filter(F.size(toks) >= window)
        .select(F.col(id_col), F.explode(_wh(F.col(text_col))).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.wh").alias("wh"))
    )
    if sample_mod is not None:
        bucket = F.conv(F.substring("wh", 1, 8), 16, 10).cast("long")
        rows = rows.filter(bucket % sample_mod == 0)
    return rows


def _flagged_occurrences(
    wh: DataFrame, id_col: str, min_docs: int
) -> DataFrame:
    """The occurrences of cross-doc duplicated windows, from the
    positional rows.  At the standard ``min_docs=2`` the flag is
    simply ``min(doc_id) != max(doc_id)`` per hash — ONE window pass
    over the hash-shuffled rows, so the Arrow window kernel upstream
    evaluates once (the groupBy + semi-join form re-evaluates the
    whole kernel lineage on the probe side AND pays the exact
    count-distinct's two-exchange expand; measured 128 s → see the
    spandedup1m tier).  ``min_docs > 2`` needs a true distinct count,
    so it keeps the groupBy + broadcast-semi-join form and pays the
    second kernel pass.

    Skew exposure (module docstring, "Skew"): the window form has no
    map-side partial aggregation — a hash occurring in millions of
    docs funnels into one task; the ``min_docs > 2`` groupBy form is
    the map-side-combined alternative when that profile is known."""
    if min_docs <= 2:
        w_h = Window.partitionBy("wh")
        return (
            wh.withColumn("_mn", F.min(id_col).over(w_h))
            .withColumn("_mx", F.max(id_col).over(w_h))
            .filter(F.col("_mn") != F.col("_mx"))
            .drop("_mn", "_mx")
        )
    dup_hashes = (
        wh.groupBy("wh")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("wh")
    )
    return wh.join(dup_hashes, "wh", "left_semi")


def duplicated_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = EXACTSUBSTR_WINDOW,
    min_docs: int = 2,
    sample_mod: int | None = None,
) -> DataFrame:
    """Per-document duplicated-span statistics.  A window is
    *duplicated* when its hash occurs in >= `min_docs` DISTINCT
    documents (within-doc repetition is the Gopher n-gram filter's
    job, not this one's).  Only documents with at least one
    duplicated window are returned:

    * ``n_tokens`` / ``n_windows`` — whitespace tokens and window
      starts (``n_tokens - window + 1``);
    * ``n_dup_windows`` and ``dup_window_frac``;
    * ``dup_tokens`` — tokens covered by the UNION of the duplicated
      windows' ``[pos, pos+window-1]`` intervals (merged, not
      double-counted: sorted by pos, each window past the first
      contributes ``min(window, pos - prev_pos)``) and
      ``dup_token_frac`` over ``n_tokens``.

    Fractions are one IEEE division of exact integers, so a SQL
    oracle replays them bit-for-bit.  The removal/flag consumer is a
    trivial filter on ``dup_token_frac`` (corpus-prep wires it as an
    opt-in gate).
    """
    wh = positional_window_hashes(
        docs, text_col, id_col, window=window, sample_mod=sample_mod
    )
    dup = _flagged_occurrences(wh, id_col, min_docs)
    return _coverage_stats(dup, docs, text_col, id_col, window)


def _coverage_stats(
    dup: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
) -> DataFrame:
    """Per-doc coverage math over a flagged-occurrence frame
    ``(id_col, pos, ...)``: the sorted-interval merge (lag window
    over (doc, pos), each window past the first contributing
    ``min(window, pos - prev_pos)`` tokens) aggregated per doc, then
    joined with doc token counts for the fractional columns.  Shared
    by the batch operator (`duplicated_span_stats`) and the
    persistent-index probe (`span_index.incremental_span_stats`), so
    both grains compute bit-identical statistics from their
    respective occurrence sets."""
    w = Window.partitionBy(id_col).orderBy("pos")
    delta = F.col("pos") - F.lag("pos").over(w)
    contrib = F.when(delta.isNull(), F.lit(window)).otherwise(
        F.least(delta, F.lit(window))
    )
    per_doc = (
        dup.withColumn("_c", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_dup_windows"),
            F.sum("_c").cast("long").alias("dup_tokens"),
        )
    )

    toks = F.split(F.col(text_col), " ")
    sizes = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - window + 1).cast("long").alias("n_windows"),
    )
    return per_doc.join(sizes, id_col).select(
        id_col,
        "n_tokens",
        "n_windows",
        "n_dup_windows",
        (F.col("n_dup_windows") / F.col("n_windows").cast("double")).alias(
            "dup_window_frac"
        ),
        "dup_tokens",
        (F.col("dup_tokens") / F.col("n_tokens").cast("double")).alias(
            "dup_token_frac"
        ),
    )


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = EXACTSUBSTR_WINDOW,
    min_docs: int = 2,
    sample_mod: int | None = None,
) -> DataFrame:
    """The full ExactSubstr protocol step: REWRITE each document,
    dropping the tokens covered by cross-doc duplicated windows while
    keeping exactly one canonical occurrence of every duplicated
    window corpus-wide (the lexicographically smallest
    ``(doc_id, pos)`` occurrence keeps its copy — deterministic, no
    tie to break twice).  A token survives if it is outside every
    duplicated window of its doc, or inside a canonical one
    (canonical coverage overrides removal, so the kept occurrence is
    never chewed up by its own overlapping non-canonical windows).

    ``sample_mod`` caveat: with sampling active the rewrite removes
    only spans whose ANCHOR windows were sampled — removal becomes a
    PARTIAL (lower-bound) removal, and the remove-then-redetect-clean
    property holds only at the same ``sample_mod`` (a full redetect
    can still find duplicated spans whose anchors the sample missed).
    Measured at 1M docs (STRESS_sf1_r13 ``spanrecall1m``, planted
    spans, window=15): detection recall under sampling matches the
    predicted ``1-(1-1/p)^(L-window+1)`` anchor curve within ~3
    points at every (p, L) — e.g. p=8: L=16 tokens 0.26 measured vs
    0.23 predicted, L=32 0.90 vs 0.91, L=48+ ≈1.0; token-coverage
    under sampling is a strict underestimate (p=8, L=64: 0.74 of
    full).  Long spans survive sampling, short ones are the
    casualties — so reserve ``sample_mod`` for the stats/gating
    path, or accept the bounded residual in the rewrite.

    Returns ``docs`` with ``text_col`` rewritten plus
    ``n_removed_tokens``; docs without duplicated windows pass
    through unchanged (removed = 0).  Column passthrough is
    preserved via a left join on ``id_col``.

    Scale: the detection plan is `duplicated_span_stats`' (one Arrow
    pass, one O(tokens) hash shuffle, semi-join back); the canonical
    pick is one more groupBy on the window hash (min over a packed
    struct — map-side combinable); the rewrite collects each doc's
    OWN dup-window list (bounded by its token count) and rebuilds in
    one Arrow kernel — per-doc state, never corpus-wide.
    """
    wh = positional_window_hashes(
        docs, text_col, id_col, window=window, sample_mod=sample_mod
    )
    occ = _flagged_occurrences(wh, id_col, min_docs)
    # the canonical pick rides the same hash-partitioned window the
    # min_docs=2 flag used (same key -> no extra exchange or sort)
    w_h = Window.partitionBy("wh")
    flagged = occ.withColumn(
        "_c", F.min(F.struct(F.col(id_col), F.col("pos"))).over(w_h)
    ).select(
        id_col,
        "pos",
        (
            (F.col(id_col) == F.col(f"_c.{id_col}"))
            & (F.col("pos") == F.col("_c.pos"))
        ).alias("keep"),
    )
    return rewrite_docs_from_spans(docs, flagged, text_col, id_col, window)


def rewrite_docs_from_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = EXACTSUBSTR_WINDOW,
) -> DataFrame:
    """The rewrite HALF of the ExactSubstr protocol, decoupled from
    detection (VERDICT r14 #2): apply a precomputed duplicated-span
    record ``(id_col, pos, keep)`` — ``keep`` marking the canonical
    occurrence whose copy survives — to ``docs``, excising the
    ``window``-token spans anchored at each non-kept ``pos`` with
    canonical coverage overriding removal, exactly as
    ``remove_duplicated_spans`` (which now delegates here) does
    inline.  The record's producer decides the corpus the canonical
    pick was computed over: inline detection uses the prep corpus;
    the daily span-index step persists positions computed against ALL
    stored days (``span_index.incremental_span_positions``), so a
    prep run can rewrite at O(flagged-docs) with no corpus-wide
    detection.

    Docs with no record rows pass through unchanged (removed = 0);
    ``window`` must be the record producer's window — positions are
    anchors, not extents.  Returns ``docs`` with ``text_col``
    rewritten plus ``n_removed_tokens``.

    Scale: one groupBy of the record on ``id_col`` (the record is
    bounded by flagged docs' window counts, not the corpus), one left
    join onto ``docs``, one Arrow kernel pass — per-doc state only."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("pos", "keep")).alias("_spans")
    )

    @F.pandas_udf("struct<text: string, n_removed_tokens: long>")
    def _rewrite(texts: pd.Series, spans_col: pd.Series) -> pd.DataFrame:
        out_text, out_removed = [], []
        for t, sp in zip(texts, spans_col):
            if sp is None or len(sp) == 0:
                out_text.append(t)
                out_removed.append(0)
                continue
            toks = t.split(" ")
            drop = [False] * len(toks)
            for s in sp:
                if not s["keep"]:
                    for i in range(s["pos"], s["pos"] + window):
                        drop[i] = True
            for s in sp:
                if s["keep"]:
                    for i in range(s["pos"], s["pos"] + window):
                        drop[i] = False
            out_text.append(
                " ".join(tok for tok, d in zip(toks, drop) if not d)
            )
            out_removed.append(sum(drop))
        return pd.DataFrame(
            {"text": out_text, "n_removed_tokens": out_removed}
        )

    rewritten = (
        docs.join(per_doc, id_col, "left")
        .withColumn("_rw", _rewrite(F.col(text_col), F.col("_spans")))
        .drop("_spans")
    )
    return rewritten.withColumns(
        {
            text_col: F.col("_rw.text"),
            "n_removed_tokens": F.col("_rw.n_removed_tokens"),
        }
    ).drop("_rw")
