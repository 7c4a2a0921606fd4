"""PII scrubbing and repetition signals for corpus pipelines.

Two pre-training hygiene steps the reference's domain (raw event and
document ingest) needs at corpus scale:

* ``scrub_pii`` — redact email addresses, phone numbers, IPv4
  addresses, and long digit runs (card/account numbers) with typed
  placeholder tokens.  Pure ``regexp_replace`` chains — string work
  stays inside whole-stage codegen, no Python in the hot path, and
  the patterns are deliberately engine-portable (no lookbehind) so
  a DuckDB/other-engine oracle can replay them.
* ``repetition_signals`` — the Gopher-family intra-document
  repetition ratios (duplicate-line fraction and the fraction of
  CHARACTERS inside duplicated lines) used to drop boilerplate and
  template spam.  One map-side projection: lines are split,
  counted, and measured per row with array built-ins — no explode,
  no shuffle, no UDF.

Both are map-only: at 100 TB they pipeline inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) applied in order.  Order matters: emails
#: first (their digits must not be half-eaten by the digit rules),
#: IPv4 before digit runs (dots would split a run), bare long digit
#: runs (account/card numbers) before phones (the phone pattern
#: would otherwise swallow them), separator-formatted phones last.
#: No lookbehind/lookahead — portable syntax only.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{8,}\b", "<NUMBER>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace PII spans in ``text_col`` with placeholder tokens
    (``<EMAIL>``, ``<IP>``, ``<PHONE>``, ``<NUMBER>``), in rule
    order.  Writes ``out_col`` (default: in place)."""
    col: Column = F.col(text_col)
    for pattern, repl in PII_RULES:
        col = F.regexp_replace(col, pattern, repl)
    return df.withColumn(out_col or text_col, col)


def repetition_signals(
    df: DataFrame, text_col: str = "text", line_sep: str = "\n"
) -> DataFrame:
    """Add ``n_lines``, ``dup_line_frac`` (fraction of line
    OCCURRENCES that are repeats of an earlier-seen line), and
    ``dup_line_char_frac`` (fraction of characters living in lines
    that occur more than once) — the Gopher repetition-filter pair.

    Computed entirely with array expressions over the split lines,
    O(L log L) per document: the duplicated-char mass is total chars
    minus the chars of single-occurrence lines, and a line occurs
    once iff, in the SORTED line array, it differs from both
    neighbors — one sort + linear zip passes, instead of the naive
    count-each-distinct-line-against-all-lines O(L_distinct · L)
    which melts on pathological many-line documents.  The adjacency
    is built with ``zip_with`` over the sorted array and its shifted
    slice — NOT ``aggregate(sequence(0,n-1), i -> get(s, i±1)...)``:
    Catalyst interprets higher-order functions, and an outer-array
    ``get`` inside the lambda re-evaluates the sort (and the split
    feeding it) per ELEMENT, turning the linear pass quadratic.
    ``zip_with`` binds both arrays once.
    """
    lines = F.split(F.col(text_col), F.lit(line_sep))
    n = F.size(lines)
    n_uniq = F.size(F.array_distinct(lines))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    s = F.sort_array(lines)
    # next_differs[i] = s[i] != s[i+1]; zip_with null-pads the shorter
    # (shifted) side, and NULL != x is NULL — coalesce(…, True) makes
    # the last element count as "differs"
    shifted = F.slice(s, 2, F.greatest(n - 1, F.lit(0)))
    next_differs = F.zip_with(
        s, shifted, lambda a, b: F.coalesce(a != b, F.lit(True))
    )
    # prev_differs[i] = next_differs[i-1]; the first element's left
    # neighbor is the array edge -> True
    prev_differs = F.concat(
        F.array(F.lit(True)),
        F.slice(next_differs, 1, F.greatest(n - 1, F.lit(0))),
    )
    is_uniq = F.zip_with(next_differs, prev_differs, lambda a, b: a & b)
    uniq_chars = F.aggregate(
        F.zip_with(
            s,
            is_uniq,
            lambda x, u: F.when(u, F.length(x)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda a, c: a + c,
    )
    return df.withColumns(
        {
            "n_lines": n.cast("long"),
            "dup_line_frac": (
                (n - n_uniq) / F.greatest(n, F.lit(1))
            ).cast("double"),
            "dup_line_char_frac": (
                (total_chars - uniq_chars)
                / F.greatest(total_chars, F.lit(1))
            ).cast("double"),
        }
    )
