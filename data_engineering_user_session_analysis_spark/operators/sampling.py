"""Deterministic sampling, splitting, and mixture operators for
training-data pipelines.

Every operator here is a MAP-SIDE expression over a stable id — no
shuffle, no RNG state, no driver round-trip — so the same call over
the same rows yields the same sample on 1 executor or 1000, at any
partitioning, on any engine that agrees on md5 (the reproducibility
contract a 100 TB corpus build needs: re-running a failed day must
not resample the world).

The unit hash (``uniform_hash_unit``) maps ``md5(id || salt)``'s
first 8 hex chars to [0, 1): uniform, engine-portable (DuckDB/Python
reproduce it byte-for-byte — pinned against hashlib in
tests/test_sampling.py), and INDEPENDENT across salts, so a
train/val split salted "split" and a downsample salted "mix" don't
correlate (the classic same-hash trap: filtering hash < 0.5 twice
keeps 50%, not 25%).

Mixture building (``mixture_rates`` + ``apply_mixture``): given
per-domain token counts and target proportions, solve for the
largest total corpus that honors the proportions without exceeding
any domain's budget (rates ≤ max_repeat), then realize it with
deterministic down-/up-sampling — upsampling emits whole copies plus
a hash-selected fractional copy, each copy re-salted so repeated
epochs stay decorrelated.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_DENOM = float(1 << 32)


def uniform_hash_unit(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a stable id: the first 8 hex
    chars of ``md5(id || ':' || salt)`` as a 32-bit integer, scaled.
    Engine-portable (same value in DuckDB / Python hashlib) and
    independent across salts."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hex8 = F.substring(F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, 8)
    return F.conv(hex8, 16, 10).cast("double") / F.lit(_HASH_DENOM)


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id hash — the
    reproducible twin of ``df.sample`` (which is seed-and-partitioning
    dependent).  Map-side filter: pushes into the scan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(uniform_hash_unit(id_col, salt) < F.lit(fraction))


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name (train/val/test/...) by
    cumulative hash thresholds: splits are DISJOINT, cover every row,
    and membership is a pure function of (id, salt) — a row keeps its
    split across reruns, engine versions, and repartitioning, and a
    NEW row cannot move an old row's split (the property random
    splits lack).  Weights are normalized; order follows the dict."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and non-empty: {weights}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError(f"weights sum to {total}")
    u = uniform_hash_unit(id_col, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample_by_rates(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep ``rates[stratum]``
    of each stratum's rows (``default_rate`` for unlisted strata).
    The rate table is a literal CASE expression — bounded config-sized
    dicts (domains, languages, sources), never a join."""
    if any(not 0.0 <= r <= 1.0 for r in rates.values()):
        raise ValueError(f"rates must be in [0, 1]: {rates}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    rate = None
    for k, r in rates.items():
        cond = F.col(strata_col) == F.lit(k)
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(uniform_hash_unit(id_col, salt) < rate)


def upsample_by_rate(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "epoch",
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic repetition for rates above 1: every row emits
    ``floor(rate)`` whole copies plus one hash-selected fractional
    copy (so expected multiplicity is exactly ``rate``), each tagged
    with a ``copy`` index.  The fractional choice is salted with the
    copy index, so which rows carry the extra epoch is decorrelated
    from every other sampling decision.  Map-side explode — output
    size rate·N, no shuffle."""
    if rate < 0:
        raise ValueError(f"rate must be non-negative, got {rate}")
    whole = int(math.floor(rate))
    frac = rate - whole
    out = df.withColumn(
        copy_col, F.explode(F.sequence(F.lit(0), F.lit(max(whole, 1) - 1)))
    )
    if whole == 0:
        out = out.filter(
            uniform_hash_unit(id_col, f"{salt}:0") < F.lit(frac)
        )
    elif frac > 0:
        extra = df.withColumn(copy_col, F.lit(whole)).filter(
            uniform_hash_unit(id_col, f"{salt}:{whole}") < F.lit(frac)
        )
        out = out.unionByName(extra)
    return out


def mixture_rates(
    available: dict[str, float],
    target_shares: dict[str, float],
    max_repeat: float = 1.0,
) -> dict:
    """Solve a data mixture: given per-domain AVAILABLE mass (tokens
    or docs) and target proportions, find the largest total T with
    ``T · share_d ≤ available_d · max_repeat`` for every domain —
    i.e. the binding domain caps the corpus — and return per-domain
    sampling rates (``> 1`` means repetition, realized by
    ``upsample_by_rate``).  Driver-side arithmetic over a
    config-sized dict; the heavy lifting stays in the sampling
    expressions.  Returns ``{"total", "rates", "binding_domain"}``."""
    if max_repeat <= 0:
        raise ValueError(f"max_repeat must be positive, got {max_repeat}")
    missing = set(target_shares) - set(available)
    if missing:
        raise ValueError(f"target domains not in available: {sorted(missing)}")
    share_sum = sum(target_shares.values())
    if share_sum <= 0 or any(s < 0 for s in target_shares.values()):
        raise ValueError(f"target_shares must be non-negative with positive sum: {target_shares}")
    shares = {d: s / share_sum for d, s in target_shares.items()}
    binding, total = None, float("inf")
    for d, s in shares.items():
        if s == 0:
            continue
        cap = available[d] * max_repeat / s
        if cap < total:
            binding, total = d, cap
    rates = {
        d: (total * s / available[d] if available[d] > 0 else 0.0)
        for d, s in shares.items()
    }
    return {"total": total, "rates": rates, "binding_domain": binding}


def apply_mixture(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mixture",
    copy_col: str = "copy",
) -> DataFrame:
    """Realize ``mixture_rates`` output over a corpus: strata with
    rate ≤ 1 are hash-downsampled in ONE pass (a single CASE-rate
    filter), strata with rate > 1 are upsampled per stratum; rows in
    strata without a rate are dropped.  Every kept row carries a
    ``copy`` index (0 for downsampled rows).  Still map-side end to
    end."""
    down = {d: r for d, r in rates.items() if r <= 1.0}
    up = {d: r for d, r in rates.items() if r > 1.0}
    parts = []
    if down:
        parts.append(
            stratified_sample_by_rates(
                df, down, strata_col, id_col, default_rate=0.0, salt=salt
            ).withColumn(copy_col, F.lit(0))
        )
    for d, r in sorted(up.items()):
        parts.append(
            upsample_by_rate(
                df.filter(F.col(strata_col) == F.lit(d)),
                r,
                id_col,
                salt=f"{salt}:{d}",
                copy_col=copy_col,
            )
        )
    if not parts:
        raise ValueError("rates selected no strata")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
