"""Deterministic corpus sampling for training-data pipelines.

Mixture construction (downsample boilerplate-heavy strata, upweight rare
languages, carve out held-out splits) needs sampling that is (a) exactly
reproducible across runs AND engines, (b) stable under repartitioning, and
(c) pushdown-friendly.  Spark's ``DataFrame.sample`` is none of these (seed
semantics are partition-dependent), so these operators use the standard
HASH-based scheme instead: a row is kept iff the leading 32 bits of
``md5(seed | key)`` fall below ``fraction * 2^32``.  The md5 keyspace makes
the decision a pure function of (seed, key) — the same rows are selected on
any cluster size, any engine (the DuckDB oracle compares the hex prefix as a
string; fixed-width hex compares identically to the number), and any run.
The same trick backs the ANN hyperplane oracle (similarity.py) and the
minhash banding (dedup.py).

A per-row Column expression — zero shuffle, and the predicate sits directly
on the scan, so at 100 TB a 1% sample reads the full input once but
materializes 1% (with column pruning it is the cheapest possible pass).
Splits with different seeds are independent; the SAME seed with nested
fractions gives nested samples (a 1% sample is a subset of the 10% sample —
useful for scaling-law ladders).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32  # leading 8 hex digits of md5


def _threshold_hex(fraction: float) -> str:
    """fraction in [0,1] → zero-padded 8-digit hex threshold (row kept iff
    its hash prefix is lexicographically below this).  fraction=1.0 returns
    'g', which sorts above every hex digit → keep all."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _HASH_SPACE), "08x")


def _keep_expr(key: Column, fraction: float, seed: str) -> Column:
    return (
        F.substring(F.md5(F.concat(F.lit(seed), F.lit("|"), key.cast("string"))), 1, 8)
        < F.lit(_threshold_hex(fraction))
    )


def deterministic_sample(
    docs: DataFrame, id_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by ``md5(seed|id)`` —
    bit-reproducible on any engine/cluster/run, nested across fractions."""
    return docs.filter(_keep_expr(F.col(id_col), fraction, seed))


def deterministic_sample_sql(
    table: str, id_col: str, fraction: float, seed: str = "sample"
) -> str:
    """DuckDB twin of :func:`deterministic_sample` (SELECT * of kept rows)."""
    return f"""
SELECT * FROM {table}
WHERE substring(md5('{seed}' || '|' || CAST({id_col} AS VARCHAR)), 1, 8)
      < '{_threshold_hex(fraction)}'
"""


def stratified_sample(
    docs: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep fractions (language/quality mixture construction):
    ``fractions[stratum]`` of each stratum survives, strata not listed keep
    ``default_fraction``.  Same hash decision as
    :func:`deterministic_sample`, so the same (seed, id) stays selected when
    a stratum's fraction only grows."""
    hashv = F.substring(
        F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))), 1, 8
    )
    thr = F.lit(_threshold_hex(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col).cast("string") == stratum, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return docs.filter(hashv < thr)


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN CAST({strata_col} AS VARCHAR) = '{s}' THEN '{_threshold_hex(f)}'"
        for s, f in sorted(fractions.items())
    )
    return f"""
SELECT * FROM {table}
WHERE substring(md5('{seed}' || '|' || CAST({id_col} AS VARCHAR)), 1, 8)
      < CASE {cases} ELSE '{_threshold_hex(default_fraction)}' END
"""


def hash_split(
    docs: DataFrame, id_col: str, splits: dict[str, float], seed: str = "split"
) -> DataFrame:
    """Assign every row to exactly ONE named split (train/val/test carving —
    the held-out-set step of any training-data pipeline): appends a
    ``split`` column.

    ``splits`` maps name → fraction in INSERTION order; fractions must sum
    to 1 (±1e-9).  The row's md5 prefix is compared against the CUMULATIVE
    thresholds, so membership is a pure function of (seed, id): stable
    across runs, engines, cluster sizes, and — because the hash space is
    shared with :func:`deterministic_sample` — a row's split never changes
    when OTHER splits are re-proportioned around it (train can grow by
    eating val without touching test).  Per-row CASE expression: zero
    shuffle, survives scan pushdown when filtered to one split.
    """
    fracs = list(splits.values())
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >=0 and sum to 1, got {splits}")
    hashv = F.substring(
        F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))), 1, 8
    )
    names = list(splits.keys())
    expr = F.lit(names[-1])  # last split takes the remainder (rounding-safe)
    cum = 0.0
    rules = []
    for name, frac in zip(names[:-1], fracs[:-1]):
        cum += frac
        rules.append((name, _threshold_hex(cum)))
    for name, thr in reversed(rules):
        expr = F.when(hashv < F.lit(thr), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def hash_split_sql(
    table: str, id_col: str, splits: dict[str, float], seed: str = "split"
) -> str:
    """DuckDB twin of :func:`hash_split`."""
    fracs = list(splits.values())
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >=0 and sum to 1, got {splits}")
    names = list(splits.keys())
    cum = 0.0
    whens = []
    for name, frac in zip(names[:-1], fracs[:-1]):
        cum += frac
        whens.append(f"WHEN h < '{_threshold_hex(cum)}' THEN '{name}'")
    return f"""
SELECT * EXCLUDE (h), CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split
FROM (
  SELECT *, substring(md5('{seed}' || '|' || CAST({id_col} AS VARCHAR)), 1, 8) AS h
  FROM {table}
)
"""
