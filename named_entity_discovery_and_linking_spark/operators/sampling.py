"""Deterministic hash-based sampling for training-data curation.

Down-sampling is the last step of every curation pipeline (keep 100% of
high-quality documents, 10% of mid-tier, drop the rest), and at 100 TB it
must NOT use ``rand()``: a random sample is not reproducible across reruns,
changes under AQE re-planning / task retries (each retry re-draws), and
cannot be resumed consistently from a checkpoint.  Hashing a stable key
fixes all three — the decision for a row is a pure function of (seed, key),
independent of partitioning, task placement, and execution order, so a
resumed or re-sharded job keeps exactly the same rows.

The hash is the engine-portable md5-derived family from
``functions/hashing.py`` (whole-stage-codegen Column expressions, oracle-
reproducible in DuckDB), bucketed mod 1e6 for ppm-resolution rates.  Both
operators are map-only filters: one scan, no shuffle, predicate stays next
to the Parquet/Iceberg reader.

Beyond-reference operators (training-data-pipeline section of the task
brief): the reference (ner.py / linking.py) never samples its corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import seeded_hash

RESOLUTION = 1_000_000  # sampling-rate resolution: parts-per-million


def _bucket(key_col: str, seed: int) -> Column:
    return seeded_hash(F.col(key_col).cast("string"), seed) % RESOLUTION


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(round(rate * RESOLUTION))


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                seed: int = 11) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``: a row is
    kept iff h(seed, key) mod 1e6 < rate*1e6.  Same key + seed => same
    decision on every engine, rerun, and partitioning."""
    return df.filter(_bucket(key_col, seed) < F.lit(_threshold(rate)))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", key_col: str = "doc_id",
                      seed: int = 11, default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: each value of ``strata_col`` gets
    its own keep rate (unlisted strata get ``default_rate``).  The standard
    corpus-mixing move — e.g. keep head languages at low rates and tail
    languages at 100% to rebalance, or keep quality tiers at graded rates.

    Single map-only filter: the per-stratum threshold is a chained-when
    Column (broadcast-free — the rate table is a literal expression, not a
    join), compared against the same hash bucket as :func:`hash_sample`.
    """
    thr: Column | None = None
    for value, rate in sorted(rates.items()):
        t = F.lit(_threshold(rate))
        cond = F.col(strata_col) == value
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default = F.lit(_threshold(default_rate))
    thr = default if thr is None else thr.otherwise(default)
    return df.filter(_bucket(key_col, seed) < thr)


def budget_sample(df: DataFrame, budgets: dict[str, int],
                  token_col: str, strata_col: str = "lang",
                  key_col: str = "doc_id", seed: int = 11,
                  default_budget: int = 0) -> DataFrame:
    """Corpus mixing to per-stratum TOKEN budgets: keep a deterministic
    subset of each stratum whose token mass approximates ``budgets[stratum]``
    (e.g. "2e11 tokens of en, 5e10 of de, drop the rest").

    Two-phase, scale-first shape:
      1. one tiny aggregation computes each stratum's total token count
         (map-side combinable; |strata| rows, collected to the driver — a
         bounded control-plane set like the lineage bucket ids);
      2. the keep rate ``budget / total`` (clamped to [0, 1]) is applied
         as the SAME map-only hash-threshold filter as
         :func:`stratified_sample`.
    The alternative — an exact per-stratum running-total cutoff — needs a
    per-stratum ordered window over data-scale rows: a giant sort per
    stratum with head-language skew, exactly the shape BENCH.md's window
    lessons forbid.  The hash-rate form is exact in expectation, within
    ±max(token_col) of the budget in practice at corpus scale, and keeps
    the decision a pure function of (seed, key): resumable, re-shardable,
    and engine-portable like every other sampler here.

    Returns the kept rows.  Deterministic: same (seed, budgets, input) =>
    same subset, regardless of partitioning.
    """
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("t")).collect()
    }
    # a NULL stratum (common for lang in web corpora) must not reach the
    # rate table: sorted(rates.items()) would raise on None vs str, and a
    # `col == None` arm could never match a NULL row anyway — NULL-stratum
    # rows fall through to stratified_sample's default_rate (0.0: no
    # budget key can name them), the advisor r6 #3 fix
    rates = {
        s: min(1.0, budgets.get(s, default_budget) / t) if t else 0.0
        for s, t in totals.items() if s is not None
    }
    return stratified_sample(df, rates, strata_col=strata_col,
                             key_col=key_col, seed=seed, default_rate=0.0)
