"""Deterministic, engine-portable sampling for training-data curation.

Two selection primitives a 100 TB pipeline needs between filtering and
training-set assembly, both PURE FUNCTIONS of (seed, doc_id) — no RNG
state, no partition-order dependence — so a resumed, re-partitioned,
or re-run job selects byte-identical subsets, and an ANSI-SQL oracle
can replay the decision exactly:

- ``hash_bernoulli_sample``: keep a document iff the lowercase-hex
  ``md5(seed || ':' || doc_id)`` is lexicographically below a
  threshold prefix derived from the rate. Fixed-width lowercase hex
  compares identically to its numeric value, so string comparison IS
  the uniform threshold test — portable to any engine with md5.
- ``stratified_sample``: per-stratum top-``n`` quota in md5 order
  (language/source balancing). One shuffle on the stratum key and one
  window sort; ties broken by doc_id for total determinism.

Scale notes: Bernoulli is embarrassingly parallel (scan + filter,
no shuffle — predicate evaluated at the scan). The stratified quota is
a window top-n per stratum: skewed strata sort more rows, but rank<=n
short-circuits via the WindowGroupLimit optimization in Spark 3.5+/4.x
(per-partition partial top-n before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sample_key(seed: str, id_col: str = "doc_id"):
    """The portable sampling key: md5('<seed>:<id>') lowercase hex."""
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def rate_threshold(rate: float, digits: int = 8) -> str:
    """Hex-prefix threshold such that P[md5 < threshold] ~= rate with
    16^-digits granularity (exactly floor(rate * 16^digits) buckets)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    buckets = int(rate * (16**digits))
    if buckets >= 16**digits:
        return "g"  # sorts after every hex digit: rate=1.0 keeps all
    if rate > 0.0 and buckets == 0:
        # refuse to silently floor a positive rate to an empty sample
        raise ValueError(
            f"rate {rate} is below the 16^-{digits} threshold granularity "
            f"(would select nothing); pass a larger `digits`"
        )
    return format(buckets, f"0{digits}x")


def hash_bernoulli_sample(
    df: DataFrame, rate: float, seed: str = "0", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic Bernoulli(rate) subset of ``df``: keep rows whose
    md5 sampling key sorts below the rate threshold. Re-runs, resumes
    and re-partitionings select the identical subset."""
    thr = rate_threshold(rate)
    return df.where(sample_key(seed, id_col) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    seed: str = "0",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, stratum_col, rk): up to ``n_per_stratum`` rows per
    stratum, chosen in md5-order (uniform within stratum), rank
    included so the selection order is auditable."""
    w = Window.partitionBy(stratum_col).orderBy(
        sample_key(seed, id_col), F.col(id_col)
    )
    return (
        df.select(id_col, stratum_col)
        # long, matching ANSI row_number() (BIGINT) for oracle parity
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= n_per_stratum)
    )
