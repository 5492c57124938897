"""Candidate generation: LSH band explode + self-equi-join + CB prune.

Replaces the reference's O(N^2) pair enumeration
(/root/reference/src/selection.cpp:270-291, selection_cuda.cpp:146-150)
with the Spark-native equivalent: a pair survives iff

  - both cardinalities > 0 (selection.cpp:281 skip),
  - CB: min(card)/max(card) >= tau (criteria_sketch.hpp:45-49 — the
    sorted+break loop is just an early-exit evaluation of this same
    symmetric predicate, so no global sort is needed),
  - smh_a: SOME band of r consecutive signature values is equal
    (criteria_sketch.hpp:66-81) == equi-join on the raw band slice.

Joining on the raw band slice (array<long>) makes hash collisions
impossible by construction — band equality IS the join condition.
An xxhash64 of the slice is used only as an optional narrow pre-key.

Scale notes (north_rule):
- band rows are (band_id, band slice, url_id, card_i) — no urls, no
  16KiB register blobs through this shuffle;
- AQE skew-join splitting handles hot band keys (template pages);
  ``max_band_bucket`` optionally caps pathological buckets (off by
  default: parity keeps every colliding pair);
- the CB filter runs pre-dedup, cutting the dropDuplicates shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle import DedupConfig


def cb_bucket_pairs(
    sketches: DataFrame,
    cfg: DedupConfig,
    salt_target: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs for the non-LSH criteria (hll_a / hll_an / cb):
    the Spark-native form of the reference's sorted + prefix-break scan
    (SURVEY.md §2 O1/O2).

    CB(tau, cA, cB) = cA/cB >= tau (cA <= cB) implies
    |floor(log_(1/tau) cA) - floor(log_(1/tau) cB)| <= 1, so an
    equi-join on log-cardinality buckets (right side exploded to
    {b-1, b, b+1}) touches every CB-surviving pair exactly, without a
    global sort or O(N^2) enumeration. The right side must cover BOTH
    adjacent buckets: the join is followed by an ``id_a < id_b`` filter,
    and a straddling pair whose lower-bucket doc has the larger url_id
    only survives in the (a=higher-bucket, b=lower-bucket) orientation.
    The exact CB predicate re-filters after the join; dropDuplicates
    collapses the same-bucket double match. When the criterion needs
    hll_aux blobs they are joined back AFTER the pair dedup (late
    payload attach — the narrow sides above explain why).

    Flood guard: at tau=0.9 one bucket spans only ~11% in cardinality,
    and web corpora concentrate document sizes — ~100 buckets cover
    10..10^6-shingle docs, so at 10^12 docs a single bucket holds
    ~10^10 rows and an unguarded self-join is quadratic within it.
    ``salt_target`` applies the same two-level salting as
    ``candidate_pairs``: a bucket whose side-load exceeds the target is
    split into s salt blocks per side, spreading the f^2 pair work over
    s^2 shuffle keys while emitting every pair exactly once (a's salt
    pins sa, b's pins sb). ``max_bucket`` drops oversized buckets
    entirely (last-resort cap; OFF for parity). Note the criterion
    itself stays inherently pairwise post-CB — that is the reference's
    hll_a/hll_an semantics (selection.cpp evaluates every CB-surviving
    pair); smh_a's banded LSH remains the 10^12-doc scale default, with
    salting making hll_a/hll_an *executable* at scale rather than
    straggler-bound.
    """
    import math

    inv_log = 1.0 / math.log(1.0 / cfg.tau)
    has_aux = "hll_aux" in sketches.columns
    base = (
        sketches.where(F.col("card_i") > 0)
        .select("url_id", "card_i", F.floor(F.log(F.col("card_i").cast("double")) * F.lit(inv_log)).alias("bkt"))
    )
    join_key = ["bkt"]
    if salt_target is not None or max_bucket is not None:
        # per-BUCKET doc counts first (the stats table is tiny by
        # construction — log-scale buckets: ~100s of rows for any
        # corpus — so every join against it broadcasts)
        na = base.groupBy("bkt").agg(F.count("*").alias("_na"))
    if max_bucket is not None:
        # cap = drop the DOCS of buckets whose OWN size exceeds the cap,
        # BEFORE sides are built — capping on the exploded join-key load
        # would also drop keys k-1/k+1 merely adjacent to a flooded
        # bucket k (non-flooded neighbor pairs silently lost)
        over = na.where(F.col("_na") > max_bucket).select("bkt")
        base = base.join(F.broadcast(over), "bkt", "left_anti")
        na = na.where(F.col("_na") <= max_bucket)
    # NARROW sides: the hll_aux register blobs (256 B each) do NOT ride
    # the bucket join, the salt explode, or the dropDuplicates exchange
    # — pairs dedup on (id, card) only and the aux payload joins back
    # AFTER the dedup, the same late-payload shape verify_pairs uses.
    # At 10^10 CB-surviving pairs that is TBs of avoidable shuffle
    # payload (guide §2.3 / §8: shuffle keys and metadata, attach heavy
    # bytes once).
    a = base.select(
        F.col("bkt"),
        F.col("url_id").alias("id_a"),
        F.col("card_i").alias("card_a"),
    )
    b = base.select(
        F.explode(F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)).alias("bkt"),
        F.col("url_id").alias("id_b"),
        F.col("card_i").alias("card_b"),
    )
    if salt_target is not None:
        # per-join-key load AFTER the cap: a-side sees n_k rows at key
        # k, b-side sees n_{k-1}+n_k+n_{k+1} (the +-1 explode)
        nb = (
            na.select(
                F.explode(
                    F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
                ).alias("bkt"),
                "_na",
            )
            .groupBy("bkt")
            .agg(F.sum("_na").alias("_nb"))
        )
        stats = na.join(nb, "bkt").select(
            "bkt", F.greatest("_na", "_nb").alias("_load")
        )
        hot = stats.where(F.col("_load") > salt_target)
        s_col = F.ceil(
            F.coalesce(F.col("_load"), F.lit(1)) / F.lit(salt_target)
        ).cast("int")
        all_salts = F.explode(F.sequence(F.lit(0), s_col - 1))
        a_cols = [c for c in a.columns if c != "bkt"]
        b_cols = [c for c in b.columns if c != "bkt"]
        a = a.join(F.broadcast(hot), "bkt", "left").select(
            "bkt",
            F.pmod(F.xxhash64("id_a"), s_col).cast("int").alias("sa"),
            all_salts.alias("sb"),
            *a_cols,
        )
        b = b.join(F.broadcast(hot), "bkt", "left").select(
            "bkt",
            all_salts.alias("sa"),
            F.pmod(F.xxhash64("id_b"), s_col).cast("int").alias("sb"),
            *b_cols,
        )
        join_key = ["bkt", "sa", "sb"]
    tau = cfg.tau
    pairs = (
        a.join(b, join_key)
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.least("card_a", "card_b").cast("double")
            / F.greatest("card_a", "card_b").cast("double")
            >= F.lit(tau)
        )
        .drop(*join_key)
        .dropDuplicates(["id_a", "id_b"])
    )
    if has_aux:
        payload = sketches.select("url_id", "hll_aux")
        pairs = pairs.join(
            payload.select(
                F.col("url_id").alias("id_a"), F.col("hll_aux").alias("aux_a")
            ),
            "id_a",
        ).join(
            payload.select(
                F.col("url_id").alias("id_b"), F.col("hll_aux").alias("aux_b")
            ),
            "id_b",
        )
    return pairs


def aux_criterion_filter(pairs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """hll_a / hll_an pair predicate over joined aux register blobs
    (criteria_sketch.hpp:52-64), vectorized per Arrow batch."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..sketchlib.batch import register_histograms
    from ..sketchlib.criteria import sigma
    from ..sketchlib.hll import ertl_mle_batch

    p = cfg.aux_p
    m = 1 << p
    tau, z, order_n = cfg.tau, cfg.z_score, cfg.order_n
    crit = cfg.criterion
    schema = "id_a long, id_b long, card_a long, card_b long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sigma_p = sigma(p)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ra = np.frombuffer(b"".join(pdf["aux_a"]), dtype=np.uint8).reshape(n, m)
            rb = np.frombuffer(b"".join(pdf["aux_b"]), dtype=np.uint8).reshape(n, m)
            hist = register_histograms(np.maximum(ra, rb))
            t_hat = ertl_mle_batch(hist, p)
            ca = np.minimum(pdf["card_a"].values, pdf["card_b"].values).astype(np.float64)
            cb = np.maximum(pdf["card_a"].values, pdf["card_b"].values).astype(np.float64)
            gamma = ca / cb
            if crit == "hll_a":
                t = np.floor(t_hat)  # size_t truncation (criteria_sketch.hpp:61)
                t_mas = t / (1.0 + z * sigma_p)
                keep = ((1.0 + gamma) * cb - t_mas) / t_mas >= tau
            else:  # hll_an
                j_hat = (ca + cb - t_hat) / t_hat
                s = 0.0
                num = 1.0
                for _ in range(order_n):
                    num *= z * sigma_p
                    s += num
                minimo = np.minimum(1.0, (1.0 + z * sigma_p) * cb / t_hat)
                keep = (j_hat + minimo * (1.0 + gamma) * s) >= tau
            out = pdf.loc[keep, ["id_a", "id_b", "card_a", "card_b"]]
            if len(out):
                yield out

    return pairs.mapInPandas(fn, schema=schema)


def _star_pairs(
    sketches: DataFrame, cfg: DedupConfig, max_band_bucket: int | None
) -> DataFrame:
    """Star pairing: every bucket member pairs with the bucket's
    minimum url_id; CB still filters each pair.

    The per-bucket minimum (and size, when capping) is a groupBy
    aggregate joined back on the band key — partial (map-side)
    aggregation computes the min in parallel, and the equi-join is
    AQE-skew-splittable. A Window.partitionBy(band) formulation would
    funnel every row of a hot bucket into ONE task (windows can't be
    skew-split) — the exact flood case star mode exists for.
    """
    bands = explode_bands(sketches, cfg)
    stats = bands.groupBy("band_id", "band").agg(
        F.min(F.struct("url_id", "card_i")).alias("_min"),
        F.count("*").alias("_n"),
    )
    if max_band_bucket is not None:
        stats = stats.where(F.col("_n") <= max_band_bucket)
    # inner join: rows in dropped (oversized) buckets simply don't match
    annotated = bands.join(stats, ["band_id", "band"])
    tau = cfg.tau
    return (
        annotated.where(F.col("url_id") != F.col("_min.url_id"))
        .select(
            F.least("url_id", F.col("_min.url_id")).alias("id_a"),
            F.greatest("url_id", F.col("_min.url_id")).alias("id_b"),
            F.when(F.col("url_id") < F.col("_min.url_id"), F.col("card_i"))
            .otherwise(F.col("_min.card_i"))
            .alias("card_a"),
            F.when(F.col("url_id") < F.col("_min.url_id"), F.col("_min.card_i"))
            .otherwise(F.col("card_i"))
            .alias("card_b"),
        )
        .where(
            F.least("card_a", "card_b").cast("double")
            / F.greatest("card_a", "card_b").cast("double")
            >= F.lit(tau)
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def explode_bands(sketches: DataFrame, cfg: DedupConfig) -> DataFrame:
    """sketches -> (url_id, card_i, band_id, band) rows, n_bands per doc."""
    n_bands, n_rows = cfg.bands
    slices = F.array(
        *[F.slice(F.col("smh"), b * n_rows + 1, n_rows) for b in range(n_bands)]
    )
    return (
        sketches.where(F.col("card_i") > 0)
        .select("url_id", "card_i", F.posexplode(slices).alias("band_id", "band"))
    )


def candidate_pairs(
    sketches: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    max_band_bucket: int | None = None,
    bucket_pairing: str = "all",
    salt_target: int | None = None,
) -> DataFrame:
    """-> (id_a, id_b, card_a, card_b) candidate pairs, id_a < id_b.

    ``bucket_pairing``:
      - "all" (default, reference parity): every pair within a band
        bucket — a bucket of f near-identical template pages emits
        f(f-1)/2 pairs, exactly like the reference would.
      - "star": each bucket member pairs only with the bucket minimum —
        O(f) pairs, same connected components (the clustering output is
        preserved whenever the bucket min verifies against members,
        which near-identical template cliques do). This is the
        10^12-doc mode: candidate volume becomes linear in corpus size
        instead of quadratic in clique size.

    ``max_band_bucket``: if set, band buckets larger than this are
    dropped entirely (last-resort flood guard; OFF for parity).

    ``salt_target``: explicit two-level salting for hot band keys in
    parity mode (the OpenMP-dynamic-schedule analogue the reference
    uses for skewed per-file cost, src/build_sketch.cpp:232; SURVEY §4).
    A bucket of f rows is split into s = ceil(f / salt_target) salt
    blocks; each side joins on (band, salt_a, salt_b), spreading the
    f^2 pair work over s^2 shuffle keys of ~salt_target^2 work each
    instead of one straggler key. Every pair still appears exactly once
    (a's salt pins salt_a, b's pins salt_b). Buckets at or under
    salt_target are untouched (s = 1). OFF by default: AQE skew-join
    splitting covers moderate skew; turn this on when one template
    clique exceeds what a single task should hold.
    """
    if bucket_pairing == "star":
        return _star_pairs(sketches, cfg, max_band_bucket)
    bands = explode_bands(sketches, cfg)
    sizes = None
    if max_band_bucket is not None or salt_target is not None:
        sizes = bands.groupBy("band_id", "band").agg(F.count("*").alias("_n"))
    if max_band_bucket is not None:
        bands = bands.join(
            F.broadcast(sizes.where(F.col("_n") > max_band_bucket)),
            ["band_id", "band"],
            "left_anti",
        )
    if salt_target is not None:
        hot = sizes.where(F.col("_n") > salt_target)
        if max_band_bucket is not None:
            hot = hot.where(F.col("_n") <= max_band_bucket)
        bands = bands.join(F.broadcast(hot), ["band_id", "band"], "left").withColumn(
            "_s",
            F.ceil(F.coalesce(F.col("_n"), F.lit(1)) / F.lit(salt_target)).cast("int"),
        )
        all_salts = F.explode(F.sequence(F.lit(0), F.col("_s") - 1))
        own_salt = F.pmod(F.xxhash64("url_id"), F.col("_s")).cast("int")
        a = bands.select(
            "band_id",
            "band",
            own_salt.alias("sa"),
            all_salts.alias("sb"),
            F.col("url_id").alias("id_a"),
            F.col("card_i").alias("card_a"),
        )
        b = bands.select(
            "band_id",
            "band",
            all_salts.alias("sa"),
            own_salt.alias("sb"),
            F.col("url_id").alias("id_b"),
            F.col("card_i").alias("card_b"),
        )
        join_key = ["band_id", "band", "sa", "sb"]
    else:
        a = bands.select(
            F.col("band_id"),
            F.col("band"),
            F.col("url_id").alias("id_a"),
            F.col("card_i").alias("card_a"),
        )
        b = bands.select(
            F.col("band_id"),
            F.col("band"),
            F.col("url_id").alias("id_b"),
            F.col("card_i").alias("card_b"),
        )
        join_key = ["band_id", "band"]
    tau = cfg.tau
    pairs = (
        a.join(b, on=join_key)
        .where(F.col("id_a") < F.col("id_b"))
        # CB prune before the dedup shuffle (cheap, symmetric form)
        .where(
            F.least("card_a", "card_b").cast("double")
            / F.greatest("card_a", "card_b").cast("double")
            >= F.lit(tau)
        )
        .select("id_a", "id_b", "card_a", "card_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs
