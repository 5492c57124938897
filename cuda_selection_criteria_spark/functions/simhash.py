"""SimHash near-duplicate detection (Charikar 2002 / Manku et al. 2007).

A second dedup family alongside SuperMinHash: 64-bit sign-fingerprint
of the token multiset, candidates via Hamming-ball banding (split the
fingerprint into 4 x 16-bit blocks; Hamming distance <= 3 implies at
least one block equal — pigeonhole), exact Hamming re-check after the
block equi-join. Same explode + equi-join shape as the SMH band join.

All hashing is JVM-side (xxhash64); the bit-vote aggregation is a
vectorized pandas pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spread import spread

N_BLOCKS = 4  # Hamming radius 3 via pigeonhole


def simhash_docs(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): 64-bit sign fingerprint of whitespace tokens.

    Entirely JVM-side: split + explode + xxhash64, then ONE wide
    hash-aggregate of 64 bit-vote sums (map-side partial aggregation
    applies, so the shuffle carries 64 longs per doc), then the sign
    bits reassemble into the fingerprint as column math. No Python in
    the plan at all — whole-stage codegen end to end.
    """
    # spread: the tokenize explode is the heavy map stage (spread.py)
    toks = spread(documents).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col("text"), " +")).alias("tok"),
    ).select("doc_id", F.xxhash64(F.col("tok")).alias("th"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim.bitwiseOR(term)
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within the Hamming ball."""
    sh = simhash_docs(documents, id_col)
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias(f"b{b}")
            for b in range(N_BLOCKS)
        ]
    )
    exploded = sh.select("doc_id", "simhash", F.posexplode(blocks).alias("block_id", "block"))
    a = exploded.select(
        "block_id", "block", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")
    )
    b = exploded.select(
        "block_id", "block", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")
    )
    return (
        a.join(b, ["block_id", "block"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
