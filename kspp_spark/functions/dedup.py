"""Deduplication for training-data pipelines — exact and near-dup.

Beyond-reference capability (BASELINE.json north star). Designed for
100 TB: every stage is a hash shuffle on bounded-width keys (digests,
band hashes), never on raw text; signatures are fixed-width; candidate
generation is band-bucket joins (LSH) so the cross-product never
materializes globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kspp_spark.functions.text import doc_fingerprint, tokenize


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized content: keep the lowest id per
    fingerprint. One hash aggregation over a 128-bit digest — the scan
    shuffles (digest, id) only, not document bodies."""
    return (
        df.select(doc_fingerprint(F.col(text)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
    )


def _shingles(text: Column, n: int) -> Column:
    """Word n-gram shingle set (distinct)."""
    toks = tokenize(text)
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams)


def minhash_signatures(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures: shingle -> k seeded xxhash64 values -> per-doc
    elementwise min. The k mins are k partial-aggregable `min()`s (one
    shuffle of (id, k×int64)); no Python executes per row.

    Output: (id_col, sig array<bigint>[num_hashes])
    """
    sh = df.select(
        F.col(id_col), F.explode(_shingles(F.col(text), shingle_n)).alias("shingle")
    )
    hashed = sh.select(
        id_col,
        *[
            F.xxhash64(F.col("shingle"), F.lit(i)).alias(f"_h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: equal band-slices bucket together; same-bucket pairs
    are near-dup candidates. The join key is (band_idx, band_hash) — a
    self-equi-join on a high-cardinality hash, which AQE handles well
    even with moderately skewed buckets.

    Output: distinct candidate pairs (a, b) with a < b.
    """
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bhash"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bhash")
    left = banded.withColumnRenamed("_id", "a")
    right = banded.withColumnRenamed("_id", "b")
    pairs = (
        left.join(right, on=["band", "bhash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.
    Joins shingle sets onto the (small) candidate set only — the
    expensive exact measure never runs on the full cross product.
    """
    sets_ = df.select(F.col(id_col), _shingles(F.col(text), shingle_n).alias("sh"))
    a = sets_.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    j = (
        candidates.join(a, "a")
        .join(b, "b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def simhash(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: per-token xxhash64; each bit position votes
    +1/-1; the sign vector packs into one BIGINT. Vectorized as `bits`
    conditional sums in a single hash aggregation.

    Near-dup detection = small hamming distance between signatures;
    pair generation can band the signature bytes like minhash.
    """
    toks = df.select(F.col(id_col), F.explode(tokenize(F.col(text))).alias("tok"))
    h = toks.select(id_col, F.xxhash64("tok").alias("h"))
    votes = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    sig = votes.select(
        id_col,
        sum(
            [
                F.when(F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(F.lit(0).cast("bigint"))
                for i in range(bits)
            ],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )
    return sig
