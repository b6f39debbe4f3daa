"""End-to-end training-data assembly (beyond-reference): quality gate
-> LM fluency gate -> near-dup removal -> chunking -> packing -> split
-> deterministic global shuffle -> token-balanced shards.
Each stage is one of the library's oracle-backed operators; everything
stays one lazy Catalyst plan until the terminal counts."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.dedup import (
    connected_components,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from kspp_spark.functions.packing import pack_sequences
from kspp_spark.functions.sampling import shard_assign, shuffle_order, split_assign
from kspp_spark.functions.text import (
    bigram_lm_scores,
    chunk_tokens,
    hashed_bow_score,
    linear_classifier_weights,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_training_mix")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. linear quality classifier (hashed BoW, exact integer weights)
    scored = hashed_bow_score(docs, linear_classifier_weights(256))
    kept = docs.join(scored.filter(F.col("keep")).select("doc_id"), "doc_id")
    # 2. corpus-LM fluency gate: drop the least fluent decile
    lm = bigram_lm_scores(kept)
    cut = lm.approxQuantile("score", [0.1], 0.01)[0]
    fluent = kept.join(lm.filter(F.col("score") >= cut).select("doc_id"), "doc_id")
    # 3. near-dup removal: minhash bands -> jaccard verify -> clusters
    #    -> keep one canonical doc per cluster
    sigs = minhash_signatures(fluent, num_hashes=32, shingle_n=3)
    cands = minhash_candidates(sigs, bands=8, rows_per_band=4)
    pairs = ngram_jaccard_pairs(fluent, cands, threshold=0.8)
    clusters = connected_components(pairs)
    victims = clusters.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    unique = fluent.join(victims, "doc_id", "left_anti")
    # 4. token-window chunking -> 5. greedy packing -> 6. splits
    chunks = chunk_tokens(unique, chunk_len=64, step=48)
    packed = pack_sequences(
        chunks.select(
            (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("doc_id"),
            "n_tokens",
        ),
        size_col="n_tokens",
        budget=256,
    )
    final = split_assign(
        packed.select(F.col("pack_id").cast("string").alias("pid")).distinct(),
        id_col="pid",
    )
    # 7. deterministic training ORDER (re-salt for a new epoch's
    #    permutation) + 8. token-balanced output shards
    train_packs = final.filter("split = 'train'")
    ordered = shuffle_order(train_packs, id_col="pid", salt="epoch0")
    weights = packed.groupBy(F.col("pack_id").cast("string").alias("pid")).agg(
        F.sum("size").cast("int").alias("pack_tokens")
    )
    shards = shard_assign(
        weights.join(train_packs.select("pid"), "pid"),
        id_col="pid", n_shards=4, balance_col="pack_tokens",
    )

    print(f"documents in          : {n0}")
    print(f"after quality gate    : {kept.count()}")
    print(f"after fluency gate    : {fluent.count()}")
    print(f"after near-dup removal: {unique.count()}")
    print(f"training chunks       : {chunks.count()}")
    by_split = {
        r.split: r.n
        for r in final.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"packs per split       : {by_split}")
    n_train = ordered.count()
    ranks = sorted(r.shuffle_rank for r in ordered.collect())
    assert ranks == list(range(1, n_train + 1)), "shuffle rank not a permutation"
    shard_tokens = {
        r.shard: r.s
        for r in shards.groupBy("shard").agg(F.sum("pack_tokens").alias("s")).collect()
    }
    print(f"train order           : {n_train} packs, rank 1..{n_train}")
    print(f"shard token sums      : {dict(sorted(shard_tokens.items()))}")
    spark.stop()


if __name__ == "__main__":
    main()
