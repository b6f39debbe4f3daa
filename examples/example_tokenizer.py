"""Tokenizer lifecycle at corpus scale — train, persist, encode:

1. train a char-level BPE merge table on the corpus (Sennrich et al.
   2016; distributed pair counts, 1-row argmax per round);
2. persist it as the tokenizer artifact (train-bpe CLI writes the
   same thing);
3. load it back and ENCODE a corpus two ways — sequential JVM folds
   (bpe_encode) and the Arrow-batched vocabulary-scale path
   (bpe_encode_pandas) — asserting they agree token-for-token.
"""

import os
import tempfile

from pyspark.sql import functions as F

from kspp_spark.functions.text import (
    bpe_encode,
    bpe_encode_pandas,
    load_bpe_alphabet,
    load_bpe_merges,
    save_bpe_merges,
    bpe_train,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_tokenizer")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    merges, _ = bpe_train(docs.limit(100), n_merges=8, alphabet="words")
    print(f"learned {len(merges)} merges; top:", merges[:3])

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/merges"
        save_bpe_merges(spark, merges, path, alphabet="words")
        loaded = load_bpe_merges(spark, path)
        alphabet = load_bpe_alphabet(spark, path)
        assert alphabet == "words"
        assert [(a, b) for a, b, _ in loaded] == [(a, b) for a, b, _ in merges]

        sample = docs.limit(50)
        jvm = {
            r.doc_id: tuple(r.toks)
            for r in bpe_encode(sample, loaded, alphabet=alphabet).collect()
        }
        arrow = {
            r.doc_id: tuple(r.toks)
            for r in bpe_encode_pandas(sample, loaded, alphabet=alphabet).collect()
        }
        assert jvm == arrow
        n_before = sample.select(
            F.sum(F.size(F.split("text", r"\s+"))).alias("n")
        ).collect()[0].n
        n_after = sum(len(v) for v in jvm.values())
        print(f"encoded 50 docs: ~{n_before} -> {n_after} tokens "
              f"(both encode paths identical)")


if __name__ == "__main__":
    main()
