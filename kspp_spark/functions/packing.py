"""Sequence packing — batch-assembly for training pipelines.

Greedy first-fit packing of documents into fixed-budget sequences
(budget in tokens/chars): within a bucket, docs are taken in id order
and appended to the current pack until the next doc would overflow the
budget, which starts a new pack. Oversized docs (> budget) get a pack
of their own.

Packing is inherently sequential, so the parallel unit is a BUCKET
(doc_id % n_buckets — deterministic, engine-neutral): each bucket packs
independently in one Arrow-batched applyInPandas task. At 100 TB you
raise n_buckets to the cluster's task budget; packing quality loss vs
a single global pass is negligible when buckets hold thousands of
docs. No driver-side state, no global sort.

Beyond-reference operator (north-star training-data pipeline); no kspp
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_sequences(
    df: DataFrame,
    size_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Returns (id_col, size, bucket, pack_id) — pack_id is globally
    unique (bucket * 1_000_000 + per-bucket pack ordinal)."""
    import pandas as pd

    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(size_col).cast("long").alias("_size"),
        (F.col(id_col) % n_buckets).alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        packs, acc, pack = [], 0, -1
        for size in pdf["_size"]:
            if pack < 0 or acc + size > budget:
                pack += 1
                acc = int(size)
            else:
                acc += int(size)
            packs.append(pack)
        pdf["pack_id"] = pdf["bucket"] * 1_000_000 + pd.Series(packs)
        return pdf

    out_schema = "_id long, _size long, bucket long, pack_id long"
    packed = src.groupBy("bucket").applyInPandas(pack, out_schema)
    return packed.select(
        F.col("_id").alias(id_col),
        F.col("_size").alias("size"),
        "bucket",
        "pack_id",
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Fill-rate per pack: (pack_id, n_docs, used, fill_pct) — the
    packing-efficiency feedback a data pipeline monitors."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("size").alias("used"),
        (F.sum("size") * F.lit(100.0) / F.lit(float(budget))).alias("fill_pct"),
    )
