"""CLI equivalents of the reference's tools/ directory.

Parity targets (thin CLIs over operators this repo already has):
  csv2avro       tools/csv2avro/csv2avro.cpp — CSV file(s) -> Avro
                 container with a typed schema.
  kafka2avro     tools/kafka2avro/kafka2avro.cpp:144-151 — Kafka topic
                 -> event-time-rotated Avro files (file or s3 dst).
  kafka2table    tools/kafka2rocksdb/kafka2rocksdb.cpp:122-124 — Kafka
                 topic materialized as a latest-per-key table. The
                 reference's RocksDB store maps to Spark's state store
                 (+ a queryable parquet snapshot — at rest, parquet IS
                 the serving copy; Spark's own RocksDB provider holds
                 the streaming state, streaming/core.use_rocksdb_state).
  mqtt2kafka     tools/mqtt2kafka/mqtt2kafka.cpp — MQTT bridge into a
                 Kafka topic (sources/bridge.spool_source + kafka sink).
  docs2index     (beyond-reference) parquet corpus -> bucketed
                 positional index + doc-length table; the offline half
                 of the index-only retrieval queries.
  train-bpe      (beyond-reference) parquet corpus -> persisted BPE
                 merge table (the tokenizer artifact bpe_encode
                 consumes; chars or words alphabet).
  warc2docs      (beyond-reference) WARC crawl segments -> curation-
                 ready parquet documents (record parse, HTTP bodies,
                 canonical-URL latest-capture dedup, HTML -> text).
  register-schema  tools/kspp_protobuf_register_schema/
                 kspp_protobuf_register_schema.cpp — register a
                 protobuf (or avro/json) schema file under a subject
                 via the schema-registry client; prints the assigned
                 global id. The reference compiles the .proto locally
                 (protobuf Importer) before posting — Confluent
                 registries validate server-side, so this posts the
                 schema text directly (no local protoc dependency).

Run: `python -m kspp_spark.tools <subcommand> --help`.

Broker-bound subcommands build-and-start streaming queries and so need
live endpoints; csv2avro runs anywhere (and is the one the sandbox
e2e-tests). Every subcommand is a ~10-line wiring of library operators
— by design: the reference's tools are the same thin wrappers over its
operator library.
"""

from __future__ import annotations

import argparse


def csv2avro(
    spark,
    src: str,
    dst: str,
    codec: str = "deflate",
    delimiter: str = ",",
    header: bool = True,
    block_rows: int = 4096,
) -> None:
    """CSV -> Avro OCF (csv2avro.cpp behavior: read typed rows, write
    one container). Schema inference via the Spark CSV reader; output
    through the jarless OCF writer (multi-block so downstream jarless
    reads split, and timestamp/date columns convert in-plan — the
    writer owns the temporal handling)."""
    from kspp_spark.sources.avro_ocf import write_avro_ocf

    df = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("inferSchema", "true")
        .csv(src)
    )
    write_avro_ocf(df, dst, codec=codec, block_rows=block_rows)


def kafka2avro(
    spark,
    brokers: str,
    topic: str,
    dst: str,
    checkpoint: str,
    window: str = "1 hour",
    fmt: str = "ocf",
    kafka_extra: dict[str, str] | None = None,
):
    """Kafka topic -> event-time-rotated files (kafka2avro.cpp:144-151;
    dst may be a local path or s3a:// URI — same code path, like the
    reference's file/s3 sink split). Default fmt="ocf" writes avro
    containers through the jarless codec (works in environments
    without spark-avro); pass fmt="avro"/"parquet" to use a jar-backed
    writer. Returns the started query."""
    from kspp_spark.sinks.writers import rotated_file_sink
    from kspp_spark.sources.avro_ocf import rotated_avro_ocf_sink
    from kspp_spark.sources.kafka_avro import kafka_stream

    src = kafka_stream(spark, brokers, topic, extra_options=kafka_extra)

    def write_batch(batch, batch_id):
        if fmt == "ocf":
            rotated_avro_ocf_sink(batch, dst, event_time="event_time", window=window)
        else:
            rotated_file_sink(
                batch, dst, event_time="event_time", window=window, fmt=fmt
            )

    return (
        src.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def kafka2table(
    spark,
    brokers: str,
    topic: str,
    dst: str,
    checkpoint: str,
    rocksdb_state: bool = True,
    kafka_extra: dict[str, str] | None = None,
):
    """Kafka changelog topic -> continuously-materialized latest-per-key
    table (kafka2rocksdb.cpp:122-124: kafka_source -> ktable<rocksdb>).
    Spark mapping: ktable_stream (LWW in streaming state, optionally on
    the RocksDB provider) appends each micro-batch's UPDATES to a
    parquet changelog at `dst`; `table_snapshot(spark, dst)` reads the
    current table (latest per key — compaction on read, the same
    merge-on-read a RocksDB LSM does natively). Returns the started
    query."""
    from kspp_spark.sources.kafka_avro import kafka_stream
    from kspp_spark.streaming.core import ktable_stream, use_rocksdb_state

    if rocksdb_state:
        use_rocksdb_state(spark)
    src = kafka_stream(
        spark, brokers, topic, extra_options=kafka_extra
    ).selectExpr(
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
        "event_time",
    )
    latest = ktable_stream(src, "key", ["value"], "event_time")
    return (
        latest.writeStream.outputMode("update")
        .foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(dst)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )


def table_snapshot(spark, dst: str):
    """Current latest-per-key view of a kafka2table changelog dir —
    the read side of the reference's RocksDB get() surface. Tombstones
    (null value) drop out, like rocksdb_store's deleted keys."""
    from pyspark.sql import functions as F

    log = spark.read.parquet(dst)
    latest = (
        log.groupBy("key")
        .agg(F.max(F.struct("event_time", "value")).alias("_w"))
        .select("key", F.col("_w.value").alias("value"),
                F.col("_w.event_time").alias("event_time"))
    )
    return latest.filter(F.col("value").isNotNull())


def mqtt2kafka(
    spark,
    spool_dir: str,
    brokers: str,
    topic: str,
    checkpoint: str,
    kafka_extra: dict[str, str] | None = None,
):
    """MQTT -> Kafka bridge (mqtt2kafka.cpp): an external paho-style
    callback spools messages via BridgeSource.spool (sources/bridge
    documents the transport contract); this end tails the spool
    directory as a file stream and produces into the Kafka topic with
    the reference's key/value framing (key = MQTT topic). Returns the
    started query."""
    from kspp_spark.sinks.writers import kafka_sink
    from kspp_spark.sources.bridge import BRIDGE_SCHEMA

    src = spark.readStream.schema(BRIDGE_SCHEMA).parquet(spool_dir)
    return kafka_sink(src, brokers, topic, checkpoint, extra_options=kafka_extra)


def docs2index(
    spark,
    src: str,
    dst: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
    buckets: int = 32,
) -> None:
    """Materialize the retrieval artifacts for a parquet document
    corpus (beyond-reference — kspp has no retrieval surface): the
    positional index written BUCKETED BY TERM (every term-lookup join
    downstream is exchange-free) plus the doc-length side table. After
    this, phrase_search_indexed / bm25_indexed run index-only — the
    corpus never re-tokenizes at query time.

    The corpus tokenizes ONCE: the unpruned index is built and
    persisted, doc lengths derive from it (dl = Σ tf per doc — every
    token posts exactly once), and the df bounds then prune what gets
    written. Note min_df pruning trades phrase/BM25 exactness for
    index size — see phrase_search_indexed/bm25_indexed docstrings."""
    from pyspark.sql import functions as F

    from kspp_spark.functions.text import positional_index
    from kspp_spark.io import write_bucketed

    docs = spark.read.parquet(src)
    idx = positional_index(docs, id_col=id_col, text_col=text_col).persist()
    try:
        dl = idx.groupBy(id_col).agg(F.sum("tf").cast("int").alias("dl"))
        dl.write.mode("overwrite").parquet(f"{dst}/doclen")
        pruned = idx.filter(F.col("df") >= min_df)
        if max_df is not None:
            pruned = pruned.filter(F.col("df") <= max_df)
        write_bucketed(
            pruned,
            table="kspp_positional_index",
            key="term",
            buckets=buckets,
            path=f"{dst}/postings",
            sort_by="term",
        )
    finally:
        idx.unpersist()


def warc2docs(
    spark,
    src: str,
    dst: str,
    extract_html: bool = True,
    latest_only: bool = True,
) -> None:
    """WARC crawl segment(s) -> curation-ready parquet documents
    (beyond-reference — the raw-crawl front door): distributed record
    parse (sources/warc), HTTP body extraction, optional canonical-URL
    latest-capture dedup and HTML -> text extraction. The output
    parquet feeds the text tiers (boilerplate/gopher/dedup/index)
    directly."""
    from pyspark.sql import functions as F

    from kspp_spark.functions.web import html_to_text, latest_capture_per_url
    from kspp_spark.sources.warc import read_warc, warc_to_documents

    docs = warc_to_documents(read_warc(spark, src), with_date=True)
    if latest_only:
        docs = latest_capture_per_url(
            docs, url_col="url", date_col="warc_date", tiebreak_col="doc_id"
        )
    if extract_html:
        docs = docs.withColumn("text", html_to_text(F.col("text")))
    docs.write.mode("overwrite").parquet(dst)


def train_bpe(
    spark,
    src: str,
    dst: str,
    n_merges: int = 64,
    alphabet: str = "chars",
    text_col: str = "text",
) -> int:
    """Train a BPE merge table on a parquet corpus and persist it as
    the tokenizer artifact (merge_rank, a, b, cnt) — the offline half
    of bpe_encode/bpe_encode_pandas (beyond-reference: the tokenizer-
    training face of the training-data pipeline, Sennrich et al.
    2016). Returns the number of merges learned (early stop when no
    pair repeats)."""
    from kspp_spark.functions.text import bpe_train, save_bpe_merges

    docs = spark.read.parquet(src)
    merges, _ = bpe_train(
        docs, n_merges=n_merges, text_col=text_col, alphabet=alphabet
    )
    save_bpe_merges(spark, merges, dst, alphabet=alphabet)
    return len(merges)


def register_schema(
    registry_url: str,
    subject: str,
    schema_file: str,
    schema_type: str | None = None,
    post_fn=None,
) -> int:
    """Register a schema file under a subject
    (kspp_protobuf_register_schema.cpp:18-56: argv = source_root,
    .protofile, subject -> protobuf_register_schema). Type defaults
    by extension: .proto -> PROTOBUF, .json -> JSON, anything else
    (.avsc) -> AVRO. Returns the assigned global schema id. post_fn
    is the injectable transport (tests / air-gapped registries) —
    same convention as SchemaRegistryClient."""
    from kspp_spark.sources.schema_registry import SchemaRegistryClient

    if schema_type is None:
        low = schema_file.lower()
        schema_type = (
            "PROTOBUF"
            if low.endswith(".proto")
            else "JSON" if low.endswith(".json") else "AVRO"
        )
    with open(schema_file, "r", encoding="utf-8") as f:
        schema_text = f.read()
    client = SchemaRegistryClient(registry_url, post_fn=post_fn)
    return client.put_schema(subject, schema_text, schema_type=schema_type)


def resolve_kafka(brokers: str | None) -> tuple[str, dict[str, str]]:
    """CLI default resolution, reference-style: an omitted --brokers
    falls back to the KSPP_KAFKA_BROKER_URL environment and yields
    (bootstrap servers, extra kafka.* client options) — the SECURITY
    config rides along, so an ssl:// environment is dialed SSL, not
    plaintext. TLS material is only probed when the resolved scheme
    is ssl (no spurious cert warnings on plaintext runs). An explicit
    --brokers is passed through verbatim with no extra options."""
    if brokers:
        return brokers, {}
    from kspp_spark.config import (
        ClusterConfig,
        default_ca_cert_path,
        default_client_cert_path,
        default_client_key_passphrase,
        default_client_key_path,
        default_kafka_broker_uri,
    )
    from kspp_spark.utils import split_url_list

    cfg = ClusterConfig(consumer_group="cli")
    cfg.set_brokers(default_kafka_broker_uri())
    if any(
        u.scheme == "ssl"
        for u in split_url_list(cfg.brokers, "plaintext")
    ):
        if cfg.set_ca_cert_path(default_ca_cert_path()):
            cfg.set_private_key_path(
                default_client_cert_path(),
                default_client_key_path(),
                default_client_key_passphrase(),
            )
    opts = cfg.kafka_options()
    return opts.pop("kafka.bootstrap.servers"), opts


def resolve_registry(url: str | None) -> str:
    """An omitted --registry falls back to KSPP_SCHEMA_REGISTRY_URL
    (env.cpp:41)."""
    if url:
        return url
    from kspp_spark.config import default_schema_registry_uri

    return default_schema_registry_uri()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kspp_spark.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("csv2avro", help="CSV file(s) -> Avro container")
    c.add_argument("--src", required=True)
    c.add_argument("--dst", required=True)
    c.add_argument("--codec", default="deflate", choices=["deflate", "null"])
    c.add_argument("--delimiter", default=",")
    c.add_argument("--no-header", action="store_true")

    k = sub.add_parser("kafka2avro", help="Kafka topic -> rotated Avro files")
    k.add_argument("--brokers", default=None,
                   help="default: KSPP_KAFKA_BROKER_URL")
    k.add_argument("--topic", required=True)
    k.add_argument("--dst", required=True)
    k.add_argument("--checkpoint", required=True)
    k.add_argument("--window", default="1 hour")
    k.add_argument(
        "--fmt",
        default="ocf",
        choices=["ocf", "avro", "parquet"],
        help="ocf = jarless avro containers (default); avro/parquet need jars",
    )

    r = sub.add_parser(
        "kafka2table", help="Kafka changelog -> materialized latest-per-key table"
    )
    r.add_argument("--brokers", default=None,
                   help="default: KSPP_KAFKA_BROKER_URL")
    r.add_argument("--topic", required=True)
    r.add_argument("--dst", required=True)
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--no-rocksdb", action="store_true")

    m = sub.add_parser("mqtt2kafka", help="MQTT bridge spool -> Kafka topic")
    m.add_argument("--spool-dir", required=True)
    m.add_argument("--brokers", default=None,
                   help="default: KSPP_KAFKA_BROKER_URL")
    m.add_argument("--topic", required=True)
    m.add_argument("--checkpoint", required=True)

    d = sub.add_parser(
        "docs2index", help="parquet corpus -> bucketed positional index + doclens"
    )
    d.add_argument("--src", required=True)
    d.add_argument("--dst", required=True)
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--min-df", type=int, default=1)
    d.add_argument("--max-df", type=int, default=None)
    d.add_argument("--buckets", type=int, default=32)

    w = sub.add_parser(
        "warc2docs",
        help="WARC crawl segments -> curation-ready parquet documents",
    )
    w.add_argument("--src", required=True)
    w.add_argument("--dst", required=True)
    w.add_argument("--raw-html", action="store_true",
                   help="keep raw HTML bodies (skip html_to_text)")
    w.add_argument("--all-captures", action="store_true",
                   help="keep every capture (skip latest-per-URL dedup)")

    t = sub.add_parser(
        "train-bpe", help="parquet corpus -> persisted BPE merge table"
    )
    t.add_argument("--src", required=True)
    t.add_argument("--dst", required=True)
    t.add_argument("--n-merges", type=int, default=64)
    t.add_argument("--alphabet", default="chars", choices=["chars", "words"])
    t.add_argument("--text-col", default="text")

    s = sub.add_parser(
        "register-schema",
        help="register a protobuf/avro/json schema file under a subject",
    )
    s.add_argument("--registry", default=None,
                   help="schema-registry base URL (default: KSPP_SCHEMA_REGISTRY_URL)")
    s.add_argument("--subject", required=True)
    s.add_argument("--file", required=True, help=".proto / .avsc / .json file")
    s.add_argument(
        "--type",
        default=None,
        choices=["avro", "protobuf", "json"],
        help="override the extension-derived schema type",
    )

    args = p.parse_args(argv)
    if args.cmd == "train-bpe":
        from kspp_spark.session import get_spark

        n = train_bpe(
            get_spark("kspp_tools_train_bpe"), args.src, args.dst,
            n_merges=args.n_merges, alphabet=args.alphabet,
            text_col=args.text_col,
        )
        print(n)
        return 0
    if args.cmd == "register-schema":
        # registry-only: no SparkSession needed
        schema_id = register_schema(
            resolve_registry(args.registry), args.subject, args.file,
            schema_type=args.type.upper() if args.type else None,
        )
        print(schema_id)
        return 0
    from kspp_spark.session import get_spark

    spark = get_spark(f"kspp_tools_{args.cmd}")
    if args.cmd == "warc2docs":
        warc2docs(
            spark,
            args.src,
            args.dst,
            extract_html=not args.raw_html,
            latest_only=not args.all_captures,
        )
        return 0
    if args.cmd == "docs2index":
        docs2index(
            spark,
            args.src,
            args.dst,
            id_col=args.id_col,
            text_col=args.text_col,
            min_df=args.min_df,
            max_df=args.max_df,
            buckets=args.buckets,
        )
        return 0
    if args.cmd == "csv2avro":
        csv2avro(
            spark,
            args.src,
            args.dst,
            codec=args.codec,
            delimiter=args.delimiter,
            header=not args.no_header,
        )
        return 0
    bootstrap, kafka_extra = resolve_kafka(args.brokers)
    if args.cmd == "kafka2avro":
        q = kafka2avro(
            spark, bootstrap, args.topic, args.dst,
            args.checkpoint, window=args.window, fmt=args.fmt,
            kafka_extra=kafka_extra,
        )
    elif args.cmd == "kafka2table":
        q = kafka2table(
            spark, bootstrap, args.topic, args.dst,
            args.checkpoint, rocksdb_state=not args.no_rocksdb,
            kafka_extra=kafka_extra,
        )
    else:
        q = mqtt2kafka(
            spark, args.spool_dir, bootstrap, args.topic,
            args.checkpoint, kafka_extra=kafka_extra,
        )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
