"""Confluent schema-registry client: runtime id -> writer-schema
resolution for Confluent-framed Avro topics.

Parity targets:
  registry client  include/kspp/schema_registry/schema_registry_client.h:14-37
                   (get_avro_schema(schema_id) backed by avro_cache_,
                    put_schema(subject, schema) -> id)
  REST shape       src/schema_registry/confluent_http_proxy.cpp:141-200
                   (POST /subjects/{subject}/versions,
                    GET  /schemas/ids/{id})
  wire framing     include/kspp/serdes/avro_serdes.h:48-102

Spark mapping: schema resolution is a DRIVER-side concern — the set of
distinct schema ids on a topic is tiny (schema versions, not rows), so
the client caches id->schema and the decode plan branches per id with
`from_avro`, keeping row decoding fully JVM-side. Executors never talk
to the registry.

The HTTP transport is injectable (fetch_fn/post_fn) so tests — and
air-gapped deployments with schema files — run without a live registry.
"""

from __future__ import annotations

import json
import threading
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kspp_spark.sources.kafka_avro import (
    confluent_avro_value,
    confluent_schema_id,
)


class SchemaRegistryClient:
    """Cached id->schema resolver against a Confluent-compatible
    registry. Mirrors the reference client's surface: get_schema
    (get_avro_schema + avro_cache_, schema_registry_client.h:21,35)
    and put_schema (:20).

    fetch_fn(url) -> response-body str and post_fn(url, payload) ->
    response-body str default to stdlib urllib; inject fakes for tests
    or file-backed registries.
    """

    def __init__(
        self,
        base_url: str,
        fetch_fn: Callable[[str], str] | None = None,
        post_fn: Callable[[str, str], str] | None = None,
        timeout: float = 10.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._fetch = fetch_fn or self._http_get
        self._post = post_fn or self._http_post
        self._cache: dict[int, str] = {}
        self._lock = threading.Lock()

    # -- transport (overridable) -------------------------------------
    def _http_get(self, url: str) -> str:
        import urllib.request

        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return r.read().decode("utf-8")

    def _http_post(self, url: str, payload: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=payload.encode("utf-8"),
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return r.read().decode("utf-8")

    # -- API ----------------------------------------------------------
    def get_schema(self, schema_id: int) -> str:
        """Writer schema (Avro JSON string) for a schema id; cached
        forever — registered schemas are immutable per id."""
        with self._lock:
            if schema_id in self._cache:
                return self._cache[schema_id]
        body = self._fetch(f"{self.base_url}/schemas/ids/{schema_id}")
        schema = json.loads(body)["schema"]
        with self._lock:
            self._cache[schema_id] = schema
        return schema

    def put_schema(
        self, subject: str, schema: str | dict, schema_type: str | None = None
    ) -> int:
        """Register a schema under a subject; returns the global id
        (confluent_http_proxy.cpp:150 POST /subjects/{s}/versions).
        schema_type None/'AVRO' posts the registry-default payload;
        'PROTOBUF'/'JSON' add the Confluent schemaType field (the
        registry compiles/validates server-side — the reference's
        local protobuf Importer pass is a client-side convenience,
        kspp_protobuf_register_schema.cpp:36-46)."""
        if not isinstance(schema, str):
            schema = json.dumps(schema)
        payload: dict = {"schema": schema}
        if schema_type and schema_type.upper() != "AVRO":
            payload["schemaType"] = schema_type.upper()
        body = self._post(
            f"{self.base_url}/subjects/{subject}/versions",
            json.dumps(payload),
        )
        schema_id = int(json.loads(body)["id"])
        with self._lock:
            self._cache.setdefault(schema_id, schema)
        return schema_id

    def schema_map(self, ids: Iterable[int]) -> dict[int, str]:
        return {int(i): self.get_schema(int(i)) for i in ids}


def split_by_schema_id(
    df: DataFrame,
    client: SchemaRegistryClient,
    value: str = "value",
) -> list[tuple[int, str, DataFrame]]:
    """Route a mixed-schema-id topic batch: one (schema_id, writer
    schema JSON, sub-frame) per distinct id present. The distinct runs
    on the 4-byte id column only (bounded by the number of schema
    VERSIONS ever registered, not by data volume), so the driver-side
    collect is safe at any scale."""
    with_id = df.withColumn("_sid", confluent_schema_id(value))
    ids = sorted(r._sid for r in with_id.select("_sid").distinct().collect())
    schemas = client.schema_map(ids)
    return [
        (i, schemas[i], with_id.filter(F.col("_sid") == i).drop("_sid"))
        for i in ids
    ]


def _py_confluent_avro_value(value: str, writer_schema_json: str):
    """Arrow-batched Python fallback for confluent_avro_value when the
    spark-avro jar is absent: strip the 5-byte Confluent frame, decode
    the avro binary with the self-contained codec (sources/avro_ocf.py)
    into the writer schema's struct."""
    import io
    import json as _json

    from kspp_spark.sources.avro_ocf import _decode, _pythonize, avro_to_spark_type

    schema = _json.loads(writer_schema_json)
    names = [f["name"] for f in schema["fields"]]

    @F.pandas_udf(avro_to_spark_type(schema))
    def dec(vals: pd.Series) -> pd.DataFrame:
        rows = [
            _pythonize(schema, _decode(schema, io.BytesIO(bytes(b)[5:])))
            for b in vals
        ]
        return pd.DataFrame(rows, columns=names)

    return dec(F.col(value))


def decode_confluent_topic(
    df: DataFrame,
    client: SchemaRegistryClient,
    value: str = "value",
    decoded: str = "decoded",
) -> list[tuple[int, DataFrame]]:
    """Decode each schema-id slice of a topic with its own writer
    schema. Prefers from_avro (JVM-side; needs the spark-avro package
    on the classpath); falls back to the Arrow-batched pure-Python
    decoder otherwise. Returns [(schema_id, decoded frame)] —
    different writer schemas produce different struct types, so
    aligning versions into one frame is the caller's reader-schema
    decision."""
    out = []
    for sid, schema, part in split_by_schema_id(df, client, value):
        try:
            d = part.withColumn(decoded, confluent_avro_value(value, schema))
            d.schema  # force analysis so a missing jar surfaces here
        except Exception as e:
            if "avro" not in str(e) and "Avro" not in str(e):
                raise
            d = part.withColumn(decoded, _py_confluent_avro_value(value, schema))
        out.append((sid, d))
    return out
