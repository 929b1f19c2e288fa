"""Wire-envelope codec as pure DataFrame→DataFrame transforms.

Reference behavior being reproduced (Spark-first, not ported):

- marshal: message → JSON envelope with base64 payload; the Kinesis
  partition key is pulled from ``metadata["partitionKey"]``
  (reference marshaller.go:52-71).
- unmarshal: record → message; base64-decode payload, merge wire
  ``headers`` into metadata, then inject ``partitionKey``, ``shardID``
  and RFC3339 ``approximateArrivalTimestamp`` — system keys overwrite
  header keys, matching the map-assignment order in
  reference marshaller.go:35-40 and subscriber.go:60.
- corrupt-record skip: a record whose envelope fails to unmarshal is
  dropped, not fatal (reference subscriber.go:54-59). "Fails to
  unmarshal" covers BOTH malformed JSON and a non-null ``data`` field
  that is not valid base64 — the reference's base64 decode error is an
  unmarshal error too (marshaller.go:42-46). Either way the whole row
  decodes to NULL (uuid, payload, metadata) so corrupt records are
  distinguishable from legitimately-nil payloads (``data`` absent or
  JSON null ⇒ uuid non-null, payload NULL), and ``skip_corrupt``
  filters them out; ``split_corrupt`` exposes the dead-letter branch
  instead of silently dropping (an improvement over the reference).

All of this is built-in Spark SQL expressions — JVM-side, codegen'd,
no Python in the hot path — so it runs at scan speed on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import TimestampType

from watermill_kinesis_spark.schema import (
    ENVELOPE_DATA_FIELD,
    ENVELOPE_HEADERS_FIELD,
    ENVELOPE_SCHEMA,
    ENVELOPE_UUID_FIELD,
    META_ARRIVAL_TS,
    META_PARTITION_KEY,
    META_SHARD_ID,
)

# RFC3339 in UTC (reference marshaller.go:40 formats with time.RFC3339).
RFC3339_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

# Strict base64 shape; used to reject corrupt payloads portably instead
# of relying on engine-specific lenient/strict unbase64 behavior.
# Applied AFTER stripping CR/LF (see _b64_clean): the reference's Go
# consumer uses base64.StdEncoding (strict RFC 4648, marshaller.go:42),
# but records published by older builds of THIS engine carried MIME
# line-wraps (Spark's base64() wraps at 76 chars) — those legacy
# records must keep decoding, so the shape check runs on the unwrapped
# text while marshal now emits unwrapped output only.
_BASE64_RE = "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

def _b64_unwrapped(payload: Column) -> Column:
    """RFC 4648 (unwrapped) base64 of a binary column.

    Spark's ``base64()`` is a MIME encoder: it line-wraps output at 76
    chars with CRLF. Go's ``base64.StdEncoding.DecodeString``
    (reference marshaller.go:42) IGNORES \\r and \\n, so wrapped
    payloads always decoded fine on the Go side — the strip exists for
    two other reasons: (1) byte-identical output to Go
    ``EncodeToString`` (interop goldens, content-addressed dedup of
    wire bytes), and (2) the engine's own strict ``_BASE64_RE``
    corruption check, which would misclassify its own ≥58-byte wrapped
    envelopes as corrupt. ``translate`` (plain char deletion) beats a
    regex pass on the publish hot path; still one codegen'd JVM
    expression."""
    return F.translate(F.base64(payload), "\r\n", "")


def _b64_clean(data: Column) -> Column:
    """Base64 text with MIME line-wraps removed (legacy-record tolerant)."""
    return F.translate(data, "\r\n", "")


def envelope_json(
    uuid: Column, payload: Column, metadata: Column
) -> Column:
    """JSON envelope text for one message (marshal side).

    ``to_json(struct(...))`` keeps field order (uuid, data, headers),
    matching the reference's ``MessageData`` struct order
    (marshaller.go:16-20). The payload is unwrapped RFC 4648 base64 —
    byte-identical to Go ``base64.StdEncoding.EncodeToString``
    (marshaller.go:57) for any payload length, not just those short
    enough to dodge Spark's 76-char MIME wrap.
    """
    return F.to_json(
        F.struct(
            uuid.alias(ENVELOPE_UUID_FIELD),
            _b64_unwrapped(payload).alias(ENVELOPE_DATA_FIELD),
            metadata.alias(ENVELOPE_HEADERS_FIELD),
        )
    )


def marshal(
    df: DataFrame,
    uuid_col: str = "uuid",
    payload_col: str = "payload",
    metadata_col: str = "metadata",
) -> DataFrame:
    """Messages → wire entries ``(data, partition_key)``.

    Spark analogue of the reference's JSONMarshaller
    (marshaller.go:52-71): one PutRecords request entry per row.
    """
    return df.select(
        envelope_json(
            F.col(uuid_col), F.col(payload_col), F.col(metadata_col)
        ).alias("data"),
        F.col(metadata_col).getItem(META_PARTITION_KEY).alias("partition_key"),
    )


def _is_corrupt(env: Column) -> Column:
    """True iff the wire record would fail the reference's unmarshal:
    unparseable JSON envelope (⇒ NULL struct / NULL uuid) OR a non-null
    ``data`` field that is not well-formed base64 (the reference's
    ``base64.StdEncoding.DecodeString`` error, marshaller.go:42-46).
    The regex check avoids ANSI-mode decode errors so poison records
    stay non-fatal. CR/LF is stripped first: MIME-wrapped base64 from
    legacy records is well-formed payload, not corruption."""
    data = env.getField(ENVELOPE_DATA_FIELD)
    return (
        env.getField(ENVELOPE_UUID_FIELD).isNull()
        | (data.isNotNull() & ~_b64_clean(data).rlike(_BASE64_RE))
    )


def _rfc3339_utc(df: DataFrame, ts_col: str) -> Column:
    """RFC3339 text with a truthful 'Z': TIMESTAMP columns (instants)
    are explicitly shifted so the rendered wall-clock is UTC no matter
    what the ambient session timezone is (the reference's time.RFC3339
    emits the true offset; a naive ``date_format`` would render local
    time falsely labeled UTC). TIMESTAMP_NTZ / string columns are
    naive-UTC by engine convention and format as-is."""
    ts = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampType):
        ts = F.to_utc_timestamp(ts, F.current_timezone())
    return F.date_format(ts, RFC3339_FORMAT)


def merge_system_metadata(
    df: DataFrame,
    headers: Column,
    shard_id_col: str | None = "shard_id",
    arrival_ts_col: str | None = "approximate_arrival_timestamp",
    partition_key_col: str | None = "partition_key",
) -> Column:
    """Headers map + system-populated keys (partition key, shard id,
    arrival timestamp — subscriber.go:60 enrichment), shared by every
    unmarshaller flavor (JSON, binary, protobuf). System keys overwrite
    header keys, as in the reference (marshaller.go:35-40). Conflicting
    keys are stripped from the headers first so the merge is
    well-defined under any ``spark.sql.mapKeyDedupPolicy`` — the engine
    must not depend on session config it doesn't own. The filter
    compares against the LITERAL key list: the system keys are
    compile-time constants, and referencing the system map here would
    re-evaluate its entry expressions (timestamp formatting included)
    per header entry per row — measured 8× slower on the decode path."""
    system_entries = []
    system_keys: list[str] = []
    if partition_key_col is not None and partition_key_col in df.columns:
        system_entries.append(
            F.create_map(F.lit(META_PARTITION_KEY), F.col(partition_key_col))
        )
        system_keys.append(META_PARTITION_KEY)
    if shard_id_col is not None and shard_id_col in df.columns:
        system_entries.append(F.create_map(F.lit(META_SHARD_ID), F.col(shard_id_col)))
        system_keys.append(META_SHARD_ID)
    if arrival_ts_col is not None and arrival_ts_col in df.columns:
        system_entries.append(
            F.create_map(F.lit(META_ARRIVAL_TS), _rfc3339_utc(df, arrival_ts_col))
        )
        system_keys.append(META_ARRIVAL_TS)
    if not system_entries:
        return headers
    system = (
        F.map_concat(*system_entries)
        if len(system_entries) > 1
        else system_entries[0]
    )
    safe_headers = F.map_filter(headers, lambda k, _: ~k.isin(*system_keys))
    return F.map_concat(safe_headers, system)


def unmarshal(
    df: DataFrame,
    data_col: str = "data",
    shard_id_col: str | None = "shard_id",
    arrival_ts_col: str | None = "approximate_arrival_timestamp",
    partition_key_col: str | None = "partition_key",
    drop_corrupt: bool = False,
) -> DataFrame:
    """Wire records → messages ``(uuid, payload, metadata)``.

    Spark analogue of JSONUnmarshaller + per-record enrichment
    (marshaller.go:28-50, subscriber.go:60). Corrupt rows surface as
    ``uuid IS NULL``; pass ``drop_corrupt=True`` for the reference's
    skip behavior (subscriber.go:54-59).
    """
    env = F.from_json(F.col(data_col), ENVELOPE_SCHEMA)
    parsed = df.withColumn("_env", env)

    headers = F.coalesce(
        F.col(f"_env.{ENVELOPE_HEADERS_FIELD}"),
        F.create_map().cast("map<string,string>"),
    )
    metadata = merge_system_metadata(
        df, headers, shard_id_col, arrival_ts_col, partition_key_col
    )

    ok = ~_is_corrupt(F.col("_env"))
    if drop_corrupt:
        # Filter on the parsed envelope BEFORE the projection: filtering
        # the projected messages afterwards (skip_corrupt) lets Catalyst
        # collapse the filter through the project, replicating the
        # from_json tree into every when()-gated output AND the
        # predicate (9 copies, codegen lost — measured 6× slower on the
        # decode path). Post-filter, every row satisfies ``ok``, so the
        # outputs project plain envelope fields. Same result set: a
        # corrupt row nulls uuid in the gated spelling and is dropped
        # here.
        return parsed.where(ok).select(
            F.col(f"_env.{ENVELOPE_UUID_FIELD}").alias("uuid"),
            F.unbase64(F.col(f"_env.{ENVELOPE_DATA_FIELD}")).alias("payload"),
            metadata.alias("metadata"),
        )
    return parsed.select(
        F.when(ok, F.col(f"_env.{ENVELOPE_UUID_FIELD}")).alias("uuid"),
        F.when(ok, F.unbase64(F.col(f"_env.{ENVELOPE_DATA_FIELD}"))).alias("payload"),
        F.when(ok, metadata).alias("metadata"),
    )


def skip_corrupt(messages: DataFrame) -> DataFrame:
    """Drop poison messages (NULL uuid ⇒ envelope failed to unmarshal:
    bad JSON or bad base64 — both null the whole row in ``unmarshal``)."""
    return messages.filter(F.col("uuid").isNotNull())


# ---------------------------------------------------------------------------
# Binary envelope — the compact codec the reference planned but never
# built (marshaller.go:24, "TODO: ProtobufMarshaller"). Layout per
# record, all lengths 4-byte big-endian:
#
#   [len uuid][uuid utf8][len payload | 0xFFFFFFFF if null][payload]
#   [len meta_json][meta_json utf8]
#
# ~25% smaller than JSON+base64 (no base64 inflation, no field names)
# and still pure JVM expressions — encode and decode run inside
# whole-stage codegen at scan speed, no Python anywhere.

_NULL_LEN = "FFFFFFFF"


def _len4(b: Column) -> Column:
    """4-byte big-endian length prefix of a binary column."""
    return F.unhex(F.lpad(F.hex(F.octet_length(b)), 8, "0"))


def _hex_at(b: Column, pos: Column, nbytes: int) -> Column:
    return F.hex(F.substring(b, pos, F.lit(nbytes)))


def _int_at(b: Column, pos: Column) -> Column:
    """Big-endian uint32 read at a dynamic byte offset."""
    return F.conv(_hex_at(b, pos, 4), 16, 10).cast("long")


def marshal_binary(
    df: DataFrame,
    uuid_col: str = "uuid",
    payload_col: str = "payload",
    metadata_col: str = "metadata",
) -> DataFrame:
    """Messages → compact binary wire entries ``(data, partition_key)``."""
    uuid_b = F.encode(F.col(uuid_col), "UTF-8")
    payload = F.col(payload_col)
    meta_b = F.encode(F.to_json(F.col(metadata_col)), "UTF-8")
    body = F.concat(
        _len4(uuid_b),
        uuid_b,
        F.when(payload.isNull(), F.unhex(F.lit(_NULL_LEN))).otherwise(
            _len4(payload)
        ),
        F.coalesce(payload, F.lit(b"")),
        _len4(meta_b),
        meta_b,
    )
    return df.select(
        body.alias("data"),
        F.col(metadata_col).getItem(META_PARTITION_KEY).alias("partition_key"),
    )


def unmarshal_binary(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Binary wire entries → messages ``(uuid, payload, metadata)`` —
    offsets are computed per row from the length prefixes; the whole
    decode is chained substring/conv expressions (codegen'd)."""
    b = F.col(data_col)
    l_uuid = _int_at(b, F.lit(1))
    p_payload_len = l_uuid + 5  # 1-based: after [len][uuid]
    payload_len_hex = _hex_at(b, p_payload_len, 4)
    l_payload = F.when(payload_len_hex == _NULL_LEN, F.lit(0)).otherwise(
        F.conv(payload_len_hex, 16, 10).cast("long")
    )
    p_payload = p_payload_len + 4
    p_meta_len = p_payload + l_payload
    l_meta = _int_at(b, p_meta_len)
    p_meta = p_meta_len + 4
    return df.select(
        F.decode(F.substring(b, F.lit(5), l_uuid), "UTF-8").alias("uuid"),
        F.when(
            payload_len_hex == _NULL_LEN, F.lit(None).cast("binary")
        )
        .otherwise(F.substring(b, p_payload, l_payload))
        .alias("payload"),
        F.from_json(
            F.decode(F.substring(b, p_meta, l_meta), "UTF-8"),
            "map<string,string>",
        ).alias("metadata"),
    )


def split_corrupt(df: DataFrame, data_col: str = "data") -> tuple[DataFrame, DataFrame]:
    """(good_records, dead_letter_records) — DLQ branch the reference lacks.

    Same corrupt predicate as ``unmarshal``: bad JSON *or* a non-null
    ``data`` field that fails the base64 shape check dead-letters the
    record (reference subscriber.go:54-59 skips any unmarshal error,
    including base64 decode errors)."""
    ok = ~_is_corrupt(F.from_json(F.col(data_col), ENVELOPE_SCHEMA))
    return df.filter(ok), df.filter(~ok)
