"""File-format I/O surface: Parquet, JSON-lines, CSV, and partitioned
layouts.

The reference has no file I/O at all (SURVEY.md §2-B — its only I/O is
the AWS SDK); a batch engine needs the standard lake formats. Each
round-trip query writes a slice of the testdata in the target format,
reads it back, and aggregates — the oracle runs the same aggregate on
the ORIGINAL table, so a hash match proves the round trip was lossless
(schema + values), not just that the code ran.

Scale notes: all writers go through the normal distributed write path
(one file per task); `partitioned_write_prune` additionally proves
partition pruning — the read plan touches only the selected partition
directories, which at 100 TB is the difference between scanning one
day and scanning the lake.
"""

from __future__ import annotations

import os
import tempfile
import uuid as uuidlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.functions.exact import dsum, sql_dsum
from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"wk_fmt_{prefix}_{uuidlib.uuid4().hex[:6]}_")


_AGG_ORACLE = f"""
    SELECT event_type, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events GROUP BY event_type
"""


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )


@query("format_json_roundtrip", oracle=_AGG_ORACLE, tags=("format",))
def format_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → read back → aggregate; hash-matching the
    oracle's direct aggregate proves lossless round trip. Timestamps
    ride as ISO strings and are restored via the explicit schema."""
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(_tmp("json"), "events_json")
    ev.select("event_id", "event_type", "value").write.mode("overwrite").json(out)
    back = spark.read.schema("event_id long, event_type string, value double").json(
        out
    )
    return _agg(back)


@query("format_csv_roundtrip", oracle=_AGG_ORACLE, tags=("format",))
def format_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV (header) → read back with explicit schema →
    aggregate. Doubles survive because Spark writes round-trippable
    shortest representations."""
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(_tmp("csv"), "events_csv")
    ev.select("event_id", "event_type", "value").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    back = spark.read.schema("event_id long, event_type string, value double").option(
        "header", True
    ).csv(out)
    return _agg(back)


@query("format_parquet_roundtrip", oracle=_AGG_ORACLE, tags=("format",))
def format_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Parquet → read back → aggregate (the lake's native
    format; schema travels with the data)."""
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(_tmp("parquet"), "events_parquet")
    ev.select("event_id", "event_type", "value").write.mode("overwrite").parquet(out)
    return _agg(spark.read.parquet(out))


@query("format_orc_roundtrip", oracle=_AGG_ORACLE, tags=("format",))
def format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → read back → aggregate (the other columnar lake
    format Spark ships natively; same lossless-roundtrip proof as the
    parquet twin — the oracle aggregates the source directly, so a
    hash match certifies the write/read cycle preserved every value)."""
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(_tmp("orc"), "events_orc")
    ev.select("event_id", "event_type", "value").write.mode("overwrite").orc(out)
    return _agg(spark.read.orc(out))


@query(
    "partitioned_write_prune",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
    tags=("format", "partition-prune"),
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write (`partitionBy(event_type)`) + a
    partition-pruned read: the filter on the partition column prunes
    directories at planning time — `PartitionFilters` in the scan node,
    zero I/O for unselected partitions."""
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(_tmp("part"), "events_part")
    ev.select("event_id", "value", "event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    back = spark.read.parquet(out).where(
        F.col("event_type").isin("click", "purchase")
    )
    return _agg(back)


@query(
    "bucketed_join_colocated",
    oracle=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           {sql_dsum('l.l_quantity')} AS sum_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("format", "bucketing", "join"),
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both fact tables are written
    ``bucketBy(8, orderkey)`` + ``sortBy``, so the merge join reads
    bucket-aligned files and needs NO exchange on either side — the
    shuffle happened once at write time and is amortized over every
    subsequent join. This is the 100 TB answer to repeated fact-fact
    joins on the same key (the plan shows ``Bucketed: true`` scans and
    no Exchange below the SortMergeJoin; asserted in
    tests/test_plans.py). The oracle computes the same join+aggregate
    from the original tables, proving bucketing changed the plan, not
    the result."""
    run = uuidlib.uuid4().hex[:8]
    base = _tmp("bucket")
    o_name, l_name = f"wk_orders_b{run}", f"wk_lineitem_b{run}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, "orders"))
        .saveAsTable(o_name)
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, "lineitem"))
        .saveAsTable(l_name)
    )
    ob, lb = spark.table(o_name), spark.table(l_name)
    # 'merge' hint pins a sort-merge join so the bucket layout (not a
    # broadcast) is what elides the exchanges
    return (
        ob.hint("merge")
        .join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@query(
    "format_json_corrupt_modes",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE event_id % 31 <> 0) AS BIGINT) AS n_good,
           CAST(COUNT(*) FILTER (WHERE event_id % 31 = 0) AS BIGINT) AS n_corrupt,
           CAST(SUM(event_id) FILTER (WHERE event_id % 31 <> 0) AS BIGINT)
               AS sum_good_ids
    FROM events
    """,
    tags=("format", "codec"),
)
def format_json_corrupt_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling at the FORMAT layer — the file-reader
    counterpart of the wire codec's corrupt-skip (reference
    subscriber.go:54-59): every 31st JSON line is mangled before
    writing; the PERMISSIVE read (Spark's default) lands those rows in
    ``columnNameOfCorruptRecord`` with data columns NULL, and good
    rows parse fully. The emitted triple (good count, corrupt count,
    good-id checksum) is pinned by the oracle's arithmetic, proving
    both that poison lines never kill the scan and that they are
    EXACTLY the lines the synthesis corrupted — no healthy row is
    misclassified."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    lines = ev.select(
        F.when(
            F.col("event_id") % 31 == 0,
            F.concat(F.lit("{broken"), F.to_json(F.struct("event_id"))),
        )
        .otherwise(F.to_json(F.struct("event_id", "event_type")))
        .alias("value")
    )
    out = os.path.join(_tmp("json_corrupt"), "lines")
    lines.write.mode("overwrite").text(out)
    back = spark.read.schema(
        "event_id long, event_type string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(out)
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("bigint")
        .alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("event_id")))
        .cast("bigint")
        .alias("sum_good_ids"),
    )


@query(
    "format_fixedwidth_parse",
    oracle="""
    WITH rendered AS (
        -- the fixed-width record a legacy feed would emit: 12-char
        -- right-padded status+priority code, 20-char zero-padded key,
        -- 20-char zero-padded cents amount (both sized past int64's
        -- 19 digits so lpad can NEVER truncate — lpad silently keeps
        -- a prefix on overflow, which would corrupt keys while both
        -- engines agreed; r6 review)
        SELECT rpad(o_orderstatus || substr(o_orderpriority, 1, 1), 12, ' ')
               || lpad(CAST(o_orderkey AS VARCHAR), 20, '0')
               || lpad(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS VARCHAR), 20, '0') AS line
        FROM orders),
    parsed AS (
        SELECT trim(substr(line, 1, 12)) AS code,
               CAST(substr(line, 13, 20) AS BIGINT) AS okey,
               CAST(substr(line, 33, 20) AS BIGINT) AS cents
        FROM rendered)
    SELECT code,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MIN(okey) AS BIGINT) AS min_key,
           CAST(MAX(okey) AS BIGINT) AS max_key
    FROM parsed GROUP BY code
    """,
    tags=("formats", "ingestion"),
)
def format_fixedwidth_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (COBOL-copybook-style) record round trip — the
    legacy-feed ingestion face: render each order into a 52-char
    fixed-layout line (right-padded code, zero-padded key and cents —
    numeric fields 20 wide, PAST int64's 19 digits, because ``lpad``
    silently keeps a prefix on overflow and would corrupt keys on
    both engines at once), then parse it back with pure substring
    arithmetic and aggregate — proving the offsets, padding, and
    numeric reconversion are lossless at any int64 value. Everything
    is JVM ``substring``/``lpad``/``rpad`` inside whole-stage codegen
    (the classic mainframe-feed decode needs no UDF); one shuffle for
    the final rollup."""
    o = load_table(spark, sf_dir, "orders")
    line = F.concat(
        F.rpad(
            F.concat(
                F.col("o_orderstatus"), F.substring("o_orderpriority", 1, 1)
            ),
            12,
            " ",
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 20, "0"),
        F.lpad(
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .cast("string"),
            20,
            "0",
        ),
    )
    rendered = o.select(line.alias("line"))
    parsed = rendered.select(
        F.trim(F.substring("line", 1, 12)).alias("code"),
        F.substring("line", 13, 20).cast("bigint").alias("okey"),
        F.substring("line", 33, 20).cast("bigint").alias("cents"),
    )
    return parsed.groupBy("code").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.min("okey").alias("min_key"),
        F.max("okey").alias("max_key"),
    )
