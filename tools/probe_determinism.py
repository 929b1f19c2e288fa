"""Scratch probe: verify cross-engine (Spark vs DuckDB) value determinism
assumptions before committing to oracle formulations."""

import duckdb

from watermill_kinesis_spark.session import get_spark

SF = "/root/testdata/sf0.001"

spark = get_spark("probe", cpus=8)
from watermill_kinesis_spark.sources.tables import load_table
events = load_table(spark, SF, "events")
events.createOrReplaceTempView("events_v")
orders = spark.read.parquet(f"{SF}/orders.parquet")
print("events spark schema:", events.schema.simpleString())
print("orders spark schema:", orders.schema.simpleString())
r = events.limit(3).toPandas()
print(r.dtypes)
print(r)

con = duckdb.connect()
d = con.execute(f"SELECT * FROM '{SF}/events.parquet' LIMIT 3").fetchdf()
print(d.dtypes)
print(d)

# decimal sum -> double
sp = spark.sql(
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
           COUNT(*) AS n
    FROM events_v GROUP BY event_type ORDER BY event_type
    """.format(sf=SF)
).toPandas()
du = con.execute(
    f"""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
           COUNT(*) AS n
    FROM '{SF}/events.parquet' GROUP BY event_type ORDER BY event_type
    """
).fetchdf()
print(sp.dtypes, du.dtypes, sep="\n")
import numpy as np

print("decimal-sum doubles identical:", np.array_equal(sp.sv.values, du.sv.values))
print("counts dtype:", sp.n.dtype, du.n.dtype)

# plain double sum difference
sp2 = spark.sql(
    f"SELECT SUM(value) AS s FROM events_v"
).toPandas().s[0]
du2 = con.execute(f"SELECT SUM(value) AS s FROM '{SF}/events.parquet'").fetchdf().s[0]
print("plain double sum:", repr(sp2), repr(du2), "equal:", sp2 == du2)

# to_json vs json_object formatting
sp3 = spark.sql(
    """
    SELECT to_json(struct('u1' AS watermill_message_uuid,
                          base64(CAST('hello world' AS BINARY)) AS data,
                          map('k1','v1','k2','v2') AS headers)) AS env
    """
).collect()[0][0]
du3 = con.execute(
    """
    SELECT to_json(struct_pack(watermill_message_uuid := 'u1',
                               data := to_base64(encode('hello world')),
                               headers := MAP(['k1','k2'], ['v1','v2'])))::VARCHAR AS env
    """
).fetchone()[0]
print("spark env:", sp3)
print("duck  env:", du3)
print("envelopes equal:", sp3 == du3)

# timestamp round trip: group events by hour
sp4 = spark.sql(
    f"SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM events_v GROUP BY 1 ORDER BY 1 LIMIT 3"
).toPandas()
du4 = con.execute(
    f"SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1 LIMIT 3"
).fetchdf()
print(sp4, sp4.dtypes, sep="\n")
print(du4, du4.dtypes, sep="\n")

# window() tumbling start equals date_trunc
sp5 = spark.sql(
    f"SELECT window(ts, '1 hour').start AS h, COUNT(*) AS n FROM events_v GROUP BY 1 ORDER BY 1 LIMIT 3"
).toPandas()
print(sp5)

# ts values: any sub-second components?
print(spark.sql(f"SELECT ts FROM events_v LIMIT 5").toPandas())
print(con.execute(f"SELECT ts FROM '{SF}/events.parquet' LIMIT 5").fetchdf())

# hex / md5
sp6 = spark.sql("SELECT md5('abc') AS m, hex(CAST('ab' AS BINARY)) AS h").collect()[0]
du6 = con.execute("SELECT md5('abc') AS m, hex(encode('ab')) AS h").fetchone()
print("md5/hex:", sp6, du6)

# round semantics
sp7 = spark.sql("SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c, round(0.125, 2) AS d").collect()[0]
du7 = con.execute("SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c, round(0.125, 2) AS d").fetchone()
print("round:", sp7, du7)

spark.stop()
