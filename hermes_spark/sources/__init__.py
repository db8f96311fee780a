"""Source registry — format-symmetric readers (S1-S5, S8-S9 analogs).

The reference's datasource plugins (SQLite/PostgreSQL/Oracle/LDAP,
/root/reference/lib/plugins.py:56-123) all reduce to "fetch the full
current state of a type"; its bus consumers (Kafka/SQLite,
lib/plugins.py:126-257) reduce to "ordered event stream with offsets".
Spark-side both are DataFrameReader formats:

    snapshot(spark, url)         batch read   (S1-S5)
    stream(spark, url, schema)   readStream   (S8-S9; offsets live in
                                 the checkpoint, not in our code — S10)

URLs: ``parquet:/path``, ``json:/path``, ``csv:/path``,
``sqlite:/path.db?table=t`` (stdlib driver, tested), ``jdbc:<spark-jdbc-url>?dbtable=t``, ``iceberg:catalog.db.table``.
jdbc/iceberg are gated on their drivers being on the classpath (absent
in this sandbox) — the registry raises a clear error instead of
failing deep inside py4j.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _split(url: str) -> tuple[str, str]:
    scheme, _, rest = url.partition(":")
    if not rest:
        raise ValueError(f"source url needs a scheme: {url!r}")
    return scheme, rest


def snapshot(spark: SparkSession, url: str, schema: T.StructType | None = None) -> DataFrame:
    scheme, rest = _split(url)
    if scheme == "parquet":
        r = spark.read.schema(schema) if schema else spark.read
        return r.parquet(rest)
    if scheme == "json":
        if schema is None:
            raise ValueError("json source requires an explicit schema (no inference in prod)")
        return spark.read.schema(schema).json(rest)
    if scheme == "csv":
        if schema is None:
            raise ValueError("csv source requires an explicit schema (no inference in prod)")
        return spark.read.schema(schema).option("header", True).csv(rest)
    if scheme == "sqlite":
        # S2 analog (reference plugins/datasources/sqlite): the poll
        # model is "fetch the full current state of a type", so a
        # driver-side sqlite3 (stdlib) read into Arrow is the faithful
        # Spark restatement for dimension-scale sources — the reference
        # itself materializes the whole result in one process
        # (lib/plugins.py:56-123).  Tables too big for one process
        # belong behind jdbc: with partitioning options on a cluster.
        return _sqlite_snapshot(spark, rest, schema)
    if scheme == "jdbc":
        base, _, table = rest.partition("?dbtable=")
        try:
            return spark.read.format("jdbc").option("url", base).option("dbtable", table).load()
        except Exception as e:  # driver jar absent in sandbox
            raise RuntimeError(f"jdbc driver unavailable in this runtime: {e}") from e
    if scheme == "iceberg":
        try:
            return spark.read.format("iceberg").load(rest)
        except Exception as e:
            raise RuntimeError(
                "iceberg-spark-runtime jar not on classpath in this sandbox; "
                f"engine falls back to ParquetMergeTable: {e}"
            ) from e
    raise ValueError(f"unknown source scheme {scheme!r}")


def _sqlite_snapshot(
    spark: SparkSession, rest: str, schema: T.StructType | None
) -> DataFrame:
    """``sqlite:/path/to.db?table=name`` or ``...?query=SELECT ...`` —
    one poll = one consistent read of the type's current state."""
    import sqlite3
    import urllib.parse

    path, _, qs = rest.partition("?")
    params = dict(urllib.parse.parse_qsl(qs))
    table, query = params.get("table"), params.get("query")
    if not (table or query):
        raise ValueError("sqlite source needs ?table=NAME or ?query=SQL")
    if table and not table.replace("_", "").isalnum():
        raise ValueError(f"invalid sqlite table name {table!r}")
    sql = query or f"SELECT * FROM {table}"  # table name validated above
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def stream(spark: SparkSession, url: str, schema: T.StructType) -> DataFrame:
    scheme, rest = _split(url)
    if scheme == "parquet":
        return spark.readStream.schema(schema).parquet(rest)
    if scheme == "json":
        return spark.readStream.schema(schema).json(rest)
    if scheme == "rate":
        return spark.readStream.format("rate").option("rowsPerSecond", rest or "1000").load()
    if scheme == "kafka":
        try:
            host, _, topic = rest.partition("/")
            return (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", host)
                .option("subscribe", topic)
                .load()
            )
        except Exception as e:
            raise RuntimeError(f"kafka connector unavailable in this runtime: {e}") from e
    raise ValueError(f"unknown stream scheme {scheme!r}")
