"""Event JSON round-trip, schema evolution, source registry."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from hermes_spark.operators.events import (
    diff_schemas,
    event_from_json,
    event_to_json,
    evolve_schema,
)
from hermes_spark.schema import CHANGE_EVENT_SCHEMA
from hermes_spark.sources import snapshot, stream


def test_event_json_roundtrip(spark):
    ev = spark.createDataFrame(
        [("c1", 0, "insert", "user", "hi", None, "2026-01-01 00:00:00", "abc")],
        "conv_id string, turn_idx int, op string, role string, text string,"
        " tool string, ts string, cksum string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    wire = event_to_json(ev)
    assert set(wire.columns) == {"key", "value"}
    back = event_from_json(wire)
    # from_json yields all-nullable fields; compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in CHANGE_EVENT_SCHEMA.fields
    ]
    r = back.collect()[0]
    assert (r.conv_id, r.turn_idx, r.op, r.text, r.tool) == ("c1", 0, "insert", "hi", None)


def test_schema_diff_and_evolution(spark):
    old = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    new = T.StructType([T.StructField("a", T.LongType()), T.StructField("c", T.DoubleType())])
    d = diff_schemas(old, new)
    assert d.added == ["c"] and d.removed == ["b"]
    assert d.retyped == [("a", "int", "bigint")]
    ev = evolve_schema(old, new)
    assert [f.name for f in ev.fields] == ["a", "b", "c"]
    assert ev["c"].nullable


def test_snapshot_sources(spark, sf_dir):
    df = snapshot(spark, f"parquet:{sf_dir}/nation.parquet")
    assert df.count() == 25
    with pytest.raises(ValueError):
        snapshot(spark, "/no/scheme")
    with pytest.raises(ValueError):
        snapshot(spark, f"csv:{sf_dir}/x.csv")  # schema required


def test_stream_source_registry(spark, sf_dir, tmp_work):
    from hermes_spark.schema import TRANSCRIPT_SCHEMA

    s = stream(spark, f"parquet:{sf_dir}", TRANSCRIPT_SCHEMA)
    assert s.isStreaming


def test_sqlite_source_snapshot(spark, tmp_work):
    """S2: the SQLite datasource (reference plugins/datasources/sqlite)
    — poll = full current state, schema honored, query form works."""
    import sqlite3

    from pyspark.sql import types as T

    from hermes_spark.sources import snapshot

    db = f"{tmp_work}/src.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE users (uid INTEGER, name TEXT, grade REAL)")
    con.executemany("INSERT INTO users VALUES (?,?,?)",
                    [(1, "ann", 3.5), (2, "bob", None), (3, "cho", 1.25)])
    con.commit(); con.close()

    schema = T.StructType([
        T.StructField("uid", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("grade", T.DoubleType()),
    ])
    df = snapshot(spark, f"sqlite:{db}?table=users", schema)
    assert sorted((r.uid, r.name, r.grade) for r in df.collect()) == [
        (1, "ann", 3.5), (2, "bob", None), (3, "cho", 1.25)
    ]
    q = snapshot(
        spark, f"sqlite:{db}?query=SELECT uid, name FROM users WHERE uid > 1"
    )
    assert sorted((r.uid, r.name) for r in q.collect()) == [(2, "bob"), (3, "cho")]
    import pytest
    with pytest.raises(ValueError):
        snapshot(spark, f"sqlite:{db}?table=users; DROP TABLE users")


def test_ldap_source_snapshot_with_stub(spark):
    """S5 analog (reference plugins/datasources/ldap/ldap.py:92-128):
    subtree search → rows, with LDAP's list-of-bytes values shaped by
    the declared schema (ArrayType keeps the decoded list, scalar
    fields take the single value, absent attrs are NULL).  The network
    client is injectable; the sandbox has no ldap3, so the registry
    must raise with guidance when no search_fn is given."""
    import pytest
    from pyspark.sql import types as T

    from hermes_spark.sources import snapshot

    seen = {}

    def fake_search(base, scope, flt, attrs):
        seen.update(base=base, scope=scope, flt=flt, attrs=tuple(attrs))
        return [
            ("uid=alice,ou=people,dc=x", {
                "uid": [b"alice"],
                "cn": [b"Alice A"],
                "mail": [b"a@x.org", b"alice@x.org"],
            }),
            ("uid=bob,ou=people,dc=x", {
                "uid": [b"bob"],
                # cn absent, single-valued mail
                "mail": [b"b@x.org"],
            }),
        ]

    schema = T.StructType([
        T.StructField("uid", T.StringType(), False),
        T.StructField("cn", T.StringType(), True),
        T.StructField("mail", T.ArrayType(T.StringType()), True),
    ])
    df = snapshot(
        spark,
        "ldap://ldap.example:389/ou=people,dc=x"
        "?filter=(objectClass=person)&attrs=uid,cn,mail&scope=sub",
        schema=schema,
        search_fn=fake_search,
    )
    rows = {r.uid: r for r in df.collect()}
    assert seen == {
        "base": "ou=people,dc=x", "scope": "sub",
        "flt": "(objectClass=person)", "attrs": ("uid", "cn", "mail"),
    }
    assert rows["alice"].cn == "Alice A"
    assert rows["alice"].mail == ["a@x.org", "alice@x.org"]
    assert rows["bob"].cn is None and rows["bob"].mail == ["b@x.org"]

    # no client + no injected search_fn → loud gate, not a deep failure
    with pytest.raises(RuntimeError, match="ldap3"):
        snapshot(spark, "ldap://h/dc=x?attrs=uid", schema=schema)


# -- S3/S4: jdbc option plumbing via injectable reader (no driver jar) ---


class _StubReader:
    """Records .option() calls; .load() returns the recorded options —
    the assertion surface for the jar-free jdbc tests (the same
    injectable-client pattern the LDAP source uses)."""

    def __init__(self):
        self.opts = {}

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return dict(self.opts)


def test_postgresql_source_option_plumbing(spark):
    from hermes_spark.sources import snapshot

    got = snapshot(
        spark,
        "postgresql://pg.example:5432/hermes?dbtable=users&user=svc"
        "&password=pw&partitionColumn=id&lowerBound=0&upperBound=100000"
        "&numPartitions=8&fetchsize=5000",
        reader_factory=_StubReader,
    )
    assert got["url"] == "jdbc:postgresql://pg.example:5432/hermes"
    assert got["driver"] == "org.postgresql.Driver"
    assert got["dbtable"] == "users"
    assert (got["partitionColumn"], got["lowerBound"], got["upperBound"],
            got["numPartitions"]) == ("id", "0", "100000", "8")
    assert got["fetchsize"] == "5000"
    assert (got["user"], got["password"]) == ("svc", "pw")


def test_oracle_source_option_plumbing(spark):
    from hermes_spark.sources import snapshot

    got = snapshot(
        spark,
        "oracle://ora.example:1521/XEPDB1?query=SELECT id, name FROM users",
        reader_factory=_StubReader,
    )
    assert got["url"] == "jdbc:oracle:thin:@//ora.example:1521/XEPDB1"
    assert got["driver"] == "oracle.jdbc.OracleDriver"
    assert got["query"] == "SELECT id, name FROM users"
    assert "dbtable" not in got


def test_jdbc_generic_scheme_passthrough(spark):
    from hermes_spark.sources import snapshot

    got = snapshot(
        spark,
        "jdbc:jdbc:mysql://h:3306/db?dbtable=t",
        reader_factory=_StubReader,
    )
    assert got["url"] == "jdbc:mysql://h:3306/db"
    assert got["dbtable"] == "t"
    assert "driver" not in got  # generic scheme: caller supplies the jar


def test_jdbc_partitioning_options_must_be_complete(spark):
    import pytest

    from hermes_spark.sources import snapshot

    with pytest.raises(ValueError, match="ALL of partitionColumn"):
        snapshot(
            spark,
            "postgresql://h:5432/db?dbtable=t&partitionColumn=id",
            reader_factory=_StubReader,
        )


def test_jdbc_requires_dbtable_or_query(spark):
    import pytest

    from hermes_spark.sources import snapshot

    with pytest.raises(ValueError, match="dbtable"):
        snapshot(spark, "postgresql://h:5432/db", reader_factory=_StubReader)


def test_jdbc_dbtable_and_query_mutually_exclusive(spark):
    """dbtable used to silently win over query — the scan then read
    the wrong state with no local error."""
    import pytest

    from hermes_spark.sources import snapshot

    with pytest.raises(ValueError, match="mutually exclusive"):
        snapshot(
            spark,
            "postgresql://h:5432/db?dbtable=t&query=SELECT 1",
            reader_factory=_StubReader,
        )


def test_jdbc_unencoded_query_ampersand_detected(spark):
    """An un-encoded '&' inside query= truncates the SQL at parse_qsl
    time (the surviving prefix may still run, silently wrong); the
    stray fragments land in params as bogus keys and must raise."""
    import pytest

    from hermes_spark.sources import snapshot

    with pytest.raises(ValueError, match="URL-encode"):
        snapshot(
            spark,
            "postgresql://h:5432/db?query=SELECT a FROM t WHERE x=1 && y=2",
            reader_factory=_StubReader,
        )


def test_jdbc_unencoded_ampersand_without_equals_detected(spark):
    """parse_qsl silently DROPS '&'-fragments with no '=' before the
    bogus-key guard can see them (`WHERE flags & 8 > 0` loses
    ' 8 > 0' entirely, prefix still valid SQL) — the raw-string guard
    must catch this class too (review finding, round 6)."""
    import pytest

    from hermes_spark.sources import snapshot

    with pytest.raises(ValueError, match="URL-encode"):
        snapshot(
            spark,
            "oracle://h:1521/svc?query=SELECT a FROM t WHERE flags & 8 > 0",
            reader_factory=_StubReader,
        )


def test_jdbc_encoded_query_roundtrips(spark):
    """A quote_plus-encoded query decodes cleanly: separators arrive
    as literals inside the value, not as pair boundaries."""
    import urllib.parse

    from hermes_spark.sources import snapshot

    sql = "SELECT a, b FROM t WHERE x = 1 AND tag = 'a&b=c'"
    got = snapshot(
        spark,
        "postgresql://h:5432/db?query=" + urllib.parse.quote_plus(sql),
        reader_factory=_StubReader,
    )
    assert got["query"] == sql


def test_kafka_stream_option_plumbing(spark):
    """Bus-consumer connector (S8/S9): option plumbing pinned jar-free
    with the same injectable reader the jdbc tests use."""
    from pyspark.sql import types as T

    from hermes_spark.sources import stream

    got = stream(
        spark,
        "kafka://k1:9092,k2:9092/events?startingOffsets=earliest"
        "&maxOffsetsPerTrigger=50000&failOnDataLoss=false"
        "&kafka.security.protocol=SASL_SSL",
        T.StructType([]),
        reader_factory=_StubReader,
    )
    assert got["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert got["subscribe"] == "events"
    assert got["startingOffsets"] == "earliest"
    assert got["maxOffsetsPerTrigger"] == "50000"
    assert got["failOnDataLoss"] == "false"
    # EVERY option forwards — an allowlist would silently drop the
    # security options and the consumer would try PLAINTEXT
    assert got["kafka.security.protocol"] == "SASL_SSL"

    import pytest

    with pytest.raises(ValueError, match="kafka"):
        stream(spark, "kafka://onlyhosts", T.StructType([]), reader_factory=_StubReader)
