"""IcebergTable: jar-free tests — every SQL statement the class runs
comes from a pure generator tested here, and the call surface is
checked method-by-method against ParquetMergeTable by signature
inspection (the cluster twin must run JoinCdcPipeline/ExactlyOnceSink
unchanged)."""

import inspect

import pytest
from pyspark.sql import types as T

from hermes_spark.iceberg import (
    IcebergTable,
    add_columns_sql,
    create_table_sql,
    drop_columns_sql,
    expire_snapshots_sql,
    merge_sql,
    purge_merge_sql,
    rewrite_data_files_sql,
    set_properties_sql,
)
from hermes_spark.tables import ParquetMergeTable


def test_merge_sql_shape():
    sql = merge_sql(
        "cat.db.target", "chg", ["conv_id", "turn_idx"],
        ["conv_id", "turn_idx", "op", "text"],
    )
    assert "MERGE INTO cat.db.target t USING chg s" in sql
    assert "t.conv_id <=> s.conv_id AND t.turn_idx <=> s.turn_idx" in sql
    assert "WHEN MATCHED AND s.op = 'delete' THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.conv_id = s.conv_id" in sql
    assert (
        "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT "
        "(conv_id, turn_idx, op, text) VALUES "
        "(s.conv_id, s.turn_idx, s.op, s.text)" in sql
    )


def test_merge_sql_retain_tombstones():
    """Retain mode = target-as-state: op='delete' rows UPSERT (state
    memory), nothing is physically deleted by the regular MERGE."""
    sql = merge_sql(
        "cat.db.t", "chg", ["id"], ["id", "op", "v"], retain_tombstones=True
    )
    assert "THEN DELETE" not in sql
    assert "WHEN MATCHED THEN UPDATE SET t.id = s.id, t.op = s.op" in sql
    assert "WHEN NOT MATCHED THEN INSERT (id, op, v)" in sql


def test_create_table_sql_with_bucket_spec():
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    sql = create_table_sql(
        "cat.db.t", schema, partition_by=["bucket(32, conv_id)"]
    )
    assert sql == (
        "CREATE TABLE IF NOT EXISTS cat.db.t "
        "(conv_id string, turn_idx int, ts timestamp) USING iceberg "
        "PARTITIONED BY (bucket(32, conv_id))"
    )
    # identity partition column (the JoinCdcPipeline _bucket spec)
    assert create_table_sql("c.d.t", schema, ["_bucket"]).endswith(
        "PARTITIONED BY (_bucket)"
    )
    assert "PARTITIONED" not in create_table_sql("c.d.t", schema)


def test_ddl_generators():
    assert add_columns_sql("c.d.t", [("mood", "string"), ("n", "int")]) == (
        "ALTER TABLE c.d.t ADD COLUMNS (mood string, n int)"
    )
    assert drop_columns_sql("c.d.t", ["secret"]) == (
        "ALTER TABLE c.d.t DROP COLUMN secret"
    )
    assert expire_snapshots_sql("cat.db.t") == (
        "CALL cat.system.expire_snapshots(table => 'db.t', "
        "older_than => TIMESTAMP '9999-12-31 00:00:00', retain_last => 1)"
    )
    assert rewrite_data_files_sql("cat.db.t") == (
        "CALL cat.system.rewrite_data_files(table => 'db.t')"
    )
    assert purge_merge_sql("c.d.t", "pv", ["a", "b"]) == (
        "MERGE INTO c.d.t t USING pv s ON t.a <=> s.a AND t.b <=> s.b "
        "WHEN MATCHED THEN DELETE"
    )


def test_set_properties_sql_escapes_quotes():
    sql = set_properties_sql("c.d.t", {"hermes.lineage.9": '{"err": "it\'s"}'})
    assert sql == (
        "ALTER TABLE c.d.t SET TBLPROPERTIES "
        "('hermes.lineage.9'='{\"err\": \"it''s\"}')"
    )


# -- surface parity vs ParquetMergeTable ---------------------------------

PARITY_METHODS = [
    n
    for n, m in inspect.getmembers(ParquetMergeTable, inspect.isfunction)
    if not n.startswith("_")
]


@pytest.mark.parametrize("name", PARITY_METHODS)
def test_surface_parity_method(name):
    """Every public ParquetMergeTable method exists on IcebergTable and
    accepts (at least) the same parameters under the same names — the
    engine's pipelines call either class without branching, so a
    missing kwarg is a cluster-only TypeError."""
    assert hasattr(IcebergTable, name), f"IcebergTable lacks {name}()"
    p_params = list(inspect.signature(getattr(ParquetMergeTable, name)).parameters)
    i_sig = inspect.signature(getattr(IcebergTable, name))
    i_params = set(i_sig.parameters)
    has_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD
        for p in i_sig.parameters.values()
    )
    for p in p_params:
        assert p in i_params or has_var_kw, (
            f"IcebergTable.{name} missing parameter {p!r} "
            f"(ParquetMergeTable has it — pipelines pass it by keyword)"
        )


def test_constructor_parity():
    """The keyword surface of the constructor matches (location arg
    aside: path vs identifier)."""
    p = set(inspect.signature(ParquetMergeTable.__init__).parameters) - {"path"}
    i = set(inspect.signature(IcebergTable.__init__).parameters) - {"identifier"}
    missing = p - i
    assert not missing, f"IcebergTable.__init__ missing {sorted(missing)}"


def test_catalog_gate_raises_without_runtime(spark):
    schema = T.StructType([T.StructField("id", T.IntegerType())])
    with pytest.raises(RuntimeError, match="not configured"):
        IcebergTable(spark, "nocat.db.t", key=["id"], schema=schema)


def test_batch_ids_are_strings_in_ledger_contract(spark, tmp_work):
    """The sink stamps ids like 'sink-3'; ParquetMergeTable preserves
    them verbatim, and IcebergTable's committed_batch_ids contract is
    now string-typed (int coercion raised ValueError after the first
    string id and made replays undetectable).  Source-level check: the
    method must not contain an int() coercion."""
    import hermes_spark.iceberg as ice

    src = inspect.getsource(ice.IcebergTable.committed_batch_ids)
    assert "int(" not in src
    src_merge = inspect.getsource(ice.IcebergTable.merge)
    assert "str(batch_id)" in src_merge
