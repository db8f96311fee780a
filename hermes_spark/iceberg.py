"""IcebergTable — the cluster-side twin of ``ParquetMergeTable``.

Same call surface (``read`` / ``merge`` / ``overwrite`` / ``compact`` /
``committed_batch_ids``), backed by a real Iceberg catalog: MERGE is a
single ``MERGE INTO`` statement (row-level merge-on-read, the protocol
``ParquetMergeTable`` emulates over plain parquet), idempotency rides
Iceberg snapshot summary properties (one ``hermes.batch-id`` entry per
commit, read back from the ``.snapshots`` metadata table), and
compaction is the catalog's ``rewrite_data_files`` procedure.

The sandbox image has no ``iceberg-spark-runtime`` jar, so the
constructor gates on the catalog actually being configured and raises
with setup guidance otherwise — engine code selects the table class by
probing this (never by branching mid-operator).  The MERGE statement
generator is pure string logic and is unit-tested jar-free; the
catalog-dependent calls are exercised only on a real cluster.

Reference anchors: the sync-ack producer + write-if-changed cache
(/root/reference/server/hermesserver.py:697-724,
lib/datamodel/serialization.py:373-510) — the same exactly-once
contract ParquetMergeTable implements locally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def merge_sql(
    identifier: str,
    view: str,
    key: Sequence[str],
    columns: Sequence[str],
    op_col: str = "op",
) -> str:
    """The one-statement MERGE that applies a classified change batch:
    deletes drop the key, updates/inserts upsert the payload.  Pure
    string generation — unit-testable without an Iceberg runtime."""
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in key)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns)
    ins_cols = ", ".join(columns)
    ins_vals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {identifier} t USING {view} s ON {on} "
        f"WHEN MATCHED AND s.{op_col} = 'delete' THEN DELETE "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED AND s.{op_col} != 'delete' "
        f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


class IcebergTable:
    """Keyed Iceberg target with batch-id-idempotent MERGE (the
    ``ParquetMergeTable`` contract on a real catalog)."""

    BATCH_PROP = "hermes.batch-id"

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,          # catalog.db.table
        key: Sequence[str],
        schema: T.StructType,
    ) -> None:
        self.spark = spark
        self.identifier = identifier
        self.key = list(key)
        self.schema = schema
        catalog = identifier.split(".", 1)[0]
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured "
                f"(spark.sql.catalog.{catalog} unset — add the "
                "iceberg-spark-runtime jar and catalog conf, or use "
                "ParquetMergeTable locally)"
            )

    # -- reads ---------------------------------------------------------

    def read(self, op_col: str | None = "op",
             columns: Sequence[str] | None = None) -> DataFrame:
        df = self.spark.read.table(self.identifier)
        if columns is not None:
            df = df.select(*columns)
        return df

    def committed_batch_ids(self) -> set:
        rows = self.spark.sql(
            f"SELECT summary['{self.BATCH_PROP}'] AS b "
            f"FROM {self.identifier}.snapshots"
        ).collect()
        return {int(r.b) for r in rows if r.b is not None}

    # -- writes --------------------------------------------------------

    def _with_commit_prop(self, batch_id, fn):
        """Stamp the batch id into the Iceberg snapshot summary so a
        replayed micro-batch is detectable (exactly-once)."""
        jvm = self.spark._jvm
        cm = jvm.org.apache.iceberg.spark.CommitMetadata
        cls = self.spark._sc._gateway.jvm.java.util.concurrent.Callable
        # CommitMetadata.withCommitProperties(map, callable, klass)
        props = jvm.java.util.Collections.singletonMap(
            self.BATCH_PROP, str(batch_id)
        )

        class _Call:
            def call(_self):
                fn()

            class Java:
                implements = ["java.util.concurrent.Callable"]

        cm.withCommitProperties(props, _Call(), cls)

    def merge(self, changes: DataFrame, batch_id: int | str | None = None,
              op_col: str = "op") -> int | None:
        if batch_id is not None and batch_id in self.committed_batch_ids():
            return None  # replay no-op
        cols = [f.name for f in self.schema.fields]
        view = f"_hermes_changes_{abs(hash((self.identifier, batch_id)))%10**8}"
        changes.createOrReplaceTempView(view)
        stmt = merge_sql(self.identifier, view, self.key, cols, op_col)
        run = lambda: self.spark.sql(stmt)  # noqa: E731
        if batch_id is not None:
            self._with_commit_prop(batch_id, run)
        else:
            run()
        return batch_id

    def overwrite(self, df: DataFrame, batch_id=None) -> None:
        df.select([f.name for f in self.schema.fields]).writeTo(
            self.identifier
        ).overwritePartitions()

    def compact(self) -> None:
        catalog = self.identifier.split(".", 1)[0]
        self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files(table => "
            f"'{self.identifier.split('.', 1)[1]}')"
        )

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.identifier}")
