"""Trashbin: soft delete with retention expiry (W4) and recycle.

Reference: removed objects move to a per-type ``trashbin_<type>`` list
stamped ``_trashbin_timestamp``; a purge pass deletes entries older
than the retention window (/root/reference/clients/__init__.py:757-813);
a re-added key is *recycled* out of the trashbin
(clients/__init__.py:1061-1089); point lookups consult cache then
trashbin (clients/datamodel.py:865-878).

Spark restatement: the trashbin is a column (`deleted_ts`) on the
target table rather than a separate store — soft delete = MERGE setting
`deleted_ts`, recycle = MERGE nulling it, purge = `deleted_ts <
retention cutoff` delete, live view = `deleted_ts IS NULL`.  One table,
partition-pruned by the same key layout as the live data, so the purge
at scale is a metadata-cheap filter, not a second dataset to shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_soft_deletes(
    target: DataFrame,
    changes: DataFrame,
    key: Sequence[str],
    op_col: str = "op",
    ts_col: str = "ts",
    deleted_col: str = "deleted_ts",
) -> DataFrame:
    """Apply a change batch with delete-as-trash semantics.

    insert/update rows land live (deleted_ts NULL) — an insert on a
    trashed key recycles it; delete rows stamp deleted_ts instead of
    removing the row.
    """
    key = list(key)
    if deleted_col not in target.columns:
        target = target.withColumn(deleted_col, F.lit(None).cast("timestamp"))

    # rename the change side wholesale — robust when target's lineage
    # already contains the change DataFrame (iterated application)
    ch = changes.select([F.col(c).alias(f"__c_{c}") for c in changes.columns])

    def cc(c: str) -> Column:
        return F.col(f"__c_{c}")

    cond = [F.col(k).eqNullSafe(cc(k)) for k in key]

    data_cols = [c for c in target.columns if c not in key and c != deleted_col]
    j = target.join(ch, cond, "full_outer")

    has_change = cc(op_col).isNotNull()
    is_delete = cc(op_col) == "delete"

    out = [F.coalesce(F.col(k), cc(k)).alias(k) for k in key]
    for c in data_cols:
        src = cc(c) if c in changes.columns else F.lit(None)
        out.append(F.when(has_change & ~is_delete, src).otherwise(F.col(c)).alias(c))
    out.append(
        F.when(has_change & is_delete, cc(ts_col))
        .when(has_change & ~is_delete, F.lit(None).cast("timestamp"))  # recycle
        .otherwise(F.col(deleted_col))
        .alias(deleted_col)
    )
    return j.select(*out)


def live_view(target: DataFrame, deleted_col: str = "deleted_ts") -> DataFrame:
    return target.where(F.col(deleted_col).isNull())


def trashbin_view(target: DataFrame, deleted_col: str = "deleted_ts") -> DataFrame:
    return target.where(F.col(deleted_col).isNotNull())


def purge_expired(
    target: DataFrame,
    retention_cutoff: Column,
    deleted_col: str = "deleted_ts",
) -> DataFrame:
    """Drop trashed rows whose deletion timestamp predates the cutoff."""
    return target.where(
        F.col(deleted_col).isNull() | (F.col(deleted_col) >= retention_cutoff)
    )
