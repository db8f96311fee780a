"""Change-event (de)serialization and schema-change events.

F5 analog: the reference serializes events as JSON with typed markers
``HermesDatetime(...)``/``HermesBytes(...)``
(/root/reference/lib/datamodel/serialization.py:75-89) because its bus
is stringly-typed; Spark has real types, so events round-trip through
``to_json``/``from_json`` with a proper schema — no markers.

Dataschema events: the reference diffs its schema registry against the
cached one each cycle and publishes a ``dataschema`` event before data
events (server/hermesserver.py:340-463, dataschema.py:288-304).  Spark
analog: ``diff_schemas`` classifies added/removed/retyped columns; the
sink evolves the target by adding nullable columns (removals are kept
as dead columns — Iceberg-style non-breaking evolution).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermes_spark.schema import CHANGE_EVENT_SCHEMA


def event_to_json(df: DataFrame, out: str = "value") -> DataFrame:
    """Serialize change events to one JSON string column (bus wire
    format); key column = the pkey struct (bus partition key)."""
    return df.select(
        F.to_json(F.struct("conv_id", "turn_idx")).alias("key"),
        F.to_json(F.struct(*[F.col(f.name) for f in CHANGE_EVENT_SCHEMA.fields])).alias(out),
    )


def event_from_json(df: DataFrame, col: str = "value") -> DataFrame:
    return df.select(
        F.from_json(F.col(col), CHANGE_EVENT_SCHEMA).alias("e")
    ).select("e.*")


@dataclass
class SchemaDiff:
    added: list[str]
    removed: list[str]
    retyped: list[tuple[str, str, str]]  # (name, old_type, new_type)

    @property
    def empty(self) -> bool:
        return not (self.added or self.removed or self.retyped)


def diff_schemas(old: T.StructType, new: T.StructType) -> SchemaDiff:
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    return SchemaDiff(
        added=sorted(set(n) - set(o)),
        removed=sorted(set(o) - set(n)),
        retyped=sorted(
            (c, o[c], n[c]) for c in set(o) & set(n) if o[c] != n[c]
        ),
    )


def evolve_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """Non-breaking evolution: keep all old fields, append new ones as
    nullable (removed source columns stay, they just go NULL — the
    reference instead emits attr-removal events; both preserve replay)."""
    names = {f.name for f in old.fields}
    fields = list(old.fields)
    for f in new.fields:
        if f.name not in names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def dataschema_event(diff: SchemaDiff) -> Column:
    """The 'dataschema' bus event payload (eventtype 'dataschema',
    event.py:35) as a JSON column literal."""
    import json

    return F.lit(
        json.dumps(
            {
                "eventtype": "dataschema",
                "added": diff.added,
                "removed": diff.removed,
                "retyped": [list(t) for t in diff.retyped],
            }
        )
    )
