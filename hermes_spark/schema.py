"""Schemas and the (tiny) schema registry.

The reference keeps a runtime ``Dataschema`` registry per type with a
primary key (str or tuple), event-visible vs cache-only vs local
attribute sets, and FK declarations
(/root/reference/lib/datamodel/dataschema.py:41-324).  Here the engine
is typed: a fixed StructType per table plus a `TableSpec` carrying the
key columns, the diff-relevant ("event-visible") columns and FK edges.
Catalyst needs the fixed schema for pruning/pushdown; the registry
drives which columns participate in checksums and MERGE conditions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- the primary engine input (BASELINE.json input_hint) -------------------

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Change events mirror the reference Event
# (/root/reference/lib/datamodel/event.py:32-201): eventtype->op,
# objpkey->(conv_id, turn_idx), objattrs->payload columns, plus the
# bus-assigned offset/timestamp which in Spark is the micro-batch id +
# event time.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),  # insert|update|delete
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("cksum", T.StringType(), True),
    ]
)


@dataclass(frozen=True)
class TableSpec:
    """Per-table metadata: key + column scoping.

    event_visible: columns participating in diff checksums and change
    events (reference excludes LOCAL/CACHEONLY/internal attrs from
    equality, dataobject.py:228-247).
    """

    name: str
    key: tuple[str, ...]
    event_visible: tuple[str, ...]
    cache_only: tuple[str, ...] = ()
    local_only: tuple[str, ...] = ()
    foreign_keys: dict[str, tuple[str, str]] = field(default_factory=dict)
    # attr -> (parent_table, parent_key_col)


TRANSCRIPTS = TableSpec(
    name="transcripts",
    key=("conv_id", "turn_idx"),
    event_visible=("role", "text", "tool"),
)
