"""Duplicate-pkey quarantine (A2).

Reference: appending a duplicate pkey drops *both* copies into an
``_inconsistencies`` set — neither survives
(/root/reference/lib/datamodel/dataobjectlist.py:161-192).

Spark restatement: groupBy(key).count() > 1 → quarantined keys;
survivors = anti-join.  The count aggregate gets a map-side partial
combine for free, so the shuffle carries one (key, partial_count) per
key per map task, not one row per duplicate — at 100 TB the dedup scan
cost is dominated by the key projection, which column-prunes down to
the key columns only.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class QuarantineResult:
    clean: DataFrame        # rows whose key occurs exactly once
    quarantined: DataFrame  # (key..., dup_count) for keys occurring 2+


def dedup_quarantine(df: DataFrame, key: Sequence[str]) -> QuarantineResult:
    key = list(key)
    counts = df.groupBy(*key).agg(F.count(F.lit(1)).cast("long").alias("dup_count"))
    quarantined = counts.where(F.col("dup_count") > 1)
    clean = df.join(quarantined.select(*key), key, "left_anti")
    return QuarantineResult(clean, quarantined)
