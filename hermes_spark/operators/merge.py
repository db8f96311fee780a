"""Multi-source merge with pkey constraints and conflict quarantine.

Reference: ``DataObjectList.mergeWith`` folds source B into the
accumulated snapshot A keyed by pkey under one of four constraints
(/root/reference/lib/datamodel/dataobjectlist.py:217-292), with
attr-level conflict detection in ``DataObject.mergeWith``
(dataobject.py:327-344) and a quarantine/substitute-cached policy
(dataobjectlist.py:265-274, 332-352); driver loop
server/datamodel.py:620-637.

Spark restatement: each constraint is exactly one join type —

    noConstraint     → full_outer + per-attr coalesce
    mustNotExist     → A ∪ (B anti-join A)          (collisions dropped)
    mustAlreadyExist → A left_outer B               (B-only rows dropped)
    mustExistInBoth  → inner

Attr-level conflict (same attr non-null and different on both sides) is
a column predicate, evaluated inside the same join stage.  The small
side should be broadcast by AQE automatically; at cluster scale, merge
order follows the config like the reference, but each fold is a
shuffle-on-pkey hash join instead of a Python dict walk.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NO_CONSTRAINT = "noConstraint"
MUST_NOT_EXIST = "mustNotExist"
MUST_ALREADY_EXIST = "mustAlreadyExist"
MUST_EXIST_IN_BOTH = "mustExistInBoth"


@dataclass
class MergeResult:
    merged: DataFrame
    conflicts: DataFrame  # key rows with conflicting attr values (quarantine)


def merge_sources(
    a: DataFrame,
    b: DataFrame,
    key: Sequence[str],
    constraint: str = NO_CONSTRAINT,
    conflict_policy: str = "keep_first_value",
) -> MergeResult:
    """Merge source B into A by pkey under a pkey_merge_constraint.

    Column union: attrs present in both sides take A's value first
    (``keep_first_value``, the reference default when no conflict) via
    coalesce; attrs unique to one side pass through.  ``conflicts``
    returns the keys where both sides have a non-null, different value
    for a shared attr (reference quarantines these,
    dataobjectlist.py:265-274); with policy ``keep_first_value`` they
    stay in ``merged`` with A's value, with ``quarantine`` they are
    anti-joined out of ``merged`` (caller may substitute cached rows —
    replaceInconsistenciesByCachedValues, server/datamodel.py:643-645).
    """
    key = list(key)
    shared = [c for c in a.columns if c in b.columns and c not in key]
    only_a = [c for c in a.columns if c not in b.columns and c not in key]
    only_b = [c for c in b.columns if c not in a.columns and c not in key]

    aa, bb = a.alias("a"), b.alias("b")
    cond = [aa[k].eqNullSafe(bb[k]) for k in key]

    if constraint == MUST_NOT_EXIST:
        # A wins; colliding B rows are dropped entirely.
        b_new = bb.join(aa.select(*[aa[k] for k in key]), cond, "left_anti")
        merged = a.unionByName(b_new, allowMissingColumns=True)
        empty_conf = a.select(*key).limit(0)
        return MergeResult(merged, empty_conf)

    how = {
        NO_CONSTRAINT: "full_outer",
        MUST_ALREADY_EXIST: "left_outer",
        MUST_EXIST_IN_BOTH: "inner",
    }[constraint]

    j = aa.join(bb, cond, how)

    conflict_pred = F.lit(False)
    for c in shared:
        conflict_pred = conflict_pred | (
            aa[c].isNotNull() & bb[c].isNotNull() & (aa[c] != bb[c])
        )

    out = [F.coalesce(aa[k], bb[k]).alias(k) for k in key]
    out += [F.coalesce(aa[c], bb[c]).alias(c) for c in shared]
    out += [aa[c].alias(c) for c in only_a]
    out += [bb[c].alias(c) for c in only_b]
    out.append(conflict_pred.alias("_conflict"))

    all_rows = j.select(*out)
    conflicts = all_rows.where(F.col("_conflict")).select(*key)
    if conflict_policy == "quarantine":
        merged = all_rows.where(~F.col("_conflict")).drop("_conflict")
    else:
        merged = all_rows.drop("_conflict")
    return MergeResult(merged, conflicts)


def substitute_cached(
    merged: DataFrame,
    conflicts: DataFrame,
    cache: DataFrame,
    key: Sequence[str],
) -> DataFrame:
    """``replaceInconsistenciesByCachedValues`` (reference
    lib/datamodel/dataobjectlist.py:332-352, applied at
    server/datamodel.py:643-645): every key quarantined for merge
    conflict / duplicate inconsistency is replaced by its CACHED row
    when one exists; conflicted keys absent from the cache stay
    dropped.  Two pkey joins (anti + semi) — broadcast-able when the
    conflict set is small, which it is by construction (conflicts are
    the pathological minority)."""
    key = list(key)
    clean = merged.join(conflicts, key, "left_anti")
    subs = cache.join(conflicts, key, "left_semi")
    return clean.unionByName(subs.select(*merged.columns))
