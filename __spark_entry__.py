"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md
§2 (plus the training-pipeline extras) against the driver's parquet
testdata; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.
Column names and value types are aligned pair-by-pair (aggregates go
through DECIMAL so float sums are engine-order-independent; timestamps
are compared as epoch micros).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEP = "\x1f"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table, normalizing any TIMESTAMP_NTZ column to
    TIMESTAMP so every query below is session-config-independent (the
    driver's default session infers parquet naive timestamps as NTZ,
    which `unix_micros`/`F.window` reject)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    casts = [
        F.col(f.name).cast("timestamp").alias(f.name)
        if f.dataType.typeName() == "timestamp_ntz"
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(casts)


def _wide(df: DataFrame) -> DataFrame:
    """Scan-parallelism guard for compute-heavy map stages (guide §6):
    the testdata tables are single-digit-MB single-row-group parquet
    files, so Spark plans 1-6 scan tasks and every scan-side expression
    (sha256 checksums, decimal casts, partial aggregates) runs on a
    fraction of the cores.  Round-robin repartition to the default
    parallelism — conditional, so at real scale (wide scans) it is a
    no-op and costs nothing.  Only used by queries whose results are
    order-independent (exact decimal/count aggregates, deterministic
    windows, joins)."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df


# ---------------------------------------------------------------------------
# CDC / engine operators (SURVEY.md §2)
# ---------------------------------------------------------------------------

def q_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 snapshot diff: two deterministic snapshots derived from
    orders → insert/update/delete classification."""
    from hermes_spark.operators.diff import snapshot_diff

    # _wide: both snapshot sides derive from this scan; the per-row
    # sha256 checksum otherwise runs on the file's 2 row-group tasks
    orders = _wide(_t(spark, sf_dir, "orders"))
    old = orders.where(F.col("o_orderkey") % 10 != 7).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 3, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    new = orders.where(F.col("o_orderkey") % 10 != 4)
    d = snapshot_diff(
        new, old, key=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )
    return d.select("o_orderkey", "op")


def q_merkle_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 deep-hash analog: per-user merkle digest over sorted
    (event_id, sha256(event_type)) leaves."""
    # _wide: per-row sha256 + per-user collect otherwise run on the
    # single-row-group file's one scan task
    ev = _wide(_t(spark, sf_dir, "events"))
    leaf = F.concat_ws(
        ":", F.format_string("%010d", F.col("event_id")), F.sha2(F.col("event_type"), 256)
    )
    return (
        ev.select(F.col("user_id"), leaf.alias("leaf"))
        .groupBy("user_id")
        .agg(
            F.sha2(F.concat_ws(SEP, F.sort_array(F.collect_list("leaf"))), 256).alias(
                "merkle"
            ),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def q_dedup_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 duplicate-pkey quarantine on a deliberately colliding key."""
    from hermes_spark.operators.quarantine import dedup_quarantine

    orders = _t(spark, sf_dir, "orders").withColumn(
        "dup_key", F.col("o_orderkey") % 14000
    )
    return dedup_quarantine(orders, ["dup_key"]).quarantined


def q_merge_must_exist_in_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 multi-source merge, mustExistInBoth + keep_first_value."""
    from hermes_spark.operators.merge import MUST_EXIST_IN_BOTH, merge_sources

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    fromorders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("o_cnt"),
            F.max("o_totalprice").alias("c_acctbal"),  # conflicting shared attr
        )
    )
    r = merge_sources(cust, fromorders, key=["c_custkey"], constraint=MUST_EXIST_IN_BOTH)
    return r.merged.select("c_custkey", "c_name", "c_acctbal", "o_cnt")


def q_merge_must_not_exist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 mustNotExist: colliding source-B rows dropped wholesale."""
    from hermes_spark.operators.merge import MUST_NOT_EXIST, merge_sources

    cust = _t(spark, sf_dir, "customer")
    a = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", F.concat(F.lit("A:"), F.col("c_name")).alias("src_name")
    )
    b = cust.select(
        "c_custkey", F.concat(F.lit("B:"), F.col("c_name")).alias("src_name")
    )
    r = merge_sources(a, b, key=["c_custkey"], constraint=MUST_NOT_EXIST)
    return r.merged.select("c_custkey", "src_name")


def q_integrity_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 integrity constraints as a topological semi-join cascade:
    withhold 10% of customers → prune their orders → prune lineitems."""
    from hermes_spark.operators.integrity import cascade_fk_filter

    tables = {
        "customer": _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 != 0),
        "orders": _t(spark, sf_dir, "orders"),
        "lineitem": _t(spark, sf_dir, "lineitem"),
    }
    filtered = cascade_fk_filter(
        tables,
        [
            ("orders", "customer", [("o_custkey", "c_custkey")]),
            ("lineitem", "orders", [("l_orderkey", "o_orderkey")]),
        ],
    )
    return (
        filtered["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("sum_qty_x100"),
        )
    )


def q_oldest_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 error-queue head-of-line: oldest event per key by offset."""
    from hermes_spark.operators.ordering import oldest_event_per_key

    ev = _t(spark, sf_dir, "events")
    return oldest_event_per_key(ev, ["user_id"], order_col="event_id").select(
        "user_id", "event_id", "event_type"
    )


def q_compact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autoremediation truth table: compact each key's event run to at
    most one effective event (first/last-op classification)."""
    from hermes_spark.operators.compaction import compact_events

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id"),
        F.when(F.col("event_type") == "click", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .otherwise("update")
        .alias("op"),
    )
    out = compact_events(ev, ["user_id"], op_col="op", offset_col="event_id")
    return out.select("user_id", F.col("event_id").alias("last_offset"), "op")


def q_compact_events_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level event merge (_mergeEvents, reference
    clients/errorqueue.py:187-417): deterministic 2-event runs derived
    from `events` cover all five pair types (added+modified,
    added+removed annihilation, removed+added diff-vs-cache,
    modified+modified field merge, modified+removed); map payloads are
    canonicalized to sorted k=v strings for the oracle."""
    from pyspark.sql import Window

    from hermes_spark.operators.eventmerge import compact_events_map

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    e2 = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    cnt = e2.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).where("n = 2")
    e2 = e2.join(cnt.select("user_id"), "user_id")

    kind = F.col("user_id") % 5
    first = F.col("rn") == 1
    et = F.col("event_type")
    val = (F.col("event_id") % 97).cast("string")
    even = (F.col("event_id") % 2) == 0
    emap = F.expr("cast(map() as map<string,string>)")

    op = (
        F.when(kind == 0, F.when(first, F.lit("added")).otherwise(F.lit("modified")))
        .when(kind == 1, F.when(first, F.lit("added")).otherwise(F.lit("removed")))
        .when(kind == 2, F.when(first, F.lit("removed")).otherwise(F.lit("added")))
        .when(kind == 3, F.lit("modified"))
        .otherwise(F.when(first, F.lit("modified")).otherwise(F.lit("removed")))
    )
    is_added = op == "added"
    is_mod = op == "modified"
    attrs = F.when(is_added, F.create_map(F.lit("a"), et, F.lit("b"), val)).otherwise(emap)
    added_m = F.when(is_mod & even, F.create_map(F.lit("c"), et)).otherwise(emap)
    mod_m = (
        F.when(is_mod & even, F.create_map(F.lit("b"), val))
        .when(is_mod, F.create_map(F.lit("b"), val, F.lit("c"), val))
        .otherwise(emap)
    )
    rem_m = F.when(is_mod & ~even, F.create_map(F.lit("a"), F.lit("x"))).otherwise(emap)

    events_df = e2.select(
        F.col("user_id").alias("k"),
        F.col("rn").cast("long").alias("offset"),
        op.alias("op"),
        attrs.alias("attrs"),
        added_m.alias("added"),
        mod_m.alias("modified"),
        rem_m.alias("removed"),
    )
    prior = cnt.select(
        F.col("user_id").alias("k"),
        F.when(
            F.col("user_id") % 2 == 0,
            F.create_map(F.lit("a"), F.lit("p"),
                         F.lit("b"), (F.col("user_id") % 7).cast("string")),
        ).otherwise(
            F.create_map(F.lit("b"), (F.col("user_id") % 7).cast("string"))
        ).alias("attrs"),
    )
    out = compact_events_map(events_df, key=["k"], prior=prior)

    def canon(c: str):
        return F.array_join(
            F.transform(
                F.array_sort(F.map_entries(F.col(c))),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            "|",
        ).alias(c + "_s")

    return out.select(
        "k", "op", canon("attrs"), canon("added"), canon("modified"), canon("removed")
    )


def q_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One remote change event → N local-type events
    (convertEventToLocal, reference clients/datamodel.py:497-621):
    synthetic change events over customer fan out to two local types
    with their own attr mappings; empty-payload events are dropped
    except deletes."""
    from hermes_spark.plans.mapping import LocalTypeSpec, fanout_events

    c = _t(spark, sf_dir, "customer")
    ev = c.select(
        F.col("c_custkey").alias("uid"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
        F.col("c_name").alias("login"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("u"), (F.col("c_custkey") % 100).cast("string")))
        .alias("mail"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment")).alias("building"),
    )
    out = fanout_events(
        ev,
        [
            LocalTypeSpec("account", {"v1": "login", "v2": "mail"}),
            LocalTypeSpec(
                "badge",
                {"v1": {"expr": "concat(building, ':', login)"}, "v2": "building"},
            ),
        ],
        key_cols=["uid"],
        passthrough=(),
    )
    acc = out["account"].select(F.lit("account").alias("ltype"), "uid", "op", "v1", "v2")
    badge = out["badge"].select(F.lit("badge").alias("ltype"), "uid", "op", "v1", "v2")
    return acc.unionByName(badge)


def q_fanout_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial ``modified`` events re-rendered against the FULL cached
    object, each rendered attr re-classified vs the cached local row
    (the reference's modified-event path: clients/datamodel.py:550-596,
    clients/__init__.py:983-994).  Events carry an attr SUBSET; the
    multi-var badge template references attrs the event did not send,
    which must render from cache — and events whose re-render changes
    nothing for a local type are dropped for that type."""
    from hermes_spark.plans.mapping import LocalTypeSpec, fanout_events

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cache = c.select(
        k.alias("uid"),
        F.col("c_name").alias("login"),
        F.concat(F.lit("m"), (k % 50).cast("string")).alias("mail"),
        F.col("c_mktsegment").alias("building"),
    )
    ev = c.select(
        k.alias("uid"),
        F.when(k % 13 == 0, F.lit("delete"))
        .when(k % 11 == 0, F.lit("insert"))
        .otherwise(F.lit("update")).alias("op"),
        F.when(k % 3 == 2, F.concat(F.lit("L"), (k % 9).cast("string")))
        .alias("login"),
        F.when(
            k % 3 == 0,
            F.when(k % 5 == 0, F.concat(F.lit("m"), (k % 50).cast("string")))
            .otherwise(F.concat(F.lit("x"), (k % 7).cast("string"))),
        ).alias("mail"),
        F.when(k % 3 == 1, F.concat(F.lit("BB"), (k % 4).cast("string")))
        .alias("building"),
    )
    out = fanout_events(
        ev,
        [
            LocalTypeSpec("account", {"v1": "login", "v2": "mail"}),
            LocalTypeSpec(
                "badge",
                {"v1": {"expr": "building || ':' || login"}, "v2": "building"},
            ),
        ],
        key_cols=["uid"],
        passthrough=(),
        cache=cache,
    )

    def shape(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("ltype"), "uid", "op", "v1", "v2",
            F.array_join("attrs_added", ",").alias("ch_a"),
            F.array_join("attrs_modified", ",").alias("ch_m"),
            F.array_join("attrs_removed", ",").alias("ch_r"),
        )

    return shape("account", out["account"]).unionByName(shape("badge", out["badge"]))


def q_merge_substitute_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantined merge conflicts replaced by cached rows
    (replaceInconsistenciesByCachedValues,
    reference lib/datamodel/dataobjectlist.py:332-352)."""
    from hermes_spark.operators.merge import (
        MUST_EXIST_IN_BOTH,
        merge_sources,
        substitute_cached,
    )

    c = _t(spark, sf_dir, "customer")
    a = c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("v"),
                 F.col("c_mktsegment").alias("seg"))
    b = c.select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("CONFLICT"))
        .otherwise(F.col("c_name")).alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    cache = c.where(F.col("c_custkey") % 14 == 0).select(
        F.col("c_custkey").alias("id"),
        F.concat(F.lit("cached:"), F.col("c_name")).alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    res = merge_sources(a, b, ["id"], MUST_EXIST_IN_BOTH, conflict_policy="quarantine")
    return substitute_cached(res.merged, res.conflicts, cache, ["id"])


def q_trashbin_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 trashbin purge: soft-deleted rows expire past retention."""
    from hermes_spark.operators.trashbin import purge_expired

    orders = _t(spark, sf_dir, "orders").withColumn(
        "deleted_ts",
        F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate")),
    )
    kept = purge_expired(orders, F.lit("1995-06-01").cast("timestamp"))
    return kept.select("o_orderkey", F.col("deleted_ts").isNotNull().alias("trashed"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (batch gap-based form) over the events stream."""
    from hermes_spark.operators.windows import sessionize_batch

    # (_wide measured slower here: the session window re-shuffles by
    # user_id anyway and the scan-side work is trivial)
    ev = _t(spark, sf_dir, "events")
    s = sessionize_batch(ev, key="user_id", ts_col="ts", gap_seconds=1800)
    return s.select(
        "user_id",
        "session_id",
        "n_events",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
    )


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/tumbling window aggregate (F.window, 1 hour)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
            .cast("long")
            .alias("v_x1e6"),
        )
        .select(F.unix_micros(F.col("w.start")).alias("hour_us"), "event_type", "n", "v_x1e6")
    )


def q_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window aggregate (F.window, 1 hour / slide 30 min) —
    each event lands in exactly two overlapping windows; the oracle
    enumerates Spark's epoch-aligned window starts arithmetically."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
            .cast("long")
            .alias("v_x1e6"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_us"), "event_type", "n", "v_x1e6"
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 correlation analog on events: first purchase within 1h after
    each click, per user (the tool-call↔response pattern)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("b_ts"),
    )
    j = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") > F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    return (
        j.groupBy("user_id", "click_id", "c_ts")
        .agg(F.min_by(F.struct("b_ts", "purchase_id"), F.struct("b_ts", "purchase_id")).alias("f"))
        .select(
            "user_id",
            "click_id",
            F.col("f.purchase_id").alias("purchase_id"),
            (F.unix_micros("f.b_ts") - F.unix_micros("c_ts")).alias("latency_us"),
        )
    )


def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle reconciliation: digest-compare two derived snapshots of
    events (per user_id) and localize divergence."""
    from hermes_spark.operators.reconcile import reconcile

    # _wide: per-row sha256 digests on both compared sides otherwise
    # run on the single-row-group file's one scan task
    ev = _wide(_t(spark, sf_dir, "events")).select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("text"),
    )
    # target: drop users %7==0, corrupt event_type of events %11==0
    tgt = ev.where(F.col("conv_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("turn_idx") % 11 == 0, F.concat(F.col("text"), F.lit("_x")))
        .otherwise(F.col("text")),
    )
    return reconcile(ev, tgt).select(
        F.col("conv_id").cast("long").alias("user_id"), "status",
        "src_n_turns", "tgt_n_turns",
    )


def q_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregate (engine breadth: grouping sets; NULL = total)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
            .cast("long")
            .alias("v_x1e6"),
        )
    )


def q_orphan_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential orphans via anti-join (O2 set-difference): orders
    whose customer was withheld."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 != 0)
    orders = _t(spark, sf_dir, "orders")
    from hermes_spark.operators.integrity import fk_filter

    orphans = fk_filter(orders, cust, [("o_custkey", "c_custkey")], keep_if_exists=False)
    return orphans.select("o_orderkey", "o_custkey")


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment (rank window)."""
    from pyspark.sql import Window as W

    o = _wide(_t(spark, sf_dir, "orders"))
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (decimal-exact aggregates)."""
    # _wide AFTER the pushed-down date filter: the decimal casts and
    # partial aggregation otherwise run on the file's 6 row-group tasks
    li = _wide(
        _t(spark, sf_dir, "lineitem").where(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(13,2)")
    factor = (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty) * 100).cast("long").alias("sum_qty_x100"),
            (F.sum(price) * 100).cast("long").alias("sum_base_price_x100"),
            (F.sum(price * factor) * 100_000_000)
            .cast("long")
            .alias("sum_disc_price_x1e8"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dims: revenue per region/nation."""
    # _wide: with broadcast dims the whole join+agg pipeline runs
    # scan-side — 6 row-group tasks without the spread.  orders gets a
    # deliberate SHUFFLE_HASH (guide §3.1): the planner's size estimate
    # auto-broadcast a 1.5M-row build side whose construction cost ~2 s
    # (measured A/B: broadcast 4.9 s, shuffle-hash 2.5 s, sort-merge
    # 3.0 s at sf1.0); a shuffled hash join also stays the right
    # strategy when orders outgrows any broadcast threshold.
    li = _wide(_t(spark, sf_dir, "lineitem"))
    o = _t(spark, sf_dir, "orders").hint("shuffle_hash")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    price = F.col("l_extendedprice").cast("decimal(13,2)")
    factor = (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,6)")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("r_name", "n_name").agg(
        (F.sum(price * factor) * 100_000_000).cast("long").alias("revenue_x1e8"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Training-pipeline extras: dedup / text / similarity
# ---------------------------------------------------------------------------

def _docs_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ an exact copy at doc_id+10000 (dedup fixture)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(d.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hermes_spark.functions.dedup import exact_dedup

    return exact_dedup(_docs_with_copies(spark, sf_dir)).select("doc_id", "n_copies")


MAX_DOC_FREQ = 64  # boilerplate-shingle guard: docs sharing a shingle
                   # join pairwise, so an unguarded shingle in m docs
                   # costs m² rows — quadratic at corpus scale


def _docs_plus_noisy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    noisy = d.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail")).alias("text"),
    )
    return d.unionByName(noisy)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs over documents + noisy
    copies (text || ' extra tail'), threshold 0.8, with the
    max-doc-freq boilerplate guard (the injected ' extra tail' shingles
    appear in every noisy doc — exactly the hot-shingle quadratic
    blowup the guard exists for)."""
    from hermes_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_plus_noisy(spark, sf_dir), threshold=0.8, max_doc_freq=MAX_DOC_FREQ
    ).select("doc_a", "doc_b", "jaccard")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hermes_spark.functions.text import lang_id

    # _wide: the marker-scoring expressions run scan-side
    return _wide(_t(spark, sf_dir, "documents")).select(
        "doc_id", lang_id("text").alias("lang_pred")
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hermes_spark.functions.text import quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_features(d).select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "distinct_ratio",
        "stopword_hits",
        "avg_token_len",
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hermes_spark.functions.text import token_count

    return _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hermes_spark.functions.text import normalized_fingerprint

    return _t(spark, sf_dir, "documents").select(
        "doc_id", normalized_fingerprint("text").alias("fp")
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 1-in-50 query vectors."""
    from hermes_spark.functions.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "rank", "neighbor_id"
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH graded against the exact Jaccard oracle: the
    verified LSH pairs must be a subset of the exact ≥0.8 pair set
    (zero false positives — verification computes exact Jaccard on
    candidates) and must recover ≥95% of it (banded-signature recall,
    8 bands × 8 rows ⇒ ~0.92 per-pair candidate probability at J=0.85,
    ~0.999 at J=0.95).  One deterministic verdict row the DuckDB
    oracle reproduces from the exact pair set alone."""
    from hermes_spark.functions.dedup import minhash_dedup_pairs, ngram_jaccard_pairs

    both = _docs_plus_noisy(spark, sf_dir)
    on = ["doc_a", "doc_b"]
    lsh = minhash_dedup_pairs(
        both, verify_threshold=0.8, max_doc_freq=MAX_DOC_FREQ
    ).select(*on)
    exact = ngram_jaccard_pairs(
        both, threshold=0.8, max_doc_freq=MAX_DOC_FREQ
    ).select(*on)
    missed = exact.join(lsh, on, "left_anti")
    false_pos = lsh.join(exact, on, "left_anti")
    return (
        exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact_pairs"))
        .crossJoin(missed.agg(F.count(F.lit(1)).alias("_miss")))
        .crossJoin(false_pos.agg(F.count(F.lit(1)).alias("_fp")))
        .select(
            "n_exact_pairs",
            (F.col("_fp") == 0).alias("all_verified_pairs_exact"),
            (F.col("_miss") * 20 <= F.col("n_exact_pairs")).alias("recall_ge_95pct"),
        )
    )


def _ann_verdict(queries: DataFrame, ann: DataFrame, bf: DataFrame,
                 k: int, recall_floor_pct: int, label: str) -> DataFrame:
    on = ["query_id", "neighbor_id"]
    hits = ann.select(*on).join(bf.select(*on), on)
    return (
        queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("_hits")))
        .select(
            "n_queries",
            (F.col("_hits") * 100 >= F.col("n_queries") * k * recall_floor_pct)
            .alias(label),
        )
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN graded against in-Spark brute force with an
    aggregate recall floor.  The synthetic embeddings are isotropic
    random vectors — LSH's adversarial case (no cluster structure, so
    a true top-5 neighbor agrees with each hyperplane only ~60% of the
    time).  The 9 multi-probe buckets of 256 scan ~3.5% of vectors;
    achieved top-5 recall at sf0.01 is 10% — a ~3× lift over scanning
    a random 3.5% — and the floor (≥8%) gates that lift property.
    Both recall and the floor are deterministic (seeded planes), so a
    regression is a hash mismatch in CORRECTNESS, not a flaky test."""
    from hermes_spark.functions.similarity import brute_force_topk, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    bf = brute_force_topk(emb, queries, k=5)
    ann = lsh_topk(emb, queries, dim=64, k=5)
    return _ann_verdict(queries, ann, bf, k=5, recall_floor_pct=8,
                        label="recall_ge_8pct")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means coarse quantizer, n_probe/n_lists = 6/16 →
    ~37% of lists scanned) graded against in-Spark brute force:
    aggregate top-5 recall ≥ 60% (measured 72% at sf0.01, 84% at
    sf0.001; deterministic seeded k-means, so the verdict is stable)."""
    from hermes_spark.functions.similarity import brute_force_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    bf = brute_force_topk(emb, queries, k=5)
    ann = ivf_topk(emb, queries, dim=64, k=5, n_lists=16, n_probe=6)
    return _ann_verdict(queries, ann, bf, k=5, recall_floor_pct=60,
                        label="recall_ge_60pct")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash graded as a verdict (signature VALUES stay engine-
    specific by necessity: they are a function of Spark's xxhash64,
    which DuckDB cannot reproduce — so the oracle states the verdict
    booleans as constants, like ann_lsh/ann_ivf).  Two real checks run
    inside the measured plan:

    1. semantics — a noisy copy (text || ' extra tail') must be
       Hamming-close (≤6 of 64 bits) to its source for ≥90% of docs;
    2. losslessness — the banded retrieval (8×8-bit bands + popcount
       filter) must find EXACTLY the directly-computed Hamming-near
       true pairs (pigeonhole: hamming < bands ⇒ some band matches, so
       the band join provably loses nothing; this gates the
       implementation, computed O(n) on the (a, a+10000) pair set)."""
    from hermes_spark.functions.dedup import simhash, simhash_near_pairs

    both = _docs_plus_noisy(spark, sf_dir)
    # eager localCheckpoint: sigs feeds four plan legs (band join l/r,
    # exact-true a/b); materializing the ~8-byte-per-doc signature set
    # once replaces four copies of the explode+64-vote aggregate
    # subtree AND shrinks the 60-aggregate static plan whose compile +
    # stage scheduling dominated the cell (measured 5.8 → 3.4 s at 10×
    # scale, 3.8 → 2.4 s at sf0.01; the round-start tree measured the
    # same barrier WORSE — 21-29 s vs 15-18 s — because the enumerate
    # join it then fed dwarfed the recompute, so this flip is a
    # consequence of the id_offset pushdown above)
    sigs = simhash(both).localCheckpoint(eager=True)
    # id_offset pushes the (a, a+10000) pair restriction INTO the band
    # join as an equi-key — identical rows to the old post-filter
    # (pinned row-exact by test_round7_opts), but the join no longer
    # enumerates every band collision (∝ n²/2⁸ here) to discard them
    found = (
        simhash_near_pairs(sigs, max_hamming=6, bands=8, id_offset=10000)
        .select("doc_a", F.lit(1).alias("_f"))
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    F.col("simhash").alias("sig_a"))
    b = sigs.select((F.col("doc_id") - 10000).alias("doc_a"),
                    F.col("simhash").alias("sig_b"))
    exact_true = (
        a.join(b, "doc_a")
        .where(F.bit_count(F.expr("sig_a ^ sig_b")) <= 6)
        .select("doc_a", F.lit(1).alias("_e"))
    )
    # one full-outer join replaces the two anti-joins of the old
    # sym_diff (each leg re-evaluated the whole signature pipeline —
    # ~10 copies of the explode+64-vote aggregate in the static plan;
    # compile + stage scheduling dominated the cell wall at every SF).
    # doc_a is unique on both sides (one signature per doc, one pair
    # per offset doc), so |A△B| = rows of the full join where either
    # marker is NULL and |A| = count(_e) — pinned row-exact by
    # test_round7_opts.
    fo = exact_true.join(found, "doc_a", "full_outer")
    stats = fo.agg(
        F.sum(
            (F.col("_e").isNull() | F.col("_f").isNull()).cast("long")
        ).alias("_diff"),
        F.count("_e").alias("_near"),
    )
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(stats)
        .select(
            "n_docs",
            (F.coalesce(F.col("_diff"), F.lit(0)) == 0).alias(
                "banded_lossless_on_true_pairs"
            ),
            (F.col("_near") * 10 >= F.col("n_docs") * 9).alias(
                "noisy_copies_near_ge_90pct"
            ),
        )
    )


def q_simhash128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit SimHash — the scale path the round-4 candidate telemetry
    motivated (64-bit band candidates grow ∝ n²/2¹⁶: measured 93× at
    10× docs; 32-bit bands push that to n²/2³²).  Verdict booleans
    computed in-plan (signature values are engine-specific, like
    q_simhash):

    1. semantics — a noisy copy must be Hamming-close (≤12 of 128
       bits — the same 9% bit-fraction as the 64-bit variant's ≤6:
       per-bit flip probability is width-independent, so the expected
       distance scales with signature width) for ≥90% of docs;
    2. losslessness — 4×32-bit pigeonhole retrieval at d≤3 finds
       EXACTLY the directly-computed Hamming≤3 true pairs;
    3. scale — the 128-bit band-candidate count is strictly below the
       64-bit operator's on the same corpus (the quadratic-term fix,
       asserted on data rather than by formula)."""
    from hermes_spark.functions.dedup import (
        simhash,
        simhash128,
        simhash128_near_pairs,
        simhash_near_pairs,
    )

    both = _docs_plus_noisy(spark, sf_dir)
    # same eager-checkpoint rationale as q_simhash (sigs feeds found
    # l/r, a, b, and the c128 candidate leg — five aggregate subtrees)
    sigs = simhash128(both).localCheckpoint(eager=True)
    # same offset-as-join-key pushdown as q_simhash (row-exact pinned)
    found = (
        simhash128_near_pairs(sigs, max_hamming=3, id_offset=10000)
        .select("doc_a", F.lit(1).alias("_f"))
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    F.col("sig_hi").alias("a_hi"), F.col("sig_lo").alias("a_lo"))
    b = sigs.select((F.col("doc_id") - 10000).alias("doc_a"),
                    F.col("sig_hi").alias("b_hi"), F.col("sig_lo").alias("b_lo"))
    ham = (
        F.bit_count(F.expr("a_hi ^ b_hi")) + F.bit_count(F.expr("a_lo ^ b_lo"))
    )
    joined = a.join(b, "doc_a").withColumn("_h", ham)
    exact_true = joined.where(F.col("_h") <= 3).select(
        "doc_a", F.lit(1).alias("_e")
    )
    near6 = joined.where(F.col("_h") <= 12).select("doc_a")
    # full-outer sym-diff count, same one-pass assembly as q_simhash
    # (doc_a unique on both sides; pinned row-exact by test_round7_opts)
    fo = exact_true.join(found, "doc_a", "full_outer")
    diff_stat = fo.agg(
        F.sum(
            (F.col("_e").isNull() | F.col("_f").isNull()).cast("long")
        ).alias("_diff")
    )
    # candidate volumes: band-join pairs pre-popcount (max_hamming
    # vacuous ⇒ pure candidate set), 64- vs 128-bit on the same corpus
    c64 = simhash_near_pairs(simhash(both), max_hamming=64, bands=4)
    c128 = simhash128_near_pairs(sigs, max_hamming=128)
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(diff_stat)
        .crossJoin(near6.agg(F.count(F.lit(1)).alias("_near")))
        .crossJoin(c64.agg(F.count(F.lit(1)).alias("_c64")))
        .crossJoin(c128.agg(F.count(F.lit(1)).alias("_c128")))
        .select(
            "n_docs",
            (F.coalesce(F.col("_diff"), F.lit(0)) == 0).alias(
                "banded_lossless_on_true_pairs"
            ),
            (F.col("_near") * 10 >= F.col("n_docs") * 9).alias(
                "noisy_copies_near_ge_90pct"
            ),
            (F.col("_c128") < F.col("_c64")).alias("band_candidates_reduced"),
        )
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing with a real oracle on the checkable part:
    n_bytes is computed in the Python worker from the ACTUAL binary
    payload after the binary-column → Arrow → pandas round trip, and
    the synthetic payload length is formulaic — so the oracle verifies
    payload integrity through the multimodal path end-to-end.  The
    decode itself stays an honest declared stub (no PIL/ffmpeg in this
    sandbox); the 16-float fake features are exercised by pytest, not
    the oracle."""
    from hermes_spark.functions.multimodal import extract_features, synthetic_media

    return extract_features(synthetic_media(spark, n=64)).select(
        "media_id", "kind", "n_bytes"
    )



def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode oracle (round 6): the payloads are genuine
    WAV / BMP / PPM bytes built by the format writers, decoded in the
    Python worker by the stdlib decoders (``wave`` / hand-parsed
    headers incl. BMP row-stride padding) — and every decoded property
    (rates, dimensions, and the exact int64 sum of decoded samples /
    pixel bytes) is recomputed by DuckDB from the generation formulas
    alone.  A decoder that echoed its builder's parameters instead of
    parsing bytes would still pass the header fields but not
    ``sum_values``, which requires walking the actual content area
    (and, for BMP, skipping the 4-byte row padding)."""
    from hermes_spark.functions.multimodal import (
        decode_media,
        synthetic_decodable_media,
    )

    return decode_media(synthetic_decodable_media(spark, n=48)).select(
        "media_id", "format", "decoded", "sample_rate", "n_channels",
        "n_frames", "duration_ms", "width", "height", "n_values", "sum_values",
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize/resample oracle (round 6): images nearest-neighbor
    to 3×2 (in image orientation — the BMP bottom-up flip matters),
    audio nearest-resampled to 4 kHz.  The index maps are pure integer
    floor formulas, so DuckDB recomputes the RESIZED content sums from
    the generator formulas alone — sampling at different offsets, or
    treating a bottom-up BMP as top-down, changes ``sum_values``."""
    from hermes_spark.functions.multimodal import (
        resize_media,
        synthetic_decodable_media,
    )

    return resize_media(
        synthetic_decodable_media(spark, n=48), out_w=3, out_h=2,
        out_rate=4000,
    ).select(
        "media_id", "format", "decoded", "out_width", "out_height",
        "out_frames", "out_rate", "n_values", "sum_values",
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame-sampling oracle (round 6): one row per 5 ms tick per
    audio payload, ``sample_sum`` = channel-sum of the decoded source
    frame at ``t*rate // 1000`` — recomputed by DuckDB from the
    generation formulas."""
    from hermes_spark.functions.multimodal import (
        sample_frames,
        synthetic_decodable_media,
    )

    return sample_frames(
        synthetic_decodable_media(spark, n=48), every_ms=5
    ).select("media_id", "frame_ts_ms", "decoded", "sample_sum")


def q_merkle_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase merkle — must equal q_merkle_events
    bit-for-bit (same oracle): the salting guard for hot keys."""
    from hermes_spark.operators.checksum import salted_merkle

    ev = _wide(_t(spark, sf_dir, "events"))
    leaf = F.concat_ws(
        ":", F.format_string("%010d", F.col("event_id")), F.sha2(F.col("event_type"), 256)
    )
    return salted_merkle(ev, "user_id", leaf, n_salts=16).select(
        F.col("user_id"),
        F.col("merkle"),
        F.col("n_leaves").alias("n_events"),
    )


def q_simhash_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token doc-freq prefilter graded as a verdict (round 5; signature
    values are engine-specific like q_simhash, so the oracle states the
    booleans as constants).  Two checks run inside the measured plan:

    1. exactness — ``simhash(max_token_doc_freq=K)`` must produce
       EXACTLY the signatures of the corpus with the >K-doc-freq
       tokens physically stripped (the prefilter IS hot-token removal,
       not an approximation; K = half the corpus).  Null-safe full
       outer compare, so a doc dropped on one side only also fails;
    2. non-triviality — the corpus actually HAS hot tokens at that K
       (otherwise check 1 passes vacuously)."""
    from hermes_spark.functions.dedup import simhash

    # whitespace-normalize FIRST so the strip-and-reconstruct round
    # trip is exact: tab/newline-edged text would otherwise leave an
    # empty token in the direct signing (trim strips only spaces) that
    # the concat_ws(' ') reconstruction cannot reproduce — a false
    # mismatch on a correct implementation
    both = _docs_plus_noisy(spark, sf_dir).withColumn(
        "text", F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    )
    k = both.count() // 2
    sig_f = both.transform(lambda d: simhash(d, max_token_doc_freq=k)).select(
        "doc_id", F.col("simhash").alias("sig_f")
    )
    tok = both.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("pos", "t"),
    )
    hot = (
        tok.select("doc_id", "t")
        .distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > k)
    )
    stripped = (
        tok.join(hot.select("t"), "t", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda s: s["t"],
                ),
            ).alias("text")
        )
    )
    sig_s = simhash(stripped).select(
        "doc_id", F.col("simhash").alias("sig_s")
    )
    mism = sig_f.join(sig_s, "doc_id", "full").where(
        ~F.col("sig_f").eqNullSafe(F.col("sig_s"))
    )
    return (
        both.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(mism.agg(F.count(F.lit(1)).alias("_mism")))
        .crossJoin(hot.agg(F.count(F.lit(1)).alias("_hot")))
        .select(
            "n_docs",
            (F.col("_mism") == 0).alias("prefilter_equals_stripped"),
            (F.col("_hot") > 0).alias("hot_tokens_exist"),
        )
    )



def q_attr_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 config-driven projection compiled to Column expressions."""
    from hermes_spark.plans.mapping import apply_mapping

    cust = _t(spark, sf_dir, "customer")
    return apply_mapping(
        cust,
        {
            "uid": "c_custkey",
            "display": {"expr": "concat(c_name, ' [', c_mktsegment, ']')"},
            "acct_bucket": {"expr": "cast(floor(c_acctbal / 1000) as bigint)"},
        },
    )


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint (Arrow pandas UDF; rows-only check)."""
    from hermes_spark.functions.text import rolling_hash

    return _t(spark, sf_dir, "documents").select(
        "doc_id", rolling_hash(F.col("text")).alias("rhash")
    )


def _twin(e):
    """Deterministic near-dup twin of an embedding: element i scaled by
    1 + ((i mod 7) - 3)/1000 — cosine ≈ 0.999995, expressible
    identically in Spark and DuckDB (index-lambda transform)."""
    return F.transform(
        e, lambda x, i: x * (F.lit(1.0) + ((i % 7) - 3) / F.lit(1000.0))
    )


def q_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine between consecutive embeddings — VALUE-equality
    oracle for the JVM-side vectorized cosine kernel (zip_with +
    sequential aggregate fold: bit-identical IEEE doubles vs DuckDB's
    list_reduce in the same fold order)."""
    from hermes_spark.functions.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    nxt = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("e").alias("e2")
    )
    return emb.join(nxt, "vec_id").select(
        "vec_id", cosine(F.col("e"), F.col("e2")).alias("cos")
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (the dedup family's embedding member)
    graded as a verdict: deterministic twins (cosine ≈ 0.999995) must
    be recovered by the LSH-bucketed candidate join + exact-cosine
    verify with ≥90% recall (12 planes + 1-bit probes ⇒ ~0.9999
    per-pair), and every twin must exceed the 0.999 threshold under the
    exact kernel.  False positives are impossible by construction (the
    verify stage computes true cosine), so recall is the graded
    property — like minhash_lsh."""
    from hermes_spark.functions.similarity import cosine, cosine_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        _twin(F.col("embedding")).alias("embedding"),
    )
    both = emb.unionByName(twins)
    found = (
        cosine_neardup_pairs(both, dim=64, threshold=0.999, n_planes=12)
        .where(F.col("vec_b") - F.col("vec_a") == 100000)
        .select("vec_a")
    )
    true_near = emb.where(
        cosine(F.col("embedding"), _twin(F.col("embedding"))) >= 0.999
    ).select(F.col("vec_id").alias("vec_a"))
    hits = found.join(true_near, "vec_a", "left_semi")
    return (
        emb.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .crossJoin(true_near.agg(F.count(F.lit(1)).alias("_true")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("_hits")))
        .select(
            "n_vecs",
            (F.col("_true") == F.col("n_vecs")).alias("all_twins_near"),
            (F.col("_hits") * 10 >= F.col("_true") * 9).alias("recall_ge_90pct"),
        )
    )


def q_ldap_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 scalar crypto (reference ldapPasswordHash plugin,
    plugins/attributes/ldapPasswordHash/ldapPasswordHash.py:46-85 +
    helpers/ldaphash.py:91-115): SSHA256 with a deterministic per-row
    salt, the SHA-256 compression running column-wise in numpy across
    each Arrow batch (functions/crypto.py).  VALUE-equality oracle:
    DuckDB reproduces the salted digest + base64 byte-for-byte."""
    from hermes_spark.functions.crypto import ldap_password_hash, salt_of

    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        ldap_password_hash(
            F.col("text"), "SSHA256", salt=salt_of(F.col("doc_id"))
        ).alias("pwhash"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction as pure Column exprs (curation.py): ordered
    regexp_replace chain + per-category counts on the progressively
    scrubbed text, so an email's digit run can never double-count as a
    phone.  The pattern set is restricted to the Java-regex ∩ RE2
    subset, so DuckDB replays the exact chain.  PII is synthesized
    deterministically per doc (the corpus itself is clean)."""
    from hermes_spark.functions.curation import pii_scrub

    # _wide: the regex chain runs scan-side — 1 row-group task otherwise
    d = _wide(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("@ex-corp.io")),
            F.lit("555-123-4567"),
            F.lit("4111 1111 1111 1111"),
            F.concat(F.lit("10.0.0."), (F.col("doc_id") % 256).cast("string")),
            F.lit("123-45-6789"),
        ).alias("text"),
    )
    return pii_scrub(d)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed sampling (curation.py): keep a
    row iff an 8-hex-char sha256 prefix of (salt|key) sorts below the
    fraction threshold.  Reproducible across engines / runs /
    repartitions / appends — the property df.sample() lacks — and the
    oracle IS that property: DuckDB independently recomputes the hash
    and selects the same rows."""
    from hermes_spark.functions.curation import hash_sample, sample_hash

    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, ["doc_id"], 0.35, salt="r6").select(
        "doc_id", sample_hash(["doc_id"], salt="r6").alias("h")
    )


def q_mix_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted deterministic dataset mixing (curation.py): two
    disjoint sub-corpora sampled at different rates (salted per source
    name) into one tagged union."""
    from hermes_spark.functions.curation import mix_datasets

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    even = d.where(F.col("doc_id") % 2 == 0)
    odd = d.where(F.col("doc_id") % 2 == 1)
    return mix_datasets(
        {"even": (even, 0.5), "odd": (odd, 0.25)},
        key=["doc_id"], salt="mx", source_col="mix_source",
    ).select("doc_id", "mix_source")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (curation.py): 16-token windows, 4-token
    overlap, via sequence+slice+explode — a narrow plan, no shuffle.
    Text is whitespace-normalized first so the oracle's single-space
    split is exact (same lesson as the simhash prefilter oracle)."""
    from hermes_spark.functions.curation import chunk_documents

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")).alias("text"),
    )
    return chunk_documents(d, ["doc_id"], size=16, overlap=4)


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (similarity.py): scale =
    max|v|/127, q = floor(v/scale + 0.5) — written as floor(x+0.5)
    precisely so BOTH engines compute bit-identical integers (their
    round() halves disagree).  The oracle recomputes every q vector
    and the IEEE scale from the same floats."""
    from hermes_spark.functions.similarity import quantize_embeddings

    # _wide: per-vector array math runs scan-side (1 row-group file)
    e = _wide(_t(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    # q is serialized to one string: array-typed result columns hash
    # differently per client (numpy vs list), the values don't
    return quantize_embeddings(e).select(
        "vec_id", "scale", F.array_join("q", ",").alias("q_csv")
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report (curation.py): docs, token/char
    volume, exact duplicate rate via distinct normalized fingerprints
    — over documents ∪ noisy copies so dup_rate is non-trivial."""
    from hermes_spark.functions.curation import corpus_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    noisy = d.withColumn("doc_id", F.col("doc_id") + 100000)
    return corpus_stats(d.unionByName(noisy), by=["source"])


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (curation.py): chunk the corpus 16/4 then
    pack chunks into capacity-64 training sequences across 8 shards
    (pack_id = floor(start-offset/capacity) within the (doc_id,
    chunk_idx) shard order).  The oracle replays the identical window
    cumsum in DuckDB — wrong ordering, shard function, or boundary
    semantics all shift pack ids."""
    from hermes_spark.functions.curation import chunk_documents, pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")).alias("text"),
    )
    chunks = chunk_documents(d, ["doc_id"], size=16, overlap=4)
    return pack_sequences(
        chunks, ["doc_id", "chunk_idx"], capacity=64, n_shards=8
    ).select(
        "doc_id", "chunk_idx", "shard", "n_tokens", "pack_id", "pack_pos"
    )


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-token counting (text.py): GPT-2-family
    pre-tokenizer regex in the Java∩RE2 subset, exercised against a
    punctuation/contraction/number-rich suffix so every branch of the
    alternation fires; reported next to the whitespace count the
    simpler estimator gives.  The oracle replays the IDENTICAL regex
    through DuckDB's RE2."""
    from hermes_spark.functions.text import bpe_token_count, token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" it's 3.14, don't stop!")
            ).otherwise(F.lit(" plain tail")),
        ).alias("text"),
    )
    return d.select(
        "doc_id",
        bpe_token_count("text").alias("n_bpe_tokens"),
        token_count("text").alias("n_ws_tokens"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (curation.py): the corpus is split
    deterministically into an "eval set" (doc_id % 29 == 0) and the
    training rest; every (train, eval) pair sharing a distinct word
    3-gram is reported with the overlap measured against the eval doc
    (GPT-3 appendix-C convention).  The eval shingle frame is
    broadcast, so the corpus side never shuffles for the probe — the
    100 TB shape.  The testdata corpus contains real near-copies, so
    the report surfaces genuine overlap_frac ≈ 1.0 contamination."""
    from hermes_spark.functions.curation import decontamination_report

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = d.where(F.col("doc_id") % 29 == 0)
    tr = d.where(F.col("doc_id") % 29 != 0)
    return decontamination_report(tr, ev, n=3).select(
        "doc_id", "eval_id", "n_overlap", "eval_sz", "overlap_frac"
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (curation.py) over a corpus
    with KNOWN line structure: each doc becomes [text, 'filler-<id>',
    text again if id is even], so even docs must report
    dup_line_frac = 2/3 and a char-weighted fraction near 1, odd docs
    0 — plus top-token concentration over the whole doc.  The oracle
    recomputes every fraction from the same constructed text."""
    from hermes_spark.functions.curation import repetition_stats

    # _wide: line/token stats run scan-side (1 row-group file)
    d = _wide(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("filler-"), F.col("doc_id").cast("string")),
            F.when(F.col("doc_id") % 2 == 0, F.col("text")),
        ).alias("text"),
    )
    return repetition_stats(d)


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC snapshot diff on sf0.001 (driver smoke check)."""
    return q_cdc_diff(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_diff": q_cdc_diff,
        "merkle_events": q_merkle_events,
        "merkle_salted": q_merkle_salted,
        "attr_mapping": q_attr_mapping,
        "dedup_quarantine": q_dedup_quarantine,
        "merge_must_exist_in_both": q_merge_must_exist_in_both,
        "merge_must_not_exist": q_merge_must_not_exist,
        "integrity_cascade": q_integrity_cascade,
        "oldest_event_per_key": q_oldest_event_per_key,
        "compact_events": q_compact_events,
        "compact_events_map": q_compact_events_map,
        "fanout": q_fanout,
        "fanout_cache": q_fanout_cache,
        "merge_substitute_cache": q_merge_substitute_cache,
        "trashbin_retention": q_trashbin_retention,
        "sessionize": q_sessionize,
        "tumbling_hourly": q_tumbling_hourly,
        "sliding_hourly": q_sliding_hourly,
        "range_join": q_range_join,
        "reconcile": q_reconcile,
        "rollup_hourly": q_rollup_hourly,
        "orphan_anti_join": q_orphan_anti_join,
        "topk_per_group": q_topk_per_group,
        "pricing_summary": q_pricing_summary,
        "star_join": q_star_join,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "lang_id": q_lang_id,
        "quality": q_quality,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "cosine_topk": q_cosine_topk,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "simhash128": q_simhash128,
        "simhash_prefilter": q_simhash_prefilter,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "multimodal_features": q_multimodal_features,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        "pii_scrub": q_pii_scrub,
        "hash_sample": q_hash_sample,
        "mix_datasets": q_mix_datasets,
        "chunk_documents": q_chunk_documents,
        "bpe_token_count": q_bpe_token_count,
        "pack_sequences": q_pack_sequences,
        "quantize_embeddings": q_quantize_embeddings,
        "corpus_stats": q_corpus_stats,
        "decontaminate": q_decontaminate,
        "repetition_stats": q_repetition_stats,
        "rolling_fingerprint": q_rolling_fingerprint,
        "ldap_hash": q_ldap_hash,
        "embed_cosine": q_embed_cosine,
        "embed_neardup": q_embed_neardup,
    }


# exact word-3-gram Jaccard pair set (threshold 0.8) over documents +
# noisy copies, with the shingle doc-freq ≤ MAX_DOC_FREQ guard — shared
# by the ngram_jaccard oracle and the minhash_lsh verdict oracle
_NGRAM_PAIRS_CTE = f"""
            WITH alldocs AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 10000, text || ' extra tail' FROM documents
            ), toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
              FROM alldocs
            ), pos AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
              FROM toks
            ), sh0 AS (
              SELECT DISTINCT doc_id,
                     t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2] AS s
              FROM pos
            ), keep AS (
              SELECT s FROM sh0 GROUP BY s HAVING count(*) <= {MAX_DOC_FREQ}
            ), sh AS (
              SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
            ), sizes AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
            ), common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT doc_a, doc_b,
                     CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE) AS jaccard
              FROM common
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE) >= 0.8
            )
"""


def _pii_oracle_sql() -> str:
    """The DuckDB mirror of q_pii_scrub, GENERATED from the operator's
    own PII_PATTERNS so the chain order and patterns cannot drift."""
    from hermes_spark.functions.curation import PII_PATTERNS

    ctes = [
        """b0 AS (
          SELECT doc_id, concat_ws(' ', text,
            'u' || CAST(doc_id AS VARCHAR) || '@ex-corp.io',
            '555-123-4567', '4111 1111 1111 1111',
            '10.0.0.' || CAST(doc_id % 256 AS VARCHAR),
            '123-45-6789') AS t
          FROM documents)"""
    ]
    for i, (name, pat) in enumerate(PII_PATTERNS):
        esc = pat.replace("'", "''")
        prior = ", ".join(f"n_{n}" for n, _ in PII_PATTERNS[:i])
        prior = (prior + ", ") if prior else ""
        ctes.append(
            f"b{i + 1} AS (SELECT doc_id, {prior}"
            f"CAST(len(regexp_extract_all(t, '{esc}')) AS INT) AS n_{name}, "
            f"regexp_replace(t, '{esc}', '<{name.upper()}>', 'g') AS t "
            f"FROM b{i})"
        )
    names = ", ".join(f"n_{n}" for n, _ in PII_PATTERNS)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, t AS text, {names} FROM b{len(PII_PATTERNS)}"
    )


def _curation_sampling_oracles() -> dict[str, str]:
    """hash_sample / mix_datasets mirrors — thresholds come from the
    operator's own sample_threshold so the quantization matches."""
    from hermes_spark.functions.curation import sample_threshold

    t35, t50, t25 = (
        sample_threshold(0.35), sample_threshold(0.5), sample_threshold(0.25),
    )
    h = "substring(sha256({salt} || CAST(doc_id AS VARCHAR)), 1, 8)"
    h35 = h.format(salt="'r6|'")
    heven = h.format(salt="'mx|even|'")
    hodd = h.format(salt="'mx|odd|'")
    return {
        "hash_sample": f"""
            SELECT doc_id, {h35} AS h
            FROM documents
            WHERE {h35} < '{t35}'
        """,
        "mix_datasets": f"""
            SELECT doc_id, 'even' AS mix_source FROM documents
            WHERE doc_id % 2 = 0 AND {heven} < '{t50}'
            UNION ALL
            SELECT doc_id, 'odd' AS mix_source FROM documents
            WHERE doc_id % 2 = 1 AND {hodd} < '{t25}'
        """,
    }


def oracle_sql() -> dict[str, str]:
    stop_en = "'the','a','row','fast','slow'"
    lang_cases = []
    from hermes_spark.functions.text import LANG_MARKERS

    for lang, words in sorted(LANG_MARKERS.items()):
        inlist = ",".join(f"'{w}'" for w in words)
        lang_cases.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"count(DISTINCT CASE WHEN t IN ({inlist}) THEN t END) AS score FROM tok GROUP BY doc_id"
        )
    lang_union = " UNION ALL ".join(lang_cases)

    return {
        "cdc_diff": """
            WITH old AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2 ELSE o_totalprice END AS p,
                     o_orderstatus AS s
              FROM orders WHERE o_orderkey % 10 <> 7
            ), new AS (
              SELECT o_orderkey, o_totalprice AS p, o_orderstatus AS s
              FROM orders WHERE o_orderkey % 10 <> 4
            ), j AS (
              SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
                     CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                          WHEN n.o_orderkey IS NULL THEN 'delete'
                          WHEN n.p <> o.p OR n.s <> o.s THEN 'update' END AS op
              FROM new n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey
            )
            SELECT o_orderkey, op FROM j WHERE op IS NOT NULL
        """,
        "merkle_events": """
            WITH leaves AS (
              SELECT user_id,
                     lpad(CAST(event_id AS VARCHAR), 10, '0') || ':' || sha256(event_type) AS leaf
              FROM events
            )
            SELECT user_id,
                   sha256(string_agg(leaf, chr(31) ORDER BY leaf)) AS merkle,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM leaves GROUP BY user_id
        """,
        "merkle_salted": """
            WITH leaves AS (
              SELECT user_id,
                     lpad(CAST(event_id AS VARCHAR), 10, '0') || ':' || sha256(event_type) AS leaf
              FROM events
            )
            SELECT user_id,
                   sha256(string_agg(leaf, chr(31) ORDER BY leaf)) AS merkle,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM leaves GROUP BY user_id
        """,
        "attr_mapping": """
            SELECT c_custkey AS uid,
                   c_name || ' [' || c_mktsegment || ']' AS display,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS acct_bucket
            FROM customer
        """,
        "dedup_quarantine": """
            SELECT o_orderkey % 14000 AS dup_key, CAST(count(*) AS BIGINT) AS dup_count
            FROM orders GROUP BY 1 HAVING count(*) > 1
        """,
        "merge_must_exist_in_both": """
            SELECT c.c_custkey, c.c_name, c.c_acctbal, b.o_cnt
            FROM customer c
            JOIN (SELECT o_custkey AS c_custkey, CAST(count(*) AS BIGINT) AS o_cnt
                  FROM orders GROUP BY 1) b USING (c_custkey)
        """,
        "merge_must_not_exist": """
            SELECT c_custkey, 'A:' || c_name AS src_name FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT c_custkey, 'B:' || c_name AS src_name FROM customer WHERE c_custkey % 3 <> 0
        """,
        "integrity_cascade": """
            WITH cust AS (SELECT * FROM customer WHERE c_custkey % 10 <> 0),
            vorders AS (SELECT o.* FROM orders o WHERE EXISTS
                        (SELECT 1 FROM cust c WHERE c.c_custkey = o.o_custkey)),
            vli AS (SELECT l.* FROM lineitem l WHERE EXISTS
                    (SELECT 1 FROM vorders o WHERE o.o_orderkey = l.l_orderkey))
            SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_x100
            FROM vli GROUP BY l_returnflag
        """,
        "oldest_event_per_key": """
            SELECT user_id, event_id, event_type FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1
        """,
        "compact_events": """
            WITH ev AS (
              SELECT user_id, event_id,
                     CASE event_type WHEN 'click' THEN 'insert'
                                     WHEN 'purchase' THEN 'delete'
                                     ELSE 'update' END AS op
              FROM events
            ), g AS (
              SELECT user_id,
                     arg_min(op, event_id) AS first_op,
                     arg_max(op, event_id) AS last_op,
                     CAST(max(event_id) AS BIGINT) AS last_offset
              FROM ev GROUP BY user_id
            )
            SELECT user_id, last_offset,
                   CASE WHEN first_op = 'insert' AND last_op = 'delete' THEN NULL
                        WHEN first_op = 'insert' THEN 'insert'
                        WHEN last_op = 'delete' THEN 'delete'
                        ELSE 'update' END AS op
            FROM g
            WHERE NOT (first_op = 'insert' AND last_op = 'delete')
        """,
        "trashbin_retention": """
            SELECT o_orderkey, (o_orderstatus = 'F') AS trashed
            FROM orders
            WHERE o_orderstatus <> 'F' OR o_orderdate >= TIMESTAMP '1995-06-01'
        """,
        "sessionize": """
            WITH w AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                               OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS is_new
              FROM events
            ), s AS (
              SELECT user_id, ts,
                     CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              FROM w
            )
            SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
                   CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "tumbling_hourly": """
            SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS v_x1e6
            FROM events GROUP BY 1, 2
        """,
        "sliding_hourly": """
            WITH ev AS (
              SELECT epoch_us(ts) AS tus, event_type, value FROM events
            ), expl AS (
              SELECT (CAST(floor(tus / 1800000000) AS BIGINT) - o) * 1800000000 AS win_us,
                     event_type, value
              FROM ev, (VALUES (0), (1)) t(o)
            )
            SELECT win_us, event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS v_x1e6
            FROM expl GROUP BY 1, 2
        """,
        "range_join": """
            WITH clicks AS (
              SELECT user_id, event_id AS click_id, ts AS c_ts FROM events WHERE event_type = 'click'
            ), buys AS (
              SELECT user_id AS b_user, event_id AS purchase_id, ts AS b_ts FROM events WHERE event_type = 'purchase'
            )
            SELECT user_id, click_id, purchase_id, latency_us FROM (
              SELECT c.user_id, c.click_id, b.purchase_id,
                     CAST(epoch_us(b.b_ts) - epoch_us(c.c_ts) AS BIGINT) AS latency_us,
                     row_number() OVER (PARTITION BY c.user_id, c.click_id
                                        ORDER BY b.b_ts, b.purchase_id) AS rn
              FROM clicks c JOIN buys b ON c.user_id = b.b_user
                   AND b.b_ts > c.c_ts AND b.b_ts <= c.c_ts + INTERVAL 1 HOUR
            ) WHERE rn = 1
        """,
        "reconcile": """
            WITH src AS (
              SELECT user_id AS conv_id, CAST(event_id AS INT) AS turn_idx,
                     event_type AS text
              FROM events
            ), tgt AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN turn_idx % 11 = 0 THEN text || '_x' ELSE text END AS text
              FROM src WHERE conv_id % 7 <> 0
            ), sd AS (
              SELECT conv_id,
                     sha256(string_agg(lpad(CAST(turn_idx AS VARCHAR),10,'0') || ':' || sha256(COALESCE(text, chr(0))), chr(31)
                            ORDER BY lpad(CAST(turn_idx AS VARCHAR),10,'0') || ':' || sha256(COALESCE(text, chr(0))))) AS ck,
                     CAST(count(*) AS BIGINT) AS n
              FROM src GROUP BY conv_id
            ), td AS (
              SELECT conv_id,
                     sha256(string_agg(lpad(CAST(turn_idx AS VARCHAR),10,'0') || ':' || sha256(COALESCE(text, chr(0))), chr(31)
                            ORDER BY lpad(CAST(turn_idx AS VARCHAR),10,'0') || ':' || sha256(COALESCE(text, chr(0))))) AS ck,
                     CAST(count(*) AS BIGINT) AS n
              FROM tgt GROUP BY conv_id
            )
            SELECT COALESCE(sd.conv_id, td.conv_id) AS user_id,
                   CASE WHEN td.conv_id IS NULL THEN 'missing_in_target'
                        WHEN sd.conv_id IS NULL THEN 'extra_in_target'
                        WHEN sd.ck <> td.ck THEN 'mismatch' END AS status,
                   sd.n AS src_n_turns, td.n AS tgt_n_turns
            FROM sd FULL OUTER JOIN td ON sd.conv_id = td.conv_id
            WHERE (td.conv_id IS NULL OR sd.conv_id IS NULL OR sd.ck <> td.ck)
        """,
        "rollup_hourly": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS v_x1e6
            FROM events GROUP BY ROLLUP(event_type)
        """,
        "orphan_anti_join": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 10 <> 0)
        """,
        "topk_per_group": """
            SELECT c_mktsegment, CAST(rnk AS INT) AS rnk, o_orderkey, o_totalprice FROM (
              SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (PARTITION BY c.c_mktsegment
                                        ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ) WHERE rnk <= 3
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_x100,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(13,2))) * 100 AS BIGINT) AS sum_base_price_x100,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(13,2)) *
                            CAST(1 - l_discount AS DECIMAL(8,6))) * 100000000 AS BIGINT) AS sum_disc_price_x1e8,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "star_join": """
            SELECT r.r_name, n.n_name,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(13,2)) *
                            CAST(1 - l.l_discount AS DECIMAL(8,6))) * 100000000 AS BIGINT) AS revenue_x1e8,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
        """,
        "exact_dedup": """
            WITH alldocs AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 10000, text FROM documents
            )
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
            FROM alldocs
            GROUP BY sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        """,
        "fanout": """
            WITH ev AS (
              SELECT c_custkey AS uid,
                     CASE WHEN c_custkey % 4 = 0 THEN 'delete' ELSE 'insert' END AS op,
                     c_name AS login,
                     CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE 'u' || CAST(c_custkey % 100 AS VARCHAR) END AS mail,
                     CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS building
              FROM customer
            )
            SELECT 'account' AS ltype, uid, op, login AS v1, mail AS v2 FROM ev
            WHERE op = 'delete' OR login IS NOT NULL OR mail IS NOT NULL
            UNION ALL
            SELECT 'badge', uid, op, building || ':' || login, building FROM ev
            WHERE op = 'delete' OR (building || ':' || login) IS NOT NULL
               OR building IS NOT NULL
        """,
        "fanout_cache": """
            WITH cache AS (
              SELECT c_custkey AS uid, c_name AS login,
                     'm' || CAST(c_custkey % 50 AS VARCHAR) AS mail,
                     c_mktsegment AS building
              FROM customer
            ), ev AS (
              SELECT c_custkey AS uid,
                     CASE WHEN c_custkey % 13 = 0 THEN 'delete'
                          WHEN c_custkey % 11 = 0 THEN 'insert'
                          ELSE 'update' END AS op,
                     CASE WHEN c_custkey % 3 = 2
                          THEN 'L' || CAST(c_custkey % 9 AS VARCHAR) END AS login,
                     CASE WHEN c_custkey % 3 = 0 THEN
                       CASE WHEN c_custkey % 5 = 0
                            THEN 'm' || CAST(c_custkey % 50 AS VARCHAR)
                            ELSE 'x' || CAST(c_custkey % 7 AS VARCHAR) END
                     END AS mail,
                     CASE WHEN c_custkey % 3 = 1
                          THEN 'BB' || CAST(c_custkey % 4 AS VARCHAR) END AS building
              FROM customer
            ), eff AS (
              SELECT e.uid, e.op,
                CASE WHEN e.op = 'update' THEN COALESCE(e.login, c.login)
                     ELSE e.login END AS login,
                CASE WHEN e.op = 'update' THEN COALESCE(e.mail, c.mail)
                     ELSE e.mail END AS mail,
                CASE WHEN e.op = 'update' THEN COALESCE(e.building, c.building)
                     ELSE e.building END AS building,
                c.login AS c_login, c.mail AS c_mail, c.building AS c_building
              FROM ev e LEFT JOIN cache c USING (uid)
            ), u AS (
              SELECT 'account' AS ltype, uid, op,
                     login AS v1, mail AS v2,
                     c_login AS o1, c_mail AS o2
              FROM eff
              UNION ALL
              SELECT 'badge', uid, op,
                     building || ':' || login, building,
                     c_building || ':' || c_login, c_building
              FROM eff
            ), cls AS (
              SELECT ltype, uid, op, v1, v2,
                CASE WHEN op = 'delete' THEN ''
                     WHEN op = 'insert' THEN concat_ws(',',
                       CASE WHEN v1 IS NOT NULL THEN 'v1' END,
                       CASE WHEN v2 IS NOT NULL THEN 'v2' END)
                     ELSE concat_ws(',',
                       CASE WHEN o1 IS NULL AND v1 IS NOT NULL THEN 'v1' END,
                       CASE WHEN o2 IS NULL AND v2 IS NOT NULL THEN 'v2' END)
                END AS ch_a,
                CASE WHEN op = 'update' THEN concat_ws(',',
                       CASE WHEN o1 IS NOT NULL AND v1 IS NOT NULL AND o1 <> v1 THEN 'v1' END,
                       CASE WHEN o2 IS NOT NULL AND v2 IS NOT NULL AND o2 <> v2 THEN 'v2' END)
                     ELSE '' END AS ch_m,
                CASE WHEN op = 'update' THEN concat_ws(',',
                       CASE WHEN o1 IS NOT NULL AND v1 IS NULL THEN 'v1' END,
                       CASE WHEN o2 IS NOT NULL AND v2 IS NULL THEN 'v2' END)
                     ELSE '' END AS ch_r
              FROM u
            )
            SELECT ltype, uid, op, v1, v2, ch_a, ch_m, ch_r FROM cls
            WHERE op = 'delete'
               OR (op = 'insert' AND (v1 IS NOT NULL OR v2 IS NOT NULL))
               OR (op = 'update' AND (ch_a <> '' OR ch_m <> '' OR ch_r <> ''))
        """,
        "merge_substitute_cache": """
            WITH a AS (
              SELECT c_custkey AS id, c_name AS v, c_mktsegment AS seg FROM customer
            ), conflicts AS (
              SELECT id FROM a WHERE id % 7 = 0
            ), clean AS (
              SELECT * FROM a WHERE id % 7 <> 0
            ), subs AS (
              SELECT c_custkey AS id, 'cached:' || c_name AS v, c_mktsegment AS seg
              FROM customer WHERE c_custkey % 14 = 0
            )
            SELECT * FROM clean UNION ALL SELECT * FROM subs
        """,
        "compact_events_map": """
            WITH ranked AS (
              SELECT user_id AS k, event_id, event_type AS et,
                     CAST(event_id % 97 AS VARCHAR) AS val,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
              FROM events
            ), p AS (
              SELECT k,
                     max(CASE WHEN rn=1 THEN et END) AS et1,
                     max(CASE WHEN rn=1 THEN val END) AS v1,
                     max(CASE WHEN rn=1 THEN event_id END) AS id1,
                     max(CASE WHEN rn=2 THEN et END) AS et2,
                     max(CASE WHEN rn=2 THEN val END) AS v2,
                     max(CASE WHEN rn=2 THEN event_id END) AS id2,
                     count(*) AS n
              FROM ranked WHERE rn <= 2 GROUP BY k
            ), pp AS (
              SELECT *, k % 5 AS kind, id1 % 2 = 0 AS even1, id2 % 2 = 0 AS even2,
                     CAST(k % 7 AS VARCHAR) AS pb, k % 2 = 0 AS keven
              FROM p WHERE n = 2
            )
            SELECT k,
              CASE WHEN kind=0 THEN 'added'
                   WHEN kind=2 OR kind=3 THEN 'modified'
                   ELSE 'removed' END AS op,
              CASE WHEN kind=0 AND even2 THEN 'a=' || et1 || '|b=' || v2 || '|c=' || et2
                   WHEN kind=0 THEN 'b=' || v2 || '|c=' || v2
                   ELSE '' END AS attrs_s,
              CASE WHEN kind=2 AND NOT keven THEN 'a=' || et2
                   WHEN kind=3 AND even2 THEN 'c=' || et2
                   WHEN kind=3 AND even1 AND NOT even2 THEN 'c=' || v2
                   ELSE '' END AS added_s,
              CASE WHEN kind=2 AND keven THEN
                     CASE WHEN et2 <> 'p' AND v2 <> pb THEN 'a=' || et2 || '|b=' || v2
                          WHEN et2 <> 'p' THEN 'a=' || et2
                          WHEN v2 <> pb THEN 'b=' || v2 ELSE '' END
                   WHEN kind=2 THEN CASE WHEN v2 <> pb THEN 'b=' || v2 ELSE '' END
                   WHEN kind=3 AND even2 AND even1 THEN 'b=' || v2
                   WHEN kind=3 AND even2 THEN 'b=' || v2 || '|c=' || v1
                   WHEN kind=3 AND even1 THEN 'b=' || v2
                   WHEN kind=3 THEN 'b=' || v2 || '|c=' || v2
                   ELSE '' END AS modified_s,
              CASE WHEN kind=3 AND NOT (even1 AND even2) THEN 'a=x' ELSE '' END AS removed_s
            FROM pp
            WHERE kind <> 1
              AND NOT (kind = 2 AND keven AND et2 = 'p' AND v2 = pb)
        """,
        "ngram_jaccard": f"""
            {_NGRAM_PAIRS_CTE}
            SELECT doc_a, doc_b, jaccard FROM pairs
        """,
        "minhash_lsh": f"""
            {_NGRAM_PAIRS_CTE}
            SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
                   TRUE AS all_verified_pairs_exact,
                   TRUE AS recall_ge_95pct
            FROM pairs
        """,
        "simhash": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   TRUE AS banded_lossless_on_true_pairs,
                   TRUE AS noisy_copies_near_ge_90pct
            FROM documents
        """,
        "simhash_prefilter": """
            SELECT CAST(2 * count(*) AS BIGINT) AS n_docs,
                   TRUE AS prefilter_equals_stripped,
                   TRUE AS hot_tokens_exist
            FROM documents
        """,
        "simhash128": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   TRUE AS banded_lossless_on_true_pairs,
                   TRUE AS noisy_copies_near_ge_90pct,
                   TRUE AS band_candidates_reduced
            FROM documents
        """,
        "ann_lsh": """
            SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ge_8pct
            FROM embeddings WHERE vec_id % 50 = 0
        """,
        "ann_ivf": """
            SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ge_60pct
            FROM embeddings WHERE vec_id % 50 = 0
        """,
        "multimodal_features": """
            SELECT i AS media_id,
                   CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(64 + (i % 5) * 32 AS INT) AS n_bytes
            FROM range(0, 64) t(i)
        """,
        "multimodal_decode": """
            WITH m AS (
              SELECT i, CAST(i % 3 AS INT) AS f, CAST(i // 3 AS BIGINT) AS v
              FROM range(0, 48) t(i)
            )
            SELECT
              i AS media_id,
              CASE f WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp' ELSE 'ppm' END AS format,
              TRUE AS decoded,
              CASE WHEN f = 0 THEN CAST(8000 + v * 500 AS INT) END AS sample_rate,
              CASE WHEN f = 0 THEN CAST(1 + v % 2 AS INT) END AS n_channels,
              CASE WHEN f = 0 THEN CAST(100 + v * 10 AS INT) END AS n_frames,
              CASE WHEN f = 0
                   THEN CAST((100 + v * 10) * 1000 // (8000 + v * 500) AS INT)
              END AS duration_ms,
              CASE f WHEN 1 THEN CAST(4 + v AS INT)
                     WHEN 2 THEN CAST(5 + v AS INT) END AS width,
              CASE f WHEN 1 THEN CAST(3 + v % 5 AS INT)
                     WHEN 2 THEN CAST(2 + v % 4 AS INT) END AS height,
              CAST(CASE f
                WHEN 0 THEN (100 + v * 10) * (1 + v % 2)
                WHEN 1 THEN (4 + v) * (3 + v % 5) * 3
                ELSE (5 + v) * (2 + v % 4) * 3
              END AS BIGINT) AS n_values,
              -- DuckDB range() cannot take correlated bounds; use a
              -- fixed upper bound (max content size over all media)
              -- and filter on the correlated length instead
              CAST(CASE f
                WHEN 0 THEN (SELECT SUM(((v * 7919 + j * 31) % 65536) - 32768)
                             FROM range(0, 500) s(j)
                             WHERE j < (100 + v * 10) * (1 + v % 2))
                WHEN 1 THEN (SELECT SUM((v * 13 + k * 7) % 256)
                             FROM range(0, 500) s(k)
                             WHERE k < (4 + v) * (3 + v % 5) * 3)
                ELSE (SELECT SUM((v * 11 + k * 3) % 256)
                      FROM range(0, 500) s(k)
                      WHERE k < (5 + v) * (2 + v % 4) * 3)
              END AS BIGINT) AS sum_values
            FROM m
        """,
        "multimodal_resize": """
            WITH m AS (
              SELECT i, CAST(i % 3 AS INT) AS f, CAST(i // 3 AS BIGINT) AS v
              FROM range(0, 48) t(i)
            ),
            -- images: 3x2 nearest-neighbor, 18 output cells per media.
            -- t -> (r, c, chn); source pixel (r*h//2, c*w//3); BMP is
            -- bottom-up so its file row is (h-1 - image_row)
            img AS (
              SELECT i, f, v,
                     t // 9 AS r, (t % 9) // 3 AS c, t % 3 AS chn
              FROM m, range(0, 18) s(t) WHERE f IN (1, 2)
            ),
            impx AS (
              SELECT i, f, v,
                CASE WHEN f = 1 THEN
                  (v*13 + (((3 + v%5) - 1 - (r*(3 + v%5) // 2)) * ((4+v)*3)
                           + (c*(4+v) // 3)*3 + chn) * 7) % 256
                ELSE
                  (v*11 + ((r*(2 + v%4) // 2) * ((5+v)*3)
                           + (c*(5+v) // 3)*3 + chn) * 3) % 256
                END AS val
              FROM img
            ),
            isum AS (
              SELECT i, f, v, SUM(val) AS s FROM impx GROUP BY i, f, v
            ),
            -- audio: out_frames = frames*4000//rate, all channels kept;
            -- output cell t -> frame t//ch, channel t%ch, source frame
            -- (t//ch)*rate//4000 (fixed range bound, correlated filter)
            wv AS (
              SELECT i, v, 8000 + v*500 AS rate, 1 + v%2 AS ch,
                     100 + v*10 AS frames
              FROM m WHERE f = 0
            ),
            wcell AS (
              SELECT i, v, rate, ch,
                     greatest(frames*4000 // rate, 1) AS mfr, t
              FROM wv, range(0, 500) s(t)
              WHERE t < greatest(frames*4000 // rate, 1) * ch
            ),
            wsum AS (
              SELECT i, ch, mfr,
                SUM(((v*7919 + (((t // ch)*rate // 4000)*ch + (t % ch))*31)
                     % 65536) - 32768) AS s
              FROM wcell GROUP BY i, ch, mfr
            )
            SELECT i AS media_id,
                   CASE f WHEN 1 THEN 'bmp' ELSE 'ppm' END AS format,
                   TRUE AS decoded,
                   CAST(3 AS INT) AS out_width, CAST(2 AS INT) AS out_height,
                   CAST(NULL AS INT) AS out_frames,
                   CAST(NULL AS INT) AS out_rate,
                   CAST(18 AS BIGINT) AS n_values,
                   CAST(s AS BIGINT) AS sum_values
            FROM isum
            UNION ALL
            SELECT i, 'wav', TRUE, NULL, NULL,
                   CAST(mfr AS INT), CAST(4000 AS INT),
                   CAST(mfr * ch AS BIGINT), CAST(s AS BIGINT)
            FROM wsum
        """,
        "multimodal_frames": """
            WITH m AS (
              SELECT CAST(i AS BIGINT) AS i, CAST(i // 3 AS BIGINT) AS v,
                     8000 + (i // 3)*500 AS rate,
                     1 + (i // 3) % 2 AS ch,
                     100 + (i // 3)*10 AS frames
              FROM range(0, 48) t(i) WHERE i % 3 = 0
            ),
            ticks AS (
              SELECT i, v, rate, ch, frames, j*5 AS t,
                     (j*5*rate) // 1000 AS fr
              FROM m, range(0, 20) s(j)
              WHERE (j*5*rate) // 1000 < frames
            )
            SELECT i AS media_id, CAST(t AS INT) AS frame_ts_ms,
                   TRUE AS decoded,
                   CAST(((v*7919 + (fr*ch)*31) % 65536) - 32768
                     + CASE WHEN ch = 2
                       THEN ((v*7919 + (fr*ch + 1)*31) % 65536) - 32768
                       ELSE 0 END AS BIGINT) AS sample_sum
            FROM ticks
        """,
        "pii_scrub": _pii_oracle_sql(),
        **_curation_sampling_oracles(),
        "chunk_documents": """
            WITH d AS (
              SELECT doc_id,
                     trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id, string_split(t, ' ') AS toks
              FROM d WHERE t <> ''
            ), n AS (
              SELECT doc_id, toks,
                     CAST(ceil(greatest(len(toks) - 4, 1) / 12.0) AS INT)
                       AS n_chunks
              FROM tok
            )
            -- DuckDB range() cannot take correlated bounds (same
            -- workaround as multimodal_decode): fixed bound sized to
            -- the corpus with ample headroom — 64 chunks covers docs
            -- up to 64*12+4 = 772 tokens (generator max ~100 across
            -- sf0.001-0.1); the Spark side is unbounded
            SELECT doc_id, CAST(j AS INT) AS chunk_idx,
                   array_to_string(list_slice(toks, j*12 + 1, j*12 + 16), ' ')
                     AS chunk_text
            FROM n, range(0, 64) r(j)
            WHERE j < n_chunks
        """,
        "bpe_token_count": r"""
            WITH d AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 2 = 0
                                  THEN ' it''s 3.14, don''t stop!'
                                  ELSE ' plain tail' END AS text
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))
                     AS BIGINT) AS n_bpe_tokens,
                   CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
                     AS BIGINT) AS n_ws_tokens
            FROM d
        """,
        "quantize_embeddings": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), s AS (
              SELECT vec_id, v,
                     list_max([abs(x) for x in v]) / 127.0 AS scale
              FROM e
            )
            SELECT vec_id, scale,
                   array_to_string(
                     CASE WHEN scale = 0
                          THEN [CAST(0 AS INT) for x in v]
                          ELSE [CAST(floor(x / scale + 0.5) AS INT)
                                for x in v]
                     END, ',') AS q_csv
            FROM s
        """,
        "corpus_stats": r"""
            WITH d AS (
              SELECT doc_id, source, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, source, text FROM documents
            ), f AS (
              SELECT source,
                     CAST(len(regexp_split_to_array(lower(trim(text)),
                       '\s+')) AS BIGINT) AS nt,
                     CAST(length(text) AS BIGINT) AS nc,
                     sha256(regexp_replace(lower(trim(text)),
                       '\s+', ' ', 'g')) AS fp
              FROM d
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   CAST(sum(nc) AS BIGINT) AS n_chars,
                   CAST(sum(nt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     AS avg_tokens,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
                   1.0 - CAST(count(DISTINCT fp) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS dup_rate
            FROM f
            GROUP BY source
        """,
        "pack_sequences": r"""
            WITH d AS (
              SELECT doc_id,
                     trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id, string_split(t, ' ') AS toks
              FROM d WHERE t <> ''
            ), n AS (
              SELECT doc_id, toks,
                     CAST(ceil(greatest(len(toks) - 4, 1) / 12.0) AS INT)
                       AS n_chunks
              FROM tok
            ), chunks AS (
              SELECT doc_id, CAST(j AS INT) AS chunk_idx,
                     list_slice(toks, j*12 + 1, j*12 + 16) AS ctoks
              FROM n, range(0, 64) r(j)
              WHERE j < n_chunks
            ), c2 AS (
              SELECT doc_id, chunk_idx,
                     CAST(doc_id % 8 AS INT) AS shard,
                     CAST(len(ctoks) AS BIGINT) AS n_tokens
              FROM chunks
            ), c3 AS (
              SELECT *,
                     CAST(floor(
                       (sum(n_tokens) OVER (
                          PARTITION BY shard
                          ORDER BY doc_id, chunk_idx
                          ROWS UNBOUNDED PRECEDING) - n_tokens) / 64.0
                     ) AS BIGINT) AS pack_id
              FROM c2
            )
            SELECT doc_id, chunk_idx, shard, n_tokens, pack_id,
                   CAST(row_number() OVER (
                      PARTITION BY shard, pack_id
                      ORDER BY doc_id, chunk_idx) - 1 AS INT) AS pack_pos
            FROM c3
        """,
        "decontaminate": """
            WITH ev AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0
            ), tr AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 29 <> 0
            ), evt AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS t
              FROM ev
            ), evp AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
              FROM evt
            ), evsh AS (
              SELECT DISTINCT doc_id,
                     t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
                       || ' ' || t[CAST(i AS INT) + 2] AS s
              FROM evp
            ), evsz AS (
              SELECT doc_id AS eval_id, CAST(count(*) AS BIGINT) AS eval_sz
              FROM evsh GROUP BY 1
            ), trt AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS t
              FROM tr
            ), trp AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
              FROM trt
            ), trsh AS (
              SELECT DISTINCT doc_id,
                     t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
                       || ' ' || t[CAST(i AS INT) + 2] AS s
              FROM trp
            ), hits AS (
              SELECT trsh.doc_id, evsh.doc_id AS eval_id,
                     CAST(count(*) AS BIGINT) AS n_overlap
              FROM trsh JOIN evsh ON trsh.s = evsh.s GROUP BY 1, 2
            )
            SELECT h.doc_id, h.eval_id, h.n_overlap, z.eval_sz,
                   CAST(h.n_overlap AS DOUBLE) / CAST(z.eval_sz AS DOUBLE)
                     AS overlap_frac
            FROM hits h JOIN evsz z USING (eval_id)
        """,
        "repetition_stats": """
            WITH d AS (
              SELECT doc_id,
                     concat_ws(chr(10), text,
                               'filler-' || CAST(doc_id AS VARCHAR),
                               CASE WHEN doc_id % 2 = 0 THEN text END) AS text
              FROM documents
            ), lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM d
            ), pl AS (
              SELECT doc_id, l, CAST(count(*) AS BIGINT) AS c,
                     CAST(length(l) AS BIGINT) AS ln
              FROM lines GROUP BY 1, 2
            ), la AS (
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_lines,
                     CAST(coalesce(sum(c) FILTER (c > 1), 0) AS DOUBLE)
                       / CAST(sum(c) AS DOUBLE) AS dup_line_frac,
                     CASE WHEN sum(c * ln) > 0
                          THEN CAST(coalesce(sum(c * ln) FILTER (c > 1), 0)
                                 AS DOUBLE) / CAST(sum(c * ln) AS DOUBLE)
                          ELSE 0.0 END AS dup_line_char_frac
              FROM pl GROUP BY 1
            ), toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS t
              FROM d
            ), pt AS (
              SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
              FROM toks WHERE t <> '' GROUP BY 1, 2
            ), ta AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                       AS top_token_frac
              FROM pt GROUP BY 1
            )
            SELECT la.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
                   coalesce(n_tokens, 0) AS n_tokens, top_token_frac
            FROM la LEFT JOIN ta USING (doc_id)
        """,
        "embed_cosine": """
            WITH a AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ), p AS (
              SELECT x.vec_id, x.e AS e1, y.e AS e2
              FROM a x JOIN a y ON y.vec_id = x.vec_id + 1
            )
            SELECT vec_id,
              list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  [e1[i]*e2[i] for i in range(1, len(e1)+1)]),
                  (acc,x) -> acc+x)
              / ( sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    [e1[i]*e1[i] for i in range(1, len(e1)+1)]),
                    (acc,x) -> acc+x))
                * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    [e2[i]*e2[i] for i in range(1, len(e2)+1)]),
                    (acc,x) -> acc+x)) ) AS cos
            FROM p
        """,
        "embed_neardup": """
            SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                   TRUE AS all_twins_near,
                   TRUE AS recall_ge_90pct
            FROM embeddings
        """,
        "ldap_hash": """
            WITH s AS (
              SELECT doc_id, text,
                     substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS salt
              FROM documents
            )
            SELECT doc_id,
                   '{SSHA256}' || to_base64(
                     unhex(sha256(text || salt)) || encode(salt)
                   ) AS pwhash
            FROM s
        """,
        "rolling_fingerprint": """
            SELECT doc_id,
                   COALESCE(CAST(list_reduce(
                     list_prepend(CAST(0 AS HUGEINT),
                       [CAST(CAST('0x' || substr(hex(encode(text)), 2*i-1, 2) AS INT) AS HUGEINT)
                        for i in range(1, octet_length(encode(text)) + 1)]),
                     (acc, b) -> (acc * 1000003 + b) % 2305843009213693951
                   ) AS BIGINT), 0) AS rhash
            FROM documents
        """,
        "lang_id": f"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
              FROM documents
            ), scores AS ({lang_union})
            SELECT doc_id, lang AS lang_pred FROM scores
            QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) = 1
        """,
        "quality": f"""
            WITH tok AS (
              SELECT doc_id, t FROM (
                SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
                FROM documents)
            ), agg AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(count(DISTINCT t) AS BIGINT) AS n_distinct_tokens,
                     CAST(count(DISTINCT CASE WHEN t IN ({stop_en}) THEN t END) AS BIGINT) AS stopword_hits
              FROM tok GROUP BY doc_id
            )
            SELECT d.doc_id, a.n_tokens, a.n_distinct_tokens,
                   CAST(a.n_distinct_tokens AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) AS distinct_ratio,
                   a.stopword_hits,
                   CAST(length(d.text) AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) AS avg_token_len
            FROM documents d JOIN agg a USING (doc_id)
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "cosine_topk": """
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ), q AS (
              SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0
            ), scored AS (
              SELECT q.query_id, v.vec_id AS neighbor_id,
                     list_dot_product(q.qe, v.e) /
                     (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(v.e, v.e))) AS cos
              FROM q JOIN v ON v.vec_id <> q.query_id
            )
            SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
              FROM scored
            ) WHERE rnk <= 5
        """,
    }
