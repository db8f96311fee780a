"""Physical-plan shape regressions: the plans we iterated to must not
silently degrade.  Each assertion encodes a scale property from the
round briefs: column pruning reaches the scan, small dimensions
broadcast, filters push down, and the Python-free paths stay
Python-free."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermes_spark.tables import ParquetMergeTable, scratch_dir

WIDE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("cksum", T.StringType(), True),
        T.StructField("cks64", T.LongType(), True),
    ]
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pruned_state_read_never_scans_text(spark):
    """Join-mode CDC reads state as (key, op, ts, cks64): the parquet
    ReadSchema must not contain text/role/tool — at 10^12 turns the
    wide payload is ~95% of the bytes."""
    work = scratch_dir("planprune")
    t = ParquetMergeTable(
        spark, work + "/t", key=["conv_id", "turn_idx"], schema=WIDE_SCHEMA,
        tombstone_mode="retain",
    )
    rows = [("c1", 0, "insert", "user", "BIGTEXT", None, None, "x", 1)]
    t.merge(spark.createDataFrame(rows, WIDE_SCHEMA), batch_id=0)
    t.merge(
        spark.createDataFrame(
            [("c1", 1, "insert", "user", "MORE", None, None, "y", 2)], WIDE_SCHEMA
        ),
        batch_id=1,
    )
    pruned = t.read(columns=["conv_id", "turn_idx", "op", "ts", "cks64"])
    plan = _physical(pruned)
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "text" not in ln and "role" not in ln and "tool" not in ln, ln
    t.drop()


def test_small_dim_join_broadcasts(spark, sf_dir):
    """Star joins with tiny dims must pick BroadcastHashJoin, not a
    shuffled join — region/nation are KBs while lineitem is the fact."""
    import __spark_entry__ as E

    plan = _physical(E.queries()["star_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """A selective filter on the scan column appears in PushedFilters."""
    import os

    df = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .where(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _physical(df)
    assert "PushedFilters" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderkey" in ln for ln in pushed), plan


def test_headline_queries_have_no_python_udfs(spark, sf_dir):
    """The CDC/engine headline queries are JVM-only — a Python UDF
    (BatchEvalPython / ArrowEvalPython) sneaking into these plans is a
    10-100x regression at scale."""
    import __spark_entry__ as E

    qs = E.queries()
    for name in [
        "cdc_diff", "merkle_events", "sessionize", "tumbling_hourly",
        "range_join", "compact_events", "compact_events_map", "fanout",
        "fanout_cache",
        "merge_substitute_cache", "exact_dedup", "ngram_jaccard",
        "lang_id", "quality", "token_count", "fingerprint",
    ]:
        plan = _physical(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, (name, plan[:2000])


def test_exact_dedup_aggregates_map_side(spark, sf_dir):
    """exact_dedup is one hash aggregate pair (partial + final) over
    the fingerprint — no join, no window, no sort."""
    import __spark_entry__ as E

    plan = _physical(E.queries()["exact_dedup"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_round6_queries_have_no_python_udfs(spark, sf_dir):
    """The round-6 curation/tokenization/packing operators stay
    JVM-only too."""
    import __spark_entry__ as E

    qs = E.queries()
    for name in [
        "decontaminate", "repetition_stats", "bpe_token_count",
        "pack_sequences", "quantize_embeddings", "corpus_stats",
        "pii_scrub", "hash_sample", "chunk_documents",
    ]:
        plan = _physical(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, (name, plan[:2000])


def test_decontaminate_probe_join_broadcasts(spark, sf_dir):
    """The eval-shingle side of the contamination probe is broadcast —
    the corpus side must NOT shuffle for candidate generation (the
    100 TB property: probing is a map-side join)."""
    import __spark_entry__ as E

    plan = _physical(E.queries()["decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_single_exchange_per_window(spark, sf_dir):
    """Packing is sharded: the plan partitions by shard (hash
    exchange), never a single-partition global window (which would
    serialize the cumsum)."""
    import __spark_entry__ as E

    plan = _physical(E.queries()["pack_sequences"](spark, sf_dir))
    assert "SinglePartition" not in plan, plan[:2000]
    assert "Window" in plan


def test_quantize_and_chunk_are_narrow(spark, sf_dir):
    """Quantization and chunking are pure per-row transforms — the
    OPERATORS add zero exchanges on top of their input: they
    parallelize with the scan.  (Round 7: the declared queries may
    prepend one conditional round-robin spread of the scan itself —
    single-row-group testdata files plan 1-task scans — which is a
    no-op on already-wide inputs, so the operator property is pinned on
    a pre-widened frame.)"""
    from pyspark.sql import functions as F

    from hermes_spark.functions.curation import chunk_documents
    from hermes_spark.functions.similarity import quantize_embeddings

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(4)
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .repartition(4)
    )
    for name, df in (
        ("quantize_embeddings", quantize_embeddings(emb)),
        ("chunk_documents", chunk_documents(docs, ["doc_id"])),
    ):
        plan = _physical(df)
        # exactly the one deliberate input repartition, nothing more
        assert plan.count("Exchange") == 1, (name, plan[:2000])
        assert "hashpartitioning" not in plan, (name, plan[:2000])
