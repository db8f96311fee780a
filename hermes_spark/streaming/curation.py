"""Streaming curation: the declarative curation job over a LIVE
document stream, exactly-once into a curated target table.

The batch `curate` verb re-runs the whole corpus; this runs the SAME
YAML step list inside ``foreachBatch`` as documents arrive:

- per-row steps (pii_scrub, quality_filter, sample, chunk,
  decontaminate-vs-fixed-eval) apply to each micro-batch unchanged —
  they are row-local, so batch scope loses nothing;
- dedup steps are BATCH-SCOPED unless backed by the persisted
  signature store: declare ``near_dedup`` with ``store:`` to dedup
  across the whole stream history (first arrival wins, the
  incremental.py contract).  Exact cross-batch dedup is the same
  store at ``threshold: 1.0`` — identical texts have identical
  signatures;
- the curated output lands in a :class:`ParquetMergeTable` via
  idempotent MERGE keyed on the doc id (or (id, chunk_idx) after a
  chunk step) under the micro-batch id — a replayed batch after a
  crash re-merges as a no-op, and the signature-store commits inside
  the batch are content-stable, so BOTH stores converge: effectively
  exactly-once end to end, the same discipline as the CDC sink.

Resume is the stock checkpoint contract: stop the stream, run the
same config again, offsets and both tables pick up where they were.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hermes_spark.config import ConfigError, load_config


def _target_key(cur: dict) -> list[str]:
    key = [cur["id"]]
    if any(s["op"] == "chunk" for s in cur["steps"]):
        key.append("chunk_idx")
    return key


def _schemas(spark: SparkSession, cur: dict):
    """(input schema, output schema) for the stream — derived once
    against an empty frame: analysis only, no store side effects
    (dedup steps never change the schema, so the probe skips them).
    A declared ``schema:`` (DDL) skips the input probe entirely."""
    from hermes_spark.jobs import build_curation, parse_ddl_schema

    in_schema = parse_ddl_schema(
        cur.get("schema"), "hermes-spark.curation.schema"
    )
    if in_schema is None:
        from hermes_spark.jobs import registry_scheme

        path = cur["input"]
        scheme = registry_scheme(path)
        if scheme and scheme != "parquet":
            raise ConfigError(
                "hermes-spark.curation.schema",
                f"streaming over a {scheme}: source needs "
                "a declared schema: (no inference on a stream)",
            )
        if scheme == "parquet":
            path = path.split(":", 1)[1]
        try:
            in_schema = spark.read.parquet(path).schema
        except Exception as e:
            raise ConfigError(
                "hermes-spark.curation.input",
                f"cannot infer the stream schema — write at least one "
                f"parquet file first, or declare schema: "
                f"({str(e).splitlines()[0]})",
            ) from e
    probe_cfg = {
        "curation": {
            **cur,
            "steps": [
                s for s in cur["steps"]
                if s["op"] not in ("exact_dedup", "near_dedup")
            ] or [{"op": "sample", "fraction": 1.0, "salt": ""}],
        }
    }
    out_schema = build_curation(
        spark, probe_cfg, input_df=spark.createDataFrame([], in_schema)
    ).schema
    return in_schema, out_schema


def _open_target(spark: SparkSession, cur: dict, out_schema):
    from hermes_spark.tables import ParquetMergeTable

    return ParquetMergeTable(
        spark,
        os.path.join(cur["work_dir"], "curated"),
        key=_target_key(cur),
        schema=out_schema,
        compact_every=8,
    )


def start_curation_stream(
    spark: SparkSession,
    config,
    timeout: float | None = None,
    run_once: bool = False,
):
    """Start (or resume) the curation stream; returns the
    StreamingQuery (``run_once=True`` processes what's available,
    stops, and returns None).  Layout under ``curation.work_dir``:
    ``curated/`` (the target table), ``checkpoint/``."""
    from hermes_spark.jobs import build_curation

    cfg = config if isinstance(config, dict) and "curation" in config \
        else load_config(config)
    cur = cfg.get("curation")
    if cur is None:
        raise ConfigError(
            "hermes-spark.curation", "this config declares no curation job"
        )
    if not cur.get("work_dir"):
        raise ConfigError(
            "hermes-spark.curation.work_dir",
            "streaming curation needs work_dir: for the target table "
            "and checkpoint",
        )
    if any(s["op"] == "pack" for s in cur["steps"]):
        raise ConfigError(
            "hermes-spark.curation.steps",
            "pack is a whole-corpus operation — a stream would restart "
            "pack ids every micro-batch; run the batch curate verb over "
            "the curated table instead",
        )

    in_schema, out_schema = _schemas(spark, cur)
    target = _open_target(spark, cur, out_schema)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = build_curation(spark, cfg, input_df=batch_df)
        from pyspark.sql import functions as F

        target.merge(
            out.withColumn("op", F.lit("insert")),
            batch_id=f"curation-{batch_id}",
        )

    reader = spark.readStream.schema(in_schema)
    if cur.get("max_files_per_trigger"):
        reader = reader.option(
            "maxFilesPerTrigger", cur["max_files_per_trigger"]
        )
    # registry parquet:/json: handled inline (sources.stream has the
    # same dispatch but no reader-option passthrough); a filesystem
    # URI (s3://, hdfs://) or bare dir streams as parquet
    from hermes_spark.jobs import registry_scheme

    url = cur["input"]
    scheme = registry_scheme(url)
    if scheme == "parquet":
        src_stream = reader.parquet(url.split(":", 1)[1])
    elif scheme == "json":
        src_stream = reader.json(url.split(":", 1)[1])
    elif scheme:
        raise ConfigError(
            "hermes-spark.curation.input",
            f"streaming curation reads parquet:/json: (or a parquet "
            f"dir/URI), not {scheme}:",
        )
    else:
        src_stream = reader.parquet(url)
    q = (
        src_stream
        .writeStream.foreachBatch(on_batch)
        .option(
            "checkpointLocation", os.path.join(cur["work_dir"], "checkpoint")
        )
        .start()
    )
    if run_once:
        q.processAllAvailable()
        q.stop()
        return None
    if timeout is not None:
        q.awaitTermination(timeout)
    return q


def curated_table(spark: SparkSession, config):
    """Open the stream's curated target for reading.

    An EXISTING table self-describes from its commit log (create
    record key/schema + any evolution) — `curate --status` works even
    when the input directory has since been detached.  Only a
    first-ever open (no ledger yet) derives the schema from the input
    the way the stream start does."""
    from hermes_spark.tables import ParquetMergeTable
    from pyspark.sql import types as T

    cfg = config if isinstance(config, dict) and "curation" in config \
        else load_config(config)
    cur = cfg["curation"]
    if not cur.get("work_dir"):
        raise ConfigError(
            "hermes-spark.curation.work_dir", "streaming curation only"
        )
    path = os.path.join(cur["work_dir"], "curated")
    if os.path.exists(os.path.join(path, "_commits.jsonl")):
        # ledger present: a probe instance (constructor writes nothing
        # when the log exists) reads back the logged key + schema
        probe = ParquetMergeTable(
            spark, path, key=_target_key(cur),
            schema=T.StructType(
                [T.StructField(c, T.StringType(), True)
                 for c in _target_key(cur)]
            ),
        )
        key = probe.logged_key()
        schema = probe.logged_schema()
        if key and schema:
            return ParquetMergeTable(
                spark, path, key=key, schema=schema, compact_every=8
            )
    _, out_schema = _schemas(spark, cur)
    return _open_target(spark, cur, out_schema)
