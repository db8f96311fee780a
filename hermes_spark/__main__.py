"""Command-line entry — the reference's operational verb set, driven
by the declarative YAML config.

The reference is operated entirely from the command line: hermes.py
dispatches the app context (server / client, config-driven startup,
hermes.py:33-118), and a unix-socket CLI exposes the runtime verbs —
``initsync`` / ``update`` / ``pause`` / ``resume`` / ``status`` /
``quit`` on the server (server/hermesserver.py:158-216) and
``pause`` / ``resume`` / ``status`` / ``quit`` on each client
(clients/__init__.py:313-360).

The Spark analog needs no socket: offsets live in the checkpoint and
the sink is exactly-once, so *pause* is simply stopping the stream
(Ctrl-C here) and *resume* is running the same config again over the
same ``work_dir`` — the replayed in-flight batch commits as a no-op.
That collapses the verb set to subcommands over one YAML file::

    python -m hermes_spark validate job.yml        # config check only
    python -m hermes_spark run job.yml --once      # one sync cycle
    python -m hermes_spark run job.yml             # continuous stream
    python -m hermes_spark status job.yml          # counters + progress
    python -m hermes_spark drain job.yml           # retry the DLQ now
    python -m hermes_spark maintain job.yml        # compact + vacuum

``validate`` is the cerberus-style gate (lib/config/__init__.py:88-129
behavior): it parses and validates without touching Spark, and an
error names the dotted config path.  ``run --once`` is the reference's
``update`` (process everything currently available, then stop);
first ``run`` over an empty work_dir is ``initsync``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m hermes_spark",
        description="PySpark CDC engine — config-driven operational CLI",
    )
    sub = ap.add_subparsers(dest="verb", required=True)

    def _with_config(p):
        p.add_argument("config", help="YAML job config path")
        return p

    _with_config(sub.add_parser(
        "validate", help="parse + validate the config; no Spark"))

    run = _with_config(sub.add_parser(
        "run", help="start the pipeline (resumes from checkpoint)"))
    run.add_argument(
        "--once", action="store_true",
        help="process everything currently available, then stop "
             "(the reference 'update' verb)")
    run.add_argument(
        "--timeout", type=float, default=None, metavar="SEC",
        help="stop the continuous stream after SEC seconds")

    st = _with_config(sub.add_parser(
        "status", help="print counters + last trigger as JSON"))
    st.add_argument(
        "--no-queue", action="store_true",
        help="skip the error-queue depth count (no Spark job)")

    _with_config(sub.add_parser(
        "drain", help="run a dependency-ordered DLQ retry pass now"))

    mt = _with_config(sub.add_parser(
        "maintain", help="out-of-band target maintenance"))
    mt.add_argument(
        "--mode", choices=("full", "incremental"), default="full")

    cu = _with_config(sub.add_parser(
        "curate", help="run the declarative batch curation job"))
    cu.add_argument(
        "--output", default=None, metavar="PATH",
        help="override curation.output (parquet directory)")
    cu.add_argument(
        "--stream", action="store_true",
        help="run as a continuous stream over curation.input into the "
             "curated table under curation.work_dir (exactly-once, "
             "checkpoint-resumable)")
    cu.add_argument(
        "--once", action="store_true",
        help="with --stream: process everything available, then stop")
    cu.add_argument(
        "--timeout", type=float, default=None, metavar="SEC",
        help="with --stream: stop after SEC seconds")
    cu.add_argument(
        "--status", action="store_true",
        help="report the stream's curated table (rows, commits) "
             "without processing anything")

    for name in ("run", "status", "drain", "maintain", "curate"):
        p = sub.choices[name]
        p.add_argument(
            "--master", default=None,
            help="Spark master (default local[$SPARK_GRAFT_CPUS]; "
                 "'inherit' defers to spark-submit)")
    return ap


def _offline_status(pipe, cfg: dict, include_queue: bool) -> dict:
    """The ``status`` verb without a live stream: durable per-op
    counters folded from the commit ledger, the last trigger row from
    the status JSONL (written by the listener during any prior run),
    and the current error-queue depth.  Mirrors what the reference
    status verb reports from a running server (hermesserver.py:584-616)
    — here the durable half survives the process, so status works
    between runs too."""
    api = getattr(pipe, "status_api", None)
    if api is not None:
        out = api.status(include_queue_depth=include_queue)
    else:
        from hermes_spark.streaming.status import (
            PipelineStatus,
            PipelineStatusListener,
        )
        out = PipelineStatus(pipe, PipelineStatusListener()).status(
            include_queue_depth=include_queue)
    st = cfg.get("status") or {}
    path = st.get("path")
    if out.get("last_trigger") is None and path and os.path.exists(path):
        last = None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    last = line
        if last:
            try:
                out["last_trigger"] = json.loads(last)
            except json.JSONDecodeError:
                pass
    return out


def main(argv=None, spark=None) -> int:
    """Run one CLI verb; returns the exit code.

    ``spark`` is injectable for tests (and embedders); when None, a
    session is built lazily — ``validate`` never builds one."""
    from hermes_spark.config import ConfigError, load_config

    args = _build_parser().parse_args(argv)

    try:
        cfg = load_config(args.config)
    except ConfigError as e:
        print(f"config error at {e.path}: {e.message}", file=sys.stderr)
        return 2

    if args.verb == "validate":
        out = {"ok": True}
        if cfg.get("pipeline"):
            out.update({
                "mode": cfg["pipeline"]["mode"],
                "source": cfg["pipeline"]["source"],
                "work_dir": cfg["pipeline"]["work_dir"],
                "types": [t["name"] for t in (cfg.get("datamodel") or {}).get(
                    "types", [])],
            })
        if cfg.get("curation"):
            out["curation_steps"] = [
                s["op"] for s in cfg["curation"]["steps"]]
        print(json.dumps(out))
        return 0

    # verb/config shape checks BEFORE the session build — a pure
    # config error must not pay JVM startup
    if args.verb == "curate" and not cfg.get("curation"):
        print("config error at hermes-spark.curation: this config "
              "declares no curation job", file=sys.stderr)
        return 2
    if args.verb != "curate" and cfg.get("pipeline") is None:
        print("config error at hermes-spark.pipeline: this verb needs a "
              "pipeline: section", file=sys.stderr)
        return 2

    if spark is None:
        from hermes_spark.session import build_session

        spark = build_session(
            app_name=f"hermes_spark.{args.verb}", master=args.master)

    if args.verb == "curate":
        try:
            if args.status:
                from hermes_spark.streaming.curation import curated_table

                t = curated_table(spark, cfg)
                print(json.dumps({
                    "rows_curated": t.read().count(),
                    "target_version": t.current_version(),
                    "commits": len(t.committed_batch_ids()),
                }))
                return 0
            if args.stream:
                from hermes_spark.streaming.curation import (
                    curated_table,
                    start_curation_stream,
                )

                q = start_curation_stream(spark, cfg, run_once=args.once)
                if q is not None:
                    try:
                        if args.timeout is not None:
                            q.awaitTermination(args.timeout)
                        else:
                            q.awaitTermination()
                    except KeyboardInterrupt:
                        pass  # pause: checkpointed, rerun resumes
                    finally:
                        q.stop()
                t = curated_table(spark, cfg)
                print(json.dumps({
                    "rows_curated": t.read().count(),
                    "target_version": t.current_version(),
                }))
                return 0
            from hermes_spark.jobs import run_curation

            report = run_curation(spark, cfg, output=args.output)
        except ConfigError as e:
            print(f"config error at {e.path}: {e.message}", file=sys.stderr)
            return 2
        print(json.dumps(report))
        return 0

    from hermes_spark.config import build_pipeline

    try:
        # build from the ORIGINAL source — load_config's output is
        # normalized (wrapper stripped) and not itself a valid document
        pipe = build_pipeline(spark, args.config)
    except ConfigError as e:
        print(f"config error at {e.path}: {e.message}", file=sys.stderr)
        return 2

    if args.verb == "run":
        if args.once:
            pipe.run_available()
        else:
            q = pipe.start()
            try:
                if args.timeout is not None:
                    q.awaitTermination(args.timeout)
                else:
                    q.awaitTermination()
            except KeyboardInterrupt:
                pass  # pause: offsets are checkpointed, rerun resumes
            finally:
                q.stop()
                try:
                    q.awaitTermination(30)
                except Exception:
                    pass
        print(json.dumps(_offline_status(pipe, cfg, include_queue=False)))
        return 0

    if args.verb == "status":
        print(json.dumps(
            _offline_status(pipe, cfg, include_queue=not args.no_queue)))
        return 0

    if args.verb == "drain":
        dlq = getattr(pipe, "dlq", None)
        if dlq is None:
            print(json.dumps({"remaining": 0, "note": "no error queue "
                              "configured (pipeline.validator absent)"}))
            return 0
        remaining = pipe.retry_queue()
        print(json.dumps({"remaining": remaining}))
        return 0

    if args.verb == "maintain":
        pipe.maintain(mode=args.mode)
        print(json.dumps({
            "ok": True, "mode": args.mode,
            "target_version": pipe.target.current_version(),
        }))
        return 0

    raise AssertionError(f"unhandled verb {args.verb}")  # pragma: no cover


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
