"""Status surface: the reference's CLI status verb / notification
counters (hermesserver.py:584-616, clients/__init__.py:1852-1983) as a
StreamingQueryListener + ledger fold."""

from __future__ import annotations

import datetime as dt
import json

from hermes_spark.schema import TRANSCRIPT_SCHEMA
from hermes_spark.streaming.pipeline import CdcPipeline
from hermes_spark.streaming.status import attach_status


def _rows(conv, n, t0="2026-01-01 00:00:00"):
    base = dt.datetime.fromisoformat(t0)
    return [
        (conv, i, "user", f"{conv}-{i}", None, base + dt.timedelta(seconds=i))
        for i in range(n)
    ]


def test_status_listener_and_ledger_fold(spark, tmp_work):
    src = f"{tmp_work}/src"
    spark.createDataFrame(
        _rows("a", 20) + _rows("b", 10), TRANSCRIPT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    pipe = CdcPipeline(spark, src, f"{tmp_work}/run")
    st = attach_status(pipe, path=f"{tmp_work}/status.jsonl")
    try:
        pipe.run_available()
        # the listener bus is async — progress events land shortly
        # after processAllAvailable returns
        import time

        for _ in range(50):
            if st.listener.last_progress():
                break
            time.sleep(0.2)
        s = st.status()
        assert s["applied"]["inserts"] == 30
        assert s["applied"]["commits"] >= 1
        lp = s["last_trigger"]
        assert lp is not None and lp["num_input_rows"] == 30
        assert lp["duration_ms"].get("triggerExecution", 0) > 0
        assert s["sustained_rows_per_sec"] is None or s["sustained_rows_per_sec"] > 0
        # the JSONL audit file parses line-by-line and carries the
        # started + progress lifecycle
        events = [json.loads(l) for l in open(f"{tmp_work}/status.jsonl")]
        kinds = {e["event"] for e in events}
        assert "started" in kinds and "progress" in kinds
    finally:
        spark.streams.removeListener(st.listener)
