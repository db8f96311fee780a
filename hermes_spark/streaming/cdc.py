"""Stateful per-conversation CDC classification (the streaming J3).

Each arriving turn is classified insert / update / delete against a
per-``conv_id`` state store, reproducing the reference's snapshot-diff
semantics (/root/reference/lib/datamodel/dataobjectlist.py:294-322 and
the client apply path clients/datamodel.py:645-659) incrementally:

* first delivery of a (conv_id, turn_idx)        → insert
* re-delivery with a different content checksum   → update
* re-delivery with the same checksum              → no-op (dropped;
  unchanged rows never re-emit — the reference's dedup-by-content)
* tombstone (text IS NULL)                        → delete if the key
  exists, else no-op (removing a non-existent key emits nothing)

Design for 10^12 turns:

* The content checksum is computed **JVM-side** (``F.sha2`` over the
  event-visible columns) *before* the stateful operator, so the Python
  side never hashes text — the grouped-state function only does
  O(batch) dict/array bookkeeping on 64-char digests.  This is also
  what bounds state size: state per conversation is (turn_idx → cksum),
  ~72 bytes/turn, never the text itself (mega-conversation safe).
* ``applyInPandasWithState`` keyed on conv_id — state co-partitioned by
  the same key as every downstream aggregate, so the post-classify
  windowed rollups reuse the shuffle.
* Arrow batches in/out; no per-row Python UDFs anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hermes_spark.operators.checksum import row_cksum
from hermes_spark.schema import CHANGE_EVENT_SCHEMA, TRANSCRIPTS

# state: parallel arrays (turn_idxs, cksums) — compact, Arrow-friendly
STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType()), True),
        T.StructField("cksums", T.ArrayType(T.StringType()), True),
    ]
)

_IN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "cksum"]


def _classify_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Grouped-state function: diff arriving turns against the held
    (turn_idx → cksum) snapshot for one conversation."""
    if state.exists:
        turn_idxs, cksums = state.get
        snap: dict[int, str] = dict(zip(turn_idxs, cksums))
    else:
        snap = {}

    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        # numpy-only hot path: per-group overhead is the throughput
        # ceiling (every active conversation is one function call per
        # micro-batch), so no pandas ops until the final output frame.
        ti = pdf["turn_idx"].to_numpy()
        ts = pdf["ts"].to_numpy()
        cks = pdf["cksum"].to_numpy()
        txt = pdf["text"].to_numpy(dtype=object)

        # per-key ordered application: event time then turn_idx (W3
        # analog — deterministic under bounded out-of-order arrival)
        order = np.lexsort((ti, ts))
        ti, ts, cks, txt = ti[order], ts[order], cks[order], txt[order]
        is_tomb = np.array([t is None for t in txt], dtype=bool)

        uniq = len(np.unique(ti)) == len(ti)
        if uniq:
            # vectorized classification: no turn delivered twice in-batch
            prev = np.array([snap.get(t) for t in ti.tolist()], dtype=object)
            absent = np.equal(prev, None)
            changed = prev != cks
            op = np.where(
                is_tomb,
                np.where(~absent, "delete", "noop"),
                np.where(absent, "insert", np.where(changed, "update", "noop")),
            )
            live = ~is_tomb
            snap.update(zip(ti[live].tolist(), cks[live]))
            for k in ti[is_tomb & ~absent].tolist():
                snap.pop(k, None)
        else:
            # intra-batch re-delivery: apply sequentially, but emit at
            # most ONE compacted event per turn (classified against the
            # batch-start state — the sink MERGE needs one row per key,
            # and compaction here is the reference's autoremediation
            # _mergeEvents collapsed to first/last state, errorqueue.py:
            # 187-417)
            before = {t: snap.get(t) for t in set(ti.tolist())}
            last_pos: dict[int, int] = {}
            for i, (tidx, tomb, ck) in enumerate(
                zip(ti.tolist(), is_tomb.tolist(), cks)
            ):
                if tomb:
                    snap.pop(tidx, None)
                else:
                    snap[tidx] = ck
                last_pos[tidx] = i
            ops = []
            for i, tidx in enumerate(ti.tolist()):
                if last_pos[tidx] != i:
                    ops.append("noop")  # superseded within batch
                    continue
                pre = before[tidx]
                post = snap.get(tidx)
                if post is None:
                    ops.append("delete" if pre is not None else "noop")
                elif pre is None:
                    ops.append("insert")
                elif pre != post:
                    ops.append("update")
                else:
                    ops.append("noop")
            op = np.array(ops, dtype=object)

        keep = op != "noop"
        if keep.any():
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": pdf["conv_id"].to_numpy()[order][keep],
                        "turn_idx": ti[keep],
                        "op": op[keep],
                        "role": pdf["role"].to_numpy()[order][keep],
                        "text": txt[keep],
                        "tool": pdf["tool"].to_numpy()[order][keep],
                        "ts": ts[keep],
                        "cksum": cks[keep],
                    }
                )
            )

    if snap:
        items = sorted(snap.items())
        state.update(([i for i, _ in items], [c for _, c in items]))
    elif state.exists:
        state.remove()

    if out:
        yield pd.concat(out, ignore_index=True)


def with_content_cksum(turns: DataFrame) -> DataFrame:
    """JVM-side checksum over the event-visible columns (schema
    registry: TRANSCRIPTS.event_visible) — NULL text yields a checksum
    too, but tombstones are classified by text IS NULL, not by cksum."""
    return turns.withColumn("cksum", row_cksum(list(TRANSCRIPTS.event_visible)))


def classify_changes(
    turns: DataFrame,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Streaming (or batch) DataFrame of turns → change-event stream.

    Works identically on a batch DataFrame in tests?  No — the stateful
    operator is streaming-only; batch equivalence is checked against
    ``operators.diff.snapshot_diff`` on the same input (tests assert
    final-state equality).
    """
    src = with_content_cksum(turns)
    if watermark is not None and turns.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.select(*_IN_COLS).groupBy("conv_id").applyInPandasWithState(
        _classify_group,
        outputStructType=CHANGE_EVENT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
