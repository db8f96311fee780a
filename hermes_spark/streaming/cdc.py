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

# bucketed mode: state keyed on hash(conv_id) % n_buckets; entries are
# flattened (conv_id, turn_idx, cksum) triples for all convs in the
# bucket.  Rationale: applyInPandasWithState costs ~5ms per GROUP per
# batch (Arrow chunk + pandas frames + state ser/de), and with state
# keyed on conv_id every active conversation pays it every micro-batch.
# Bucketing divides the group count by ~30× while the per-(conv,turn)
# classification logic stays identical — the standard state-key
# coarsening trick for high-cardinality keyed state.
BUCKET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("conv_ids", T.ArrayType(T.StringType()), True),
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType()), True),
        # state compares 64-bit content hashes (xxhash64), not the full
        # sha256 hex: 4× smaller state and serde; the sha256 checksum
        # still travels in the event payload / MERGE guard / merkle.
        T.StructField("cksums", T.ArrayType(T.LongType()), True),
    ]
)

_IN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "cksum"]
_BUCKET_IN_COLS = [*_IN_COLS, "cks64", "_bucket"]


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


def _classify_bucket(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Bucketed grouped-state function: same per-(conv,turn) truth
    table as ``_classify_group``, state holds every conversation of the
    bucket as flattened parallel arrays."""
    if state.exists:
        conv_ids, turn_idxs, cksums = state.get
        snap: dict[tuple, str] = dict(zip(zip(conv_ids, turn_idxs), cksums))
    else:
        snap = {}

    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        conv = pdf["conv_id"].to_numpy(dtype=object)
        ti = pdf["turn_idx"].to_numpy()
        ts = pdf["ts"].to_numpy()
        cks = pdf["cks64"].to_numpy()
        sha = pdf["cksum"].to_numpy()
        txt = pdf["text"].to_numpy(dtype=object)

        # per-conv ordered application: (ts, turn_idx) within each conv;
        # cross-conv interleaving is irrelevant (independent keys)
        order = np.lexsort((ti, ts))
        conv, ti, ts, cks, sha, txt = (
            conv[order], ti[order], ts[order], cks[order], sha[order], txt[order],
        )
        is_tomb = np.array([t is None for t in txt], dtype=bool)
        keys = list(zip(conv.tolist(), ti.tolist()))

        if len(set(keys)) == len(keys):
            prev = np.array([snap.get(k) for k in keys], dtype=object)
            absent = np.equal(prev, None)
            changed = prev != cks
            op = np.where(
                is_tomb,
                np.where(~absent, "delete", "noop"),
                np.where(absent, "insert", np.where(changed, "update", "noop")),
            )
            live = ~is_tomb
            snap.update(
                zip([k for k, l in zip(keys, live.tolist()) if l], cks[live])
            )
            for k, t, a in zip(keys, is_tomb.tolist(), absent.tolist()):
                if t and not a:
                    snap.pop(k, None)
        else:
            # intra-batch re-delivery: sequential apply, compacted
            # emission (≤1 event per key vs batch-start state)
            before = {k: snap.get(k) for k in set(keys)}
            last_pos: dict[tuple, int] = {}
            for i, (k, tomb, ck) in enumerate(zip(keys, is_tomb.tolist(), cks)):
                if tomb:
                    snap.pop(k, None)
                else:
                    snap[k] = ck
                last_pos[k] = i
            ops = []
            for i, k in enumerate(keys):
                if last_pos[k] != i:
                    ops.append("noop")
                    continue
                pre, post = before[k], snap.get(k)
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
                        "conv_id": conv[keep],
                        "turn_idx": ti[keep],
                        "op": op[keep],
                        "role": pdf["role"].to_numpy()[order][keep],
                        "text": txt[keep],
                        "tool": pdf["tool"].to_numpy()[order][keep],
                        "ts": ts[keep],
                        "cksum": sha[keep],
                    }
                )
            )

    if snap:
        items = sorted(snap.items())
        state.update(
            (
                [c for (c, _t), _ in items],
                [t for (_c, t), _ in items],
                [int(v) for _, v in items],
            )
        )
    elif state.exists:
        state.remove()

    if out:
        yield pd.concat(out, ignore_index=True)


def with_content_cksum(turns: DataFrame) -> DataFrame:
    """JVM-side checksums over the event-visible columns (schema
    registry: TRANSCRIPTS.event_visible) — NULL text yields a checksum
    too, but tombstones are classified by text IS NULL, not by cksum.

    Two hashes: ``cksum`` (sha256 hex — event payload, MERGE guard,
    merkle leaves) and ``cks64`` (xxhash64 — the state-store compare
    key; 8 bytes instead of 64, which is most of the state size)."""
    cols = list(TRANSCRIPTS.event_visible)
    return turns.withColumn("cksum", row_cksum(cols)).withColumn(
        "cks64", F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols])
    )


def classify_changes(
    turns: DataFrame,
    watermark: str | None = "10 minutes",
    n_buckets: int | None = 1024,
) -> DataFrame:
    """Streaming DataFrame of turns → change-event stream.

    ``n_buckets``: state-key coarsening factor (None → state keyed
    directly on conv_id; the semantics are identical, tests assert it —
    bucketing only amortizes the per-group operator overhead).  Batch
    equivalence oracle: ``operators.diff.snapshot_diff`` on the same
    input (tests assert final-state equality).
    """
    src = with_content_cksum(turns)
    if watermark is not None and turns.isStreaming:
        src = src.withWatermark("ts", watermark)
    if n_buckets is None:
        return src.select(*_IN_COLS).groupBy("conv_id").applyInPandasWithState(
            _classify_group,
            outputStructType=CHANGE_EVENT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    src = src.withColumn(
        "_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )
    return src.select(*_BUCKET_IN_COLS).groupBy("_bucket").applyInPandasWithState(
        _classify_bucket,
        outputStructType=CHANGE_EVENT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
