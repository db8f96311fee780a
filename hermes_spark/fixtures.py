"""Deterministic transcript fixtures (seed 42, no external data).

Synthesizes the BASELINE.json ``input_hint`` table
(conv_id, turn_idx, role, text, tool, ts) at parameterized scale,
mirroring the reference's deterministic Faker corpus approach
(/root/reference/tests/functional/fixtures/data/generateData.py:151,
seed 42) but shaped for the streaming engine's test axes:

* zipf-ish conversation lengths (2..max_len) plus a few
  **mega-conversations** holding a large share of turns (skew/salting);
* mostly-monotonic event time per conversation with bounded
  out-of-order jitter and a controlled fraction of late-beyond-watermark
  turns (late-data policy tests);
* deterministic re-deliveries: duplicate turns (same text → no-op),
  modified turns (same key, new text → update), and tombstones
  (text NULL → delete), split into numbered micro-batches for
  replay/resume tests.

Everything is vectorized numpy/pandas — generating 10^7 turns takes
seconds — and reproducible from (seed, n_convs) alone.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array(["search", "python", "browser", "calculator", "sql"])
EPOCH = np.datetime64("2026-01-01T00:00:00", "us")


@dataclass
class TranscriptConfig:
    n_convs: int = 200
    seed: int = 42
    max_len: int = 500
    n_mega: int = 3
    mega_len: int = 4000
    mean_gap_s: float = 40.0
    session_break_prob: float = 0.03  # gap >> session gap
    ooo_frac: float = 0.05            # bounded out-of-order
    ooo_max_s: float = 120.0
    late_frac: float = 0.002          # beyond-watermark late turns
    late_s: float = 3600.0


def _texts(conv_ids: np.ndarray, turn_idx: np.ndarray, salt: str = "") -> np.ndarray:
    """Deterministic pseudo-text per (conv, turn): cheap but unique."""
    base = np.char.add(
        np.char.add(conv_ids.astype("U24"), "::"),
        turn_idx.astype("U10"),
    )
    if salt:
        base = np.char.add(base, "::" + salt)
    # expand to a sentence-ish payload without python-level hashing per row
    return np.char.add(
        np.char.add("turn text ", base),
        np.char.multiply(" lorem", (turn_idx % 7 + 1).astype(int)),
    )


def generate_transcripts(cfg: TranscriptConfig | None = None) -> pd.DataFrame:
    cfg = cfg or TranscriptConfig()
    rng = np.random.default_rng(cfg.seed)

    lens = np.minimum(
        2 + rng.zipf(1.6, cfg.n_convs) % cfg.max_len, cfg.max_len
    ).astype(np.int64)
    if cfg.n_mega > 0:
        lens[: cfg.n_mega] = cfg.mega_len  # deterministic mega-conversations

    total = int(lens.sum())
    conv_ord = np.repeat(np.arange(cfg.n_convs), lens)
    conv_ids = np.char.add("conv-", np.char.zfill(conv_ord.astype("U10"), 8))
    turn_idx = (
        np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    ).astype(np.int32)

    # roles: user, assistant, (tool if assistant called one), cycle-ish
    role_pick = rng.random(total)
    role = np.where(
        turn_idx % 3 == 0,
        "user",
        np.where(turn_idx % 3 == 1, "assistant", "tool"),
    ).astype(object)
    role = np.where((turn_idx == 0) & (role_pick < 0.1), "system", role)

    # assistant turns call a tool ~45% of the time; the following turn
    # (turn_idx % 3 == 2) is its 'tool' response — gives the join fixture.
    calls_tool = (role == "assistant") & (rng.random(total) < 0.45)
    tool = np.where(calls_tool, TOOLS[rng.integers(0, len(TOOLS), total)], None)
    # tool-response rows only where previous turn actually called a tool
    prev_called = np.concatenate(([False], calls_tool[:-1])) & (
        np.concatenate(([0], conv_ord[:-1])) == conv_ord
    )
    role = np.where((role == "tool") & ~prev_called, "assistant", role)

    text = _texts(conv_ids, turn_idx)

    # event time: per-conv start + cumulative gaps
    conv_start_s = rng.uniform(0, 86400, cfg.n_convs)
    gaps = rng.exponential(cfg.mean_gap_s, total)
    breaks = rng.random(total) < cfg.session_break_prob
    gaps = np.where(breaks, gaps + rng.uniform(3600, 7200, total), gaps)
    # cumulative within conversation
    cum = np.cumsum(gaps)
    conv_offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cum = cum - np.repeat(cum[conv_offsets] - gaps[conv_offsets], lens)
    ts_s = np.repeat(conv_start_s, lens) + cum

    # bounded out-of-order jitter
    ooo = rng.random(total) < cfg.ooo_frac
    ts_s = np.where(ooo, ts_s - rng.uniform(0, cfg.ooo_max_s, total), ts_s)
    # late-beyond-watermark turns
    late = rng.random(total) < cfg.late_frac
    ts_s = np.where(late, ts_s - cfg.late_s, ts_s)

    ts = EPOCH + (ts_s * 1e6).astype("timedelta64[us]")

    return pd.DataFrame(
        {
            "conv_id": conv_ids.astype(object),
            "turn_idx": turn_idx,
            "role": role.astype(object),
            "text": text.astype(object),
            "tool": pd.array(tool, dtype=object),
            "ts": ts,
        }
    )


def generate_change_batches(
    base: pd.DataFrame,
    n_batches: int = 4,
    update_frac: float = 0.05,
    delete_frac: float = 0.02,
    dup_frac: float = 0.03,
    seed: int = 4242,
) -> list[pd.DataFrame]:
    """Split the base stream into ordered micro-batch frames and inject
    re-deliveries: updates (same key, new text), duplicates (no-ops) and
    tombstones (text NULL = delete) referencing keys from earlier
    batches.  Expected ops are recoverable: first delivery of a key =
    insert; re-delivery with new text = update; text NULL = delete;
    exact duplicate = no-op.
    """
    rng = np.random.default_rng(seed)
    df = base.sort_values("ts", kind="stable").reset_index(drop=True)
    cuts = np.linspace(0, len(df), n_batches + 1).astype(int)
    # injected re-deliveries carry event times strictly AFTER the whole
    # base stream, strictly increasing across (batch, kind, seq) — so
    # global last-writer-by-ts ordering equals stream arrival ordering
    # and the batch oracle is unambiguous.
    horizon = df["ts"].max()
    batches = []
    seen: pd.DataFrame | None = None
    for i in range(n_batches):
        b = df.iloc[cuts[i] : cuts[i + 1]].copy()
        if seen is not None and len(seen) > 0:
            base_off = i * 1_000_000  # disjoint per-batch second ranges

            def _stamp(frame: pd.DataFrame, kind_off: int) -> pd.DataFrame:
                frame = frame.copy()
                frame["ts"] = horizon + pd.to_timedelta(
                    base_off + kind_off + np.arange(len(frame)) + 1, "s"
                )
                return frame

            k = min(len(seen), max(1, int(len(b) * update_frac)))
            upd = seen.sample(n=k, random_state=int(rng.integers(1 << 30)))
            upd = _stamp(upd, 0)
            upd["text"] = upd["text"] + f" [edited@b{i}]"
            taken = upd.set_index(["conv_id", "turn_idx"]).index

            kd = min(len(seen), max(1, int(len(b) * delete_frac)))
            dels = seen.sample(n=kd, random_state=int(rng.integers(1 << 30)))
            dels = dels[~dels.set_index(["conv_id", "turn_idx"]).index.isin(taken)]
            dels = _stamp(dels, 100_000)
            dels["text"] = None  # tombstone
            taken = taken.append(dels.set_index(["conv_id", "turn_idx"]).index)

            kq = min(len(seen), max(1, int(len(b) * dup_frac)))
            dups = seen.sample(n=kq, random_state=int(rng.integers(1 << 30)))
            dups = dups[~dups.set_index(["conv_id", "turn_idx"]).index.isin(taken)]
            dups = _stamp(dups, 200_000)

            b = pd.concat([b, upd, dels, dups], ignore_index=True)
        batches.append(b.reset_index(drop=True))
        new_seen = df.iloc[cuts[i] : cuts[i + 1]]
        seen = (
            new_seen
            if seen is None
            else pd.concat([seen, new_seen], ignore_index=True)
        )
        seen = seen.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    return batches


def fingerprint(df: pd.DataFrame) -> str:
    """Order-insensitive digest of a frame — fixture self-check."""
    h = hashlib.sha256()
    for line in sorted(
        df.astype(str).apply(lambda r: "|".join(r.values), axis=1).tolist()
    ):
        h.update(line.encode())
    return h.hexdigest()
