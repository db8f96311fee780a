"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages.

Round 6: the decode is REAL for every format the Python stdlib can
parse — WAV (RIFF/PCM via ``wave``), BMP (BITMAPINFOHEADER, hand
parse incl. row-stride padding and top-down images) and binary PPM
(P6).  ``decode_media`` returns typed per-media properties
(sample_rate / channels / frames / duration, width / height, and the
exact integer sum of decoded content values) so an independent engine
can recompute them from the generation formulas — the
``multimodal_decode`` contract query does exactly that against DuckDB.
Formats that genuinely need native libs absent from this container
(JPEG, H.264 video...) stay behind a loud capability flag
(``CAPABILITIES``) with a deterministic fake feature vector, so the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is exercised end-to-end either way.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Which payload formats this build decodes for real.  Anything False
#: falls back to the deterministic fake-feature stub — loudly, via the
#: ``decoded`` flag on every output row.
CAPABILITIES = {
    "wav": True,   # stdlib `wave` (RIFF / PCM)
    "bmp": True,   # hand parse (BITMAPINFOHEADER, 24bpp uncompressed)
    "ppm": True,   # hand parse (binary P6)
    "jpeg": False,  # needs PIL — not in this container
    "video": False,  # needs ffmpeg — not in this container
}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for the real decoder (PIL/ffmpeg not in this container).

    Deterministic fake: 16 floats derived from sha256(payload) — stable
    across runs/engines, so tests can assert exact values.  Replace
    with a real decode+embed on a cluster with media libs.
    """
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = hashlib.sha256(kind.encode() + payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Deterministic format builders (tests / oracle input generation).
# Each writes REAL format bytes so the decoders below parse genuine
# headers + content, not echoes of their own parameters.
# ---------------------------------------------------------------------------


def make_wav(sample_rate: int, n_channels: int, samples: "list[int]") -> bytes:
    """Real RIFF/PCM WAV bytes (16-bit LE) via the stdlib ``wave``
    module.  ``samples`` is the interleaved int16 frame data."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def make_bmp(width: int, height: int, seed: int, topdown: bool = False) -> bytes:
    """Real 24bpp uncompressed BMP (BITMAPINFOHEADER).  Pixel-area
    bytes take the value ``(seed + k*7) % 256`` where ``k`` indexes the
    NON-PADDING pixel bytes in file order — rows are padded to 4-byte
    stride with zeros, so a decoder that naively sums the whole pixel
    area (ignoring stride) gets a different answer.  ``topdown=True``
    writes a negative height (rows stored top-to-bottom)."""
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if topdown else height, 1, 24, 0,
        img_size, 2835, 2835, 0, 0,
    )
    rows = bytearray()
    k = 0
    pad = b"\x00" * (stride - width * 3)
    for _ in range(height):
        for _ in range(width * 3):
            rows.append((seed + k * 7) % 256)
            k += 1
        rows += pad
    return header + dib + bytes(rows)


def make_ppm(width: int, height: int, seed: int) -> bytes:
    """Real binary PPM (P6, maxval 255).  Pixel byte k (row-major RGB)
    takes the value ``(seed + k*3) % 256``."""
    body = bytes((seed + k * 3) % 256 for k in range(width * height * 3))
    return b"P6\n%d %d\n255\n" % (width, height) + body


# ---------------------------------------------------------------------------
# Real decoders.  Each returns the typed property dict for one payload
# or raises ValueError on malformed bytes (decode_media catches and
# falls back to the stub path with decoded=False).
# ---------------------------------------------------------------------------


def _sniff_format(payload: bytes) -> str | None:
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6" and payload[2:3] in (b"\n", b" ", b"\t", b"\r"):
        return "ppm"
    return None


def _decode_wav(payload: bytes) -> dict:
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sample_rate = w.getframerate()
        n_frames = w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()}")
        raw = w.readframes(n_frames)
    samples = np.frombuffer(raw, dtype="<i2")
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "n_values": int(samples.size),
        "sum_values": int(samples.sum(dtype=np.int64)),
        "_values": samples,
    }


def _decode_bmp(payload: bytes) -> dict:
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    dib_size, width, raw_height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if dib_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (dib={dib_size} bpp={bpp})")
    height = abs(raw_height)
    stride = (width * 3 + 3) & ~3
    if data_offset + stride * height > len(payload):
        raise ValueError("truncated BMP pixel area")
    px = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * 3]
    if raw_height > 0:
        # positive height = bottom-up storage; present ``_values`` in
        # IMAGE orientation (row 0 = top) so row-sensitive consumers
        # (resize) are orientation-correct.  Sums/histograms unchanged.
        px = px[::-1]
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "n_values": int(px.size),
        "sum_values": int(px.sum(dtype=np.int64)),
        "_values": px,
    }


def _decode_ppm(payload: bytes) -> dict:
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(payload) and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PPM header")
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = width * height * 3
    if i + n > len(payload):
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "n_values": int(px.size),
        "sum_values": int(px.sum(dtype=np.int64)),
        "_values": px,
    }


_DECODERS = {"wav": _decode_wav, "bmp": _decode_bmp, "ppm": _decode_ppm}

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_values", T.LongType(), True),
        T.StructField("sum_values", T.LongType(), True),
    ]
)

_DECODE_NULLS = {
    "format": None, "sample_rate": None, "n_channels": None,
    "n_frames": None, "duration_ms": None, "width": None,
    "height": None, "n_values": None, "sum_values": None,
}


def decode_media(media: DataFrame) -> DataFrame:
    """Real media decode as an Arrow-batched ``mapInPandas`` stage.

    Sniffs the payload magic and runs the matching stdlib decoder
    (WAV / BMP / PPM); unrecognized or malformed payloads come back
    with ``decoded=False`` and NULL properties instead of failing the
    batch (one corrupt blob must not kill a 100 TB scan).  Properties
    are exact integers (incl. ``sum_values`` over the decoded content)
    so they are engine-recomputable — see the ``multimodal_decode``
    contract query."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                row = {
                    "media_id": mid,
                    "kind": kind,
                    "decoded": False,
                    "n_bytes": len(payload) if payload is not None else 0,
                    **_DECODE_NULLS,
                }
                fmt = _sniff_format(payload)
                if fmt is not None and CAPABILITIES.get(fmt):
                    try:
                        props = _DECODERS[fmt](payload)
                        props.pop("_values", None)
                        row.update(props)
                        row["decoded"] = True
                    except (ValueError, wave.Error, struct.error, EOFError):
                        row["format"] = None  # malformed → stub path
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.mapInPandas(run, DECODE_SCHEMA)


def wav_params(v: int) -> tuple[int, int, int]:
    """(sample_rate, n_channels, n_frames) for synthetic wav #v —
    shared between the builder and the DuckDB oracle formulas."""
    return 8000 + v * 500, 1 + v % 2, 100 + v * 10


def synthetic_decodable_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL-format media table: wav / bmp / ppm payloads
    round-robin by ``media_id % 3``, every parameter and content byte a
    pure formula of the id — so an independent engine can recompute
    the decoded properties without parsing a single byte:

      wav  (id%3==0, v=id//3): rate 8000+v*500, channels 1+v%2,
           frames 100+v*10, sample j = ((v*7919 + j*31) % 65536) - 32768
      bmp  (id%3==1, v=id//3): width 4+v, height 3+v%5,
           pixel byte k = (v*13 + k*7) % 256  (k skips stride padding)
      ppm  (id%3==2, v=id//3): width 5+v, height 2+v%4,
           pixel byte k = (v*11 + k*3) % 256
    """
    rows = []
    for i in range(n):
        v = i // 3
        if i % 3 == 0:
            rate, ch, frames = wav_params(v)
            samples = [((v * 7919 + j * 31) % 65536) - 32768 for j in range(frames * ch)]
            payload, kind, meta = make_wav(rate, ch, samples), "audio", (
                None, None, frames * 1000 // rate, "pcm_s16le",
            )
        elif i % 3 == 1:
            w, h = 4 + v, 3 + v % 5
            payload, kind, meta = make_bmp(w, h, v * 13), "image", (w, h, None, "bmp")
        else:
            w, h = 5 + v, 2 + v % 4
            payload, kind, meta = make_ppm(w, h, v * 11), "image", (w, h, None, "ppm")
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction — the real plumbing.

    Arrow batches stream through the Python worker; each batch is
    processed as a whole.  Payloads in a stdlib-decodable format
    (WAV / BMP / PPM — see ``CAPABILITIES``) get REAL features: a
    16-bin normalized histogram of the decoded content values (audio
    samples / pixel bytes), i.e. the features change when the content
    changes, not just the bytes.  Anything else (JPEG, video, opaque
    blobs) falls back to the deterministic fake-feature stub.
    Repartition upstream by media_id so payload bytes distribute evenly
    (one huge video per partition is the skew case)."""

    def one(payload, kind: str) -> list:
        fmt = _sniff_format(payload)
        if fmt is not None and CAPABILITIES.get(fmt):
            try:
                props = _DECODERS[fmt](payload)
            except (ValueError, wave.Error, struct.error, EOFError):
                return _decode_stub(payload, kind).tolist()
            vals = props["_values"].astype(np.float64).ravel()
            if fmt == "wav":
                vals, span = vals + 32768.0, 65536.0
            else:
                span = 256.0
            hist, _ = np.histogram(vals, bins=FEATURE_DIM, range=(0.0, span))
            total = max(1, int(hist.sum()))
            return (hist.astype(np.float32) / np.float32(total)).tolist()
        return _decode_stub(payload, kind).tolist()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                one(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("out_frames", T.IntegerType(), True),
        T.StructField("out_rate", T.IntegerType(), True),
        T.StructField("n_values", T.LongType(), True),
        T.StructField("sum_values", T.LongType(), True),
    ]
)

_RESIZE_NULLS = {
    "format": None, "out_width": None, "out_height": None,
    "out_frames": None, "out_rate": None, "n_values": None,
    "sum_values": None,
}


def resize_media(
    media: DataFrame, out_w: int = 3, out_h: int = 2, out_rate: int = 4000
) -> DataFrame:
    """REAL resize / resample for the stdlib-decodable formats, as the
    same Arrow-batched ``mapInPandas`` pattern as ``decode_media``.

    Images (BMP / PPM): nearest-neighbor to ``out_w × out_h`` in image
    orientation — output pixel (r, c) samples source pixel
    ``(r*h // out_h, c*w // out_w)``.  Audio (WAV): nearest-neighbor
    resample to ``out_rate`` Hz — ``out_frames = n*out_rate // rate``
    output frames, output frame j sampling source frame
    ``j*rate // out_rate`` (all channels kept).  The index maps are
    pure integer floor formulas, so the ``multimodal_resize`` contract
    query recomputes ``sum_values`` of the RESIZED content in DuckDB
    from the generator formulas alone — an implementation that
    resampled at different offsets (or forgot the BMP bottom-up flip)
    produces a different sum.  Undecodable payloads pass through with
    ``decoded=False`` rather than failing the scan."""
    if out_w < 1 or out_h < 1 or out_rate < 1:
        raise ValueError("resize targets must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                row = {
                    "media_id": mid, "kind": kind, "decoded": False,
                    **_RESIZE_NULLS,
                }
                fmt = _sniff_format(payload)
                if fmt is not None and CAPABILITIES.get(fmt):
                    try:
                        props = _DECODERS[fmt](payload)
                    except (ValueError, wave.Error, struct.error, EOFError):
                        out.append(row)
                        continue
                    if fmt in ("bmp", "ppm"):
                        w, h = props["width"], props["height"]
                        px = props["_values"].reshape(h, w * 3)
                        rs = (np.arange(out_h) * h) // out_h
                        cs = (np.arange(out_w) * w) // out_w
                        byte_cols = (
                            cs[:, None] * 3 + np.arange(3)
                        ).ravel()
                        res = px[rs][:, byte_cols]
                        row.update(
                            format=fmt, decoded=True,
                            out_width=out_w, out_height=out_h,
                            n_values=int(res.size),
                            sum_values=int(res.sum(dtype=np.int64)),
                        )
                    else:  # wav
                        ch = props["n_channels"]
                        rate = props["sample_rate"]
                        n = props["n_frames"]
                        m = max(1, (n * out_rate) // rate)
                        sf = (np.arange(m) * rate) // out_rate
                        frames = props["_values"].reshape(n, ch)
                        res = frames[sf]
                        row.update(
                            format=fmt, decoded=True,
                            out_frames=int(m), out_rate=out_rate,
                            n_values=int(res.size),
                            sum_values=int(res.sum(dtype=np.int64)),
                        )
                out.append(row)
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("sample_sum", T.LongType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 5) -> DataFrame:
    """Frame sampling across modalities — one row per time tick.

    Audio (WAV) is REAL: at each tick ``t`` (0, every_ms, ... while
    ``t*rate // 1000 < n_frames``) the decoded source frame
    ``t*rate // 1000`` is read and ``sample_sum`` is the sum of its
    channel samples — a pure formula of the tick, recomputed by the
    ``multimodal_frames`` contract query in DuckDB.  Video payloads
    need codecs absent from this container: they emit the same
    tick rows from metadata duration with ``decoded=False`` (the
    plumbing — schema, tick plan, batch shape — is identical, only
    the per-frame decode is stubbed; ``frame_sample_plan`` remains
    the JVM-side metadata-only variant)."""
    if every_ms < 1:
        raise ValueError("every_ms must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                fmt = _sniff_format(payload)
                if fmt == "wav" and CAPABILITIES.get("wav"):
                    try:
                        props = _decode_wav(payload)
                    except (ValueError, wave.Error, struct.error, EOFError):
                        continue
                    ch = props["n_channels"]
                    rate = props["sample_rate"]
                    n = props["n_frames"]
                    frames = props["_values"].reshape(n, ch)
                    t = 0
                    while (t * rate) // 1000 < n:
                        f = (t * rate) // 1000
                        out.append({
                            "media_id": mid, "kind": kind,
                            "frame_ts_ms": t, "decoded": True,
                            "sample_sum": int(
                                frames[f].sum(dtype=np.int64)
                            ),
                        })
                        t += every_ms
                elif kind == "video" and meta is not None:
                    raw = meta.get("duration_ms") if isinstance(
                        meta, dict
                    ) else meta["duration_ms"]
                    # Arrow structs land as dicts with float-typed ints
                    # (NaN for NULL) in the pandas batch
                    dur = (
                        0 if raw is None or (
                            isinstance(raw, float) and raw != raw
                        ) else int(raw)
                    )
                    for t in range(0, max(dur, 1), every_ms):
                        out.append({
                            "media_id": mid, "kind": kind,
                            "frame_ts_ms": t, "decoded": False,
                            "sample_sum": None,
                        })
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-timestamp plan per
    video from metadata (JVM-side) — the decode of each frame would be
    a second mapInPandas over (media_id, frame_ts).  NotImplemented
    decode; the plan/schema/partitioning is the deliverable here."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(42)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = (
            (64 + i, 48 + i, None, "png")
            if kind == "image"
            else (None, None, 1000 * (1 + i % 7), "opus" if kind == "audio" else "h264")
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
