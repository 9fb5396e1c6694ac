"""Multimodal column handling for LLM training-data pipelines.

Images/audio/video ride as opaque BINARY columns with typed metadata
structs; decode/resize/frame-sample are Arrow-batched mapInPandas stages.
The decode step is REAL for the two uncompressed formats that need no
external libraries — binary PPM (P6) and uncompressed 24-bit BMP — and
raises a clear error for formats that would need a codec library (JPEG,
PNG, audio, video); swapping in PIL/ffmpeg later changes only the inner
per-payload function.

Scale notes: binary payloads make rows wide, so these stages run on
repartitioned inputs sized by `target_rows_per_batch` (Arrow batch memory =
rows x payload), and metadata-only predicates (media_type, width) are
ordinary columns Catalyst can push down to parquet BEFORE the payload is
ever read — keep payloads in a separate column chunk and select late.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decode: byte size + an md5 content
    key (dedup-ready, same operator family as exact text dedup)."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col))).withColumn(
        "content_key", F.md5(F.col(payload_col).cast("string"))
    )


# ---------------------------------------------------------------------------
# Real decoders (pure Python, zero dependencies). These are defined at
# module level for unit-testability but REDEFINED inside the mapInPandas
# closure below: everything shipped to executors must pickle by value —
# the external driver's session does not guarantee `orion_spark` is
# importable on workers.
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> tuple[int, int, list[int]]:
    """Binary PPM (P6): 'P6' <ws> width <ws> height <ws> maxval <one ws>
    raw RGB bytes. Comments (#..EOL) legal anywhere in the header.
    Returns (width, height, flat channel values)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = payload[i + 1 : i + 1 + w * h * 3]  # exactly one ws after maxval
    if len(data) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return w, h, list(data)


def decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows bottom-up,
    padded to 4-byte boundaries, BGR per pixel. Returns (width, height,
    flat channel values in row-major top-down RGB order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    vals: list[int] = []
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for r in rows:
        base = data_off + r * row_bytes
        row = payload[base : base + w * 3]
        if len(row) != w * 3:
            raise ValueError("truncated BMP pixel data")
        for px in range(w):
            b, g, rr = row[px * 3 : px * 3 + 3]
            vals.extend((rr, g, b))
    return w, h, vals


def decode_image(payload: bytes) -> tuple[str, int, int, list[int]]:
    """Dispatch on magic bytes. Compressed formats need a codec library
    this environment doesn't ship — fail loudly, never guess."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    if payload[:2] == b"P6":
        return ("ppm", *decode_ppm(payload))
    if payload[:2] == b"BM":
        return ("bmp", *decode_bmp(payload))
    raise NotImplementedError(
        f"no codec for magic {payload[:2]!r} (JPEG/PNG need an image library)"
    )


def encode_ppm(w: int, h: int, vals: list[int]) -> bytes:
    """Inverse of decode_ppm — used by tests and fixture synthesis."""
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(vals)


def encode_bmp(w: int, h: int, vals: list[int]) -> bytes:
    """Inverse of decode_bmp: bottom-up, padded, BGR (the common layout)."""
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + row_bytes * h, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0)
    body = b""
    for r in range(h - 1, -1, -1):  # bottom-up: last image row first
        row = bytearray()
        for px in range(w):
            i = (r * w + px) * 3
            rr, g, b = vals[i], vals[i + 1], vals[i + 2]
            row += bytes((b, g, rr))
        body += bytes(row) + pad
    return header + body


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """mapInPandas decode/feature-extract stage over real image bytes:
    parses PPM (P6) and 24-bit BMP payloads and emits
    (format, width, height, n_channel_bytes, pixel_sum). Output schema is
    fixed and engine-typed; the inner decode is the only swappable piece —
    a PIL-backed decoder would slot into `_decode` unchanged."""
    out_schema = (
        f"{id_col} bigint, format string, width int, height int, "
        "n_channel_bytes int, pixel_sum bigint"
    )

    # decoders redefined INSIDE the closure (pickled by value — workers
    # can't import orion_spark under the external driver's session)
    import struct as _struct

    def _ppm(payload: bytes):
        toks, i = [], 2
        while len(toks) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
        w, h, maxval = toks
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        data = payload[i + 1 : i + 1 + w * h * 3]
        if len(data) != w * h * 3:
            raise ValueError("truncated PPM pixel data")
        return w, h, data

    def _bmp(payload: bytes):
        (data_off,) = _struct.unpack_from("<I", payload, 10)
        w, h = _struct.unpack_from("<ii", payload, 18)
        (bpp,) = _struct.unpack_from("<H", payload, 28)
        (compression,) = _struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0:
            raise ValueError("unsupported BMP variant")
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        chunks = []
        for r in range(h):
            base = data_off + r * row_bytes
            row = payload[base : base + w * 3]
            if len(row) != w * 3:
                raise ValueError("truncated BMP pixel data")
            chunks.append(row)
        return w, h, b"".join(chunks)

    def _decode(payload: bytes):
        if payload is None or len(payload) < 2:
            raise ValueError("empty payload")
        if payload[:2] == b"P6":
            return ("ppm", *_ppm(payload))
        if payload[:2] == b"BM":
            return ("bmp", *_bmp(payload))
        raise NotImplementedError(
            "no codec for magic %r (JPEG/PNG need an image library)"
            % (payload[:2],)
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: pdf[id_col].values,
                "format": [],
                "width": [],
                "height": [],
                "n_channel_bytes": [],
                "pixel_sum": [],
            }
            for p in pdf[payload_col]:
                fmt, w, h, data = _decode(bytes(p))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_channel_bytes"].append(len(data))
                out["pixel_sum"].append(sum(data))
            yield pd.DataFrame(out)

    narrow = df.select(id_col, payload_col)
    return narrow.mapInPandas(process, schema=out_schema)


def synthesize_media(
    df: DataFrame, id_col: str = "media_id", max_dim: int = 8
) -> DataFrame:
    """Deterministic real-image fixture generator: for each id, builds an
    actual PPM (even ids) or BMP (odd ids) byte payload with
    width = 1 + id % max_dim, height = 1 + (id // max_dim) % max_dim and
    channel value stream v_i = (id * 31 + i) % 256 — closed-form enough
    for a SQL oracle to recompute every decoded feature analytically.
    Generation is a mapInPandas stage (bytes can't be assembled from JVM
    expressions), sized like any other payload stage."""
    import struct as _struct

    md = max_dim

    def _ppm_bytes(w, h, vals):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes(vals)

    def _bmp_bytes(w, h, vals):
        row_bytes = (w * 3 + 3) & ~3
        pad = b"\x00" * (row_bytes - w * 3)
        header = _struct.pack(
            "<2sIHHI", b"BM", 14 + 40 + row_bytes * h, 0, 0, 14 + 40
        ) + _struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0
        )
        body = b""
        for r in range(h - 1, -1, -1):
            row = bytearray()
            for px in range(w):
                i = (r * w + px) * 3
                row += bytes((vals[i + 2], vals[i + 1], vals[i]))  # BGR
            body += bytes(row) + pad
        return header + body

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = 1 + mid % md
                h = 1 + (mid // md) % md
                vals = [(mid * 31 + i) % 256 for i in range(w * h * 3)]
                payloads.append(
                    _ppm_bytes(w, h, vals) if mid % 2 == 0 else _bmp_bytes(w, h, vals)
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, payload binary"
    )


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: explode one row per sampled timestamp
    (the decode of each frame is the stage above). Pure column ops —
    the fan-out happens before any decoder runs, so Spark sizes the decode
    stage by frames, not videos."""
    n_frames = (F.col(duration_col) / every_ms).cast("int") + 1
    return df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )
