"""Multimodal column handling for LLM training-data pipelines.

Images/audio/video ride as opaque BINARY columns with typed metadata
structs; decode/resize/frame-sample are Arrow-batched mapInPandas stages.
The decode step is REAL for every format decodable with the stdlib —
binary PPM (P6), uncompressed 24-bit BMP, zlib-inflated 8-bit PNG
(full None/Sub/Up/Average/Paeth unfiltering), and RIFF/WAVE PCM16
audio — plus a codec-free JPEG header parser; formats that genuinely
need a codec library (JPEG pixels, compressed audio, video) raise a
clear error naming the optional dependency. Swapping in PIL/ffmpeg
changes only the inner per-payload function.

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


def _spread_narrow(ids: DataFrame) -> DataFrame:
    """Round-robin-spread a NARROW frame before a mapInPandas stage
    (round 11, guide §2.2/§4): compact parquet scans arrive in 1-2
    partitions, and a MapInPandas node is never pushed below an
    exchange, so without this a payload GENERATOR stage runs every
    payload on one core (measured at sf1: 7.6 s of a 12 s video query
    in ONE task) while the old unconditional repartition in the
    near-dup operators only spread the DECODE. Spreading the id-only
    frame before generation means the payload bytes themselves never
    cross a shuffle at all (guide §8: move heavy bytes zero times,
    decide with small rows); the decode-side spread in the near-dup
    operators goes through the same probe so already-spread synthesized
    payloads are NOT reshuffled. Already-wide inputs pass through
    untouched, so at cluster scale (many-file tables) this is inert.
    No materialization barrier is needed: unlike a codegen'd
    projection, a Python eval stage cannot collapse below the
    exchange."""
    parallelism = ids.sparkSession.sparkContext.defaultParallelism
    if ids.rdd.getNumPartitions() >= max(2, parallelism // 2):
        return ids
    return ids.repartition(parallelism)


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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> tuple[int, int, list[int]]:
    """Baseline PNG via stdlib zlib (round-4 verdict ask #7): 8-bit
    truecolor (color type 2) and truecolor+alpha (type 6), non-interlaced.
    Chunk walk -> IHDR dims -> concatenated-IDAT inflate -> per-row
    unfilter (None/Sub/Up/Average/Paeth per the PNG spec §9). Returns
    (width, height, flat channel values — 3 or 4 per pixel)."""
    import zlib

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    i, w = 8, None
    h = bit_depth = color_type = interlace = None
    idat = b""
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={bit_depth} color={color_type} "
            f"interlace={interlace}"
        )
    nch = 3 if color_type == 2 else 4
    raw = zlib.decompress(idat)
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    out = bytearray()
    prev = bytearray(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for x in range(nch, stride):
                row[x] = (row[x] + row[x - nch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = row[x - nch] if x >= nch else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = row[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return w, h, list(out)


def jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """JPEG metadata WITHOUT a codec: walk the marker stream to the first
    SOF0/1/2 frame header and return (width, height, n_components).
    Full baseline-JPEG pixel decode needs huffman+IDCT — that path is
    behind the optional PIL dependency in decode_image; the header parse
    keeps metadata pipelines (size filters, aspect buckets) codec-free."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    n = len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        # 0xFF fill bytes are legal padding before any marker (ITU T.81
        # B.1.1.2) — skip runs of them so the marker byte is the first
        # non-FF byte.
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            break
        marker = payload[i + 1]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            h, w = struct.unpack_from(">HH", payload, i + 5)
            ncomp = payload[i + 9]
            return w, h, ncomp
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn:
            i += 2  # standalone markers carry no length segment
            continue
        if i + 4 > n:
            break
        (seg_len,) = struct.unpack_from(">H", payload, i + 2)
        if seg_len < 2:
            raise ValueError("JPEG segment length below minimum")
        i += 2 + seg_len
    raise ValueError("JPEG frame header (SOF) not found")


def decode_image(payload: bytes) -> tuple[str, int, int, list[int]]:
    """Dispatch on magic bytes. PPM/BMP/PNG decode with zero external
    dependencies; JPEG pixel decode requires PIL (documented optional
    dependency) and degrades to a loud error naming the metadata-only
    jpeg_header alternative."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    if payload[:2] == b"P6":
        return ("ppm", *decode_ppm(payload))
    if payload[:2] == b"BM":
        return ("bmp", *decode_bmp(payload))
    if payload[:8] == PNG_SIGNATURE:
        return ("png", *decode_png(payload))
    if payload[:2] == b"\xff\xd8":
        try:
            from PIL import Image  # optional dependency, not shipped here
        except ImportError:
            raise NotImplementedError(
                "JPEG pixel decode needs PIL (optional dependency); "
                "jpeg_header() extracts width/height/components without it"
            ) from None
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return ("jpeg", img.width, img.height,
                [v for px in img.getdata() for v in px])
    raise NotImplementedError(
        f"no codec for magic {payload[:2]!r}"
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


def encode_png(w: int, h: int, vals: list[int]) -> bytes:
    """Inverse of decode_png for RGB, used by tests and fixture synthesis.
    Rows cycle filter types None/Sub/Up (r % 3) so round-trip tests
    exercise the unfilter paths, not just the trivial one."""
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    stride = w * 3
    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        row = bytes(vals[r * stride : (r + 1) * stride])
        ft = r % 3
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[x] - (row[x - 3] if x >= 3 else 0)) & 0xFF
                for x in range(stride)
            )
        else:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _by_value_image_decoder():
    """Factory returning the image decoder as a CLOSURE: functions
    defined in function scope are pickled by value, so the mapInPandas
    stages that capture the returned callable ship it to executors
    without requiring orion_spark to be importable there (the external
    driver's session makes no such guarantee). Module-level twins
    (decode_ppm/decode_bmp/decode_png) exist for unit tests and stay
    pure-Python — the readable reference the vectorized paths here are
    checked against byte-for-byte (test_llm_ops vectorized-decoder
    equivalence test).

    Round 11 (guide §4.2): the per-pixel Python loops (BMP BGR swap,
    PNG Sub/Up unfiltering) are NumPy whole-row operations; byte
    semantics are unchanged (uint8 wraparound == mod-256, per-lane
    cumsum == the Sub filter's running sum). The rare sequential
    filters (Average/Paeth — never emitted by the closed-form
    fixtures) keep the scalar path."""
    import struct as _struct

    import numpy as _np

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
        # row-major top-down RGB, like the module-level decode_bmp: rows
        # un-reversed (bottom-up storage), BGR swapped. Positional
        # consumers (resize) need this; sum-only features can't tell.
        (data_off,) = _struct.unpack_from("<I", payload, 10)
        w, h = _struct.unpack_from("<ii", payload, 18)
        (bpp,) = _struct.unpack_from("<H", payload, 28)
        (compression,) = _struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0:
            raise ValueError("unsupported BMP variant")
        top_down = h < 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        if data_off + (h - 1) * row_bytes + w * 3 > len(payload):
            raise ValueError("truncated BMP pixel data")
        buf = _np.frombuffer(payload, _np.uint8)
        rows = _np.arange(h) if top_down else _np.arange(h - 1, -1, -1)
        idx = (data_off + rows * row_bytes)[:, None] + _np.arange(w * 3)
        # (h, w, 3) gather, BGR -> RGB channel flip
        out = buf[idx].reshape(h, w, 3)[:, :, ::-1]
        return w, h, out.tobytes()

    def _png(payload: bytes):
        import zlib as _zlib

        i = 8
        w = h = bit_depth = color_type = interlace = None
        idat = b""
        while i + 8 <= len(payload):
            (length,) = _struct.unpack_from(">I", payload, i)
            ctype = payload[i + 4 : i + 8]
            body = payload[i + 8 : i + 8 + length]
            if ctype == b"IHDR":
                w, h, bit_depth, color_type, _, _, interlace = _struct.unpack(
                    ">IIBBBBB", body
                )
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            i += 12 + length
        if w is None:
            raise ValueError("PNG missing IHDR")
        if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
            raise ValueError("unsupported PNG variant")
        nch = 3 if color_type == 2 else 4
        raw = _zlib.decompress(idat)
        stride = w * nch
        if len(raw) != (stride + 1) * h:
            raise ValueError("truncated PNG pixel data")
        rm = _np.frombuffer(raw, _np.uint8).reshape(h, stride + 1)
        out = _np.empty((h, stride), _np.uint8)
        prev = _np.zeros(stride, _np.uint8)
        for r in range(h):
            ft = int(rm[r, 0])
            row = rm[r, 1:]
            if ft == 0:
                cur = row.copy()
            elif ft == 1:
                # Sub: o[x] = (f[x] + o[x-nch]) mod 256 — i.e. the
                # per-channel-lane running sum of the filtered bytes
                cur = (
                    row.reshape(-1, nch)
                    .cumsum(axis=0, dtype=_np.int64) % 256
                ).astype(_np.uint8).reshape(stride)
            elif ft == 2:
                cur = row + prev  # uint8 wraparound == mod 256
            elif ft in (3, 4):
                # Average/Paeth reconstruct sequentially in x; scalar
                # path kept (never emitted by the closed-form fixtures)
                rb = bytearray(row.tobytes())
                if ft == 3:
                    for x in range(stride):
                        left = rb[x - nch] if x >= nch else 0
                        rb[x] = (rb[x] + (left + int(prev[x])) // 2) & 0xFF
                else:
                    for x in range(stride):
                        a = rb[x - nch] if x >= nch else 0
                        b = int(prev[x])
                        c = int(prev[x - nch]) if x >= nch else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (
                            b if pb <= pc else c)
                        rb[x] = (rb[x] + pred) & 0xFF
                cur = _np.frombuffer(bytes(rb), _np.uint8)
            else:
                raise ValueError("unknown PNG filter type")
            out[r] = cur
            prev = out[r]
        return w, h, out.tobytes()

    def _decode(payload: bytes):
        if payload is None or len(payload) < 2:
            raise ValueError("empty payload")
        if payload[:2] == b"P6":
            return ("ppm", *_ppm(payload))
        if payload[:2] == b"BM":
            return ("bmp", *_bmp(payload))
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return ("png", *_png(payload))
        raise NotImplementedError(
            "no codec for magic %r (JPEG pixel decode needs PIL)"
            % (payload[:2],)
        )

    return _decode


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

    _decode = _by_value_image_decoder()

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

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
                out["pixel_sum"].append(
                    int(_np.frombuffer(data, _np.uint8).sum(dtype=_np.int64))
                )
            yield pd.DataFrame(out)

    narrow = df.select(id_col, payload_col)
    return narrow.mapInPandas(process, schema=out_schema)


def synthesize_media(
    df: DataFrame,
    id_col: str = "media_id",
    max_dim: int = 8,
    near_dup_groups: int | None = None,
) -> DataFrame:
    """Deterministic real-image fixture generator: for each id, builds an
    actual binary-PPM (id % 3 == 0), 24-bit BMP (id % 3 == 1) or RGB PNG
    (id % 3 == 2, rows cycling None/Sub/Up filters) byte payload with
    width = 1 + id % max_dim, height = 1 + (id // max_dim) % max_dim and
    channel value stream v_i = (id * 31 + i) % 256 — closed-form enough
    for a SQL oracle to recompute every decoded feature analytically.
    Generation is a mapInPandas stage (bytes can't be assembled from JVM
    expressions), sized like any other payload stage. Round 11 (guide
    §4.2): the per-byte Python loops (value stream, BMP row flip, PNG
    row filters) are NumPy whole-image operations; byte output is
    unchanged (uint8 wraparound == the mod-256/& 0xFF arithmetic).

    With `near_dup_groups=g`, ids are clustered into near-duplicate
    groups of g: every id in a group shares its base image
    (base = id - id % g keys the dims 2 + base % 7 x 2 + (base // 7) % 7,
    the format base % 3, and the stream v_i = (base * 31 + i) % 256), and
    member k = id % g perturbs its first 3k channel bytes by +128 mod 256
    — so member 0 IS the base and later members drift pixel-wise. Still
    fully closed-form (image_near_dup_oracle_sql recomputes the perceptual
    hashes analytically). Dims start at 2 so no degenerate 1-wide images
    collapse the hash to zero corpus-wide."""
    import struct as _struct

    import numpy as _np

    md = max_dim
    ndg = near_dup_groups

    def _ppm_bytes(w, h, vals):
        return b"P6\n%d %d\n255\n" % (w, h) + vals.tobytes()

    def _bmp_bytes(w, h, vals):
        row_bytes = (w * 3 + 3) & ~3
        header = _struct.pack(
            "<2sIHHI", b"BM", 14 + 40 + row_bytes * h, 0, 0, 14 + 40
        ) + _struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0
        )
        # bottom-up row order, RGB -> BGR, rows padded to 4 bytes
        rows = _np.zeros((h, row_bytes), _np.uint8)
        rows[:, : w * 3] = (
            vals.reshape(h, w, 3)[::-1, :, ::-1].reshape(h, w * 3)
        )
        return header + rows.tobytes()

    def _png_bytes(w, h, vals):
        import zlib as _zlib

        def chunk(ctype, body):
            return (
                _struct.pack(">I", len(body)) + ctype + body
                + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        stride = w * 3
        rows = vals.reshape(h, stride)
        # filter types cycle None/Sub/Up by row; uint8 subtraction
        # wraps, which IS the spec's mod-256 filter arithmetic
        left = _np.zeros_like(rows)
        left[:, 3:] = rows[:, :-3]
        up = _np.zeros_like(rows)
        up[1:] = rows[:-1]
        fts = (_np.arange(h) % 3).astype(_np.uint8)
        filtered = _np.select(
            [fts[:, None] == 0, fts[:, None] == 1],
            [rows, rows - left],
            rows - up,
        ).astype(_np.uint8)
        raw = _np.empty((h, stride + 1), _np.uint8)
        raw[:, 0] = fts
        raw[:, 1:] = filtered
        ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(raw.tobytes()))
            + chunk(b"IEND", b"")
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if ndg is None:
                    w = 1 + mid % md
                    h = 1 + (mid // md) % md
                    idx = _np.arange(w * h * 3, dtype=_np.int64)
                    vals = ((mid * 31 + idx) % 256).astype(_np.uint8)
                    fmt_key = mid
                else:
                    base = mid - mid % ndg
                    w = 2 + base % 7
                    h = 2 + (base // 7) % 7
                    cut = 3 * (mid % ndg)
                    idx = _np.arange(w * h * 3, dtype=_np.int64)
                    v = (base * 31 + idx) % 256
                    v[:cut] = (v[:cut] + 128) % 256
                    vals = v.astype(_np.uint8)
                    fmt_key = base
                enc = (_ppm_bytes, _bmp_bytes, _png_bytes)[fmt_key % 3]
                payloads.append(enc(w, h, vals))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    return _spread_narrow(df.select(id_col)).mapInPandas(
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


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM16 — the third real, dependency-free codec family.
# Compressed audio (mp3/ogg/flac) stays behind the loud-error boundary the
# same way JPEG does for images.
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE, PCM (format tag 1), 16-bit samples. Chunk walk to fmt
    and data (chunks are word-aligned: odd-sized chunks carry a pad
    byte). Returns (n_channels, sample_rate, interleaved samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    n_channels = sample_rate = bits = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAVE format tag {fmt_tag}")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # word alignment pad
    if n_channels is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAVE bit depth {bits}")
    if len(data) % 2:
        raise ValueError("truncated WAVE sample data")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return n_channels, sample_rate, samples


def encode_wav(
    samples: list[int], n_channels: int = 1, sample_rate: int = 16000
) -> bytes:
    """Inverse of decode_wav (PCM16) — tests and fixture synthesis."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_audio(payload: bytes) -> tuple[str, int, int, list[int]]:
    """Dispatch on magic bytes; compressed codecs fail loudly."""
    if payload is None or len(payload) < 12:
        raise ValueError("empty payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return ("wav", *decode_wav(payload))
    raise NotImplementedError(
        f"no audio codec for magic {payload[:4]!r} (compressed audio "
        "needs an external library)"
    )


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """mapInPandas audio decode/feature stage: parses PCM16 WAV payloads
    and emits (n_channels, sample_rate, n_samples, duration_ms,
    sample_sum, peak). Same Arrow-batch shape rules as decode_features."""
    out_schema = (
        f"{id_col} bigint, format string, n_channels int, sample_rate int, "
        "n_samples int, duration_ms int, sample_sum bigint, peak int"
    )
    import struct as _struct

    def _wav(payload: bytes):
        i = 12
        n_channels = sample_rate = bits = None
        data = None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            (size,) = _struct.unpack_from("<I", payload, i + 4)
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt_tag, n_channels, sample_rate = _struct.unpack_from(
                    "<HHI", body, 0
                )
                (bits,) = _struct.unpack_from("<H", body, 14)
                if fmt_tag != 1:
                    raise ValueError("unsupported WAVE format tag")
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if n_channels is None or data is None or bits != 16:
            raise ValueError("unsupported or truncated WAVE")
        # odd-length data raises, matching the strict struct.unpack the
        # scalar path used
        return n_channels, sample_rate, _np.frombuffer(
            data, _np.dtype("<i2")
        )

    import numpy as _np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: pdf[id_col].values,
                "format": [], "n_channels": [], "sample_rate": [],
                "n_samples": [], "duration_ms": [], "sample_sum": [],
                "peak": [],
            }
            for p in pdf[payload_col]:
                payload = bytes(p)
                if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                    raise NotImplementedError(
                        "no audio codec for magic %r" % (payload[:4],)
                    )
                nch, rate, samples = _wav(payload)
                frames = len(samples) // nch
                out["format"].append("wav")
                out["n_channels"].append(nch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["duration_ms"].append(frames * 1000 // rate)
                s64 = samples.astype(_np.int64)
                out["sample_sum"].append(int(s64.sum()))
                out["peak"].append(
                    int(_np.abs(s64).max()) if len(s64) else 0
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)


def synthesize_audio(
    df: DataFrame,
    id_col: str = "media_id",
    max_frames: int = 64,
    near_dup_groups: int | None = None,
) -> DataFrame:
    """Deterministic real-audio fixture generator: per id a PCM16 WAV with
    n_channels = 1 + id % 2, sample_rate 8000/16000 by id % 2, and
    frames = 1 + id % max_frames of closed-form samples
    s_i = ((id * 7 + i * 13) % 4001) - 2000 — analytic enough for a SQL
    oracle to recompute every decoded feature.

    With `near_dup_groups=g`, ids cluster into near-duplicate groups of
    g sharing a base clip (base = id - id % g keys channels/rate and
    frames = 64 + base % 192 — always >= 64 so every envelope window is
    nonempty — and the sample stream), and member k = id % g adds
    37k to its first 4k samples: member 0 IS the base, later members
    drift early-envelope-wise. Still fully closed-form for
    audio_near_dup_oracle_sql."""
    import struct as _struct

    mf = max_frames
    ndg = near_dup_groups
    if ndg is not None and not 1 <= ndg <= 800:
        # member k = id % g perturbs by +37k; base samples reach 2000, so
        # g > 800 pushes 2000 + 37*(g-1) past int16 and struct.pack('<h')
        # would crash mid-fixture — reject loudly up front instead
        raise ValueError(
            f"near_dup_groups must be in [1, 800] (got {ndg}): the +37k "
            "member perturbation would overflow int16 samples"
        )

    import numpy as _np

    def _wav_bytes(samples, nch, rate):
        # samples: int64 ndarray, range-checked by the ndg gate above
        # (astype('<i2') wraps where struct.pack('<h') raised — the gate
        # keeps every value inside int16, so the paths are identical)
        data = samples.astype(_np.dtype("<i2")).tobytes()
        byte_rate = rate * nch * 2
        fmt = _struct.pack("<HHIIHH", 1, nch, rate, byte_rate, nch * 2, 16)
        body = (
            b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b"")
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if ndg is None:
                    nch = 1 + mid % 2
                    rate = 8000 if mid % 2 == 0 else 16000
                    n = (1 + mid % mf) * nch
                    i = _np.arange(n, dtype=_np.int64)
                    samples = ((mid * 7 + i * 13) % 4001) - 2000
                else:
                    base = mid - mid % ndg
                    nch = 1 + base % 2
                    rate = 8000 if base % 2 == 0 else 16000
                    n = (64 + base % 192) * nch
                    k = mid % ndg
                    i = _np.arange(n, dtype=_np.int64)
                    samples = ((base * 7 + i * 13) % 4001) - 2000
                    samples[: 4 * k] += 37 * k
                payloads.append(_wav_bytes(samples, nch, rate))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    return _spread_narrow(df.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} bigint, payload binary"
    )


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Nearest-neighbor image resize — the canonical thumbnail/normalize
    stage of a multimodal curation pipeline: decode (PPM/BMP/PNG via the
    by-value decoder), sample output pixel (x, y) from source pixel
    (x * src_w // out_w, y * src_h // out_h), re-encode as binary PPM.
    Integer arithmetic only, so an analytic SQL oracle can recompute the
    resized stream exactly; RGBA sources keep their first three channels.
    Emits (id, width, height, payload, pixel_sum)."""
    out_schema = (
        f"{id_col} bigint, width int, height int, payload binary, "
        "pixel_sum bigint"
    )
    _decode = _by_value_image_decoder()
    ow, oh = out_w, out_h

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        # source byte index of output pixel (y, x) channel k:
        # (sy*w + sx)*nch + k with sy = y*h//oh, sx = x*w//ow — one
        # whole-thumbnail gather per image (guide §4.2), exact integer
        # sampling as the scalar loop it replaces
        yo = _np.arange(oh, dtype=_np.int64)
        xo = _np.arange(ow, dtype=_np.int64)
        k3 = _np.arange(3, dtype=_np.int64)
        hdr = b"P6\n%d %d\n255\n" % (ow, oh)

        for pdf in batches:
            payloads, sums = [], []
            for p in pdf[payload_col]:
                _, w, h, data = _decode(bytes(p))
                nch = len(data) // (w * h)
                arr = _np.frombuffer(data, _np.uint8)
                base = (
                    (yo * h // oh)[:, None] * w + (xo * w // ow)[None, :]
                ) * nch
                resized = arr[base[:, :, None] + k3]
                payloads.append(hdr + resized.tobytes())
                sums.append(int(resized.sum(dtype=_np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [ow] * len(payloads),
                    "height": [oh] * len(payloads),
                    "payload": payloads,
                    "pixel_sum": sums,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)


# ---------------------------------------------------------------------------
# Video: ISO-BMFF (MP4) box-tree metadata — the codec-free video
# counterpart of jpeg_header. Frame pixel decode needs ffmpeg-class
# machinery and stays behind the loud-error boundary; container metadata
# (duration, timescale, track count, display dims) is what curation
# pipelines filter on, and parses with stdlib struct alone.
# ---------------------------------------------------------------------------

def mp4_metadata(payload: bytes) -> dict:
    """Walk the ISO-BMFF box tree: moov/mvhd gives timescale+duration
    (version 0 and 1 layouts), each moov/trak/tkhd contributes a track
    and its 16.16 fixed-point display width/height. Returns
    {timescale, duration, duration_ms, n_tracks, width, height} with
    dims from the first video-sized track (width > 0)."""
    if len(payload) < 8 or payload[4:8] not in (b"ftyp", b"moov", b"mdat"):
        raise ValueError("not an ISO-BMFF (MP4) stream")

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, i)
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize: 16-byte header
                (size,) = struct.unpack_from(">Q", buf, i + 8)
                hdr = 16
            if size < hdr:
                raise ValueError("malformed MP4 box size")
            yield btype, i + hdr, min(i + size, end)
            i += size

    out = {"timescale": None, "duration": None, "n_tracks": 0,
           "width": 0, "height": 0}
    for btype, s, e in boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in boxes(payload, s, e):
            if ctype == b"mvhd":
                version = payload[cs]
                if version == 1:
                    out["timescale"], out["duration"] = struct.unpack_from(
                        ">IQ", payload, cs + 4 + 8 + 8
                    )
                else:
                    out["timescale"], out["duration"] = struct.unpack_from(
                        ">II", payload, cs + 4 + 4 + 4
                    )
            elif ctype == b"trak":
                out["n_tracks"] += 1
                for ttype, ts, te in boxes(payload, cs, ce):
                    if ttype != b"tkhd":
                        continue
                    version = payload[ts]
                    # offset to the 16.16 width/height pair from the
                    # end of the version/flags word (ISO 14496-12 §8.3.2)
                    base = ts + 4 + (8 + 8 + 4 + 4 + 8 if version == 1
                                     else 4 + 4 + 4 + 4 + 4)
                    base += 8 + 2 + 2 + 2 + 2 + 36
                    w_fx, h_fx = struct.unpack_from(">II", payload, base)
                    if w_fx > 0 and out["width"] == 0:
                        out["width"] = w_fx >> 16
                        out["height"] = h_fx >> 16
    if out["timescale"] is None:
        raise ValueError("MP4 missing moov/mvhd")
    out["duration_ms"] = out["duration"] * 1000 // out["timescale"]
    return out


def encode_mp4_stub(
    duration: int, timescale: int, tracks: list[tuple[int, int]]
) -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd v0 + one trak/tkhd per
    (width, height)). Fixture synthesis and tests only — carries no
    media data."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1),
    )
    traks = b""
    for i, (w, h) in enumerate(tracks):
        tkhd = box(
            b"tkhd",
            struct.pack(">BxxxIIIxxxxI", 0, 0, 0, i + 1, duration)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        traks += box(b"trak", tkhd)
    return ftyp + box(b"moov", mvhd + traks)


def video_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """mapInPandas MP4 metadata stage: (timescale, duration_ms, n_tracks,
    width, height) per payload — the filterable columns a video-curation
    pipeline needs before any (external) frame decode runs."""
    out_schema = (
        f"{id_col} bigint, format string, timescale int, duration_ms bigint, "
        "n_tracks int, width int, height int"
    )
    import struct as _struct

    def _meta(payload: bytes):
        def boxes(buf, start, end):
            i = start
            while i + 8 <= end:
                (size,) = _struct.unpack_from(">I", buf, i)
                btype = buf[i + 4 : i + 8]
                hdr = 8
                if size == 1:
                    (size,) = _struct.unpack_from(">Q", buf, i + 8)
                    hdr = 16
                if size < hdr:
                    raise ValueError("malformed MP4 box size")
                yield btype, i + hdr, min(i + size, end)
                i += size

        timescale = duration = None
        n_tracks, width, height = 0, 0, 0
        for btype, s, e in boxes(payload, 0, len(payload)):
            if btype != b"moov":
                continue
            for ctype, cs, ce in boxes(payload, s, e):
                if ctype == b"mvhd":
                    version = payload[cs]
                    if version == 1:
                        timescale, duration = _struct.unpack_from(
                            ">IQ", payload, cs + 20)
                    else:
                        timescale, duration = _struct.unpack_from(
                            ">II", payload, cs + 12)
                elif ctype == b"trak":
                    n_tracks += 1
                    for ttype, ts, te in boxes(payload, cs, ce):
                        if ttype != b"tkhd":
                            continue
                        version = payload[ts]
                        base = ts + 4 + (32 if version == 1 else 20)
                        base += 8 + 2 + 2 + 2 + 2 + 36
                        w_fx, h_fx = _struct.unpack_from(">II", payload, base)
                        if w_fx > 0 and width == 0:
                            width, height = w_fx >> 16, h_fx >> 16
        if timescale is None:
            raise ValueError("MP4 missing moov/mvhd")
        return timescale, duration * 1000 // timescale, n_tracks, width, height

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col].values, "format": [], "timescale": [],
                   "duration_ms": [], "n_tracks": [], "width": [], "height": []}
            for p in pdf[payload_col]:
                payload = bytes(p)
                if len(payload) < 8 or payload[4:8] not in (
                    b"ftyp", b"moov", b"mdat"
                ):
                    raise NotImplementedError(
                        "no video container parser for %r" % (payload[4:8],)
                    )
                ts, dms, nt, w, h = _meta(payload)
                out["format"].append("mp4")
                out["timescale"].append(ts)
                out["duration_ms"].append(dms)
                out["n_tracks"].append(nt)
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)


def synthesize_video(
    df: DataFrame,
    id_col: str = "media_id",
    near_dup_groups: int | None = None,
) -> DataFrame:
    """Deterministic MP4 fixture generator: per id an ISO-BMFF stub with
    timescale 600/1000 by parity, duration (1 + id % 100) * timescale / 2
    (i.e. always (1 + id % 100) * 500 ms), 1 + id % 2 tracks of
    16*(1 + id % 4) x 16*(1 + (id // 4) % 4) display size.

    With `near_dup_groups=g`, ids cluster into near-duplicate groups of g
    and the payload carries REAL frames: an `mdat` box holding
    n_frames = 8 + base % 8 concatenated binary-PPM frames of
    2 + base % 7 x 2 + (base // 7) % 7 pixels (base = id - id % g keys
    everything, so group members share dims and frame count). Frame f's
    channel stream is v_i = (base * 31 + f * 17 + i) % 256 and member
    k = id % g perturbs the first 3k bytes of EVERY frame by +128 mod 256
    — the image fixture's drift scheme, per frame. The moov mvhd carries
    timescale 600 and duration n_frames * 150 (4 fps). Fully closed-form
    for video_near_dup_oracle_sql."""
    import struct as _struct

    def _stub(duration, timescale, tracks):
        def box(btype, body):
            return _struct.pack(">I", 8 + len(body)) + btype + body

        ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isomiso2")
        mvhd = box(
            b"mvhd",
            _struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
            + _struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
            + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                           0x40000000)
            + b"\x00" * 24 + _struct.pack(">I", len(tracks) + 1),
        )
        traks = b""
        for i, (w, h) in enumerate(tracks):
            tkhd = box(
                b"tkhd",
                _struct.pack(">BxxxIIIxxxxI", 0, 0, 0, i + 1, duration)
                + b"\x00" * 8 + _struct.pack(">HHHH", 0, 0, 0, 0)
                + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                + _struct.pack(">II", w << 16, h << 16),
            )
            traks += box(b"trak", tkhd)
        return ftyp + box(b"moov", mvhd + traks)

    def box(btype, body):
        return _struct.pack(">I", 8 + len(body)) + btype + body

    ndg = near_dup_groups

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if ndg is None:
                    timescale = 600 if mid % 2 == 0 else 1000
                    duration = (1 + mid % 100) * timescale // 2
                    w = 16 * (1 + mid % 4)
                    h = 16 * (1 + (mid // 4) % 4)
                    tracks = [(w, h)] * (1 + mid % 2)
                    payloads.append(_stub(duration, timescale, tracks))
                    continue
                base = mid - mid % ndg
                w = 2 + base % 7
                h = 2 + (base // 7) % 7
                nf = 8 + base % 8
                cut = 3 * (mid % ndg)
                # all nf frame value streams at once (guide §4.2):
                # frame f, byte i -> (base*31 + f*17 + i) % 256, first
                # `cut` bytes of EVERY frame perturbed +128 mod 256
                fi = _np.arange(nf, dtype=_np.int64)[:, None]
                bi = _np.arange(w * h * 3, dtype=_np.int64)[None, :]
                v = (base * 31 + fi * 17 + bi) % 256
                v[:, :cut] = (v[:, :cut] + 128) % 256
                v8 = v.astype(_np.uint8)
                hdr = b"P6\n%d %d\n255\n" % (w, h)
                frames = b"".join(
                    hdr + v8[f].tobytes() for f in range(nf)
                )
                payloads.append(
                    _stub(nf * 150, 600, [(w, h)]) + box(b"mdat", frames)
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    return _spread_narrow(df.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} bigint, payload binary"
    )


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels: decode
    the payload (PPM/BMP/PNG, the zero-dependency codecs), grayscale each
    pixel as (r + g + b) // 3, nearest-neighbor-sample an 8x8 grid
    (cell (r, c) reads pixel (min(h-1, r*h//8), min(w-1, c*w//8)) — exact
    integer arithmetic so a SQL oracle can replay it), then emit one bit
    per horizontally-adjacent cell pair: bit r*7+c = 1 iff
    cell[r][c+1] > cell[r][c]. 56 bits total (8 rows x 7 comparisons),
    deliberately inside signed-BIGINT range on both engines.

    dHash is the standard cheap perceptual near-dup signature (gradient
    orientation survives brightness shifts, small crops, re-encodes);
    Hamming distance on the 56 bits ranks similarity. mapInPandas over
    the binary column — the same Arrow-batched decode boundary as
    decode_features."""
    out_schema = f"{id_col} bigint, dhash bigint"
    _decode = _by_value_image_decoder()

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        r8 = _np.arange(8, dtype=_np.int64)
        bitw = _np.int64(1) << (r8[:, None] * 7 + r8[None, :7])
        for pdf in batches:
            hashes = []
            for p in pdf[payload_col]:
                _fmt, w, h, data = _decode(bytes(p))
                arr = _np.frombuffer(data, _np.uint8)
                # flat byte index of the R channel of grid cell (r, c) —
                # same exact integer arithmetic as the scalar loop this
                # replaces (guide §4.2: whole-grid gather, not 64 Python
                # index expressions per image)
                rr = _np.minimum(h - 1, r8 * h // 8)
                cc = _np.minimum(w - 1, r8 * w // 8)
                g = (rr[:, None] * w + cc[None, :]) * 3
                cells = (
                    arr[g].astype(_np.int64) + arr[g + 1] + arr[g + 2]
                ) // 3
                bits = (bitw * (cells[:, 1:] > cells[:, :-1])).sum()
                hashes.append(int(bits))
            yield pd.DataFrame({id_col: pdf[id_col].values, "dhash": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=out_schema
    )


def _hamming_banded_pairs(
    sigs: DataFrame,
    sig_col: str,
    id_col: str,
    sig_bits: int,
    max_hamming: int,
    max_bucket_freq: int,
) -> DataFrame:
    """Perceptual-hash near-dup blocking (image dHash, audio envelope,
    video sequence hash): delegates to the ONE shared banded-Hamming core
    in llm/dedup.py (round-8 advice — the simhash and multimodal paths
    previously carried drift-prone copies). Guaranteed recall by
    construction (n_chunks = max_hamming + 1 pigeonhole chunking); the
    deterministic hot-bucket cap — featureless payloads (flat images,
    silence) all hash near zero and would otherwise drive the bucket join
    quadratic — is the only recall loss and is mirrored by the oracles.

    Returns (media_a, media_b, hamming) with media_a < media_b,
    hamming <= max_hamming."""
    from orion_spark.llm.dedup import hamming_banded_pairs

    return hamming_banded_pairs(
        sigs, sig_col, id_col, sig_bits=sig_bits, max_hamming=max_hamming,
        max_bucket_freq=max_bucket_freq, out_a="media_a", out_b="media_b",
    )


def image_near_dup_pairs(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 6,
    max_bucket_freq: int = 64,
) -> DataFrame:
    """Image near-duplicate pairs: 56-bit dHash signatures through the
    shared guaranteed-recall blocking + Hamming verify core
    (_hamming_banded_pairs; cap/blocking semantics documented there).

    The decode spread is CONDITIONAL (round 11): synthesized media
    already arrives round-robin-spread by _spread_narrow, and an
    unconditional repartition here would shuffle every payload byte a
    second time for nothing; only a genuinely narrow media frame (e.g.
    a single-file real-media table) still pays the spread."""
    sigs = (
        image_dhash(
            _spread_narrow(media.select(id_col, payload_col)),
            payload_col=payload_col, id_col=id_col,
        )
        .localCheckpoint(eager=True)
    )
    return _hamming_banded_pairs(
        sigs, "dhash", id_col, sig_bits=56,
        max_hamming=max_hamming, max_bucket_freq=max_bucket_freq,
    )


def image_near_dup_oracle_sql(
    group_size: int = 4,
    max_hamming: int = 6,
    max_bucket_freq: int = 64,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB ground truth for image_near_dup_pairs over the
    synthesize_media(near_dup_groups=group_size) fixture: replays the
    closed-form pixel stream (base-keyed values, member perturbation),
    the integer grayscale, the 8x8 nearest-neighbor grid, the 56-bit
    dHash assembly, then the SHARED guaranteed-recall chunk blocking
    WITH the hot-bucket cap and the Hamming verify
    (dedup.hamming_banded_oracle_block_sql — same chunking arithmetic as
    the engine) — the full candidate+verify contract, so the blocked
    Spark output must equal it row-for-row."""
    from orion_spark.llm.dedup import hamming_banded_oracle_block_sql

    g = group_size
    block = hamming_banded_oracle_block_sql(
        "dhash", sig_bits=56, max_hamming=max_hamming,
        max_bucket_freq=max_bucket_freq, src_cte="dh", id_col="media_id",
    )
    return f"""
    WITH ids AS (
        SELECT {id_col} AS media_id,
               {id_col} - {id_col} % {g} AS base
        FROM {table}),
    dims AS (
        SELECT media_id, base,
               2 + base % 7 AS w, 2 + (base // 7) % 7 AS h
        FROM ids),
    cells AS (
        SELECT media_id, base, w, h, r.r, c.c,
               3 * (LEAST(h - 1, r.r * h // 8) * w
                    + LEAST(w - 1, c.c * w // 8)) AS ci
        FROM dims, range(0, 8) r(r), range(0, 8) c(c)),
    gray AS (
        SELECT media_id, r, c,
               (CASE WHEN ci < 3 * (media_id % {g})
                     THEN ((base * 31 + ci) % 256 + 128) % 256
                     ELSE (base * 31 + ci) % 256 END
                + CASE WHEN ci + 1 < 3 * (media_id % {g})
                       THEN ((base * 31 + ci + 1) % 256 + 128) % 256
                       ELSE (base * 31 + ci + 1) % 256 END
                + CASE WHEN ci + 2 < 3 * (media_id % {g})
                       THEN ((base * 31 + ci + 2) % 256 + 128) % 256
                       ELSE (base * 31 + ci + 2) % 256 END) // 3 AS gv
        FROM cells),
    bits AS (
        SELECT media_id, r, c, gv,
               LEAD(gv) OVER (PARTITION BY media_id, r ORDER BY c) AS gn
        FROM gray),
    dh AS (
        SELECT media_id,
               SUM(CASE WHEN gn > gv
                        THEN (1::BIGINT << (r * 7 + c)) ELSE 0 END) AS dhash
        FROM bits WHERE c < 7 GROUP BY media_id),
    {block}
    """


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Energy-envelope fingerprint over REAL decoded PCM16 audio: decode
    the WAV, fold channels into a per-frame absolute amplitude
    a_j = sum over channels |s|, partition the frames into 64 windows by
    w(j) = j*64 // n_frames, take each window's mean energy
    e_w = sum(a_j) // count (integers throughout — non-negative, so
    truncation == floor on both engines), then emit one bit per adjacent
    window pair: bit w = 1 iff e_{w+1} > e_w. 63 bits (inside signed
    BIGINT), the audio analogue of the image dHash: the envelope SHAPE
    survives gain changes and small edits, and Hamming distance ranks
    similarity. mapInPandas over the binary column.

    Round 11 (guide §4.2): the per-sample Python loops (channel fold,
    window binning) are NumPy whole-clip operations — int16 samples
    decode via frombuffer, the window sums via bincount on the exact
    w(j) = j*64 // n_frames bin index — integer semantics unchanged."""
    import struct as _struct

    import numpy as _np

    out_schema = f"{id_col} bigint, afp bigint"

    def _wav(payload: bytes):
        i = 12
        n_channels = bits = None
        data = None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            (size,) = _struct.unpack_from("<I", payload, i + 4)
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt_tag, n_channels, _rate = _struct.unpack_from("<HHI", body, 0)
                (bits,) = _struct.unpack_from("<H", body, 14)
                if fmt_tag != 1:
                    raise ValueError("unsupported WAVE format tag")
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if n_channels is None or data is None or bits != 16:
            raise ValueError("unsupported or truncated WAVE")
        # odd-length data raises, matching the strict struct.unpack the
        # scalar path used
        return n_channels, _np.frombuffer(data, _np.dtype("<i2"))

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w63 = _np.int64(1) << _np.arange(63, dtype=_np.int64)
        for pdf in batches:
            fps = []
            for p in pdf[payload_col]:
                nch, samples = _wav(bytes(p))
                n_frames = len(samples) // nch
                # per-frame absolute amplitude a_j = sum over channels |s|
                amp = _np.abs(
                    samples[: n_frames * nch]
                    .astype(_np.int64)
                    .reshape(n_frames, nch)
                ).sum(axis=1)
                # window w(j) = j*64 // n_frames; integer mean per window
                widx = _np.arange(n_frames, dtype=_np.int64) * 64 // n_frames
                esum = _np.bincount(widx, weights=amp, minlength=64)
                ecnt = _np.bincount(widx, minlength=64)
                # exact: esum values < 2^53, so the float64 bincount sums
                # are integral; floor-divide where a window has frames
                env = _np.where(
                    ecnt > 0,
                    esum.astype(_np.int64) // _np.maximum(ecnt, 1),
                    0,
                )
                bits = (w63 * (env[1:] > env[:-1])).sum()
                fps.append(int(bits))
            yield pd.DataFrame({id_col: pdf[id_col].values, "afp": fps})

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=out_schema
    )


def audio_near_dup_pairs(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 6,
    max_bucket_freq: int = 64,
) -> DataFrame:
    """Audio near-duplicate pairs: 63-bit envelope fingerprints through
    the shared guaranteed-recall blocking + Hamming verify core
    (_hamming_banded_pairs; cap/blocking semantics documented there).
    Conditional decode spread: see image_near_dup_pairs."""
    sigs = (
        audio_fingerprint(
            _spread_narrow(media.select(id_col, payload_col)),
            payload_col=payload_col, id_col=id_col,
        )
        .localCheckpoint(eager=True)
    )
    return _hamming_banded_pairs(
        sigs, "afp", id_col, sig_bits=63,
        max_hamming=max_hamming, max_bucket_freq=max_bucket_freq,
    )


def audio_near_dup_oracle_sql(
    group_size: int = 4,
    max_hamming: int = 6,
    max_bucket_freq: int = 64,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB ground truth for audio_near_dup_pairs over the
    synthesize_audio(near_dup_groups=group_size) fixture: replays the
    closed-form interleaved sample stream (base-keyed values, member
    perturbation on the first 4k samples), the channel-folded absolute
    amplitudes, the 64-window integer mean envelope, the 63-bit
    fingerprint assembly, then the SHARED guaranteed-recall chunk
    blocking WITH the hot-bucket cap and the Hamming verify
    (dedup.hamming_banded_oracle_block_sql) — the full candidate+verify
    contract."""
    from orion_spark.llm.dedup import hamming_banded_oracle_block_sql

    g = group_size
    block = hamming_banded_oracle_block_sql(
        "afp", sig_bits=63, max_hamming=max_hamming,
        max_bucket_freq=max_bucket_freq, src_cte="fp", id_col="media_id",
    )
    return f"""
    WITH ids AS (
        SELECT {id_col} AS media_id,
               {id_col} - {id_col} % {g} AS base
        FROM {table}),
    dims AS (
        SELECT media_id, base,
               1 + base % 2 AS nch,
               64 + base % 192 AS n_frames
        FROM ids),
    samp AS (
        SELECT media_id, n_frames, i.i // nch AS j,
               ABS(((base * 7 + i.i * 13) % 4001) - 2000
                   + CASE WHEN i.i < 4 * (media_id % {g})
                          THEN 37 * (media_id % {g}) ELSE 0 END) AS av
        FROM dims, UNNEST(range(0, n_frames * nch)) AS i(i)),
    amp AS (
        SELECT media_id, n_frames, j, SUM(av) AS a
        FROM samp GROUP BY media_id, n_frames, j),
    env AS (
        SELECT media_id, (j * 64 // n_frames) AS w,
               SUM(a) // COUNT(*) AS e
        FROM amp GROUP BY media_id, (j * 64 // n_frames)),
    bits AS (
        SELECT media_id, w, e,
               LEAD(e) OVER (PARTITION BY media_id ORDER BY w) AS en
        FROM env),
    fp AS (
        SELECT media_id,
               SUM(CASE WHEN en > e THEN (1::BIGINT << w) ELSE 0 END) AS afp
        FROM bits WHERE w < 63 GROUP BY media_id),
    {block}
    """


def video_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_step: int = 2,
) -> DataFrame:
    """Temporal perceptual fingerprint over REAL decoded video frames:
    walk the ISO-BMFF boxes to the `mdat` payload, split it into frames
    by parsing each binary-PPM header sequentially (a real byte-level
    demux — no library), sample every `frame_step`-th frame, dHash each
    sampled frame (the image operator's grayscale -> 8x8 grid ->
    gradient-bit scheme, exact integer arithmetic), then fold the
    per-frame hashes into ONE 56-bit signature by per-bit MAJORITY vote
    (bit b set iff more than half the sampled frames set it) — the
    standard temporal aggregation: the dominant gradient structure
    survives re-encodes, small edits, and frame drops, and Hamming
    distance on the folded signature ranks similarity. mapInPandas over
    the binary column, same Arrow-batch shape as image_dhash."""
    import struct as _struct

    out_schema = f"{id_col} bigint, vhash bigint, n_frames int"
    step = frame_step

    def _boxes(buf, start, end):
        i = start
        while i + 8 <= end:
            (size,) = _struct.unpack_from(">I", buf, i)
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                (size,) = _struct.unpack_from(">Q", buf, i + 8)
                hdr = 16
            if size < hdr:
                raise ValueError("malformed MP4 box size")
            yield btype, i + hdr, min(i + size, end)
            i += size

    def _ppm_frame_meta(buf, start, end):
        """Sequentially parse concatenated P6 frame HEADERS only:
        (w, h, body_offset) per frame. The pixel bytes stay in place —
        the vectorized dHash below gathers the 64 sampled pixels per
        frame straight out of the payload buffer, so the demux never
        copies frame bodies (guide §4.2: the header walk is cheap
        Python, the per-pixel work is NumPy)."""
        i = start
        while i < end:
            if buf[i : i + 3] != b"P6\n":
                raise ValueError("mdat frame is not binary PPM")
            j = buf.index(b"\n", i + 3)
            w, h = (int(t) for t in buf[i + 3 : j].split(b" "))
            k = buf.index(b"\n", j + 1)  # maxval line
            body = k + 1
            if body + w * h * 3 > end:
                raise ValueError("truncated PPM frame in mdat")
            yield w, h, body
            i = body + w * h * 3

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        r8 = _np.arange(8, dtype=_np.int64)
        # bit r*7+c of the dHash weighs 2^(r*7+c)
        bitw = _np.int64(1) << (r8[:, None] * 7 + r8[None, :7])

        def _grid(w, h):
            # flat byte index of the R channel of grid cell (r, c):
            # pixel (min(h-1, r*h//8), min(w-1, c*w//8)), 3 bytes/pixel
            rr = _np.minimum(h - 1, r8 * h // 8)
            cc = _np.minimum(w - 1, r8 * w // 8)
            return (rr[:, None] * w + cc[None, :]) * 3

        for pdf in batches:
            hashes, counts = [], []
            for p in pdf[payload_col]:
                payload = bytes(p)
                if len(payload) < 8 or payload[4:8] not in (
                    b"ftyp", b"moov", b"mdat"
                ):
                    raise NotImplementedError(
                        "no video container parser for %r" % (payload[4:8],)
                    )
                mdat = None
                for btype, s, e in _boxes(payload, 0, len(payload)):
                    if btype == b"mdat":
                        mdat = (s, e)
                if mdat is None:
                    raise ValueError("video payload has no mdat frames")
                metas = list(_ppm_frame_meta(payload, mdat[0], mdat[1]))
                sampled = metas[::step]
                n = len(sampled)
                buf = _np.frombuffer(payload, _np.uint8)
                if n == 0:
                    hashes.append(0)
                    counts.append(0)
                    continue
                # gather the 8x8 grayscale grid of every sampled frame in
                # one fancy-index: (n, 8, 8) int cells, exact
                # (r + g + b) // 3 integer arithmetic as before
                if all(
                    m[0] == sampled[0][0] and m[1] == sampled[0][1]
                    for m in sampled
                ):
                    g = _grid(sampled[0][0], sampled[0][1])
                    offs = _np.array([m[2] for m in sampled], _np.int64)
                    idx = offs[:, None, None] + g[None]
                    cells = (
                        buf[idx].astype(_np.int64) + buf[idx + 1]
                        + buf[idx + 2]
                    ) // 3
                else:  # mixed frame dims: per-frame gather, same math
                    cells = _np.stack(
                        [
                            (
                                buf[o + _grid(w, h)].astype(_np.int64)
                                + buf[o + _grid(w, h) + 1]
                                + buf[o + _grid(w, h) + 2]
                            ) // 3
                            for (w, h, o) in sampled
                        ]
                    )
                # per-frame gradient bits, then per-bit majority fold:
                # bit set iff strictly more than half the sampled frames
                # set it — identical to the scalar loop it replaces
                gt = cells[:, :, 1:] > cells[:, :, :-1]  # (n, 8, 7)
                maj = 2 * gt.sum(axis=0, dtype=_np.int64) > n
                hashes.append(int((bitw * maj).sum()))
                counts.append(n)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "vhash": hashes,
                 "n_frames": counts}
            )

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=out_schema
    )


def video_near_dup_pairs(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 6,
    max_bucket_freq: int = 64,
    frame_step: int = 2,
) -> DataFrame:
    """Video near-duplicate pairs: 56-bit majority-folded frame dHash
    sequences through the shared guaranteed-recall blocking + Hamming
    verify core (_hamming_banded_pairs) — completing the
    image/audio/video modality set on ONE blocking core.
    Conditional decode spread: see image_near_dup_pairs."""
    sigs = (
        video_fingerprint(
            _spread_narrow(media.select(id_col, payload_col)),
            payload_col=payload_col, id_col=id_col, frame_step=frame_step,
        )
        .localCheckpoint(eager=True)
    )
    return _hamming_banded_pairs(
        sigs, "vhash", id_col, sig_bits=56,
        max_hamming=max_hamming, max_bucket_freq=max_bucket_freq,
    )


def video_near_dup_oracle_sql(
    group_size: int = 4,
    max_hamming: int = 6,
    max_bucket_freq: int = 64,
    frame_step: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB ground truth for video_near_dup_pairs over the
    synthesize_video(near_dup_groups=group_size) fixture: replays the
    closed-form per-frame pixel stream (base-keyed values + f*17 frame
    term, member perturbation of each frame's first 3k bytes), the
    every-frame_step sampling, the per-frame grayscale/grid/gradient
    bits, the per-bit MAJORITY fold across sampled frames, then the
    SHARED guaranteed-recall blocking + hot-bucket cap + Hamming verify
    (dedup.hamming_banded_oracle_block_sql) — full candidate+verify
    contract, no video library anywhere."""
    from orion_spark.llm.dedup import hamming_banded_oracle_block_sql

    g = group_size
    block = hamming_banded_oracle_block_sql(
        "vhash", sig_bits=56, max_hamming=max_hamming,
        max_bucket_freq=max_bucket_freq, src_cte="vh", id_col="media_id",
    )
    return f"""
    WITH ids AS (
        SELECT {id_col} AS media_id,
               {id_col} - {id_col} % {g} AS base
        FROM {table}),
    dims AS (
        SELECT media_id, base,
               2 + base % 7 AS w, 2 + (base // 7) % 7 AS h,
               8 + base % 8 AS nf
        FROM ids),
    frames AS (
        SELECT media_id, base, w, h, s.s * {frame_step} AS f
        FROM dims,
             UNNEST(range(0, (nf + {frame_step} - 1) // {frame_step}))
                 AS s(s)),
    cells AS (
        SELECT media_id, base, f, r.r, c.c,
               3 * (LEAST(h - 1, r.r * h // 8) * w
                    + LEAST(w - 1, c.c * w // 8)) AS ci
        FROM frames, range(0, 8) r(r), range(0, 8) c(c)),
    gray AS (
        SELECT media_id, f, r, c,
               (CASE WHEN ci < 3 * (media_id % {g})
                     THEN ((base * 31 + f * 17 + ci) % 256 + 128) % 256
                     ELSE (base * 31 + f * 17 + ci) % 256 END
                + CASE WHEN ci + 1 < 3 * (media_id % {g})
                       THEN ((base * 31 + f * 17 + ci + 1) % 256 + 128) % 256
                       ELSE (base * 31 + f * 17 + ci + 1) % 256 END
                + CASE WHEN ci + 2 < 3 * (media_id % {g})
                       THEN ((base * 31 + f * 17 + ci + 2) % 256 + 128) % 256
                       ELSE (base * 31 + f * 17 + ci + 2) % 256 END) // 3
                   AS gv
        FROM cells),
    fbits AS (
        SELECT media_id, f, r, c, gv,
               LEAD(gv) OVER (PARTITION BY media_id, f, r ORDER BY c) AS gn
        FROM gray),
    vbits AS (
        SELECT media_id, r, c,
               COUNT(*) FILTER (WHERE gn > gv) AS n_set,
               COUNT(*) AS n_samp
        FROM fbits WHERE c < 7 GROUP BY media_id, r, c),
    vh AS (
        SELECT media_id,
               SUM(CASE WHEN 2 * n_set > n_samp
                        THEN (1::BIGINT << (r * 7 + c)) ELSE 0 END) AS vhash
        FROM vbits GROUP BY media_id),
    {block}
    """
