"""Multimodal column handling for LLM training-data pipelines.

Images/audio/video ride as opaque BINARY columns with typed metadata
structs; decode/resize/frame-sample are Arrow-batched mapInPandas stages.
The actual codec step is STUBBED (no image/audio libraries in this
container): `decode_stub=True` produces a deterministic fake decode so the
Spark-side plumbing — schema, batching, partition sizing — is real and
tested; swapping in PIL/ffmpeg later changes only the inner function.

Scale notes: binary payloads make rows wide, so these stages run on
repartitioned inputs sized by `target_rows_per_batch` (Arrow batch memory =
rows x payload), and metadata-only predicates (media_type, width) are
ordinary columns Catalyst can push down to parquet BEFORE the payload is
ever read — keep payloads in a separate column chunk and select late.
"""

from __future__ import annotations

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


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    target_rows_per_batch: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas decode/feature-extract stage. Output schema is fixed and
    engine-typed; the inner decode is the only swappable piece."""
    if not decode_stub:
        raise NotImplementedError(
            "no image/audio codec libraries in this environment; "
            "run with decode_stub=True"
        )
    out_schema = f"{id_col} bigint, width int, height int, pixel_sum bigint"

    # the decoder lives INSIDE the closure: everything mapInPandas ships to
    # executors must be pickled by value — a reference to a module-level
    # function would require `orion_spark` to be importable on every worker,
    # which the external driver's session does not guarantee
    def _fake_decode(payload: bytes) -> dict:
        """Deterministic stand-in for a real decoder: derives pseudo
        width/height/pixel-sum from the bytes. Replace with PIL/torchvision
        when the libraries exist."""
        if payload is None or len(payload) == 0:
            raise NotImplementedError("real decode requires an image library")
        n = len(payload)
        return {
            "width": 1 + payload[0] % 64,
            "height": 1 + payload[min(1, n - 1)] % 64,
            "pixel_sum": sum(payload[:64]),
        }

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "pixel_sum": [f["pixel_sum"] for f in feats],
                }
            )

    narrow = df.select(id_col, payload_col)
    return narrow.mapInPandas(process, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: explode one row per sampled timestamp
    (the decode of each frame is the stubbed stage above). Pure column ops —
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
