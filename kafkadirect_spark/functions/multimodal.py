"""Multimodal columns: images/audio/video as opaque BinaryType payloads
with a typed metadata struct, processed by Arrow-batched mapInPandas.

The Spark-side plumbing — schema, partition-parallel batch iteration,
UDF signatures — is real and tested; the *codec* step is stubbed
(image/audio libraries are not in this environment) behind
``decode_stub``: a clearly-marked deterministic fake that derives
pseudo-metadata from the bytes, or raises NotImplementedError in
``strict`` mode where a real decoder is required.

At 100 TB: binary payloads stay columnar (parquet BYTE_ARRAY with page
compression); mapInPandas streams Arrow record batches per partition —
no shuffle is introduced by decode/feature-extract, so the pipeline
cost is one scan + the Python batch boundary.  Size partitions with
spark.sql.files.maxPartitionBytes so a batch of decoded frames fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_META = StructType([
    StructField("media_type", StringType()),   # image/audio/video
    StructField("codec", StringType()),
    StructField("width", IntegerType()),       # px (image/video)
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),    # video frames / audio windows
    StructField("n_bytes", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("meta", MEDIA_META),
])


def attach_payload(df: DataFrame, id_col: str, text_col: str,
                   media_type: str = "image") -> DataFrame:
    """Wrap a column's bytes as a media payload row (test harness for
    the plumbing; a real source would read the bytes from object
    storage)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str, strict: bool = False) -> dict:
    """STUB — deterministic fake decode.  A real deployment replaces
    this with PIL/ffmpeg/torchaudio; the surrounding Spark plumbing is
    unchanged.  ``strict=True`` raises, marking the unimplemented
    codec path explicitly."""
    if strict:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present "
            "in this environment; wire PIL/ffmpeg here")
    n = len(payload)
    return {
        "width": (n % 640) + 1,
        "height": ((n // 640) % 480) + 1,
        "n_frames": 1 if media_type == "image" else (n % 32) + 1,
    }


def resize_stub(payload: bytes, width: int, height: int,
                strict: bool = False) -> bytes:
    """STUB — deterministic fake resize: a real deployment decodes,
    resamples, re-encodes (PIL/ffmpeg); here the payload is resized to
    a deterministic w·h-proportional byte slice so downstream plumbing
    (schemas, batch shapes, size accounting) is exercised for real."""
    if strict:
        raise NotImplementedError("real resize requires an image codec")
    n = max(1, min(len(payload), (width * height) // 64))
    return payload[:n]


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every ``every_n``-th frame of video/audio payloads: one
    output row per sampled frame with a deterministic per-frame slice.
    Arrow-batched mapInPandas; the explode happens executor-side, so
    output size scales with frames sampled, never with a shuffle."""
    import pandas as pd

    from pyspark.sql.types import IntegerType

    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("n_frames", IntegerType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf["meta"].tolist() if "meta" in pdf else [{}] * len(pdf)
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], metas):
                mt = (meta or {}).get("media_type", "video")
                d = decode_stub(bytes(payload), mt)
                nf = d["n_frames"]
                span = max(1, len(payload) // max(nf, 1))
                for i in range(0, nf, every_n):
                    rows.append({
                        "doc_id": doc_id,
                        "frame_idx": i,
                        "frame_bytes": bytes(payload[i * span:(i + 1) * span]),
                        "n_frames": nf,
                    })
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "frame_bytes", "n_frames"])

    return media.mapInPandas(batches, schema=out_schema)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: fills the
    decoded width/height/n_frames metadata and a per-payload checksum
    feature.  Arrow-batched; one Python roundtrip per record batch,
    zero shuffles."""
    import pandas as pd

    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("checksum", LongType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf["meta"].tolist() if "meta" in pdf else [{}] * len(pdf)
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], metas):
                mt = (meta or {}).get("media_type", "image")
                d = decode_stub(bytes(payload), mt)
                rows.append({
                    "doc_id": doc_id,
                    "media_type": mt,
                    "n_bytes": len(payload),
                    "width": d["width"],
                    "height": d["height"],
                    "n_frames": d["n_frames"],
                    # order-free byte checksum: Σ bytes mod 2^31
                    "checksum": int(sum(payload) % 2_147_483_647),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=out_schema)
