"""Multimodal column plumbing (SURVEY.md §7.4).

Media (image/audio/video) travels as opaque ``binary`` payload columns
with typed metadata; per-item processing (decode, feature-extract,
resize, frame-sample) runs as Arrow-batched ``mapInPandas`` — the
correct Spark shape for byte-blob UDF work: columnar transfer, batch
amortization, linear scaling with partitions, no shuffle.

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the
decode step is gated behind an import-try and raises
``NotImplementedError`` when unavailable; the deterministic fallback
("fake decode") computes real byte-level features so the Spark-side
plumbing — schema, batching, UDF signature, partitioning — is fully
exercised and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), True),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media table from a text corpus: the UTF-8 bytes stand in
    for an encoded image; metadata columns are derived deterministically.
    (Pure projection — binary columns are first-class in parquet/Tungsten.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.pmod(F.col(id_col), F.lit(1024)) + 16).cast("int").alias("meta_width"),
        (F.pmod(F.col(id_col), F.lit(768)) + 16).cast("int").alias("meta_height"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decode — requires an image codec, absent in this container.

    STUB (clearly marked): at deployment, plug PIL/torchvision here;
    the mapInPandas plumbing around it does not change.
    """
    try:
        import PIL.Image  # noqa: F401  (not installed here)
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "image decoding requires an image codec (e.g. Pillow); "
            "not available in this environment"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-level features via Arrow-batched mapInPandas.

    Deterministic (hashlib md5, byte slices) so the DuckDB oracle can
    reproduce every output; ``decoded`` records whether the real codec
    path was available.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            try:
                decode_image(b"")
                decoded = True  # pragma: no cover
            except NotImplementedError:
                decoded = False
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "header_hex": payloads.map(
                        lambda b: bytes(b[:4]).hex() if b is not None else None
                    ),
                    "decoded": decoded,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_TARGET_BYTES = 256

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("target_w", T.IntegerType(), True),
        T.StructField("target_h", T.IntegerType(), True),
        T.StructField("resized_n_bytes", T.LongType(), True),
        T.StructField("resized_md5", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), True),
    ]
)


def resize_media(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """'Resize' via Arrow-batched mapInPandas.

    STUB decode (no codec in this container): the deterministic fake
    stride-samples the payload bytes down to ~RESIZE_TARGET_BYTES —
    the same one-row-in/one-row-out batch shape a real
    decode→resize→re-encode takes, so schema, batching, and
    partitioning are fully exercised; at deployment only the
    per-payload function body changes (PIL resize between decode and
    md5)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            decode_image(b"")
            decoded = True  # pragma: no cover
        except NotImplementedError:
            decoded = False
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, target_w, target_h, 0, None, decoded))
                    continue
                data = bytes(payload)
                stride = max(1, len(data) // RESIZE_TARGET_BYTES)
                resized = data[::stride]
                rows.append(
                    (mid, target_w, target_h, len(resized),
                     hashlib.md5(resized).hexdigest(), decoded)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "target_w", "target_h",
                         "resized_n_bytes", "resized_md5", "decoded"],
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the
    shape a video frame-sampler takes — one input row → many frame
    rows), as a mapInPandas generator with bounded fan-out."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
            T.StructField("frame_no", T.IntegerType(), True),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    rows.append((mid, i, data[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_bytes"])

    return df.mapInPandas(batches, out_schema)
