"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Design for 100 TB: binary payloads live in their own column (Parquet
BYTE_ARRAY, never materialized by queries that don't touch them — column
pruning does the work); decode/feature steps run as Arrow-batched
`mapInPandas` over whole partitions, so Python cost is per-batch, and the
pipeline repartitions by size (`maxRecordsPerBatch`) rather than row count.

The actual image/audio codecs are NOT in this container, so the decode core
is stubbed two ways (clearly marked):
- a deterministic fake header codec (8-byte big-endian width/height) that
  exercises the real plumbing — schema, batching, UDF signatures — and is
  verified against a DuckDB oracle end-to-end;
- `decode_real_image`, which raises NotImplementedError unless PIL is
  importable (import-gated per the environment contract).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

HEADER_FMT = ">II"  # big-endian width, height
HEADER_LEN = struct.calcsize(HEADER_FMT)


def attach_fake_image(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload: 8-byte header + utf8 body.

    Stands in for a real image blob; dimensions derive deterministically
    from n_chars so the oracle can recompute them without touching bytes.
    """
    width = (64 + F.col("n_chars") % 512).cast("int")
    height = (64 + (F.col("n_chars") * 7) % 512).cast("int")
    header = F.concat(
        F.unhex(F.lpad(F.hex(width), 8, "0")),
        F.unhex(F.lpad(F.hex(height), 8, "0")),
    )
    return df.withColumn("image", F.concat(header, F.encode(F.col(text_col), "UTF-8")))


def decode_image_meta(df: DataFrame, binary_col: str = "image") -> DataFrame:
    """mapInPandas decode: parse the binary header per batch (real plumbing,
    fake codec). Output keeps only metadata — the blob is dropped so
    downstream stages never shuffle the heavy column."""
    out_schema = "doc_id long, width int, height int, n_bytes long"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[binary_col]
            meta = [
                struct.unpack(HEADER_FMT, bytes(b[:HEADER_LEN])) if b is not None else (None, None)
                for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_bytes": [len(bytes(b)) if b is not None else None for b in blobs],
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(decode, out_schema)


def extract_fake_features(df: DataFrame, binary_col: str = "image", dim: int = 8) -> DataFrame:
    """Deterministic fake feature extractor: md5 bytes → dim floats in [0,1).
    Real plumbing for an embedding stage (Arrow batches, array<float> out)."""
    import hashlib

    out_schema = "doc_id long, features array<float>"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[binary_col]:
                if b is None:
                    rows.append(None)
                    continue
                digest = hashlib.md5(bytes(b)).digest()
                rows.append([digest[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": rows})

    return df.select("doc_id", binary_col).mapInPandas(feats, out_schema)


def decode_real_image(df: DataFrame, binary_col: str = "image") -> DataFrame:
    """Real image decode — requires PIL, which this environment lacks."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode needs pillow on the executors; the container "
            "ships without it — use decode_image_meta (header codec) or add "
            "the dependency at deploy time"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open over mapInPandas here")


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(64 + n_chars % 512 AS INT) AS width,
       CAST(64 + (n_chars * 7) % 512 AS INT) AS height,
       CAST(octet_length(encode(text)) + 8 AS BIGINT) AS n_bytes
FROM documents
""",
    doc="Multimodal plumbing end-to-end: synthesize binary image column → mapInPandas "
    "header decode (Arrow-batched) → metadata-only output. The oracle recomputes the "
    "header fields arithmetically, proving the bytes round-tripped.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_img = attach_fake_image(docs)
    return decode_image_meta(with_img)


def attach_fake_video(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque 'video' blob: 4-byte big-endian frame count +
    body. Frame count derives from n_chars so the oracle can recompute it."""
    n_frames = (10 + F.col("n_chars") % 20).cast("int")
    header = F.unhex(F.lpad(F.hex(n_frames), 8, "0"))
    return df.withColumn("video", F.concat(header, F.encode(F.col(text_col), "UTF-8")))


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
       CAST(10 + n_chars % 20 AS INT) AS n_frames
FROM documents,
     LATERAL (SELECT UNNEST(range(0, 10 + n_chars % 20, 4)) AS frame_idx) f
""",
    doc="Video frame sampling plumbing: synthesize binary 'video' (4-byte frame-"
    "count header) → mapInPandas parses the header and emits every 4th frame "
    "index as its own row (1→N explode inside the Arrow batch). The real "
    "decoder would emit frame bytes per row; the oracle recomputes the "
    "sampled indices arithmetically, proving the header round-tripped and "
    "the fan-out is exact.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_video = attach_fake_video(docs)
    out_schema = "doc_id long, frame_idx int, n_frames int"
    stride = 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            totals: list[int] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["video"]):
                if blob is None:
                    continue
                (n_frames,) = struct.unpack(">I", bytes(blob[:4]))
                for i in range(0, n_frames, stride):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "n_frames": totals}
            )

    return with_video.select("doc_id", "video").mapInPandas(sample, out_schema)
