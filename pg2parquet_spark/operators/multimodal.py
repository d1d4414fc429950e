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


def _widen(df: DataFrame) -> DataFrame:
    """Spread the single-file fixture scan across all cores before codec
    work: the documents table is one small parquet file -> 1-2 input
    splits, and mapInPandas inherits that, single-threading the whole
    (CPU-bound) codec stage. One cheap row shuffle fixes it; at 100 TB the
    source is already thousands of splits and spread_scan (r12) makes the
    no-op claim mechanical — no exchange is added once the scan fills the
    cluster. Mirrors dedup.augmented_documents widen=True."""
    from pg2parquet_spark.tables import spread_scan

    return spread_scan(df)


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
    """REAL image decode over mapInPandas: PIL when available (C speed, all
    formats), else the vendored pure-Python PNG codec (pngcodec.py —
    stdlib-zlib DEFLATE + the 5 scanline filters), so real bytes decode
    in-container with no optional dependency. Emits metadata + a pixel
    checksum so correctness is about the DECODED PIXELS, not the header.
    """
    out_schema = (
        "doc_id long, width int, height int, channels int, "
        "n_pixel_bytes long, pixel_sum long"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # pragma: no cover - absent in container
            import io

            def one(b: bytes):
                img = Image.open(io.BytesIO(b))
                px = img.tobytes()
                return img.width, img.height, len(img.getbands()), px
        except ImportError:
            from pg2parquet_spark.pngcodec import decode_png

            def one(b: bytes):
                w, h, ch, px = decode_png(b)
                return w, h, ch, px

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "width", "height", "channels",
                    "n_pixel_bytes", "pixel_sum",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                if blob is None:
                    continue
                w, h, ch, px = one(bytes(blob))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["n_pixel_bytes"].append(len(px))
                rows["pixel_sum"].append(sum(px))
            yield pd.DataFrame(rows)

    return df.select("doc_id", binary_col).mapInPandas(decode, out_schema)


def attach_real_png(df: DataFrame) -> DataFrame:
    """Attach a REAL (standards-conformant) PNG blob per document: tiny RGB
    image whose dimensions and pixel bytes derive deterministically from
    doc_id, encoded through the vendored writer. mapInPandas because PNG
    encoding is a codec, not an expression."""
    out_schema = "doc_id long, image binary"

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pg2parquet_spark.pngcodec import encode_png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 2 + d % 6, 2 + (d * 3) % 5
                px = bytes((d * 31 + i) % 256 for i in range(w * h * 3))
                blobs.append(encode_png(w, h, 3, px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "image": blobs})

    return df.select("doc_id").mapInPandas(enc, out_schema)


@register(
    "multimodal_png_decode",
    oracle="""
SELECT doc_id,
       CAST(2 + doc_id % 6 AS INT) AS width,
       CAST(2 + (doc_id * 3) % 5 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST((2 + doc_id % 6) * (2 + (doc_id * 3) % 5) * 3 AS BIGINT) AS n_pixel_bytes,
       CAST(list_aggregate(list_transform(
              range(0, (2 + doc_id % 6) * (2 + (doc_id * 3) % 5) * 3),
              i -> (doc_id * 31 + i) % 256), 'sum') AS BIGINT) AS pixel_sum
FROM documents
""",
    doc="REAL codec end-to-end (no fake header): per-doc deterministic RGB "
    "pixels → vendored PNG ENCODE (zlib DEFLATE, CRC chunks) → opaque "
    "binary column → decode_real_image (PIL if present, else the vendored "
    "pure-Python DECODER with all 5 scanline filters) → metadata + pixel "
    "checksum. The oracle recomputes dimensions and the pixel sum "
    "arithmetically, so a hash match proves the decoded PIXELS round-"
    "tripped bit-exactly through a standards-conformant PNG. Both codec "
    "halves are Arrow-batched mapInPandas — the honest slow path, "
    "partition-parallel at any scale.",
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return decode_real_image(attach_real_png(_widen(docs)))


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
    with_img = attach_fake_image(_widen(docs))
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
    with_video = attach_fake_video(_widen(docs))
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


@register(
    "multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(64 + n_chars % 512 AS INT) AS width,
       CAST(64 + (n_chars * 7) % 512 AS INT) AS height,
       CAST((64 + n_chars % 512) // 2 AS INT) AS new_width,
       CAST((64 + (n_chars * 7) % 512) // 2 AS INT) AS new_height,
       CAST(8 + (octet_length(encode(text)) + 1) // 2 AS BIGINT) AS out_bytes
FROM documents
""",
    doc="Image resize plumbing: decode header → halve dimensions → re-encode "
    "a new blob with the new header and a proportionally reduced body "
    "(deterministic fake for the pixel resample; a real kernel would swap in "
    "PIL.Image.resize on the same batch shape). The op measures the REBUILT "
    "blob, so the oracle's arithmetic check proves the bytes were actually "
    "reconstructed, not just the metadata copied. mapInPandas keeps the "
    "per-row Python cost Arrow-batched; binary stays columnar end-to-end.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_img = attach_fake_image(_widen(docs))
    out_schema = "doc_id long, width int, height int, new_width int, new_height int, out_bytes long"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "new_width", "new_height", "out_bytes")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                if blob is None:
                    continue
                b = bytes(blob)
                w, h = struct.unpack(HEADER_FMT, b[:HEADER_LEN])
                body = b[HEADER_LEN:]
                nw, nh = w // 2, h // 2
                # fake resample: keep every other byte (ceil) — stands in for
                # the real pixel kernel, same data movement
                new_body = body[::2]
                out = struct.pack(HEADER_FMT, nw, nh) + new_body
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["new_width"].append(nw)
                rows["new_height"].append(nh)
                rows["out_bytes"].append(len(out))
            yield pd.DataFrame(rows)

    return with_img.select("doc_id", "image").mapInPandas(resize, out_schema)


def attach_fake_audio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque 'audio' blob: 4-byte big-endian sample rate +
    8-bit PCM body (the utf8 text bytes stand in for samples)."""
    rate = (8000 + (F.col("n_chars") % 8) * 1000).cast("int")
    header = F.unhex(F.lpad(F.hex(rate), 8, "0"))
    return df.withColumn("audio", F.concat(header, F.encode(F.col(text_col), "UTF-8")))


@register(
    "multimodal_audio_energy",
    oracle="""
SELECT doc_id,
       CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
       CAST(octet_length(encode(text)) * 1000 // (8000 + (n_chars % 8) * 1000) AS BIGINT) AS duration_ms,
       CAST(list_aggregate(list_transform(range(1, len(text) + 1),
                           i -> unicode(substr(text, i, 1))), 'sum') AS BIGINT) AS energy_sum
FROM documents
""",
    doc="Audio feature plumbing: 4-byte rate header + 8-bit PCM body → "
    "mapInPandas computes sample count, integer-division duration, and the "
    "summed sample amplitude from the RAW BYTES (numpy over the Arrow "
    "buffer — the shape a real spectrogram/VAD kernel uses). Integer "
    "outputs only, so the oracle (which recomputes from code points; the "
    "corpus is ASCII so byte == code point) is exact.",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = table(spark, sf_dir, "documents")
    with_audio = attach_fake_audio(_widen(docs))
    out_schema = "doc_id long, sample_rate int, n_samples long, duration_ms long, energy_sum long"

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sample_rate", "n_samples", "duration_ms", "energy_sum")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                if blob is None:
                    continue
                b = bytes(blob)
                (rate,) = struct.unpack(">I", b[:4])
                samples = np.frombuffer(b[4:], dtype=np.uint8)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["duration_ms"].append(len(samples) * 1000 // rate)
                rows["energy_sum"].append(int(samples.sum()))
            yield pd.DataFrame(rows)

    return with_audio.select("doc_id", "audio").mapInPandas(energy, out_schema)


_IMG_DEDUP_SEEDS = 40  # distinct images in the fixture; docs sharing a seed
                       # get byte-identical PNGs (the planted duplicates)


def attach_seeded_png(df: DataFrame) -> DataFrame:
    """Like attach_real_png, but pixels/dims derive from doc_id % SEEDS, so
    documents sharing a seed carry BYTE-IDENTICAL blobs — the planted
    duplicates an image-dedup operator must find. encode_png is a pure
    function, so equal pixels yield equal bytes."""
    out_schema = "doc_id long, image binary"

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pg2parquet_spark.pngcodec import encode_png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                s = int(doc_id) % _IMG_DEDUP_SEEDS
                w, h = 2 + s % 6, 2 + (s * 3) % 5
                px = bytes((s * 31 + i) % 256 for i in range(w * h * 3))
                blobs.append(encode_png(w, h, 3, px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "image": blobs})

    return df.select("doc_id").mapInPandas(enc, out_schema)


@register(
    "multimodal_image_dedup",
    oracle=f"""
SELECT MIN(doc_id) AS representative,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY doc_id % {_IMG_DEDUP_SEEDS}
""",
    doc="Byte-level image dedup: md5 over the raw PNG blob, one shuffle on "
    "the content hash, keep the min-doc_id representative per group — the "
    "image-column twin of dedup_exact (the first dedup level every "
    "multimodal pipeline runs before any perceptual hashing). Duplicates "
    "are PLANTED as byte-identical seeded PNGs (doc_id % "
    f"{_IMG_DEDUP_SEEDS}); the oracle recomputes the groups arithmetically "
    "from the seed, so a hash match proves the binary-equality grouping "
    "found exactly the planted duplicate sets — semantic-level checking, "
    "since PNG bytes are not SQL-reproducible. The blob is dropped at the "
    "aggregation boundary: only the 16-byte hash shuffles, never the "
    "image bytes.",
)
def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_img = attach_seeded_png(_widen(docs))
    return (
        with_img.select("doc_id", F.md5("image").alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("representative"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .select("representative", "n_copies")
    )


def phash_real_image(df: DataFrame, binary_col: str = "image") -> DataFrame:
    """Average-hash (aHash) over DECODED pixels: gray_j = (r+g+b)//3, bit j
    set iff gray_j >= floor(mean). Integer arithmetic only, so the hash is
    reproducible arithmetically by the oracle. Arrow-batched mapInPandas —
    partition-parallel, no shuffle."""
    out_schema = "doc_id long, width int, height int, phash long"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pg2parquet_spark.pngcodec import decode_png

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "phash": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                if blob is None:
                    continue
                w, h, ch, px = decode_png(bytes(blob))
                n = w * h
                gray = [(px[3 * j] + px[3 * j + 1] + px[3 * j + 2]) // 3 for j in range(n)]
                mn = sum(gray) // n
                ph = 0
                for j, gv in enumerate(gray):
                    if gv >= mn:
                        ph |= 1 << j
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["phash"].append(ph)
            yield pd.DataFrame(rows)

    return df.select("doc_id", binary_col).mapInPandas(compute, out_schema)


@register(
    "multimodal_image_phash",
    oracle="""
WITH g AS (
  SELECT doc_id,
         2 + doc_id % 6 AS w,
         2 + (doc_id * 3) % 5 AS h,
         list_transform(
           range(0, (2 + doc_id % 6) * (2 + (doc_id * 3) % 5)),
           j -> ((doc_id * 31 + 3 * j) % 256
               + (doc_id * 31 + 3 * j + 1) % 256
               + (doc_id * 31 + 3 * j + 2) % 256) // 3) AS gray
  FROM documents
),
m AS (SELECT doc_id, w, h, gray,
             list_aggregate(gray, 'sum') // (w * h) AS mn FROM g)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(list_aggregate(
         list_transform(range(0, w * h),
           j -> CASE WHEN gray[j + 1] >= mn THEN (CAST(1 AS BIGINT) << j) ELSE 0 END),
         'sum') AS BIGINT) AS phash
FROM m
""",
    doc="Perceptual IMAGE hash through the REAL codec: deterministic RGB "
    "pixels → vendored PNG encode → decode → integer aHash (bit j = "
    "gray_j >= floor(mean)). The oracle recomputes the hash purely "
    "arithmetically from the pixel formula, so a match proves the decoded "
    "pixels AND the hash derivation both round-tripped exactly. This is "
    "the image-dedup building block: at 100 TB the phash column feeds the "
    "same groupBy/LSH machinery the text dedup family uses (hamming "
    "neighbors via band-substrings of the hash), with the codec work "
    "embarrassingly parallel in Arrow batches.",
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return phash_real_image(attach_real_png(_widen(docs)))


# --------------------------------------------------------- scene cuts --
_CUT_THRESH = 64  # |Δ intensity| > threshold ⇒ scene boundary


def attach_intensity_video(df: DataFrame) -> DataFrame:
    """Synthesize a video blob whose BODY is per-frame intensity bytes:
    4-byte big-endian frame count, then frame k's intensity = the first
    md5 byte of 'doc_id|k'. Deterministic per (doc, frame) so the oracle
    can recompute every byte arithmetically while the operator must parse
    them out of the binary — real plumbing, exact contract."""
    n_frames = (10 + F.col("n_chars") % 20).cast("int")
    header = F.unhex(F.lpad(F.hex(n_frames), 8, "0"))
    body = F.expr(
        "aggregate(sequence(0, cast(10 + n_chars % 20 as int) - 1), "
        "cast('' as binary), (acc, k) -> concat(acc, "
        "unhex(substr(md5(concat(cast(doc_id as string), '|', cast(k as string))), 1, 2))))"
    )
    return df.withColumn("video", F.concat(header, body))


@register(
    "multimodal_scene_cuts",
    oracle=f"""
SELECT doc_id,
       CAST(10 + n_chars % 20 AS INT) AS n_frames,
       CAST(len(list_filter(range(1, 10 + n_chars % 20), k ->
            ABS(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 2) AS INT)
              - CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k - 1 AS VARCHAR)), 1, 2) AS INT))
            > {_CUT_THRESH})) AS BIGINT) AS n_cuts
FROM documents
""",
    doc="Video SCENE-CUT detection plumbing: the blob carries a 4-byte "
    "frame-count header plus one intensity byte per frame; mapInPandas "
    "parses the header, lifts the frame bytes through numpy, and counts "
    f"frame-to-frame jumps > {_CUT_THRESH} — the shape of a real "
    "histogram-delta shot detector (decode → per-frame feature → "
    "sequential delta), with the frame loop vectorized inside the Arrow "
    "batch. Intensities are md5-derived per (doc, frame), so the oracle "
    "recomputes every byte arithmetically and the gate pins that the "
    "binary round-trip and the delta logic are exact. Map-only plan: "
    "blobs never shuffle.",
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = table(spark, sf_dir, "documents")
    with_video = attach_intensity_video(_widen(docs))
    out_schema = "doc_id long, n_frames int, n_cuts long"

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_frames", "n_cuts")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["video"]):
                if blob is None:
                    continue
                b = bytes(blob)
                (n_frames,) = struct.unpack(">I", b[:4])
                inten = np.frombuffer(b[4 : 4 + n_frames], dtype=np.uint8).astype(np.int32)
                n_cuts = int((np.abs(np.diff(inten)) > _CUT_THRESH).sum())
                rows["doc_id"].append(doc_id)
                rows["n_frames"].append(n_frames)
                rows["n_cuts"].append(n_cuts)
            yield pd.DataFrame(rows)

    return with_video.select("doc_id", "video").mapInPandas(cuts, out_schema)
