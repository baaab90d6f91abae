"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a typed metadata
struct; decode/feature-extraction runs as Arrow-batched `mapInPandas` so
heavy per-item work (a real decoder) parallelizes across executors without
row-at-a-time serde. The decode step itself is STUBBED here (no image/audio
libs in this environment — clearly marked below); the Spark-side plumbing
(schema, batch iteration, partitioning) is real and tested.

Scale notes: binary payloads dominate row size — keep
spark.sql.files.maxPartitionBytes conservative (128 MB default is fine:
Parquet splits on row groups, so a 10 MB image never straddles tasks), and
never collect payloads to the driver. Feature extraction is embarrassingly
parallel; repartition by a content-hash prefix if payload-size skew shows
up in task runtimes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("byte_checksum", T.LongType()),
    ]
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """Model a multimodal table: payload bytes + typed metadata struct.

    Here the payload is the utf-8 encoding of the text (a deterministic
    stand-in for image bytes); a real ingest would read files via
    `spark.read.format("binaryFile")`.
    """
    payload = F.encode("text", "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit("synthetic").alias("origin"),
        ).alias("meta"),
    )


def binary_stats(documents: DataFrame) -> DataFrame:
    """Engine-level stats over the binary payload (pure column exprs)."""
    payload = F.encode("text", "utf-8")
    return documents.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


BINARY_STATS_SQL = """
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS content_md5
  FROM documents"""


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The pandas function receives whole record batches (payload bytes as
    Python `bytes`); a real pipeline would decode images here. We compute
    deterministic stand-in features so the batch shape, schema, and
    partition behavior are fully exercised.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "byte_checksum": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                }
            )

    return multimodal.mapInPandas(_batches, FEATURE_SCHEMA)


# DuckDB twin of extract_features: the stand-in "decode" is deterministic
# byte arithmetic over the utf-8 payload, so it IS SQL-expressible — hex()
# the blob and parse byte values from hex pairs (strpos arithmetic, same
# trick as corpus._doc_hash_sql). Spark keeps the Arrow/mapInPandas path;
# this twin makes the driver row hash-checkable instead of rows-only.
_HEX = "0123456789ABCDEF"
_BYTE_AT = (
    f"(strpos('{_HEX}', substring(h, 2*i+1, 1)) - 1) * 16"
    f" + (strpos('{_HEX}', substring(h, 2*i+2, 1)) - 1)"
)

FEATURE_EXTRACT_SQL = f"""
  WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                    octet_length(encode(text)) AS nb
             FROM documents)
  SELECT doc_id,
         CAST(nb AS INTEGER) AS n_bytes,
         lower(substring(h, 1, 8)) AS head_hex,
         CAST(COALESCE(list_sum([{_BYTE_AT} FOR i IN range(0, nb)]), 0) % 997
              AS BIGINT) AS byte_checksum
  FROM b"""


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)

FRAME_SIZE_BYTES = 16
FRAME_SAMPLE_EVERY = 4

# DuckDB twin of sample_frame_features (same hex-pair byte arithmetic as
# FEATURE_EXTRACT_SQL; the 1→N frame fan-out is an unnest over the sampled
# frame indexes). Keeps the legacy parity harness hash-checking the
# mapInPandas fan-out instead of trusting row counts.
FRAME_SAMPLE_SQL = f"""
  WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                    octet_length(encode(text)) AS nb
             FROM documents),
  f AS (SELECT doc_id, h, CAST(nb // {FRAME_SIZE_BYTES} AS INTEGER) AS n_frames,
               unnest(range(0, nb // {FRAME_SIZE_BYTES}, {FRAME_SAMPLE_EVERY})) AS fi
        FROM b)
  SELECT doc_id,
         CAST(fi AS INTEGER) AS frame_index,
         n_frames,
         CAST(COALESCE(list_sum([{_BYTE_AT}
                                 FOR i IN range(fi * {FRAME_SIZE_BYTES},
                                                (fi + 1) * {FRAME_SIZE_BYTES})]), 0)
              % 997 AS BIGINT) AS frame_checksum
  FROM f"""


def sample_frame_features(
    multimodal: DataFrame,
    frame_size: int = FRAME_SIZE_BYTES,
    every_n: int = FRAME_SAMPLE_EVERY,
) -> DataFrame:
    """Video-style frame sampling plumbing: each payload is treated as a
    sequence of fixed-size frames; every Nth frame is selected and reduced
    to features — one input row fans out to many output rows (the UDTF
    shape a real frame sampler has). The per-frame decode is a
    deterministic stand-in (`sample_frames` documents the real plug-in
    point; no av/ffmpeg bindings in this environment) — the partitioning,
    Arrow batch iteration, schema, and 1→N row expansion are real.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // frame_size
                for idx in range(0, n_frames, every_n):
                    frame = b[idx * frame_size : (idx + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_index": idx,
                            "n_frames": n_frames,
                            "frame_checksum": sum(frame) % 997,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return multimodal.mapInPandas(_batches, FRAME_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """STUB — image decoding requires PIL/opencv, absent in this
    environment. The mapInPandas plumbing above is where a real decoder
    plugs in (swap the stand-in feature computation for
    `Image.open(io.BytesIO(payload))`)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment"
    )


def sample_frames(payload: bytes, every_n: int = 30) -> "object":
    """STUB — video frame sampling (no av/ffmpeg bindings here); same
    plug-in point as decode_image."""
    raise NotImplementedError(
        "video frame sampling requires an av library not present in this environment"
    )
