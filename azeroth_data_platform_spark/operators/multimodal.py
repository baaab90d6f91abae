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
    """Feature-flagged decoder seam: decodes with Pillow when it is
    importable, raises NotImplementedError otherwise (this container
    ships no imaging library). The DETERMINISTIC stand-ins in the
    mapInPandas operators above remain the oracle-checked path either
    way — a real deployment swaps the stand-in feature computation for
    this call inside the same Arrow batch loop, changing only the
    feature values, never the schema/partitioning/batch shape.
    Both flag sides are pinned by
    tests/test_dedup_units.py::test_image_decode_seam_feature_flag."""
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — optional, probed at call time
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this"
            " environment"
        ) from exc
    return Image.open(io.BytesIO(payload))


def sample_frames(payload: bytes, every_n: int = 30) -> "object":
    """Feature-flagged video seam (same contract as decode_image): uses
    PyAV when importable, raises NotImplementedError otherwise."""
    try:
        import io

        import av  # noqa: PLC0415 — optional, probed at call time
    except ImportError as exc:
        raise NotImplementedError(
            "video frame sampling requires an av library not present in this"
            " environment"
        ) from exc
    container = av.open(io.BytesIO(payload))
    return [
        frame for i, frame in enumerate(container.decode(video=0))
        if i % every_n == 0
    ]


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup detection over binary payloads — the multimodal
# dedup stage (image near-dup removal in training pipelines): reduce each
# payload to a compact block-average fingerprint, then find pairs within a
# small hamming distance WITHOUT a pairwise sweep, using the same 4-band
# pigeonhole blocking as the text simhash (dedup.simhash_banded_dedup):
# any pair with hamming ≤ 3 agrees exactly on at least one 15-bit band, so
# banded equi-join candidate generation is EXACT for the ≤3 regime.
#
# The fingerprint here is a block-parity hash over 60 byte blocks (bit b =
# parity of block b's byte sum): block-LOCAL edits flip only the touched
# blocks' bits (small hamming), unrelated payloads differ in ~30 of 60
# bits — the locality property a real image pHash has for crops/noise,
# expressed in deterministic integer arithmetic. (A block-average hash was
# tried first and is degenerate on homogeneous ASCII payloads: every block
# mean hovers at the overall mean, so any edit avalanches.) A real decoder
# plugs in at decode_image and swaps this for a DCT pHash. Pure integer
# arithmetic, so the whole operator is hash-exact against the DuckDB
# hex-pair twin, while Spark computes fingerprints on the Arrow/
# mapInPandas decode path a real image pipeline would use.

N_PHASH_BLOCKS = 60
PHASH_BAND_BITS = 15
PHASH_MAX_HAMMING = 3


def phash_fingerprints(multimodal: DataFrame) -> DataFrame:
    """(doc_id, phash): 60-bit block-parity fingerprint of each payload,
    computed in the Arrow decode path (mapInPandas — the real pipeline
    swaps the byte arithmetic for an image DCT after decode_image)."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                sums = [0] * N_PHASH_BLOCKS
                lens = [0] * N_PHASH_BLOCKS
                for p, byte in enumerate(b):
                    blk = p * N_PHASH_BLOCKS // n
                    sums[blk] += byte
                    lens[blk] += 1
                ph = 0
                for blk in range(N_PHASH_BLOCKS):
                    # parity of the block byte sum: block-local edits flip
                    # only their own block's bit
                    if lens[blk] and sums[blk] % 2 == 1:
                        ph |= 1 << blk
                out.append({"doc_id": doc_id, "phash": ph})
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return multimodal.mapInPandas(_batches, schema)


def phash_dedup(
    documents: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """(d1, d2, hamming) payload near-dup pairs with hamming ≤ `max_hamming`
    over the 60-bit perceptual hash — exact for max_hamming ≤ 3 by the
    4-band pigeonhole (a pair that disagrees in ≤3 bits cannot disagree in
    all 4 bands). Candidate generation is a (band, band_val) equi-join;
    only candidates pay the popcount verify."""
    fp = phash_fingerprints(attach_binary(documents))
    bands = fp.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.expr(
                            f"shiftright(phash, {k * PHASH_BAND_BITS})"
                            f" & {(1 << PHASH_BAND_BITS) - 1}"
                        ).alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("x"),
    ).select("doc_id", "phash", "x.band", "x.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.expr("bit_count(a.phash ^ b.phash)")
    return (
        a.join(b, ["band", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _phash_sql() -> str:
    """DuckDB twin: identical integer arithmetic from hex pairs."""
    byte_at = _BYTE_AT
    nb = N_PHASH_BLOCKS
    return f"""
  WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                    octet_length(encode(text)) AS n
             FROM documents WHERE octet_length(encode(text)) > 0),
  bytes AS (SELECT doc_id, n, i, {byte_at} AS v,
                   (i * {nb}) // n AS blk
            FROM (SELECT doc_id, h, n, unnest(range(0, n)) AS i FROM b)),
  blocks AS (SELECT doc_id, blk, SUM(v) AS s
             FROM bytes GROUP BY doc_id, blk),
  ph AS (SELECT doc_id,
                CAST(SUM(CASE WHEN s % 2 = 1
                              THEN CAST(1 AS BIGINT) << CAST(blk AS INTEGER)
                              ELSE 0 END) AS BIGINT) AS phash
         FROM blocks
         GROUP BY doc_id)
  SELECT doc_id, phash FROM ph"""


def _phash_dedup_sql(max_hamming: int = PHASH_MAX_HAMMING) -> str:
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = ", ".join(
        f"struct_pack(band := {k},"
        f" band_val := (phash >> {k * PHASH_BAND_BITS}) & {mask})"
        for k in range(4)
    )
    return f"""
  WITH ph AS ({_phash_sql()}),
  bands AS (SELECT doc_id, phash, x.band AS band, x.band_val AS band_val
            FROM (SELECT doc_id, phash, unnest([{bands}]) AS x FROM ph)),
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                  bit_count(xor(a.phash, b.phash)) AS hamming
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_val = b.band_val
            AND a.doc_id < b.doc_id)
  SELECT d1, d2, CAST(hamming AS INTEGER) AS hamming
  FROM cand WHERE hamming <= {max_hamming}"""


PHASH_DEDUP_SQL = _phash_dedup_sql()


def phash_dedup_synth(documents: DataFrame) -> DataFrame:
    """`phash_dedup` over the corpus plus deterministic perturbed clones
    (doc_id % 17 = 0 docs re-appear at doc_id + 1,000,000 with the last 3
    bytes overwritten): the natural corpus has no payload near-dups, so this is the
    differential variant whose candidate-join and popcount-verify actually
    fire (the clone pairs land at hamming ≤ 3), while unrelated docs keep
    exercising the no-match path in the same run."""
    clones = documents.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        # same length (block boundaries unchanged): overwrite the last 3
        # bytes, so only the final blocks' parities can flip
        F.expr("concat(substring(text, 1, length(text) - 3), 'qqq')").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return phash_dedup(documents.unionByName(clones))


PHASH_DEDUP_SYNTH_SQL = _phash_dedup_sql().replace(
    "FROM documents WHERE octet_length(encode(text)) > 0",
    """FROM (SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               substring(text, 1, length(text) - 3) || 'qqq' AS text
        FROM documents WHERE doc_id % 17 = 0) d
   WHERE octet_length(encode(text)) > 0""",
)


# ---------------------------------------------------------------------------
# Audio-style fixed-window segmentation — the audio twin of frame_sample:
# treat the payload as a PCM8 sample stream and emit one row per S-sample
# window with the per-window features a real audio pipeline computes before
# the model (peak, amplitude mass, zero-crossing count — the VAD/energy
# trio). The real decoder (ffmpeg/soundfile) is environment-blocked like
# decode_image; the stand-in interprets payload BYTES as samples, which
# keeps the whole operator deterministic byte arithmetic — so the Arrow
# mapInPandas 1→N path is hash-checked against a pure-SQL DuckDB twin, not
# just rows-only. Zero-crossing = adjacent samples straddling the unsigned
# midpoint (128).
#
# Scale shape: same as extract_features — embarrassingly parallel over
# payload rows, output fan-out S-bounded per input row, no shuffle.

AUDIO_SEG_SAMPLES = 64

AUDIO_SEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seg_id", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("n_zero_crossings", T.IntegerType()),
    ]
)


def audio_segments(multimodal: DataFrame, s: int = AUDIO_SEG_SAMPLES) -> DataFrame:
    """One row per `s`-sample window of each payload: (doc_id, seg_id,
    n_samples, peak, sum_amp, n_zero_crossings)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in AUDIO_SEG_SCHEMA.fields}
            for doc, payload in zip(pdf["doc_id"], pdf["payload"]):
                bb = bytes(payload)
                for st in range(0, len(bb), s):
                    w = bb[st : st + s]
                    zc = sum(
                        1
                        for j in range(1, len(w))
                        if (w[j - 1] < 128) != (w[j] < 128)
                    )
                    rows["doc_id"].append(doc)
                    rows["seg_id"].append(st // s)
                    rows["n_samples"].append(len(w))
                    rows["peak"].append(max(w))
                    rows["sum_amp"].append(sum(w))
                    rows["n_zero_crossings"].append(zc)
            yield pd.DataFrame(rows)

    return multimodal.mapInPandas(_batches, AUDIO_SEG_SCHEMA)


def _audio_segments_sql(s: int = AUDIO_SEG_SAMPLES) -> str:
    byte_at = (
        f"(strpos('{_HEX}', substring(h, 2*j+1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substring(h, 2*j+2, 1)) - 1)"
    )
    return f"""
  WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                    octet_length(encode(text)) AS nb
             FROM documents),
  segs AS (SELECT doc_id, h, nb, unnest(range(0, nb, {s})) AS st FROM b),
  vals AS (SELECT doc_id, CAST(st // {s} AS INTEGER) AS seg_id,
                  [{byte_at} FOR j IN range(st, least(st + {s}, nb))] AS w
           FROM segs)
  SELECT doc_id, seg_id,
         CAST(len(w) AS INTEGER) AS n_samples,
         CAST(list_max(w) AS INTEGER) AS peak,
         CAST(list_sum(w) AS BIGINT) AS sum_amp,
         CAST(len([1 FOR j IN range(2, len(w) + 1)
                   IF (w[j - 1] < 128) <> (w[j] < 128)]) AS INTEGER)
           AS n_zero_crossings
  FROM vals"""


AUDIO_SEGMENTS_SQL = _audio_segments_sql()


# ---------------------------------------------------------------------------
# Binary content-defined chunking — dd_cdc_segments' MULTIMODAL twin: the
# storage-dedup technique applied to payload BYTES (how media blobs dedup
# in object stores: boundaries are a function of content, so re-encoded /
# shifted copies still share downstream chunks). Boundary after byte b
# where b % CDC_BIN_DIV == 0; chunk identity = md5 of the chunk bytes.
# Spark side runs on the Arrow mapInPandas decode path (the real-payload
# plumbing); the DuckDB twin re-derives byte values from the hex dump and
# — the corpus payload being the ASCII utf-8 of `text` — takes chunk md5s
# via substring, making the whole chunk-then-rollup chain hash-checkable.

CDC_BIN_DIV = 17  # expected chunk length in bytes

_BIN_SEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("seg_md5", T.StringType(), False),
        T.StructField("seg_len", T.LongType(), False),
    ]
)


def binary_cdc_dedup(multimodal: DataFrame, div: int = CDC_BIN_DIV) -> DataFrame:
    """(seg_md5, n_occurrences, n_docs, seg_len) for every content-defined
    payload chunk occurring more than once in the corpus."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "seg_md5": [], "seg_len": []}
            for doc, payload in zip(pdf["doc_id"], pdf["payload"]):
                bb = bytes(payload)
                start = 0
                for i, byte in enumerate(bb, start=1):
                    if byte % div == 0 or i == len(bb):
                        rows["doc_id"].append(doc)
                        rows["seg_md5"].append(
                            hashlib.md5(bb[start:i]).hexdigest()
                        )
                        rows["seg_len"].append(i - start)
                        start = i
            yield pd.DataFrame(rows)

    segs = multimodal.mapInPandas(_batches, _BIN_SEG_SCHEMA)
    return (
        segs.groupBy("seg_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("seg_len").alias("seg_len"),
        )
        .where(F.col("n_occurrences") > 1)
    )


def _binary_cdc_sql(div: int = CDC_BIN_DIV) -> str:
    byte_at = (
        f"(strpos('{_HEX}', substring(h, 2 * i - 1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substring(h, 2 * i, 1)) - 1)"
    )
    return f"""
  WITH b AS (SELECT doc_id, text, hex(encode(text)) AS h,
                    octet_length(encode(text)) AS nb
             FROM documents),
  bpos AS (SELECT doc_id, i AS e FROM b, unnest(range(1, nb + 1)) AS t(i)
           WHERE ({byte_at}) % {div} = 0),
  ends AS (SELECT doc_id, e FROM bpos UNION SELECT doc_id, nb FROM b),
  seg AS (SELECT doc_id,
                 COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s,
                 e
          FROM ends),
  segh AS (SELECT g.doc_id,
                  md5(substring(t.text, g.s, g.e - g.s + 1)) AS seg_md5,
                  g.e - g.s + 1 AS seg_len
           FROM seg g JOIN b t ON g.doc_id = t.doc_id)
  SELECT seg_md5, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS n_docs,
         CAST(MAX(seg_len) AS BIGINT) AS seg_len
  FROM segh GROUP BY seg_md5 HAVING COUNT(*) > 1"""


BINARY_CDC_SQL = _binary_cdc_sql()


# --- image resize plumbing ---------------------------------------------------

RESIZE_SRC_W = 16  # synthetic raster width (bytes per row)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resize_checksum", T.LongType()),
        T.StructField("preview_hex", T.StringType()),
    ]
)


def resize_payloads(multimodal: DataFrame) -> DataFrame:
    """Image-resize plumbing over binary payloads: treat each payload as a
    row-major `RESIZE_SRC_W`-wide byte raster (zero-padded to full rows /
    even height) and 2×2 block-average downsample it — INTEGER floor
    division, so the result is exact and the DuckDB twin (RESIZE_SQL) can
    hash-check the mapInPandas path byte for byte. A real pipeline swaps
    the raster interpretation for a decoded image (decode_image above is
    the stubbed seam) and the block mean for the interpolation kernel; the
    Arrow batching, schema, and 1-row-per-image shape are exactly this.

    Scale: embarrassingly parallel scan; payload bytes never shuffle
    (output carries dims + checksum + preview, not the raster)."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = RESIZE_SRC_W
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                src_h = max((len(b) + w - 1) // w, 1)
                padded_h = src_h + (src_h % 2)
                arr = np.zeros((padded_h, w), dtype=np.int64)
                flat = np.frombuffer(b, dtype=np.uint8)
                arr.reshape(-1)[: len(flat)] = flat
                blocks = (
                    arr[0::2, 0::2] + arr[0::2, 1::2]
                    + arr[1::2, 0::2] + arr[1::2, 1::2]
                ) // 4
                out = blocks.astype(np.uint8)
                rows.append(
                    (
                        doc_id,
                        w,
                        src_h,
                        out.shape[1],
                        out.shape[0],
                        int(out.sum()) % 997,
                        out.reshape(-1)[:4].tobytes().hex(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_w", "src_h", "out_w", "out_h",
                    "resize_checksum", "preview_hex",
                ],
            )

    return multimodal.mapInPandas(_batches, RESIZE_SCHEMA)


def _byte_at_expr(idx: str, nb: str = "nb") -> str:
    """Hex-pair byte value at (0-based) index expression `idx`, 0 beyond
    the payload (the zero padding)."""
    return (
        f"CASE WHEN ({idx}) < {nb} THEN"
        f" (strpos('{_HEX}', substring(h, 2*({idx})+1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substring(h, 2*({idx})+2, 1)) - 1)"
        " ELSE 0 END"
    )


def _resize_sql() -> str:
    w = RESIZE_SRC_W
    ow = w // 2
    # resized pixel p: r = p // ow, c = p % ow; source indexes (2r, 2c) etc.
    px = " + ".join(
        _byte_at_expr(f"(2*(p//{ow}) + {dy}) * {w} + 2*(p%{ow}) + {dx}")
        for dy in (0, 1)
        for dx in (0, 1)
    )
    return f"""
  WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                    octet_length(encode(text)) AS nb
             FROM documents),
  dims AS (SELECT doc_id, h, nb,
                  GREATEST((nb + {w} - 1) // {w}, 1) AS src_h
           FROM b),
  sized AS (SELECT doc_id, h, nb, src_h,
                   CAST((src_h + (src_h % 2)) // 2 AS INTEGER) AS out_h
            FROM dims),
  px AS (SELECT doc_id, src_h, out_h,
                [({px}) // 4 FOR p IN range(0, out_h * {ow})] AS pxs
         FROM sized)
  SELECT doc_id,
         {w} AS src_w, CAST(src_h AS INTEGER) AS src_h,
         {ow} AS out_w, out_h,
         CAST(COALESCE(list_sum(pxs), 0) % 997 AS BIGINT) AS resize_checksum,
         lower(concat(
           {", ".join(f"lpad(hex(COALESCE(pxs[{i}], 0)), 2, '0')" for i in range(1, 5))}
         )) AS preview_hex
  FROM px"""


RESIZE_SQL = _resize_sql()
