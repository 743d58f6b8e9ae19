"""Multimodal media columns over Spark.

Model: media is an opaque ``binary`` column plus typed metadata
(mime/width/height/duration), one row per asset — the only schema that
scales to 100 TB of mixed media in parquet (payloads stay columnar and
compressed; metadata predicates prune scans without touching bytes).

Processing runs through ``mapInPandas`` — Arrow ships (metadata, bytes)
batches to Python, the kernel works per batch, output schema is explicit.

Decode coverage (rounds 12-13): the publishable-spec formats decode
for real — uncompressed 24-bit BMP pixel rows (``decode_bmp``),
RIFF/WAVE integer PCM samples (``decode_wav_pcm``), non-interlaced
8-bit PNG via stdlib zlib inflate + the five scanline filters
(``decode_png``), GIF87a/89a variable-width LZW (``decode_gif``), and
BASELINE JPEG — SOF0 Huffman + dequant + zigzag + vectorized IDCT +
YCbCr, 4:4:4/4:2:2/4:2:0 (``decode_jpeg``, round 13: the
highest-frequency payload in a crawled multimodal corpus) — feeding
exact per-asset value statistics (``media_decode_stats``,
construction-oracled as ``q_media_decode`` / ``q_png_decode`` /
``q_gif_decode`` / ``q_jpeg_decode``). MP4 parses at the CONTAINER
level for real (round 13: ``parse_mp4`` box walk, sample-table
resolution, ``mp4_keyframes`` frame extraction — ``q_mp4_extract``);
only codec BITSTREAM decode (H.264/AAC) stays behind the
clearly-marked deterministic stub — tests exercise the full Spark
plumbing (schema, batching, partition sizing, UDF signatures) and a
deployment swaps ``_decode_bytes`` for the real library call.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_mean", DoubleType(), False),
        StructField("byte_entropy", DoubleType(), False),
        StructField("content_hash", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake assets (tests only): seeded pseudo-payloads with
    plausible metadata."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mime = ["image/png", "audio/wav", "video/mp4"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                mime,
                int(rng.integers(16, 1920)) if mime != "audio/wav" else None,
                int(rng.integers(16, 1080)) if mime != "audio/wav" else None,
                int(rng.integers(100, 60000)) if mime != "image/png" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_bytes(payload: bytes, mime: str) -> np.ndarray:
    """STUB — deterministic fake decode.

    A real deployment replaces this with PIL.Image.open / soundfile /
    PyAV frame extraction. The stub interprets the payload bytes as a
    uint8 array so the downstream feature math is real and testable.
    """
    if mime not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {mime}")
    return np.frombuffer(payload, dtype=np.uint8)


def decode_stub(payload: bytes, mime: str) -> np.ndarray:
    return _decode_bytes(payload, mime)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-asset byte-level features via ``mapInPandas``.

    Arrow batches keep payload bytes off the JVM heap during Python work;
    at scale, pair with ``spark.sql.files.maxPartitionBytes`` ≈ 128 MB so
    a partition of payloads fits executor memory comfortably.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar access + zip — never iterrows (which constructs a
            # pandas Series per row and dominated the round-1 profile)
            ids = pdf["media_id"].to_numpy()
            mimes = pdf["mime"].to_numpy()
            payloads = pdf["payload"].to_numpy()
            n_bytes = np.empty(len(pdf), dtype=np.int64)
            means = np.zeros(len(pdf), dtype=np.float64)
            entropies = np.zeros(len(pdf), dtype=np.float64)
            hashes = []
            for i, (mime, payload) in enumerate(zip(mimes, payloads)):
                if payload is None:
                    # defensive twin of the frame-sampler's guard: a null
                    # payload has no bytes (callers filter, kernels must
                    # still not crash on out-of-contract rows)
                    n_bytes[i] = 0
                    hashes.append(None)
                    continue
                arr = _decode_bytes(payload, mime)
                n_bytes[i] = len(arr)
                if len(arr):
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    p = counts / len(arr)
                    nz = p[p > 0]
                    means[i] = arr.mean()
                    entropies[i] = -(nz * np.log2(nz)).sum()
                hashes.append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": mimes,
                    "n_bytes": n_bytes,
                    "byte_mean": means,
                    "byte_entropy": entropies,
                    "content_hash": hashes,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 512, frame_len: int = 64) -> DataFrame:
    """Frame sampling plumbing (video/audio): one output row per sampled
    frame — the row-expanding ``mapInPandas`` shape (a UDTF in SQL terms).
    The stub samples fixed-length byte windows; a real decoder samples
    decoded frames at timestamps."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, mime, payload in zip(
                pdf["media_id"].to_numpy(), pdf["mime"].to_numpy(), pdf["payload"].to_numpy()
            ):
                if mime == "image/png" or payload is None:
                    # a null payload has no frames (kernel-level guard:
                    # len(None) raised before any query filter could be
                    # relied on — hostile-corpus finding)
                    continue
                for k, start in enumerate(range(0, len(payload) - frame_len, every_n_bytes)):
                    ids.append(media_id)
                    idxs.append(k)
                    frames.append(payload[start : start + frame_len])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes metadata through, marks the payload as
    resized via the stub transform (real impl: PIL resize). Raises
    NotImplementedError for mimes without a decoder — the contract a real
    decoder must also honor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _decode_bytes(p, m)[: width * height].tobytes()
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Container-header metadata sniffing — REAL parsing, not a stub: the
# image/audio container FORMATS are public byte layouts (PNG IHDR,
# JPEG SOF markers, GIF/BMP headers, RIFF/WAVE fmt chunk), so
# dimensions / sample rates extract with pure struct reads — no codec
# library needed. Only pixel/audio DECODE remains behind the stub.
# ---------------------------------------------------------------------------
_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate_hz", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def sniff_header(payload: bytes | None) -> tuple:
    """(format, width, height, sample_rate_hz, channels) from container
    magic + fixed header layouts. Unknown/truncated/None payloads →
    ('unknown', None, None, None, None) — never raises: hostile bytes
    are the normal case in a crawled corpus."""
    try:
        if payload is None or len(payload) < 12:
            return ("unknown", None, None, None, None)
        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR" and len(b) >= 24:
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return ("png", w, h, None, None)
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if marker in (0xDA, 0xD9):
                    # SOS/EOI: entropy-coded data (or end) follows — the
                    # segment walk must stop, never stride into it
                    break
                seglen = int.from_bytes(b[i + 2 : i + 4], "big")
                # every SOFn variant carries dimensions at the same
                # offsets: C0-CF except C4 (DHT), C8 (JPG ext), CC (DAC)
                if (
                    0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)
                    and i + 9 <= len(b)
                ):
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return ("jpeg", w, h, None, None)
                i += 2 + seglen
            return ("jpeg", None, None, None, None)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            return ("gif", w, h, None, None)
        if b[:2] == b"BM" and len(b) >= 26:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return ("bmp", w, abs(h), None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 16 <= len(b):
                    ch = int.from_bytes(b[i + 10 : i + 12], "little")
                    sr = int.from_bytes(b[i + 12 : i + 16], "little")
                    return ("wav", None, None, sr, ch)
                i += 8 + clen + (clen & 1)
            return ("wav", None, None, None, None)
        if b[4:8] == b"ftyp":
            parsed = parse_mp4(b)
            if parsed is not None:
                w = h = sr = ch = None
                for t in parsed["tracks"]:
                    if t["handler"] == "vide" and w is None:
                        w, h = t["width"], t["height"]
                    if t["handler"] == "soun" and sr is None:
                        sr, ch = t["sample_rate_hz"], t["channels"]
                return ("mp4", w, h, sr, ch)
            return ("mp4", None, None, None, None)
        return ("unknown", None, None, None, None)
    except Exception:
        return ("unknown", None, None, None, None)


def media_metadata(media: DataFrame) -> DataFrame:
    """Per-asset container metadata via one ``mapInPandas`` pass —
    the same Arrow batch shape as ``extract_features`` (payload bytes
    never touch the JVM heap), embarrassingly parallel, output is a
    narrow typed table a catalog ingests. The parse itself is exact
    public-format struct reading (``sniff_header``); the mime column
    rides through untouched so a mime-vs-sniffed-format disagreement
    is a one-filter data-quality query."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                fmt, w, h, sr, ch = sniff_header(payload)
                rows.append((media_id, mime, fmt, w, h, sr, ch))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime", "format", "width", "height",
                    "sample_rate_hz", "channels",
                ],
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        kernel, schema=_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# Binary near-dup: winnowing fingerprints over raw PAYLOAD BYTES — the
# dedup family extended to the modality you cannot tokenize. No decode:
# re-encoded/metadata-tweaked copies differ everywhere (that's
# perceptual hashing's job, needs codecs); byte winnowing catches the
# dominant real-world case — identical or locally-edited byte streams
# (same asset re-uploaded, truncated, or with bytes patched).
# ---------------------------------------------------------------------------
_BYTE_K = 16  # byte k-gram length
_BYTE_W = 8  # winnowing window (shared runs ≥ k+w−1 = 23 bytes guaranteed)
_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fp", LongType(), False),
    ]
)


def _winnow_bytes(payload: bytes, k: int = _BYTE_K, w: int = _BYTE_W) -> list:
    """Winnowing (SIGMOD 2003) over bytes with a polynomial rolling
    hash in uint64 — pure integer arithmetic, deterministic across
    platforms. Returns the sorted distinct window-minimum hashes."""
    if payload is None or len(payload) < k + w - 1:
        return []
    b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.uint64)
    # polynomial base = the FNV prime 1099511628211; k-gram hash h_i = Σ_j b[i+j]·base^(k−1−j), all in wrap-around
    # uint64 — fully vectorized (windowed view × power vector), no
    # per-byte Python loop in the Arrow kernel's hot path
    # powers mod 2^64 via Python ints (wrap-around is the DEFINED
    # arithmetic here; computing in numpy would emit overflow warnings
    # for what is intentional modular math)
    powvec = np.array(
        [pow(1099511628211, k - 1 - j, 1 << 64) for j in range(k)],
        dtype=np.uint64,
    )
    windows_b = np.lib.stride_tricks.sliding_window_view(b, k)
    hs = (windows_b * powvec).sum(axis=1, dtype=np.uint64)
    mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
    # int64 view for Spark LongType (bit pattern preserved)
    return sorted(set(mins.astype(np.int64).tolist()))


def byte_fingerprints(media: DataFrame, k: int = _BYTE_K, w: int = _BYTE_W) -> DataFrame:
    """(media_id, fp) winnowing fingerprints of each payload — one
    mapInPandas pass; a shared byte run of length ≥ k + w − 1 between
    two payloads guarantees ≥ 1 shared fingerprint (the SIGMOD-2003
    locality guarantee, now over bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                for fp in _winnow_bytes(payload, k, w):
                    rows.append((media_id, fp))
            yield pd.DataFrame(rows, columns=["media_id", "fp"])

    return media.select("media_id", "payload").mapInPandas(kernel, schema=_FP_SCHEMA)


def media_near_dup(
    media: DataFrame, df_cap: int = 100, min_common: int = 2
) -> DataFrame:
    """(media_a, media_b, n_common): asset pairs sharing ≥ ``min_common``
    byte fingerprints — the binary-modality near-dup candidate table.
    Same inverted-index discipline as every dedup operator: per-fp
    posting lists with occupancy capped at ``df_cap`` (a fingerprint
    shared by everything is container boilerplate — headers, codec
    tables — not content), in-list pair expansion, one aggregate."""
    fps = byte_fingerprints(media)
    posting = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_set("media_id")).alias("ms"))
        .where((F.size("ms") >= 2) & (F.size("ms") <= df_cap))
    )
    pairs = posting.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(0, size(ms) - 2), i ->
                  transform(sequence(i + 1, size(ms) - 1), j ->
                    struct(ms[i] AS media_a, ms[j] AS media_b))))
                """
            )
        ).alias("p")
    ).select("p.media_a", "p.media_b")
    return (
        pairs.groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


# ---------------------------------------------------------------------------
# Real content decode — the two container formats whose payloads need no
# codec library: uncompressed 24-bit BI_RGB BMP (raw pixel rows) and
# RIFF/WAVE PCM (raw integer samples). These close the multimodal
# story's last stub for the formats where "decode" is pure public
# struct layout; compressed formats (PNG deflate, JPEG DCT, MP4) keep
# the documented NotImplementedError decoder contract.
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes | None) -> "np.ndarray | None":
    """Decode an UNCOMPRESSED 24-bit BI_RGB BMP to an (h, w, 3) uint8
    array in BGR channel order (the on-disk order). Handles bottom-up
    (positive height — rows stored last-to-first) and top-down
    (negative height) layouts and the 4-byte row padding. Returns None
    for anything that is not a well-formed uncompressed 24-bit BMP
    (wrong magic, other bit depths, RLE/compressed, truncated pixel
    data) — hostile bytes are the normal case in a crawled corpus."""
    try:
        if payload is None or len(payload) < 54:
            return None
        b = bytes(payload)
        if b[:2] != b"BM":
            return None
        data_off = int.from_bytes(b[10:14], "little")
        bih_size = int.from_bytes(b[14:18], "little")
        if bih_size < 40:
            return None
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        compression = int.from_bytes(b[30:34], "little")
        if w <= 0 or h == 0 or bpp != 24 or compression != 0:
            return None
        top_down = h < 0
        h = abs(h)
        row_bytes = w * 3
        stride = (row_bytes + 3) & ~3
        need = data_off + stride * h
        if data_off < 54 or len(b) < need:
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
        return rows if top_down else rows[::-1]
    except Exception:
        return None


def decode_wav_pcm(payload: bytes | None):
    """Decode RIFF/WAVE integer PCM (format tag 1; 8- or 16-bit) to
    ``(samples int64 ndarray, sample_rate, channels)``. 8-bit WAV is
    unsigned (0..255), 16-bit is signed little-endian — both per the
    public RIFF spec. Multi-channel data stays interleaved (stats over
    all channels). Returns None for non-PCM, other bit depths, or
    malformed/truncated chunks."""
    try:
        if payload is None or len(payload) < 44:
            return None
        b = bytes(payload)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i = 12
        fmt = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = int.from_bytes(b[i + 4 : i + 8], "little")
            body = b[i + 8 : i + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                tag = int.from_bytes(body[0:2], "little")
                ch = int.from_bytes(body[2:4], "little")
                sr = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
                if tag != 1 or ch < 1 or bits not in (8, 16):
                    return None
                fmt = (ch, sr, bits)
            elif cid == b"data":
                if fmt is None or len(body) < clen:
                    return None
                ch, sr, bits = fmt
                if bits == 8:
                    samples = np.frombuffer(body, dtype=np.uint8)
                else:
                    samples = np.frombuffer(
                        body[: clen & ~1], dtype="<i2"
                    )
                return samples.astype(np.int64), sr, ch
            i += 8 + clen + (clen & 1)
        return None
    except Exception:
        return None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png(payload: bytes | None) -> "np.ndarray | None":
    """Decode a NON-INTERLACED 8-bit-per-sample PNG (grayscale, RGB,
    gray+alpha, or RGBA — color types 0/2/4/6) to an (h, w, channels)
    uint8 array, using only stdlib ``zlib`` for the IDAT inflate and
    the five public scanline filters (None/Sub/Up/Average/Paeth, RFC
    2083 §6) implemented directly. Palette (type 3), 16-bit, and
    Adam7-interlaced images return None — as does anything malformed,
    truncated, or with a bad filter byte: hostile bytes are the normal
    case in a crawled corpus. The inflate is BOUNDED by the declared
    geometry (decompressobj with max_length = h·(1+stride)+1, plus a
    64M-pixel cap checked before any allocation), so a zlib bomb or a
    forged IHDR can cost at most the declared image's bytes per task,
    never an unbounded allocation.

    Filter inversion notes: all arithmetic is mod 256 (uint8 wrap);
    Average's predictor is floor((left + up) / 2) computed WITHOUT
    wrapping (the 9-bit intermediate the spec mandates); Paeth's
    tie-break order is left, up, up-left. Up is vectorized per
    scanline; Sub/Average/Paeth carry a serial left-dependence, walked
    per pixel (decode cost is linear either way)."""
    import zlib

    try:
        if payload is None or len(payload) < len(_PNG_MAGIC) + 25:
            return None
        b = bytes(payload)
        if b[: len(_PNG_MAGIC)] != _PNG_MAGIC:
            return None
        i = len(_PNG_MAGIC)
        w = h = nch = None
        idat = []
        while i + 8 <= len(b):
            clen = int.from_bytes(b[i : i + 4], "big")
            ctype = b[i + 4 : i + 8]
            body = b[i + 8 : i + 8 + clen]
            if len(body) < clen:
                return None
            if ctype == b"IHDR":
                if clen != 13:
                    return None
                w = int.from_bytes(body[0:4], "big")
                h = int.from_bytes(body[4:8], "big")
                bit_depth, color_type = body[8], body[9]
                compression, filter_method, interlace = body[10], body[11], body[12]
                if (
                    bit_depth != 8
                    or color_type not in _PNG_CHANNELS
                    or compression != 0
                    or filter_method != 0
                    or interlace != 0
                    or w <= 0
                    or h <= 0
                ):
                    return None
                nch = _PNG_CHANNELS[color_type]
            elif ctype == b"IDAT":
                idat.append(body)
            elif ctype == b"IEND":
                break
            i += 12 + clen  # length + type + body + crc
        if w is None or not idat:
            return None
        stride = w * nch
        expect = h * (1 + stride)
        # hostile bytes are the normal case in a crawled corpus: refuse
        # absurd declared dimensions BEFORE inflating (a 4-byte header
        # field can declare a 2^31-pixel image), and bound the inflate
        # to the declared size + 1 sentinel byte so a zlib bomb can
        # allocate at most expect+1 bytes per task, never GBs — any
        # overflow or shortfall is a malformed payload, return None
        if w * h > 64 << 20 or expect > 512 << 20:
            return None
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expect + 1)
        if len(raw) != expect or d.unconsumed_tail:
            return None
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            base = y * (1 + stride)
            ftype = raw[base]
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=base + 1
            ).copy()
            if ftype == 0:  # None
                cur = line
            elif ftype == 2:  # Up (uint8 addition wraps mod 256)
                cur = line + prev
            elif ftype == 1:  # Sub
                cur = line
                for x in range(nch, stride):
                    cur[x] = (int(cur[x]) + int(cur[x - nch])) & 0xFF
            elif ftype == 3:  # Average
                cur = line
                for x in range(stride):
                    left = int(cur[x - nch]) if x >= nch else 0
                    cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                cur = line
                for x in range(stride):
                    a = int(cur[x - nch]) if x >= nch else 0
                    up = int(prev[x])
                    c = int(prev[x - nch]) if x >= nch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
            else:
                return None
            out[y] = cur
            prev = out[y]
        return out.reshape(h, w, nch)
    except Exception:
        return None


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> "bytearray | None":
    """GIF-flavor LZW decode (variable code width, LSB-first bit
    packing, CLEAR/EOI control codes — GIF89a spec appendix F).
    Returns the index stream, or None on any malformed input (bad
    code, width overflow past 12 bits without CLEAR, truncation)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out if len(out) == max_pixels else None
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None
            out += entry
            if len(out) > max_pixels:
                return None
            if prev is not None:
                if len(table) < 4096:
                    table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out if len(out) == max_pixels else None


def decode_gif(payload: bytes | None) -> "np.ndarray | None":
    """Decode the FIRST frame of a non-interlaced GIF87a/GIF89a to an
    (h, w, 3) uint8 RGB array — pure public byte layout + the LZW
    variable-width code stream (``_lzw_decode``), no codec library.
    Extensions (GCE, comments, application blocks) are skipped;
    interlaced images, missing color tables, partial-canvas frames,
    and any malformed/truncated structure return None — hostile bytes
    are the normal case in a crawled corpus."""
    try:
        if payload is None or len(payload) < 14:
            return None
        b = bytes(payload)
        if b[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        if w <= 0 or h <= 0:
            return None
        packed = b[10]
        i = 13
        gct = None
        if packed & 0x80:
            n = 3 * (2 << (packed & 0x07))
            gct = b[i : i + n]
            if len(gct) < n:
                return None
            i += n
        while i < len(b):
            block = b[i]
            if block == 0x3B:  # trailer
                return None  # no image block seen
            if block == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < len(b) and b[i] != 0:
                    i += 1 + b[i]
                i += 1
                continue
            if block != 0x2C:  # image descriptor expected
                return None
            left = int.from_bytes(b[i + 1 : i + 3], "little")
            top = int.from_bytes(b[i + 3 : i + 5], "little")
            iw = int.from_bytes(b[i + 5 : i + 7], "little")
            ih = int.from_bytes(b[i + 7 : i + 9], "little")
            ipacked = b[i + 9]
            i += 10
            if ipacked & 0x40:  # interlaced: refused
                return None
            if left or top or iw != w or ih != h:
                return None  # partial-canvas frame: refused
            ct = gct
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 0x07))
                ct = b[i : i + n]
                if len(ct) < n:
                    return None
                i += n
            if ct is None:
                return None
            min_code = b[i]
            i += 1
            if not 2 <= min_code <= 11:
                return None
            data = bytearray()
            while i < len(b) and b[i] != 0:
                n = b[i]
                chunk = b[i + 1 : i + 1 + n]
                if len(chunk) < n:
                    return None
                data += chunk
                i += 1 + n
            if i >= len(b):
                return None
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            if idx is None:
                return None
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            indices = np.frombuffer(bytes(idx), dtype=np.uint8)
            if indices.max(initial=0) >= pal.shape[0]:
                return None
            return pal[indices].reshape(ih, iw, 3)
        return None
    except Exception:
        return None


def encode_gif(indices: "np.ndarray", palette: "np.ndarray") -> bytes:
    """Minimal GIF89a writer — the inverse of ``decode_gif`` for one
    non-interlaced full-canvas frame: ``indices`` (h, w) uint8 into
    ``palette`` (n, 3) uint8. LZW code widths follow the giflib
    ordering (emit at the CURRENT width, then bump when the next free
    slot reaches 2^width — one code later than the naive rule; the
    decoder's slot assignment lags the encoder's by exactly that one
    step). Used by construction oracles and as the codec-free
    palettized-image sink."""
    import struct

    h, w = indices.shape
    n_colors = palette.shape[0]
    ct_bits = max(1, (max(2, n_colors) - 1).bit_length())
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[:n_colors] = palette
    min_code = max(2, ct_bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    bits = bytearray()
    acc = [0, 0]  # value, nbits

    out_codes = bytearray()

    def emit(code: int, width: int) -> None:
        acc[0] |= code << acc[1]
        acc[1] += width
        while acc[1] >= 8:
            out_codes.append(acc[0] & 0xFF)
            acc[0] >>= 8
            acc[1] -= 8

    width = min_code + 1
    next_code = eoi + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    emit(clear, width)
    cur = b""
    for px in indices.reshape(-1).tolist():
        ext = cur + bytes([px])
        if ext in table:
            cur = ext
            continue
        emit(table[cur], width)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[ext] = next_code
            next_code += 1
        cur = bytes([px])
    emit(table[cur], width)
    if next_code == (1 << width) and width < 12:
        width += 1
    emit(eoi, width)
    if acc[1]:
        out_codes.append(acc[0] & 0xFF)

    sub = bytearray()
    for i in range(0, len(out_codes), 255):
        chunk = out_codes[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)

    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 7), 0, 0)
        + ct.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + bytes(sub)
        + b"\x3b"
    )


def encode_png(img: "np.ndarray", filters: list | None = None) -> bytes:
    """Minimal PNG writer — the exact inverse of ``decode_png``
    (non-interlaced, 8-bit; channels 1/2/3/4 → color types 0/4/2/6).
    ``filters`` picks each scanline's filter type (default all 0/None);
    the forward equations are RFC 2083 §6 verbatim. Used by the
    construction oracles (plant known pixels, decode them back) and as
    the codec-free image sink."""
    import struct
    import zlib

    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, stride).astype(np.int64)
    filters = [0] * h if filters is None else list(filters)
    out = bytearray()
    for y, f in enumerate(filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        left = np.concatenate([np.zeros(c, dtype=np.int64), cur[:-c]])
        ul = np.concatenate([np.zeros(c, dtype=np.int64), prev[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = cur - pred
        else:
            raise ValueError(f"encode_png: invalid filter type {f}")
        out.append(f)
        out.extend((enc % 256).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


_DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("kind", StringType(), True),
        StructField("n_values", LongType(), True),
        StructField("v_min", LongType(), True),
        StructField("v_max", LongType(), True),
        StructField("v_sum", LongType(), True),
        StructField("mean_e6", LongType(), True),
    ]
)


def media_decode_stats(media: DataFrame) -> DataFrame:
    """END-TO-END content decode → per-asset value statistics in one
    ``mapInPandas`` pass: BMP payloads decode to pixels (all channels
    pooled), WAV PCM payloads to samples, everything else reports NULL
    stats with kind=NULL (sniffed-but-undecodable formats are data, not
    errors). Stats are integer-exact: v_sum is the exact value sum and
    mean_e6 = v_sum·10⁶ // n (floor division; identical to SQL ``//``
    for the non-negative sums the oracle constructs, and pinned against
    numpy on signed fixtures in pytest).

    Scale shape: identical to ``extract_features`` — embarrassingly
    parallel Arrow batches, payload bytes never enter the JVM row
    format, output is 8 narrow columns per asset."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                vals = kind = None
                px = decode_bmp(payload)
                if px is None:
                    px = decode_png(payload)
                if px is None:
                    px = decode_gif(payload)
                if px is None:
                    px = decode_jpeg(payload)
                if px is not None:
                    kind, vals = "image", px.reshape(-1).astype(np.int64)
                else:
                    wav = decode_wav_pcm(payload)
                    if wav is not None:
                        kind, vals = "audio", wav[0]
                if vals is None or len(vals) == 0:
                    rows.append((media_id, mime, kind, None, None, None, None, None))
                    continue
                n = int(len(vals))
                s = int(vals.sum())
                rows.append(
                    (
                        media_id, mime, kind, n,
                        int(vals.min()), int(vals.max()), s,
                        (s * 1_000_000) // n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime", "kind", "n_values",
                    "v_min", "v_max", "v_sum", "mean_e6",
                ],
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        kernel, schema=_DECODE_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / ISO 10918-1): SOF0 Huffman-coded DCT,
# grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling — decoder and
# construction-oracle encoder in pure numpy + stdlib, like PNG/GIF
# above. Progressive (SOF2), arithmetic coding (DAC), 12-bit samples,
# and hierarchical modes return None: refused, never mis-decoded.
# ---------------------------------------------------------------------------

#: zigzag scan order (T.81 figure 5): zigzag index -> raster index
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: standard Huffman tables (T.81 Annex K.3) — the encoder writes these
#: into DHT segments; the decoder always builds from the stream's DHT,
#: so the pair stays self-consistent by construction
_JPEG_DC_LUM = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_JPEG_DC_CHR = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_JPEG_AC_LUM = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)
_JPEG_AC_CHR = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)


def _jpeg_dct_basis() -> "np.ndarray":
    """M[u, x] = c(u)/2 · cos((2x+1)uπ/16): pixels = Mᵀ·F·M (IDCT),
    F = M·P·Mᵀ (FDCT) — both exact orthonormal float transforms."""
    x = np.arange(8)
    u = np.arange(8).reshape(-1, 1)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m


def _huff_decode_table(bits, vals) -> dict:
    """Canonical Huffman (T.81 C.2): {(length, code): symbol}."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits, vals) -> dict:
    """symbol -> (length, code), inverse of the canonical assignment."""
    return {s: lc for lc, s in _huff_decode_table(bits, vals).items()}


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte unstuffing; stops (zero-padding) at any real marker. RSTn are
    consumed only by the explicit ``restart()`` call at MCU boundaries
    (T.81 §B.2.1.2). ``overrun`` flags reads past the data end — a
    malformed stream, surfaced as a decode refusal."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0
        self.overrun = False

    def _next_byte(self) -> int | None:
        if self.p >= len(self.d):
            return None
        b = self.d[self.p]
        if b != 0xFF:
            self.p += 1
            return b
        nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else None
        if nxt == 0x00:
            self.p += 2
            return 0xFF
        return None  # a real marker: entropy data ends here

    def bit(self) -> int:
        if self.n == 0:
            b = self._next_byte()
            if b is None:
                self.overrun = True
                return 0
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expect: int) -> bool:
        """Byte-align and consume the next RSTn marker (n == expect).
        An all-ones padding byte flushes as stuffed FF 00 — skip any
        such pairs between the entropy data and the marker."""
        self.n = 0
        while (
            self.p + 1 < len(self.d)
            and self.d[self.p] == 0xFF
            and self.d[self.p + 1] == 0x00
        ):
            self.p += 2
        if self.p + 1 >= len(self.d) or self.d[self.p] != 0xFF:
            return False
        m = self.d[self.p + 1]
        if m != 0xD0 + (expect & 7):
            return False
        self.p += 2
        return True


def _huff_read(r: "_JpegBitReader", table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        s = table.get((length, code))
        if s is not None:
            return s
    return None


def _jpeg_extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(payload: "bytes | None") -> "np.ndarray | None":
    """Decode a BASELINE JPEG (SOF0, 8-bit, Huffman, 1 or 3
    components, sampling factors up to 2×2 — 4:4:4 / 4:2:2 / 4:2:0) to
    an (h, w, channels) uint8 array: marker walk → DQT/DHT/SOF0/SOS →
    entropy decode (byte unstuffing, DRI restart intervals, DC
    prediction + EXTEND, AC run-length with ZRL/EOB) → dequantize →
    de-zigzag → vectorized float IDCT per component → chroma
    upsampling (sample replication) → JFIF YCbCr→RGB. Everything
    outside baseline — progressive (SOF2), extended/lossless/
    hierarchical SOFs, arithmetic coding (DAC), 12-bit, >2 sampling
    factors — is REFUSED (returns None, never a best-effort
    mis-decode), as is anything malformed or truncated: hostile bytes
    are the normal case in a crawled corpus, and the whole walk is
    wrapped so no input can raise.

    Declared geometry is capped (64M pixels) before any allocation,
    the same bound the PNG path enforces. Cites multimodal/media.py's
    PNG/GIF decoders as the pattern; no reference analog (the
    reference pipeline decodes nothing — BASELINE.json extension)."""
    try:
        if payload is None:
            return None
        b = bytes(payload)
        if len(b) < 4 or b[0:2] != b"\xff\xd8":
            return None
        qt: dict[int, np.ndarray] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        comps = None  # [(cid, h, v, tq)]
        w = h = None
        dri = 0
        i = 2
        scan = None
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                return None  # EOI before any scan
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            seg = b[i + 4 : i + 2 + seglen]
            if len(seg) != seglen - 2:
                return None
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    if pq != 0:  # 16-bit tables: beyond baseline
                        return None
                    if j + 65 > len(seg):
                        return None
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[list(_JPEG_ZIGZAG)] = np.frombuffer(
                        seg[j + 1 : j + 65], dtype=np.uint8
                    )
                    qt[tq] = tbl.reshape(8, 8)
                    j += 65
            elif marker == 0xC4:  # DHT
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 15
                    bits = list(seg[j + 1 : j + 17])
                    nv = sum(bits)
                    vals = list(seg[j + 17 : j + 17 + nv])
                    if len(vals) != nv:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(
                        bits, vals
                    )
                    j += 17 + nv
            elif marker == 0xC0:  # SOF0: baseline sequential
                if seg[0] != 8:
                    return None  # 12-bit: beyond baseline
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if nc not in (1, 3) or w == 0 or h == 0 or w * h > 64 << 20:
                    return None
                comps = []
                for c in range(nc):
                    cid = seg[6 + c * 3]
                    hv = seg[7 + c * 3]
                    ch, cv = hv >> 4, hv & 15
                    if not (1 <= ch <= 2 and 1 <= cv <= 2):
                        return None
                    comps.append((cid, ch, cv, seg[8 + c * 3]))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/extended/lossless/arithmetic
            elif marker == 0xCC:  # DAC: arithmetic conditioning
                return None
            elif marker == 0xDD:  # DRI
                if seglen != 4:
                    return None
                dri = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS
                if comps is None:
                    return None
                ns = seg[0]
                if ns != len(comps):
                    return None  # multi-scan: beyond this decoder
                scan = []
                for s in range(ns):
                    cs = seg[1 + s * 2]
                    td, ta = seg[2 + s * 2] >> 4, seg[2 + s * 2] & 15
                    match = [c for c in comps if c[0] == cs]
                    if not match:
                        return None
                    scan.append((match[0], td, ta))
                ss, se, ahal = seg[1 + ns * 2], seg[2 + ns * 2], seg[3 + ns * 2]
                if ss != 0 or se != 63 or ahal != 0:
                    return None
                i = i + 2 + seglen
                break
            i += 2 + seglen
        if scan is None or w is None:
            return None

        hmax = max(c[0][1] for c in scan)
        vmax = max(c[0][2] for c in scan)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        m = _jpeg_dct_basis()
        planes = []
        coefs = []
        for (cid, ch, cv, tq), td, ta in scan:
            if tq not in qt or td not in huff_dc or ta not in huff_ac:
                return None
            coefs.append(
                np.zeros((mcuy * cv, mcux * ch, 8, 8), dtype=np.int32)
            )
        r = _JpegBitReader(b, i)
        pred = [0] * len(scan)
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                n_mcu = my * mcux + mx
                if dri and n_mcu and n_mcu % dri == 0:
                    if not r.restart(rst):
                        return None
                    rst = (rst + 1) & 7
                    pred = [0] * len(scan)
                for ci, ((cid, ch, cv, tq), td, ta) in enumerate(scan):
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coefs[ci][my * cv + by, mx * ch + bx]
                            t = _huff_read(r, huff_dc[td])
                            if t is None or t > 11:
                                return None
                            diff = _jpeg_extend(r.bits(t), t)
                            pred[ci] += diff
                            blk.flat[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_read(r, huff_ac[ta])
                                if rs is None:
                                    return None
                                rrrr, ssss = rs >> 4, rs & 15
                                if ssss == 0:
                                    if rrrr == 15:  # ZRL: 16 zeros
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rrrr
                                if k > 63:
                                    return None
                                blk.flat[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                                    r.bits(ssss), ssss
                                )
                                k += 1
                if r.overrun:
                    return None
        for ci, ((cid, ch, cv, tq), td, ta) in enumerate(scan):
            c4 = coefs[ci].astype(np.float64) * qt[tq]
            px = np.einsum("ux,abuv,vy->abxy", m, c4, m) + 128.0
            rows, cols = c4.shape[0] * 8, c4.shape[1] * 8
            plane = np.clip(np.rint(px), 0, 255).astype(np.uint8)
            plane = plane.transpose(0, 2, 1, 3).reshape(rows, cols)
            cw = -(-w * ch // hmax)
            chh = -(-h * cv // vmax)
            plane = plane[:chh, :cw]
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )[:h, :w]
            planes.append(plane.astype(np.float64))
        if len(planes) == 1:
            return planes[0].astype(np.uint8).reshape(h, w, 1)
        y, cb, cr = planes
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        out = np.stack([rr, gg, bb], axis=-1)
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    except Exception:
        return None


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing; final byte padded
    with 1-bits (T.81 §F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _jpeg_encode_block(
    wtr: "_JpegBitWriter", blk: "np.ndarray", pred: int, dc: dict, ac: dict
) -> int:
    """Huffman-encode one quantized 8×8 block (raster layout); returns
    the new DC predictor."""
    zz = blk.flat[list(_JPEG_ZIGZAG)]
    diff = int(zz[0]) - pred

    def mag(v: int) -> tuple[int, int]:
        ssss = int(abs(v)).bit_length()
        return ssss, (v if v >= 0 else v + (1 << ssss) - 1)

    ssss, extra = mag(diff)
    length, code = dc[ssss]
    wtr.write(code, length)
    if ssss:
        wtr.write(extra, ssss)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        ssss, extra = mag(v)
        length, code = ac[(run << 4) | ssss]
        wtr.write(code, length)
        wtr.write(extra, ssss)
        run = 0
    if run:
        length, code = ac[0x00]  # EOB
        wtr.write(code, length)
    return int(zz[0])


def encode_jpeg(
    img: "np.ndarray",
    subsampling: str = "4:2:0",
    quant: "np.ndarray | int" = 1,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder — ``decode_jpeg``'s construction oracle,
    exactly as ``encode_png``/``encode_gif`` anchor their decoders:
    (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 in; SOI → DQT →
    SOF0 → DHT (the Annex K standard tables) → SOS → entropy data →
    EOI out. ``quant`` is a uniform level or a full 8×8 table applied
    to every component; with the default all-ones table a SOLID image
    round-trips bit-exactly (uniform blocks carry only a DC
    coefficient, and gray RGB is a fixed point of the YCbCr pair), the
    property the planted-payload oracle pins. Chroma for 4:2:0/4:2:2
    is the 2×2 / 2×1 block mean; edges pad by replication (solid stays
    solid, so padding never leaks into the oracle's pixels)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg: need 1 or 3 channels")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"encode_jpeg: unsupported subsampling {subsampling!r}")
    qtbl = (
        np.full((8, 8), int(quant), dtype=np.int32)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int32).reshape(8, 8)
    )
    if (qtbl < 1).any() or (qtbl > 255).any():
        raise ValueError("encode_jpeg: quant values must be in 1..255")

    fimg = img.astype(np.float64)
    if nch == 3:
        r, g, b = fimg[..., 0], fimg[..., 1], fimg[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        ch_h, ch_v = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[
            subsampling
        ]
        samp = [(ch_h, ch_v), (1, 1), (1, 1)]  # luma carries the max factors
    else:
        planes = [fimg[..., 0]]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    m = _jpeg_dct_basis()

    blocks = []  # per component: (mcuy*v, mcux*h, 8, 8) quantized ints
    for p, (sh, sv) in zip(planes, samp):
        if (sh, sv) != (hmax, vmax):
            # subsample by block mean over (vmax//sv, hmax//sh) windows
            fy, fx = vmax // sv, hmax // sh
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
            p = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        rows, cols = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(
            p, ((0, rows - p.shape[0]), (0, cols - p.shape[1])), "edge"
        )
        blk = pp.reshape(rows // 8, 8, cols // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,abxy,vy->abuv", m, blk - 128.0, m)
        blocks.append(np.rint(coef / qtbl).astype(np.int32))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = qtbl.flat[list(_JPEG_ZIGZAG)].astype(np.uint8).tobytes()
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nch])
    for cid in range(nch):
        sh, sv = samp[cid]
        sof += bytes([cid + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    tables = (
        [(0x00, _JPEG_DC_LUM), (0x10, _JPEG_AC_LUM)]
        if nch == 1
        else [
            (0x00, _JPEG_DC_LUM), (0x10, _JPEG_AC_LUM),
            (0x01, _JPEG_DC_CHR), (0x11, _JPEG_AC_CHR),
        ]
    )
    for tid, (bits, vals) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytes([nch])
    for cid in range(nch):
        sos += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    enc = [
        (
            _huff_encode_table(*_JPEG_DC_LUM if ci == 0 else _JPEG_DC_CHR),
            _huff_encode_table(*_JPEG_AC_LUM if ci == 0 else _JPEG_AC_CHR),
        )
        for ci in range(nch)
    ]
    wtr = _JpegBitWriter()
    pred = [0] * nch
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            n_mcu = my * mcux + mx
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # byte-align (1-padding), emit RSTn, reset DC predictors
                out += wtr.flush()
                wtr = _JpegBitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * nch
            for ci in range(nch):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        pred[ci] = _jpeg_encode_block(
                            wtr,
                            blocks[ci][my * sv + by, mx * sh + bx],
                            pred[ci],
                            *enc[ci],
                        )
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO Base Media File Format (ISO 14496-12): CONTAINER parsing —
# the box tree is a public struct layout like BMP/WAV above, so track
# metadata (duration, dimensions, codec fourcc, sample rate) and the
# full SAMPLE TABLE (per-frame byte ranges + sync samples) extract
# with pure struct reads. Codec payload DECODE (H.264/AAC bitstreams)
# is genuinely out of numpy+stdlib scope and stays behind the
# documented stub; what a crawl pipeline needs from MP4 — duration
# stats, geometry filters, keyframe extraction for a downstream
# vision model — is all container-level and all real here.
# ---------------------------------------------------------------------------


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in
    b[start:end]; handles 64-bit largesize and size-0 (to-end)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        fourcc = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:
            size = end - i
        if size < (body - i) or i + size > end:
            return  # malformed/truncated box: stop the walk
        yield fourcc, body, i + size
        i += size


def _mp4_fullbox(b: bytes, s: int) -> tuple[int, int]:
    """(version, flags) of a full box body starting at s."""
    return b[s], int.from_bytes(b[s + 1 : s + 4], "big")


def parse_mp4(payload: "bytes | None") -> "dict | None":
    """Parse the ISO-BMFF box tree: returns {brand, duration_ms,
    tracks: [{handler, codec, width, height, sample_rate_hz, channels,
    n_samples, sample_sizes, chunk_offsets, sample_to_chunk,
    sync_samples, duration_ms}]} or None for anything that is not a
    well-formed MP4 (no ftyp/moov, truncated boxes, inconsistent
    sample tables). Never raises on hostile bytes."""
    try:
        if payload is None or len(payload) < 16:
            return None
        b = bytes(payload)
        top = list(_mp4_boxes(b, 0, len(b)))
        if not top or top[0][0] != b"ftyp":
            return None
        brand = b[top[0][1] : top[0][1] + 4].decode("latin-1")
        moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
        if moov is None:
            return None
        out = {"brand": brand, "duration_ms": None, "tracks": []}
        for t, s, e in _mp4_boxes(b, *moov):
            if t == b"mvhd":
                v, _ = _mp4_fullbox(b, s)
                if v == 1:
                    ts = int.from_bytes(b[s + 20 : s + 24], "big")
                    dur = int.from_bytes(b[s + 24 : s + 32], "big")
                else:
                    ts = int.from_bytes(b[s + 12 : s + 16], "big")
                    dur = int.from_bytes(b[s + 16 : s + 20], "big")
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif t == b"trak":
                trk = _mp4_parse_trak(b, s, e)
                if trk is not None:
                    out["tracks"].append(trk)
        return out
    except Exception:
        return None


def _mp4_parse_trak(b: bytes, s: int, e: int) -> "dict | None":
    trk = {
        "handler": None, "codec": None, "width": None, "height": None,
        "sample_rate_hz": None, "channels": None, "n_samples": 0,
        "sample_sizes": [], "chunk_offsets": [], "sample_to_chunk": [],
        "sync_samples": None, "duration_ms": None,
    }
    for t, ts_, te in _mp4_boxes(b, s, e):
        if t == b"tkhd":
            v, _ = _mp4_fullbox(b, ts_)
            base = ts_ + (32 if v == 0 else 44)
            # width/height are 16.16 fixed point at the end of tkhd
            w = int.from_bytes(b[te - 8 : te - 4], "big") >> 16
            h = int.from_bytes(b[te - 4 : te], "big") >> 16
            if w and h:
                trk["width"], trk["height"] = w, h
        elif t == b"mdia":
            for mt, ms, me in _mp4_boxes(b, ts_, te):
                if mt == b"mdhd":
                    v, _ = _mp4_fullbox(b, ms)
                    if v == 1:
                        mts = int.from_bytes(b[ms + 20 : ms + 24], "big")
                        mdur = int.from_bytes(b[ms + 24 : ms + 32], "big")
                    else:
                        mts = int.from_bytes(b[ms + 12 : ms + 16], "big")
                        mdur = int.from_bytes(b[ms + 16 : ms + 20], "big")
                    if mts:
                        trk["duration_ms"] = mdur * 1000 // mts
                elif mt == b"hdlr":
                    trk["handler"] = b[ms + 8 : ms + 12].decode("latin-1")
                elif mt == b"minf":
                    for nt, ns, ne in _mp4_boxes(b, ms, me):
                        if nt == b"stbl":
                            _mp4_parse_stbl(b, ns, ne, trk)
    if trk["sample_sizes"] and len(trk["sample_sizes"]) != trk["n_samples"]:
        return None
    return trk


def _mp4_parse_stbl(b: bytes, s: int, e: int, trk: dict) -> None:
    for t, ts_, te in _mp4_boxes(b, s, e):
        if t == b"stsd":
            n = int.from_bytes(b[ts_ + 4 : ts_ + 8], "big")
            if n >= 1 and ts_ + 16 <= te:
                entry = ts_ + 8
                trk["codec"] = b[entry + 4 : entry + 8].decode("latin-1")
                body = entry + 8
                if trk["handler"] == "vide" and body + 70 <= te:
                    trk["width"] = int.from_bytes(
                        b[body + 24 : body + 26], "big"
                    ) or trk["width"]
                    trk["height"] = int.from_bytes(
                        b[body + 26 : body + 28], "big"
                    ) or trk["height"]
                elif trk["handler"] == "soun" and body + 28 <= te:
                    trk["channels"] = int.from_bytes(b[body + 16 : body + 18], "big")
                    trk["sample_rate_hz"] = (
                        int.from_bytes(b[body + 24 : body + 28], "big") >> 16
                    )
        elif t == b"stsz":
            fixed = int.from_bytes(b[ts_ + 4 : ts_ + 8], "big")
            cnt = int.from_bytes(b[ts_ + 8 : ts_ + 12], "big")
            if fixed == 0:
                # entries are materialized from box bytes: cnt is a lie
                # unless the box actually holds 4*cnt bytes of sizes
                _mp4_bound(cnt, 4, te - ts_ - 12)
            elif cnt > len(b) or fixed * cnt > len(b):
                # fixed-size path allocates [fixed]*cnt with no byte
                # backing in this box — bound by what the whole payload
                # could possibly hold (cnt samples of fixed bytes each)
                raise ValueError("stsz fixed count exceeds payload")
            trk["n_samples"] = cnt
            if fixed:
                trk["sample_sizes"] = [fixed] * cnt
            else:
                trk["sample_sizes"] = [
                    int.from_bytes(b[ts_ + 12 + 4 * i : ts_ + 16 + 4 * i], "big")
                    for i in range(cnt)
                ]
        elif t == b"stco":
            cnt = _mp4_bound(
                int.from_bytes(b[ts_ + 4 : ts_ + 8], "big"), 4, te - ts_ - 8
            )
            trk["chunk_offsets"] = [
                int.from_bytes(b[ts_ + 8 + 4 * i : ts_ + 12 + 4 * i], "big")
                for i in range(cnt)
            ]
        elif t == b"co64":
            cnt = _mp4_bound(
                int.from_bytes(b[ts_ + 4 : ts_ + 8], "big"), 8, te - ts_ - 8
            )
            trk["chunk_offsets"] = [
                int.from_bytes(b[ts_ + 8 + 8 * i : ts_ + 16 + 8 * i], "big")
                for i in range(cnt)
            ]
        elif t == b"stsc":
            cnt = _mp4_bound(
                int.from_bytes(b[ts_ + 4 : ts_ + 8], "big"), 12, te - ts_ - 8
            )
            trk["sample_to_chunk"] = [
                (
                    int.from_bytes(b[ts_ + 8 + 12 * i : ts_ + 12 + 12 * i], "big"),
                    int.from_bytes(b[ts_ + 12 + 12 * i : ts_ + 16 + 12 * i], "big"),
                )
                for i in range(cnt)
            ]
        elif t == b"stss":
            cnt = _mp4_bound(
                int.from_bytes(b[ts_ + 4 : ts_ + 8], "big"), 4, te - ts_ - 8
            )
            trk["sync_samples"] = [
                int.from_bytes(b[ts_ + 8 + 4 * i : ts_ + 12 + 4 * i], "big")
                for i in range(cnt)
            ]


def _mp4_bound(cnt: int, entry_size: int, body_bytes: int) -> int:
    """Sample-table counts are attacker-controlled: refuse to materialize
    more entries than the box body can physically hold (cnt * entry_size
    must fit in the remaining box bytes). Raises — callers funnel through
    parse_mp4's hostile-bytes catch, so a forged count yields None, never
    a multi-GB allocation or a billions-long read-past-the-box loop."""
    if cnt < 0 or cnt * entry_size > max(body_bytes, 0):
        raise ValueError("sample-table count overruns the box")
    return cnt


def mp4_sample_ranges(parsed: dict, track: int = 0) -> "list[tuple] | None":
    """Resolve the sample table to absolute byte ranges: returns
    [(sample_number_1based, offset, size, is_sync), ...] — the
    container-level frame map a keyframe extractor slices payloads
    with. None when the table is inconsistent (offsets past nothing,
    stsc referencing missing chunks)."""
    try:
        trk = parsed["tracks"][track]
        sizes = trk["sample_sizes"]
        chunks = trk["chunk_offsets"]
        stsc = trk["sample_to_chunk"]
        if not sizes or not chunks or not stsc:
            return None
        sync = set(trk["sync_samples"] or range(1, len(sizes) + 1))
        # expand stsc runs: (first_chunk_1based, samples_per_chunk)
        out = []
        si = 0
        for ci in range(len(chunks)):
            spc = None
            for k, (first, n) in enumerate(stsc):
                if ci + 1 >= first:
                    spc = n
                else:
                    break
            if spc is None:
                return None
            off = chunks[ci]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                out.append((si + 1, off, sizes[si], (si + 1) in sync))
                off += sizes[si]
                si += 1
        if si != len(sizes):
            return None
        return out
    except Exception:
        return None


def encode_mp4(
    samples: "list[bytes]",
    width: int = 0,
    height: int = 0,
    keyframes: "list[int] | None" = None,
    timescale: int = 1000,
    sample_duration: int = 40,
    codec: bytes = b"avc1",
    handler: bytes = b"vide",
) -> bytes:
    """Minimal valid ISO-BMFF writer — ``parse_mp4``'s construction
    oracle: ftyp + mdat (the given sample payloads, contiguous in one
    chunk) + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd,
    stts, stsc, stsz, stco[, stss]))))). The sample BYTES are opaque
    (no codec claim); everything the parser reads back — dims,
    duration, codec fourcc, per-sample ranges, sync samples — is
    exactly what went in."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + fourcc + body

    def full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
        return box(fourcc, bytes([version, 0, 0, 0]) + body)

    n = len(samples)
    dur = n * sample_duration
    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # mdat body starts here

    mvhd = full(
        b"mvhd",
        (0).to_bytes(8, "big")
        + timescale.to_bytes(4, "big")
        + dur.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")      # volume 1.0
        + bytes(10)
        + b"".join(v.to_bytes(4, "big") for v in
                   (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
        + bytes(24)
        + (2).to_bytes(4, "big"),          # next track id
    )
    tkhd = full(
        b"tkhd",
        (0).to_bytes(8, "big")
        + (1).to_bytes(4, "big")  # track id
        + bytes(4)
        + dur.to_bytes(4, "big")
        + bytes(8)
        + bytes(8)  # layer/group/volume/reserved
        + b"".join(v.to_bytes(4, "big") for v in
                   (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
        + (width << 16).to_bytes(4, "big")
        + (height << 16).to_bytes(4, "big"),
        version=0,
    )
    mdhd = full(
        b"mdhd",
        (0).to_bytes(8, "big")
        + timescale.to_bytes(4, "big")
        + dur.to_bytes(4, "big")
        + (0x55C4).to_bytes(2, "big")  # language 'und'
        + bytes(2),
    )
    hdlr = full(b"hdlr", bytes(4) + handler + bytes(12) + b"w4h\x00")
    if handler == b"vide":
        entry_body = (
            bytes(6) + (1).to_bytes(2, "big")          # data ref index
            + bytes(16)
            + width.to_bytes(2, "big") + height.to_bytes(2, "big")
            + (0x480000).to_bytes(4, "big") * 2        # 72 dpi
            + bytes(4)
            + (1).to_bytes(2, "big")                   # frame count
            + bytes(32)                                # compressor name
            + (24).to_bytes(2, "big")                  # depth
            + (0xFFFF).to_bytes(2, "big")
        )
    else:  # soun
        entry_body = (
            bytes(6) + (1).to_bytes(2, "big")
            + bytes(8)
            + (2).to_bytes(2, "big")                   # channels
            + (16).to_bytes(2, "big")                  # sample size
            + bytes(4)
            + (44100 << 16).to_bytes(4, "big")
        )
    stsd = full(
        b"stsd",
        (1).to_bytes(4, "big") + box(codec, entry_body),
    )
    stts = full(
        b"stts",
        (1).to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + sample_duration.to_bytes(4, "big"),
    )
    stsc = full(
        b"stsc",
        (1).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + n.to_bytes(4, "big") + (1).to_bytes(4, "big"),
    )
    stsz = full(
        b"stsz",
        (0).to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + b"".join(len(s).to_bytes(4, "big") for s in samples),
    )
    stco = full(b"stco", (1).to_bytes(4, "big") + chunk_offset.to_bytes(4, "big"))
    stbl_boxes = stsd + stts + stsc + stsz + stco
    if keyframes is not None:
        stbl_boxes += full(
            b"stss",
            len(keyframes).to_bytes(4, "big")
            + b"".join(k.to_bytes(4, "big") for k in keyframes),
        )
    stbl = box(b"stbl", stbl_boxes)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mp4_keyframes(media: DataFrame, keyframes_only: bool = True) -> DataFrame:
    """Container-level FRAME EXTRACTION over a media table: parse each
    MP4 payload's sample table and emit one row per (key)frame with
    its exact codec-frame bytes sliced from mdat — the row-expanding
    mapInPandas shape (a UDTF), real byte ranges instead of the old
    fixed-window stub. Undecodable payloads contribute zero rows.
    Downstream, these frames feed a codec decode stage (out of
    numpy+stdlib scope, documented) or ship as-is to a vision
    preprocessing service. Scale: Arrow batches, payload bytes never
    enter the JVM row format, output is (media_id, frame_idx,
    is_sync, frame_bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, syncs, frames = [], [], [], []
            for media_id, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()
            ):
                parsed = parse_mp4(payload)
                if parsed is None or not parsed["tracks"]:
                    continue
                ranges = mp4_sample_ranges(parsed)
                if ranges is None:
                    continue
                b = bytes(payload)
                for num, off, size, is_sync in ranges:
                    if keyframes_only and not is_sync:
                        continue
                    if off + size > len(b):
                        continue  # table points past the payload: skip
                    ids.append(media_id)
                    idxs.append(num)
                    syncs.append(is_sync)
                    frames.append(b[off : off + size])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "is_sync": pd.Series(syncs, dtype="bool"),
                    "frame_bytes": frames,
                }
            )

    return media.mapInPandas(
        kernel,
        "media_id long, frame_idx int, is_sync boolean, frame_bytes binary",
    )
