"""Multimodal media columns over Spark.

Model: media is an opaque ``binary`` column plus typed metadata
(mime/width/height/duration), one row per asset — the only schema that
scales to 100 TB of mixed media in parquet (payloads stay columnar and
compressed; metadata predicates prune scans without touching bytes).

Processing runs through ``mapInPandas`` — Arrow ships (metadata, bytes)
batches to Python, the kernel works per batch, output schema is explicit.

Decode coverage (round 12): the codec-free-ish formats decode for
real — uncompressed 24-bit BMP pixel rows (``decode_bmp``), RIFF/WAVE
integer PCM samples (``decode_wav_pcm``), and non-interlaced 8-bit
PNG via stdlib zlib inflate + the five scanline filters
(``decode_png``) — feeding exact per-asset value statistics
(``media_decode_stats``, construction-oracled as ``q_media_decode`` /
``q_png_decode``). Codec-LIBRARY formats (JPEG DCT, MP4) need
libraries not in this container, so their decode kernel remains a
clearly-marked deterministic stub: tests exercise the full Spark
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
