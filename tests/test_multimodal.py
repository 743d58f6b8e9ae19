"""Multimodal plumbing tests: schema, Arrow batching through mapInPandas,
row-expanding frame sampling, and the decoder-stub contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from w4h_etl_container_spark.multimodal import (
    decode_stub,
    extract_features,
    frame_sample,
    synthesize_media,
)
from w4h_etl_container_spark.multimodal.media import resize_stub


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=48).cache()


class TestFeatures:
    def test_schema_and_cardinality(self, media):
        feats = extract_features(media)
        assert [f.name for f in feats.schema.fields] == [
            "media_id", "mime", "n_bytes", "byte_mean", "byte_entropy", "content_hash",
        ]
        assert feats.count() == media.count()

    def test_feature_values(self, media):
        row = extract_features(media).where(F.col("media_id") == 0).collect()[0]
        assert row["n_bytes"] > 0
        assert 0.0 <= row["byte_mean"] <= 255.0
        assert 0.0 <= row["byte_entropy"] <= 8.0
        assert len(row["content_hash"]) == 32

    def test_deterministic(self, media):
        a = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
        b = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
        assert a == b


class TestFrameSample:
    def test_row_expansion_and_no_image_frames(self, media):
        frames = frame_sample(media)
        assert frames.count() > media.count()  # expands
        image_ids = {r["media_id"] for r in media.where(F.col("mime") == "image/png").collect()}
        assert not image_ids & {r["media_id"] for r in frames.select("media_id").distinct().collect()}

    def test_frame_bytes_bounded(self, media):
        mx = frame_sample(media, frame_len=64).agg(F.max(F.length("frame_bytes"))).collect()[0][0]
        assert mx <= 64


class TestDecodeContract:
    def test_stub_decodes_known_mimes(self):
        assert decode_stub(b"\x00\x01\x02", "image/png").tolist() == [0, 1, 2]

    def test_unknown_mime_raises(self):
        with pytest.raises(NotImplementedError):
            decode_stub(b"x", "application/pdf")

    def test_resize_plumbing(self, media, spark):
        out = resize_stub(media.limit(6), 8, 8)
        rows = out.collect()
        assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
        assert all(len(r["payload"]) <= 64 for r in rows)


class TestMediaMetadataSniffing:
    """sniff_header parses REAL public container layouts (PNG IHDR,
    JPEG SOF, GIF, BMP, RIFF/WAVE) — crafted valid minimal files with
    known dimensions, plus hostile bytes."""

    @staticmethod
    def _png(w, h):
        import zlib

        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + chunk
            + zlib.crc32(chunk).to_bytes(4, "big")
        )

    @staticmethod
    def _jpeg(w, h):
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
        sof0 = (
            b"\xff\xc0"
            + (11).to_bytes(2, "big")
            + bytes([8])
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + bytes([1, 0x11, 0])
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    @staticmethod
    def _gif(w, h):
        return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes(6)

    @staticmethod
    def _bmp(w, h):
        return (
            b"BM" + bytes(16)
            + w.to_bytes(4, "little")
            + h.to_bytes(4, "little")
            + bytes(10)
        )

    @staticmethod
    def _wav(sr, ch):
        fmt = (
            b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + ch.to_bytes(2, "little")
            + sr.to_bytes(4, "little")
            + bytes(8)
        )
        return b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + fmt

    def test_known_headers_parse_exactly(self, spark):
        from w4h_etl_container_spark.multimodal.media import media_metadata

        rows = [
            (1, "image/png", bytearray(self._png(640, 480))),
            (2, "image/jpeg", bytearray(self._jpeg(1920, 1080))),
            (3, "image/gif", bytearray(self._gif(16, 9))),
            (4, "image/bmp", bytearray(self._bmp(320, 200))),
            (5, "audio/wav", bytearray(self._wav(44100, 2))),
            (6, "image/png", bytearray(b"\x00garbage not a png....")),
            (7, "image/png", None),
            (8, "image/png", bytearray(self._png(1, 1)[:10])),  # truncated
        ]
        df = spark.createDataFrame(
            rows, "media_id long, mime string, payload binary"
        )
        got = {r["media_id"]: r for r in media_metadata(df).collect()}
        assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
        assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 1920, 1080)
        assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 16, 9)
        assert (got[4]["format"], got[4]["width"], got[4]["height"]) == ("bmp", 320, 200)
        assert (got[5]["format"], got[5]["sample_rate_hz"], got[5]["channels"]) == ("wav", 44100, 2)
        for bad in (6, 7, 8):
            assert got[bad]["format"] == "unknown"
            assert got[bad]["width"] is None
        # mime rides through so mime-vs-format disagreement is queryable
        assert got[6]["mime"] == "image/png"

    def test_pure_python_reference_agrees(self):
        """Driver-side sanity of the kernel's parser on the same crafted
        bytes (no Spark) — the struct reads are deterministic."""
        from w4h_etl_container_spark.multimodal.media import sniff_header

        assert sniff_header(self._png(7, 9)) == ("png", 7, 9, None, None)
        assert sniff_header(self._jpeg(33, 44)) == ("jpeg", 33, 44, None, None)
        assert sniff_header(self._wav(16000, 1)) == ("wav", None, None, 16000, 1)
        assert sniff_header(b"")[0] == "unknown"
        assert sniff_header(None)[0] == "unknown"

    def test_all_sofn_markers_carry_dimensions(self):
        """ADVICE r10: every SOFn variant (lossless C3, differential
        C5-C7, arithmetic C9-CB/CD-CF) carries dimensions at the same
        offsets — only DHT (C4), JPG-ext (C8) and DAC (CC) don't."""
        from w4h_etl_container_spark.multimodal.media import sniff_header

        def jpeg_with(sof_marker, w, h):
            app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
            sof = (
                bytes([0xFF, sof_marker])
                + (11).to_bytes(2, "big")
                + bytes([8])
                + h.to_bytes(2, "big")
                + w.to_bytes(2, "big")
                + bytes([1, 0x11, 0])
            )
            return b"\xff\xd8" + app0 + sof + b"\xff\xd9"

        for m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                  0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            assert sniff_header(jpeg_with(m, 21, 34)) == ("jpeg", 21, 34, None, None), hex(m)

    def test_jpeg_walk_stops_at_sos(self):
        """A DHT-then-SOS stream with NO SOF must terminate at SOS and
        report unknown dimensions — never stride into entropy-coded
        data (whose bytes could alias a segment header)."""
        from w4h_etl_container_spark.multimodal.media import sniff_header

        dht = b"\xff\xc4" + (4).to_bytes(2, "big") + bytes(2)
        sos = b"\xff\xda" + (4).to_bytes(2, "big") + bytes(2)
        # entropy bytes crafted to LOOK like a giant SOF0 if mis-walked
        entropy = b"\xff\xc0\xff\xff" + bytes(8)
        assert sniff_header(b"\xff\xd8" + dht + sos + entropy + b"\xff\xd9") == (
            "jpeg", None, None, None, None,
        )

    def test_synthesized_corpus_is_unknown_format(self, spark):
        """The fixture's pseudo-payloads are random bytes — the sniffer
        must say so rather than hallucinate a format."""
        from w4h_etl_container_spark.multimodal.media import (
            media_metadata,
            synthesize_media,
        )

        out = media_metadata(synthesize_media(spark, n=16)).collect()
        assert len(out) == 16
        assert all(r["format"] == "unknown" for r in out)


class TestMediaByteNearDup:
    def test_planted_byte_edits_pair_up(self, spark):
        """Asset B = asset A with a few bytes patched mid-stream; asset
        C = truncated A; asset D = unrelated bytes. A–B and A–C must
        pair (long shared byte runs survive), D must pair with
        nothing."""
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import media_near_dup

        rng = np.random.default_rng(13)
        a = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        b = bytearray(a)
        b[2000:2004] = b"\x00\x01\x02\x03"  # 4 patched bytes
        c = a[:2500]  # truncation
        d = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        rows = [
            (1, "application/octet-stream", bytearray(a)),
            (2, "application/octet-stream", b),
            (3, "application/octet-stream", bytearray(c)),
            (4, "application/octet-stream", bytearray(d)),
            (5, "application/octet-stream", None),  # hostile: no bytes
        ]
        media = spark.createDataFrame(
            rows, "media_id long, mime string, payload binary"
        )
        got = {
            (r["media_a"], r["media_b"])
            for r in media_near_dup(media).collect()
        }
        assert (1, 2) in got and (1, 3) in got and (2, 3) in got
        assert not any(4 in p or 5 in p for p in got)

    def test_locality_guarantee_and_determinism(self):
        """Pure-python check of the kernel: payloads sharing a run of
        ≥ k + w − 1 bytes share ≥ 1 fingerprint (SIGMOD-2003 bound),
        and the fingerprint set is identical across calls."""
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            _BYTE_K,
            _BYTE_W,
            _winnow_bytes,
        )

        rng = np.random.default_rng(7)
        shared = rng.integers(0, 256, _BYTE_K + _BYTE_W - 1, dtype=np.uint8).tobytes()
        p1 = rng.integers(0, 256, 100, dtype=np.uint8).tobytes() + shared
        p2 = shared + rng.integers(0, 256, 80, dtype=np.uint8).tobytes()
        f1, f2 = set(_winnow_bytes(p1)), set(_winnow_bytes(p2))
        assert f1 & f2
        assert _winnow_bytes(p1) == _winnow_bytes(p1)
        assert _winnow_bytes(None) == [] and _winnow_bytes(b"short") == []


class TestRealDecode:
    """Round-11: real content decode for the codec-free formats —
    uncompressed 24-bit BMP pixels and RIFF/WAVE integer PCM — pinned
    against independently-constructed numpy references (struct-packed
    in the test, not by the code under test)."""

    @staticmethod
    def _bmp(px, top_down=False):
        import struct

        h, w, _ = px.shape
        stride = (w * 3 + 3) & ~3
        order = range(h) if top_down else range(h - 1, -1, -1)
        rows = b"".join(px[r].tobytes() + b"\x00" * (stride - w * 3) for r in order)
        return (
            b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h,
                          1, 24, 0, len(rows), 2835, 2835, 0, 0)
            + rows
        )

    @staticmethod
    def _wav(samples, bits=16, sr=8000, ch=1):
        import struct

        import numpy as np

        data = (samples.astype("<i2") if bits == 16 else samples.astype(np.uint8)).tobytes()
        ba = ch * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ba, ba, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def test_bmp_roundtrip_including_padding_and_orientation(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_bmp

        rng = np.random.default_rng(7)
        for w in (1, 2, 3, 4, 5):  # every padding residue
            px = rng.integers(0, 256, size=(4, w, 3), dtype=np.uint8)
            assert (decode_bmp(self._bmp(px)) == px).all(), w
            assert (decode_bmp(self._bmp(px, top_down=True)) == px).all(), w

    def test_bmp_hostile_bytes_refused(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_bmp

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        good = self._bmp(px)
        assert decode_bmp(good[:-3]) is None        # truncated pixel data
        assert decode_bmp(b"garbage bytes") is None
        assert decode_bmp(None) is None
        bad_bpp = bytearray(good); bad_bpp[28] = 8   # 8-bit: not supported
        assert decode_bmp(bytes(bad_bpp)) is None
        rle = bytearray(good); rle[30] = 1           # compressed: refused
        assert decode_bmp(bytes(rle)) is None

    def test_wav_pcm_signed_and_8bit(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_wav_pcm

        s16 = np.array([-32768, -1, 0, 1, 32767, -1234], dtype=np.int64)
        out, sr, ch = decode_wav_pcm(self._wav(s16))
        assert (out == s16).all() and sr == 8000 and ch == 1
        s8 = np.array([0, 128, 255], dtype=np.int64)
        out8, _, _ = decode_wav_pcm(self._wav(s8, bits=8))
        assert (out8 == s8).all()
        assert decode_wav_pcm(b"RIFF\x00\x00\x00\x00WAVE") is None
        # float PCM (format tag 3) refused, not misread
        import struct
        f32 = (b"RIFF" + struct.pack("<I", 40) + b"WAVE" + b"fmt "
               + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
               + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
        assert decode_wav_pcm(f32) is None

    def test_decode_stats_kernel_matches_numpy(self, spark):
        """media_decode_stats over a mixed batch == per-asset numpy
        stats, including the exact integer mean_e6 on SIGNED data."""
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import media_decode_stats

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
        s16 = np.array([-5, 7, 12, -1, 0], dtype=np.int64)
        rows = [
            (1, "image/bmp", bytearray(self._bmp(px))),
            (2, "audio/wav", bytearray(self._wav(s16))),
            (3, "text/plain", bytearray(b"not media")),
            (4, "image/bmp", None),
        ]
        df = spark.createDataFrame(
            rows, "media_id long, mime string, payload binary"
        )
        got = {r["media_id"]: r.asDict() for r in media_decode_stats(df).collect()}
        v = px.reshape(-1).astype(np.int64)
        assert got[1]["kind"] == "image" and got[1]["n_values"] == v.size
        assert got[1]["v_min"] == v.min() and got[1]["v_max"] == v.max()
        assert got[1]["v_sum"] == v.sum()
        assert got[1]["mean_e6"] == (int(v.sum()) * 10**6) // v.size
        assert got[2]["kind"] == "audio" and got[2]["v_sum"] == int(s16.sum())
        assert got[2]["mean_e6"] == (int(s16.sum()) * 10**6) // s16.size  # floor, signed
        assert got[3]["kind"] is None and got[3]["n_values"] is None
        assert got[4]["kind"] is None and got[4]["n_values"] is None


class TestPngDecode:
    """Round-12: non-interlaced 8-bit PNG decode via stdlib zlib + the
    five scanline filters — the last codec-free-ish format. The
    encoder here computes FORWARD filters (independent arithmetic from
    the decoder's inverse), plus hand-computed filtered bytes pin the
    filter equations themselves."""

    @staticmethod
    def _chunk(ctype, body):
        import struct
        import zlib

        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    @classmethod
    def _png(cls, img, filters):
        """img (h, w, c) uint8 → PNG bytes, row y pre-filtered with
        filters[y] using the spec's FORWARD equations."""
        import struct
        import zlib

        import numpy as np

        h, w, c = img.shape
        stride = w * c
        flat = img.reshape(h, stride).astype(np.int64)
        out = bytearray()
        for y, f in enumerate(filters):
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
            left = np.concatenate([np.zeros(c, dtype=np.int64), cur[:-c]])
            ul = np.concatenate([np.zeros(c, dtype=np.int64), prev[:-c]])
            if f == 0:
                enc = cur % 256
            elif f == 1:
                enc = (cur - left) % 256
            elif f == 2:
                enc = (cur - prev) % 256
            elif f == 3:
                enc = (cur - ((left + prev) >> 1)) % 256
            else:
                p = left + prev - ul
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
                )
                enc = (cur - pred) % 256
            out.append(f)
            out.extend(enc.astype(np.uint8).tobytes())
        ct = {1: 0, 3: 2, 2: 4, 4: 6}[c]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + cls._chunk(b"IHDR", ihdr)
            + cls._chunk(b"IDAT", zlib.compress(bytes(out)))
            + cls._chunk(b"IEND", b"")
        )

    def test_roundtrip_all_filters_and_color_types(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_png

        rng = np.random.default_rng(7)
        for h, w, c in [(1, 1, 1), (3, 5, 3), (4, 4, 4), (7, 3, 2), (5, 8, 1)]:
            img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            # every row a different filter, plus all-same-filter passes
            for filters in (
                [y % 5 for y in range(h)],
                [1] * h, [2] * h, [3] * h, [4] * h,
            ):
                got = decode_png(self._png(img, filters))
                assert got is not None and np.array_equal(got, img), (h, w, c, filters)

    def test_hand_computed_filter_bytes(self):
        """Filtered scanlines written out BY HAND from the RFC 2083
        equations — no shared encoder arithmetic to cancel a decoder
        bug."""
        import struct
        import zlib

        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_png

        def png_from_raw(raw, w, h):
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # grayscale
            return (
                b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
                + self._chunk(b"IDAT", zlib.compress(raw))
                + self._chunk(b"IEND", b"")
            )

        # Sub then Up: [[10,20],[30,40]] → rows (1,[10,10]), (2,[20,20])
        got = decode_png(png_from_raw(bytes([1, 10, 10, 2, 20, 20]), 2, 2))
        assert np.array_equal(got.reshape(2, 2), [[10, 20], [30, 40]])
        # Average: prev=[100,200], cur=[90,160] → (3,[40,15])
        got = decode_png(png_from_raw(bytes([0, 100, 200, 3, 40, 15]), 2, 2))
        assert np.array_equal(got.reshape(2, 2), [[100, 200], [90, 160]])
        # Paeth: prev=[100,200], cur=[120,210] → (4,[20,10])
        got = decode_png(png_from_raw(bytes([0, 100, 200, 4, 20, 10]), 2, 2))
        assert np.array_equal(got.reshape(2, 2), [[100, 200], [120, 210]])

    def test_hostile_bytes_refused(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_png

        img = np.zeros((3, 3, 3), dtype=np.uint8)
        good = self._png(img, [0, 1, 2])
        assert decode_png(good) is not None
        assert decode_png(good[:30]) is None          # truncated header
        # cut into the IDAT body itself (dropping only IEND leaves a
        # decodable image — all pixel data is present)
        assert decode_png(good[: len(good) - 20]) is None
        assert decode_png(b"not a png at all, nope....") is None
        assert decode_png(None) is None
        bad_depth = bytearray(good); bad_depth[24] = 16
        assert decode_png(bytes(bad_depth)) is None   # 16-bit refused
        interlaced = bytearray(good); interlaced[28] = 1
        assert decode_png(bytes(interlaced)) is None  # Adam7 refused
        palette = bytearray(good); palette[25] = 3
        assert decode_png(bytes(palette)) is None     # indexed refused

    def test_decode_stats_kernel_handles_png(self, spark):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import media_decode_stats

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, "image/png", bytearray(self._png(img, [0, 1, 2, 4])))],
            "media_id long, mime string, payload binary",
        )
        got = media_decode_stats(df).collect()[0]
        v = img.reshape(-1).astype(np.int64)
        assert got["kind"] == "image" and got["n_values"] == v.size
        assert got["v_min"] == v.min() and got["v_max"] == v.max()
        assert got["v_sum"] == v.sum()


class TestGifDecode:
    """Round-12: GIF87a/89a first-frame decode — pure public byte
    layout + variable-width LZW (no codec library). The encoder uses
    giflib's emit-then-bump width ordering; a HAND-derived LZW byte
    string pins the bit packing and the width-transition timing
    independently of both."""

    def test_hand_derived_lzw_stream(self):
        """Pixels [1,1,0,2], min_code_size=2: codes
        CLEAR(4)@3, 1@3, 1@3, 0@3 (bump after: slot 8 == 2^3), 2@4,
        EOI(5)@4 — LSB-first packing gives exactly 4C 20 05."""
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            _lzw_decode,
            decode_gif,
            encode_gif,
        )

        assert bytes(_lzw_decode(bytes([0x4C, 0x20, 0x05]), 2, 4)) == bytes(
            [1, 1, 0, 2]
        )
        # and the encoder reproduces those exact bytes inside a full GIF
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
        )
        gif = encode_gif(np.array([[1, 1], [0, 2]], dtype=np.uint8), pal)
        assert bytes([0x4C, 0x20, 0x05]) in gif
        got = decode_gif(gif)
        assert got is not None
        assert (got == pal[np.array([[1, 1], [0, 2]])]).all()

    def test_roundtrip_including_width_growth(self):
        """Large random index images force the LZW table through
        several width transitions (up to 9+ bits) — decode must invert
        encode exactly."""
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_gif, encode_gif

        rng = np.random.default_rng(13)
        for h, w, n_colors in [(1, 1, 2), (8, 8, 4), (40, 60, 16), (64, 64, 256)]:
            pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
            idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
            got = decode_gif(encode_gif(idx, pal))
            assert got is not None and got.shape == (h, w, 3), (h, w, n_colors)
            assert (got == pal[idx]).all(), (h, w, n_colors)
        # solid image (maximal LZW run compression)
        idx = np.full((32, 32), 3, dtype=np.uint8)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()

    def test_extensions_skipped_and_hostile_refused(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_gif, encode_gif

        pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
        idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
        gif = encode_gif(idx, pal)
        # splice a Graphic Control Extension before the image block
        at = gif.index(b"\x2c")
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        with_ext = gif[:at] + gce + gif[at:]
        assert (decode_gif(with_ext) == pal[idx]).all()

        assert decode_gif(None) is None
        assert decode_gif(b"GIF89a") is None
        assert decode_gif(b"not a gif at all....") is None
        assert decode_gif(gif[: len(gif) - 4]) is None  # truncated data
        interlaced = bytearray(gif)
        interlaced[gif.index(b"\x2c") + 9] |= 0x40
        assert decode_gif(bytes(interlaced)) is None  # Adam-style refused
        # corrupt LZW stream: flip bytes inside the data sub-block
        broken = bytearray(gif)
        pos = gif.index(b"\x2c") + 11
        broken[pos + 1] = 0xFF
        out = decode_gif(bytes(broken))  # never raises: None or a frame
        assert out is None or out.shape == (2, 2, 3)

    def test_decode_stats_kernel_handles_gif(self, spark):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            encode_gif,
            media_decode_stats,
        )

        rng = np.random.default_rng(17)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (6, 9), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, "image/gif", bytearray(encode_gif(idx, pal)))],
            "media_id long, mime string, payload binary",
        )
        got = media_decode_stats(df).collect()[0]
        v = pal[idx].reshape(-1).astype(np.int64)
        assert got["kind"] == "image" and got["n_values"] == v.size
        assert got["v_min"] == v.min() and got["v_max"] == v.max()
        assert got["v_sum"] == v.sum()


class TestDecoderFuzz:
    """Seeded fuzz over ALL real decoders: random buffers and
    bit-flipped mutations of VALID files must never raise — every
    outcome is None or a well-formed array (hostile bytes are the
    normal case in a crawled corpus; a decoder that throws kills the
    whole Arrow batch)."""

    def test_random_and_mutated_bytes_never_raise(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
            decode_wav_pcm,
            encode_gif,
            encode_jpeg,
            encode_png,
            sniff_header,
        )

        rng = np.random.default_rng(99)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        valid = [
            encode_png(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8), [0, 1, 2, 3, 4]),
            encode_gif(rng.integers(0, 4, (6, 6), dtype=np.uint8), pal),
            encode_jpeg(rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)),
        ]
        # magic-prefixed garbage hits the deep parse paths, not the
        # magic check
        magics = [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"RIFF....WAVE"]
        buffers = []
        for _ in range(120):
            n = int(rng.integers(0, 400))
            body = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            buffers.append(body)
            buffers.append(magics[int(rng.integers(0, 4))] + body)
        for v in valid:
            for _ in range(60):
                m = bytearray(v)
                for _ in range(int(rng.integers(1, 6))):
                    m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
                buffers.append(bytes(m))
            for cut in (1, len(v) // 3, len(v) - 2):
                buffers.append(v[:cut])
        for buf in buffers:
            for dec in (decode_png, decode_gif, decode_bmp, decode_jpeg):
                out = dec(buf)  # must not raise
                assert out is None or (out.ndim == 3 and out.dtype == np.uint8)
            w = decode_wav_pcm(buf)  # must not raise
            assert w is None or len(w) == 3
            fmt = sniff_header(buf)  # must not raise
            assert isinstance(fmt, tuple) and len(fmt) == 5

    def test_zlib_bomb_and_forged_dims_bounded(self):
        """A small crafted payload must not be able to force a large
        allocation: (a) a forged IHDR declaring a huge image is
        refused before the inflate; (b) an IDAT that inflates past the
        declared geometry (bomb) is cut off at expect+1 bytes and
        rejected. Both paths return None quickly instead of allocating
        hundreds of MB per executor task."""
        import struct
        import time
        import zlib

        import numpy as np

        from w4h_etl_container_spark.multimodal.media import decode_png

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body))
            )

        def png(w, h, idat_raw):
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(idat_raw))
                + chunk(b"IEND", b"")
            )

        # (a) forged dimensions: 65536 x 65536 RGB = 12 GiB declared,
        # from a ~100-byte payload — must refuse up front
        bomb_dims = png(65536, 65536, b"\x00" * 64)
        t0 = time.time()
        assert decode_png(bomb_dims) is None
        assert time.time() - t0 < 1.0

        # (b) honest small dims, bomb IDAT: 64 MB of zeros compress to
        # ~64 KB; the bounded inflate must stop at expect+1
        bomb_idat = png(4, 4, b"\x00" * (64 << 20))
        t0 = time.time()
        assert decode_png(bomb_idat) is None
        assert time.time() - t0 < 1.0

        # control: a legitimate image still decodes
        rng = np.random.default_rng(7)
        from w4h_etl_container_spark.multimodal.media import encode_png

        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        out = decode_png(encode_png(img, [0, 1, 2, 3, 4]))
        assert out is not None and (out == img).all()


class TestJpegCodec:
    """Round-13: baseline JPEG (SOF0) decode in pure numpy + stdlib —
    Huffman entropy decode, dequant, zigzag, vectorized IDCT, chroma
    upsampling, YCbCr. Construction-oracled against the matching
    encoder (exact on solid images under all-ones quant; bounded
    rounding error on random ones), refusals pinned for every
    beyond-baseline mode."""

    def test_solid_gray_roundtrip_exact_all_samplings(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_jpeg,
            encode_jpeg,
        )

        # dims straddle MCU boundaries (1..17 across 8/16 multiples) so
        # padding + cropping are exercised in every sampling mode
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            for (w, h, v) in [(1, 1, 0), (5, 3, 77), (8, 8, 1), (17, 9, 255),
                              (16, 16, 128), (6, 5, 200)]:
                img = np.full((h, w, 3), v, dtype=np.uint8)
                out = decode_jpeg(encode_jpeg(img, subsampling=sub))
                assert out is not None and out.shape == (h, w, 3), (sub, w, h)
                assert (out == img).all(), (sub, w, h, v)

    def test_solid_grayscale_single_component_exact(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_jpeg,
            encode_jpeg,
        )

        for (w, h, v) in [(1, 1, 9), (11, 7, 130), (24, 16, 255)]:
            img = np.full((h, w, 1), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img))
            assert out is not None and out.shape == (h, w, 1)
            assert (out == img).all()

    def test_random_images_bounded_rounding_error(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(17)
        # grayscale with q=1: the only loss is FDCT/quant rounding -> ±1
        g = rng.integers(0, 256, (24, 17, 1), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(g, subsampling="4:4:4"))
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 1
        # RGB 4:4:4 adds the YCbCr float roundtrip -> ±2
        c = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(c, subsampling="4:4:4"))
        assert np.abs(out.astype(int) - c.astype(int)).max() <= 2
        # a coarser quant table decodes with proportionally bounded error
        out16 = decode_jpeg(encode_jpeg(g, subsampling="4:4:4", quant=16))
        assert out16.shape == (24, 17, 1)
        assert np.abs(out16.astype(int) - g.astype(int)).max() <= 64

    def test_restart_intervals_roundtrip(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
        for ri in (1, 2, 5):
            withrst = decode_jpeg(
                encode_jpeg(img, subsampling="4:2:0", restart_interval=ri)
            )
            # RSTn resets predictors but never the data: identical decode
            assert (withrst == plain).all(), ri

    def test_beyond_baseline_refused(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((8, 8, 3), 99, dtype=np.uint8)
        base = encode_jpeg(img)
        assert decode_jpeg(base) is not None

        def mutate(marker_from, to_byte, offset=1):
            p = bytearray(base)
            i = p.find(marker_from)
            assert i >= 0
            p[i + offset] = to_byte
            return bytes(p)

        # progressive (SOF2), extended sequential is also out (SOF1 kept
        # out by this decoder's strict C0 check), lossless (SOF3),
        # arithmetic sequential (SOF9)
        for sof in (0xC2, 0xC1, 0xC3, 0xC9):
            assert decode_jpeg(mutate(b"\xff\xc0", sof)) is None, hex(sof)
        # 12-bit precision: first SOF payload byte
        p = bytearray(base)
        i = p.find(b"\xff\xc0")
        p[i + 4] = 12
        assert decode_jpeg(bytes(p)) is None
        # truncation anywhere must refuse, never raise
        for cut in (2, 20, len(base) // 2, len(base) - 3):
            assert decode_jpeg(base[:cut]) is None
        # forged huge dimensions refuse before allocating
        p = bytearray(base)
        p[i + 5 : i + 9] = (60000).to_bytes(2, "big") + (60000).to_bytes(2, "big")
        assert decode_jpeg(bytes(p)) is None

    def test_fuzz_never_raises(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(31)
        valid = encode_jpeg(
            rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
        )
        bufs = [rng.integers(0, 256, int(rng.integers(0, 300)), dtype=np.uint8).tobytes()
                for _ in range(80)]
        bufs += [b"\xff\xd8" + b for b in bufs[:40]]
        for _ in range(60):
            m = bytearray(valid)
            for _ in range(int(rng.integers(1, 6))):
                m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
            bufs.append(bytes(m))
        for cut in (1, len(valid) // 3, len(valid) - 2):
            bufs.append(valid[:cut])
        for buf in bufs:
            out = decode_jpeg(buf)  # must not raise
            assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


class TestMp4Container:
    """Round-13: ISO-BMFF container parsing — box walk, sample-table
    resolution, keyframe extraction — construction-oracled against the
    matching writer. Codec payload decode stays out of scope; the
    container layer is real."""

    def test_roundtrip_video_track(self):
        from w4h_etl_container_spark.multimodal.media import (
            encode_mp4,
            mp4_sample_ranges,
            parse_mp4,
        )

        samples = [bytes([i]) * (10 + 3 * i) for i in range(7)]
        p = encode_mp4(samples, width=320, height=240, keyframes=[1, 4, 7])
        parsed = parse_mp4(p)
        t = parsed["tracks"][0]
        assert parsed["brand"] == "isom"
        assert (t["handler"], t["codec"]) == ("vide", "avc1")
        assert (t["width"], t["height"]) == (320, 240)
        assert t["n_samples"] == 7 and t["sync_samples"] == [1, 4, 7]
        assert parsed["duration_ms"] == 7 * 40
        ranges = mp4_sample_ranges(parsed)
        assert [r[0] for r in ranges] == list(range(1, 8))
        for num, off, size, sync in ranges:
            assert p[off : off + size] == samples[num - 1]
            assert sync == (num in (1, 4, 7))

    def test_audio_track_and_no_stss_means_all_sync(self):
        from w4h_etl_container_spark.multimodal.media import (
            encode_mp4,
            mp4_sample_ranges,
            parse_mp4,
        )

        p = encode_mp4([b"a" * 5] * 3, codec=b"mp4a", handler=b"soun")
        t = parse_mp4(p)["tracks"][0]
        assert (t["handler"], t["codec"]) == ("soun", "mp4a")
        assert (t["channels"], t["sample_rate_hz"]) == (2, 44100)
        # no stss box: every sample is a sync sample (spec default)
        assert all(r[3] for r in mp4_sample_ranges(parse_mp4(p)))

    def test_sniff_header_reports_mp4(self):
        from w4h_etl_container_spark.multimodal.media import (
            encode_mp4,
            sniff_header,
        )

        p = encode_mp4([b"x" * 9] * 2, width=64, height=48, keyframes=[1])
        assert sniff_header(p) == ("mp4", 64, 48, None, None)
        pa = encode_mp4([b"x"] * 2, codec=b"mp4a", handler=b"soun")
        assert sniff_header(pa) == ("mp4", None, None, 44100, 2)

    def test_keyframe_extraction_kernel(self, spark):
        from w4h_etl_container_spark.multimodal.media import (
            encode_mp4,
            mp4_keyframes,
        )

        rows = []
        for mid in range(4):
            samples = [bytes([mid * 10 + j]) * (j + 3) for j in range(5)]
            rows.append(
                (mid, "video/mp4",
                 bytearray(encode_mp4(samples, width=16, height=16,
                                      keyframes=[1, 3, 5])))
            )
        rows.append((99, "text/plain", bytearray(b"not a video")))
        media = spark.createDataFrame(
            rows, "media_id long, mime string, payload binary"
        )
        got = mp4_keyframes(media).collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r["media_id"], []).append(
                (r["frame_idx"], bytes(r["frame_bytes"]))
            )
        assert 99 not in by_id and sorted(by_id) == [0, 1, 2, 3]
        for mid in range(4):
            assert sorted(by_id[mid]) == [
                (j + 1, bytes([mid * 10 + j]) * (j + 3)) for j in (0, 2, 4)
            ]

    def test_forged_sample_table_counts_bounded(self):
        """Advisor r13 (medium): sample-table counts are attacker-
        controlled — a ~300-byte payload forging stsz fixed!=0 with
        cnt=100M allocated ~870 MB, and stco/co64/stsc/stss loops had no
        count bound at all. Every count must now be rejected (→ None)
        when it overruns the box body, without materializing anything."""
        from w4h_etl_container_spark.multimodal.media import (
            encode_mp4,
            parse_mp4,
        )

        valid = encode_mp4([b"k" * 11] * 4, width=32, height=32,
                           keyframes=[1, 3])
        assert parse_mp4(valid) is not None

        def patched(fourcc: bytes, cnt_off: int, cnt: int,
                    fixed: "int | None" = None) -> bytes:
            m = bytearray(valid)
            i = m.index(fourcc)
            if fixed is not None:  # stsz fixed-size field at fourcc+8
                m[i + 8 : i + 12] = fixed.to_bytes(4, "big")
            m[i + cnt_off : i + cnt_off + 4] = cnt.to_bytes(4, "big")
            return bytes(m)

        # stsz fixed!=0 path: [fixed]*cnt with no byte backing in the box
        assert parse_mp4(patched(b"stsz", 12, 100_000_000, fixed=7)) is None
        # stsz variable path: cnt claims more 4-byte entries than the box
        assert parse_mp4(patched(b"stsz", 12, 2**31)) is None
        # chunk/sync tables: loops previously read past the box forever
        assert parse_mp4(patched(b"stco", 8, 2**31)) is None
        assert parse_mp4(patched(b"stsc", 8, 2**31)) is None
        assert parse_mp4(patched(b"stss", 8, 2**31)) is None
        # a plausible-but-overrunning small count is also refused
        assert parse_mp4(patched(b"stco", 8, 1000)) is None

    def test_fuzz_never_raises(self):
        import numpy as np

        from w4h_etl_container_spark.multimodal.media import (
            encode_mp4,
            mp4_sample_ranges,
            parse_mp4,
        )

        rng = np.random.default_rng(47)
        valid = encode_mp4([b"k" * 11] * 4, width=32, height=32, keyframes=[1])
        bufs = [rng.integers(0, 256, int(rng.integers(0, 300)), dtype=np.uint8).tobytes()
                for _ in range(80)]
        bufs += [b[:4] + b"ftyp" + b[8:] for b in bufs[:30] if len(b) >= 16]
        for _ in range(60):
            m = bytearray(valid)
            for _ in range(int(rng.integers(1, 6))):
                m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
            bufs.append(bytes(m))
        for cut in (1, 9, len(valid) // 2, len(valid) - 2):
            bufs.append(valid[:cut])
        for buf in bufs:
            parsed = parse_mp4(buf)  # must not raise
            if parsed is not None:
                mp4_sample_ranges(parsed)  # must not raise either


class TestDocScanVolumeGate:
    def test_directory_dataset_sums_part_files(self, spark, tmp_path):
        """ADVICE r16: the spread gate must size a DIRECTORY dataset by
        its part files — a directory entry's own st_size (~4 KB) would
        misclassify arbitrarily large inputs as small and skip the
        parallelism spread for png/gif."""
        from w4h_etl_container_spark.plans.multimodalops import (
            _SPREAD_MIN_BYTES,
            _doc_scan,
        )

        par = spark.sparkContext.defaultParallelism
        big = tmp_path / "sf-big"
        spark.range(0, 4000).select(
            F.col("id").alias("doc_id"),
            # high-entropy payload: constant/repetitive text would
            # snappy-compress under the gate and defeat the fixture
            F.concat(
                *[
                    F.sha2((F.col("id") * 1000 + i).cast("string"), 256)
                    for i in range(16)
                ]
            ).alias("text"),
        ).repartition(4).write.parquet(str(big / "documents.parquet"))
        on_disk = sum(
            p.stat().st_size for p in (big / "documents.parquet").rglob("*") if p.is_file()
        )
        assert on_disk > _SPREAD_MIN_BYTES  # the fixture really is big
        spread = _doc_scan(spark, str(big), always_spread=False)
        assert spread.rdd.getNumPartitions() == par

        small = tmp_path / "sf-small"
        spark.range(0, 20).select(
            F.col("id").alias("doc_id"), F.lit("tiny").alias("text")
        ).coalesce(1).write.parquet(str(small / "documents.parquet"))
        kept = _doc_scan(spark, str(small), always_spread=False)
        assert kept.rdd.getNumPartitions() < par  # gate skipped the spread
