"""Unit tests for the multimodal binary-column operators."""

from __future__ import annotations

import hashlib

import pytest

from stellar_etl_spark.operators.multimodal import (
    attach_media,
    decode_audio,
    decode_image,
    frame_sample,
    media_byte_features,
)

DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark):
    rows = [
        (1, "a" * 100, "en", "web", 100),
        (2, "hello world", "en", "web", 11),
        (3, "b" * 129, "en", "book", 129),  # 3 frames at 64B: 64+64+1
    ]
    return spark.createDataFrame(rows, DOCS)


class TestMultimodal:
    def test_attach_media_schema_and_checksum(self, spark):
        media = attach_media(_docs(spark))
        assert [f.name for f in media.schema.fields] == [
            "doc_id", "media_type", "payload", "meta",
        ]
        assert dict(media.dtypes)["payload"] == "binary"
        r = {x.doc_id: x for x in media.collect()}
        assert r[2].payload == b"hello world"
        assert r[2].meta.n_bytes == 11
        assert r[2].meta.checksum_md5 == hashlib.md5(b"hello world").hexdigest()

    def test_byte_features(self, spark):
        media = attach_media(_docs(spark))
        out = {r.doc_id: r for r in media_byte_features(media).collect()}
        assert out[1].n_bytes == 100
        assert out[1].first_byte == ord("a")
        assert out[1].byte_sum == 100 * ord("a")
        assert out[2].checksum_md5 == hashlib.md5(b"hello world").hexdigest()

    def test_frame_sample_fanout(self, spark):
        media = attach_media(_docs(spark))
        rows = frame_sample(media, frame_bytes=64, every_nth=1).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert len(by_doc[2]) == 1  # 11 bytes → 1 frame
        assert len(by_doc[3]) == 3  # 129 bytes → 3 frames
        frames3 = sorted(by_doc[3], key=lambda r: r.frame_idx)

        def hexmd5(bs: bytes) -> str:
            # fingerprint = md5 of the UPPERCASE-HEX rendering (lossless;
            # portable to VARCHAR-only md5 engines like DuckDB)
            return hashlib.md5(bs.hex().upper().encode()).hexdigest()

        assert frames3[0].frame_md5 == hexmd5(b"b" * 64)
        assert frames3[2].frame_md5 == hexmd5(b"b")
        # every_nth sampling keeps frames 0, 2
        sampled = frame_sample(media, frame_bytes=64, every_nth=2)
        idx3 = sorted(
            r.frame_idx for r in sampled.collect() if r.doc_id == 3
        )
        assert idx3 == [0, 2]

    def test_decoders_reject_non_media_payloads(self, spark):
        """decode_image/decode_audio are REAL now (stdlib PNG/WAV codecs);
        feeding them the text-bytes media table must fail loudly, not
        produce rows."""
        media = attach_media(_docs(spark))
        with pytest.raises(Exception, match="PNG|signature"):
            decode_image(media).collect()
        with pytest.raises(Exception, match="RIFF|WAVE"):
            decode_audio(media).collect()


class TestWaveformWindows:
    def test_known_waveform_stats(self, spark):
        import numpy as np

        from stellar_etl_spark.operators.multimodal import waveform_window_stats

        # 256 samples alternating +1000/-1000 -> 255 crossings, then
        # 100 samples of constant 500 -> 0 crossings
        sig = np.empty(256, dtype="<i2")
        sig[0::2], sig[1::2] = 1000, -1000
        tail = np.full(100, 500, dtype="<i2")
        payload = sig.tobytes() + tail.tobytes()
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        got = {
            r.window_idx: r
            for r in waveform_window_stats(df, window=256).collect()
        }
        assert got[0].n_samples == 256
        assert got[0].peak_abs == 1000
        assert got[0].mean_square == 1000 * 1000
        assert got[0].zero_crossings == 255
        assert got[1].n_samples == 100
        assert got[1].peak_abs == 500
        assert got[1].zero_crossings == 0

    def test_odd_byte_and_empty_payloads(self, spark):
        from stellar_etl_spark.operators.multimodal import waveform_window_stats

        df = spark.createDataFrame(
            [(1, bytearray(b"\x01\x00\x02")), (2, bytearray(b""))],
            "doc_id long, payload binary",
        )
        rows = waveform_window_stats(df).collect()
        # doc 1: one usable sample (trailing odd byte dropped); doc 2: none
        assert [(r.doc_id, r.n_samples) for r in rows] == [(1, 1)]


class TestStdlibCodecs:
    """The real PNG/WAV codecs (functions/codecs.py) and the decode
    operators wired over them."""

    def test_png_roundtrip_all_filters_and_channels(self):
        import random

        from stellar_etl_spark.functions.codecs import png_decode, png_encode

        rnd = random.Random(7)
        for channels in (1, 2, 3, 4):
            px = bytes(rnd.randrange(256) for _ in range(6 * 5 * channels))
            for ft in range(5):
                data = png_encode(6, 5, px, channels, ft)
                assert png_decode(data) == (6, 5, channels, px), (channels, ft)

    def test_png_filter_bytes_match_spec(self):
        """Pin the encoder's filtered scanlines against hand-computed spec
        values (RFC 2083 §6), so a mirrored encoder/decoder bug cannot
        cancel out in the roundtrip."""
        import struct
        import zlib

        from stellar_etl_spark.functions.codecs import png_encode

        # 2x2 gray image: rows (10, 20), (15, 240)
        px = bytes([10, 20, 15, 240])

        def raw_stream(data: bytes) -> bytes:
            pos, idat = 8, b""
            while pos + 8 <= len(data):
                (length,) = struct.unpack(">I", data[pos : pos + 4])
                tag = data[pos + 4 : pos + 8]
                if tag == b"IDAT":
                    idat += data[pos + 8 : pos + 8 + length]
                pos += 12 + length
            return zlib.decompress(idat)

        # filter 1 (Sub): x - left  -> rows [10, 10], [15, 225]
        assert raw_stream(png_encode(2, 2, px, 1, 1)) == bytes(
            [1, 10, 10, 1, 15, 225]
        )
        # filter 2 (Up): x - above -> rows [10, 20], [5, 220]
        assert raw_stream(png_encode(2, 2, px, 1, 2)) == bytes(
            [2, 10, 20, 2, 5, 220]
        )
        # filter 3 (Average): x - (left+above)//2
        #   row1: [10-0, 20-5] ; row2: [15-5, 240-(15+20)//2]
        assert raw_stream(png_encode(2, 2, px, 1, 3)) == bytes(
            [3, 10, 15, 3, 10, 240 - 17]
        )
        # filter 4 (Paeth): row1 predictor = left; row2: for x=0 pred=up(10);
        #   for x=1: a=15,b=20,c=10 -> p=25, pa=10,pb=5,pc=15 -> pred=b=20
        assert raw_stream(png_encode(2, 2, px, 1, 4)) == bytes(
            [4, 10, 10, 4, 5, 220]
        )

    def test_wav_matches_stdlib_wave_reader(self):
        import io
        import wave

        from stellar_etl_spark.functions.codecs import synth_wav, wav_decode

        data = synth_wav(42)
        wf = wave.open(io.BytesIO(data), "rb")
        assert wf.getframerate() == 8000
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getnframes() == 64
        sr, ch, samples = wav_decode(data)
        import struct

        assert samples == list(
            struct.unpack("<64h", wf.readframes(64))
        )

    def test_decode_operators_over_spark(self, spark):
        from stellar_etl_spark.operators.multimodal import (
            attach_png_media,
            attach_wav_media,
            decode_audio,
            decode_image,
        )

        docs = spark.createDataFrame(
            [(i,) for i in (0, 5, 123456)], "doc_id long"
        )
        img = {r.doc_id: r for r in decode_image(attach_png_media(docs)).collect()}
        for d, r in img.items():
            assert (r.width, r.height, r.channels) == (8, 8, 3)
            expected = sum((3 * d + i) % 251 for i in range(192))
            assert r.pixel_sum == expected, d
            assert r.pixel_first == (3 * d) % 251
        aud = {r.doc_id: r for r in decode_audio(attach_wav_media(docs)).collect()}
        for d, r in aud.items():
            samples = [((7 * d + i) % 2001) - 1000 for i in range(64)]
            assert r.sample_rate == 8000 and r.n_samples == 64
            assert r.sample_sum == sum(samples), d
            assert (r.sample_min, r.sample_max) == (min(samples), max(samples))

    def test_decode_rejects_garbage(self):
        import pytest as _pytest

        from stellar_etl_spark.functions.codecs import png_decode, wav_decode

        with _pytest.raises(ValueError):
            png_decode(b"not a png at all")
        with _pytest.raises(ValueError):
            wav_decode(b"RIFFxxxxNOPE")


class TestCodecProperties:
    """Property-based roundtrips for the stdlib codecs: any pixel/sample
    content, any dimensions/filter/channel combination."""

    def test_png_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from stellar_etl_spark.functions.codecs import png_decode, png_encode

        @settings(max_examples=80, deadline=None)
        @given(
            st.integers(min_value=1, max_value=9),
            st.integers(min_value=1, max_value=9),
            st.sampled_from([1, 2, 3, 4]),
            st.sampled_from([0, 1, 2, 3, 4]),
            st.randoms(use_true_random=False),
        )
        def roundtrip(w, h, channels, ft, rnd):
            px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
            assert png_decode(png_encode(w, h, px, channels, ft)) == (
                w, h, channels, px,
            )

        roundtrip()

    def test_wav_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from stellar_etl_spark.functions.codecs import wav_decode, wav_encode

        @settings(max_examples=80, deadline=None)
        @given(
            st.lists(
                st.integers(min_value=-32768, max_value=32767),
                min_size=0,
                max_size=200,
            ),
            st.integers(min_value=1, max_value=192000),
        )
        def roundtrip(samples, rate):
            sr, ch, out = wav_decode(wav_encode(rate, samples))
            assert (sr, ch, out) == (rate, 1, samples)

        roundtrip()


class TestImageDhash:
    def test_dhash_matches_reference_computation(self, spark):
        """The dHash from the real decode path equals an independent
        numpy-free recomputation from the generator formula."""
        from stellar_etl_spark.operators.multimodal import (
            attach_png_media,
            image_dhash,
        )

        docs = spark.createDataFrame([(7,), (13,)], "doc_id long")
        out = {
            r.doc_id: r.dhash
            for r in image_dhash(attach_png_media(docs)).collect()
        }

        def expected(d):
            a = (3 * d) % 251
            lum = [
                [
                    sum((a + y * 24 + x * 3 + c) % 251 for c in range(3))
                    for x in range(8)
                ]
                for y in range(8)
            ]
            h = 0
            for y in range(8):
                for x in range(7):
                    if lum[y][x + 1] > lum[y][x]:
                        h |= 1 << (y * 7 + x)
            return h

        assert out == {7: expected(7), 13: expected(13)}

    def test_identical_images_share_hash(self, spark):
        # doc ids congruent mod 251 generate identical pixel streams
        from stellar_etl_spark.operators.multimodal import (
            attach_png_media,
            image_dhash,
        )

        docs = spark.createDataFrame([(1,), (252,)], "doc_id long")
        hs = [
            r.dhash for r in image_dhash(attach_png_media(docs)).collect()
        ]
        assert hs[0] == hs[1]

    def test_large_images_hash_via_8x8_grid(self, spark):
        """Non-8x8 inputs downsample to a fixed 8x8 nearest-neighbor grid
        (classic dHash) — previously h*(w-1) > 64 silently overflowed the
        int64 bit shifts.  A 16x16 image must hash exactly like the 8x8
        image holding its sampled grid, and the 8x8 path is the identity
        (regression-pinned by test_dhash_matches_reference_computation)."""
        from stellar_etl_spark.functions.codecs import png_encode
        from stellar_etl_spark.operators.multimodal import image_dhash

        w = h = 16
        big = bytes((7 * i) % 251 for i in range(w * h * 3))
        grid_px = bytearray()
        for y in range(8):
            for x in range(8):
                sy, sx = (y * h) // 8, (x * w) // 8
                off = (sy * w + sx) * 3
                grid_px += big[off : off + 3]
        media = spark.createDataFrame(
            [
                (1, bytearray(png_encode(w, h, big))),
                (2, bytearray(png_encode(8, 8, bytes(grid_px)))),
            ],
            "doc_id long, payload binary",
        )
        out = {r.doc_id: r.dhash for r in image_dhash(media).collect()}
        assert out[1] == out[2]
        assert 0 <= out[1] < (1 << 56)


class TestAudioActivity:
    def test_zero_crossings_and_silence(self, spark):
        from stellar_etl_spark.operators.multimodal import (
            attach_wav_media,
            audio_activity_stats,
        )

        docs = spark.createDataFrame([(3,)], "doc_id long")
        [r] = audio_activity_stats(attach_wav_media(docs)).collect()
        samples = [((7 * 3 + i) % 2001) - 1000 for i in range(64)]
        zc = sum(
            1 for i in range(1, 64) if samples[i - 1] * samples[i] < 0
        )
        assert r.n_samples == 64
        assert r.zero_crossings == zc
        assert r.n_silence == sum(1 for s in samples if abs(s) < 100)
        assert r.peak == max(abs(s) for s in samples)
