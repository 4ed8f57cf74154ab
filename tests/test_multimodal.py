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
        assert frames3[0].frame_md5 == hashlib.md5(b"b" * 64).hexdigest()
        assert frames3[2].frame_md5 == hashlib.md5(b"b").hexdigest()
        # every_nth sampling keeps frames 0, 2
        sampled = frame_sample(media, frame_bytes=64, every_nth=2)
        idx3 = sorted(
            r.frame_idx for r in sampled.collect() if r.doc_id == 3
        )
        assert idx3 == [0, 2]

    def test_codec_stubs_raise(self, spark):
        media = attach_media(_docs(spark))
        with pytest.raises(NotImplementedError):
            decode_image(media)
        with pytest.raises(NotImplementedError):
            decode_audio(media)


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
