"""Multimodal (binary) column operators for training-data pipelines.

Pattern: media ride as opaque ``binary`` payloads with a typed metadata
struct; per-item compute (decode / feature-extract / resize / frame-sample)
runs as Arrow-batched pandas iterators over ``mapInPandas`` — the same shape
used for XDR decode in sources.bronze.  ``decode_image``/``decode_audio``
are REAL decoders backed by the stdlib-only PNG/WAV codecs in
functions/codecs.py (zlib inflate + five-filter scanline reconstruction;
RIFF PCM16 chunk walk) — no external imaging/audio library needed; heavier
codecs (JPEG/MP3/video) would slot into the same mapInPandas shape.

Scale shape: all operators are per-row/narrow (no shuffle); frame sampling
fans out via ``posexplode`` exactly like the reference's tx→operations
explode (input/operations.go:58-70).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes:long, checksum_md5:string, source:string>"
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → media table: payload = utf-8 bytes of the text (the
    deterministic stand-in for an image/audio blob), typed metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    # a NULL source column means a missing/corrupt asset — a media pipeline
    # skips it (the numpy kernels downstream require bytes, not None); the
    # oracle twins filter the same rows
    return docs.where(F.col(text_col).isNotNull()).select(
        F.col("doc_id"),
        F.lit("application/octet-stream").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum_md5"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def attach_png_media(docs: DataFrame, filter_type: int = 4) -> DataFrame:
    """documents → real PNG payloads (deterministic 8x8 RGB per doc_id,
    Paeth-filtered by default so the decode path is non-trivial) — the
    generator twin of ``decode_image`` for tests/queries."""
    import pandas as pd

    from stellar_etl_spark.functions.codecs import synth_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": [
                        synth_png(int(d), filter_type) for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, media_type string, payload binary"
    )


def attach_wav_media(docs: DataFrame) -> DataFrame:
    """documents → real 16-bit PCM WAV payloads (64 deterministic samples
    per doc_id) — the generator twin of ``decode_audio``."""
    import pandas as pd

    from stellar_etl_spark.functions.codecs import synth_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": [synth_wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, media_type string, payload binary"
    )


def decode_image(media: DataFrame) -> DataFrame:
    """REAL image decode over mapInPandas: the stdlib-only PNG codec
    (functions/codecs.py — IHDR parse, IDAT inflate, full five-filter
    scanline reconstruction) → per-image dimensions + pixel aggregates.

    Output: doc_id, width, height, channels, n_pixel_bytes, pixel_sum
    (exact int over all components), pixel_first/pixel_last.  Narrow
    per-row compute, Arrow-batched — the plug-in slot for any heavier
    vision featurizer at 100 TB.
    """
    import pandas as pd

    from stellar_etl_spark.functions.codecs import png_decode

    out_schema = (
        "doc_id long, width int, height int, channels int, "
        "n_pixel_bytes long, pixel_sum long, pixel_first int, pixel_last int"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, px = png_decode(bytes(p))
                a = np.frombuffer(px, dtype=np.uint8)
                rows.append(
                    {
                        "doc_id": d,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "n_pixel_bytes": len(px),
                        "pixel_sum": int(a.sum(dtype=np.int64)),
                        "pixel_first": int(a[0]) if len(a) else None,
                        "pixel_last": int(a[-1]) if len(a) else None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=out_schema
    )


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode over mapInPandas: the stdlib-only RIFF/WAVE PCM16
    reader (functions/codecs.py) → per-clip sample aggregates.

    Output: doc_id, sample_rate, n_channels, n_samples, sample_sum (exact
    int), sample_min, sample_max.
    """
    import pandas as pd

    from stellar_etl_spark.functions.codecs import wav_decode

    out_schema = (
        "doc_id long, sample_rate int, n_channels int, n_samples long, "
        "sample_sum long, sample_min int, sample_max int"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                sr, ch, samples = wav_decode(bytes(p))
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": sr,
                        "n_channels": ch,
                        "n_samples": len(samples),
                        "sample_sum": sum(samples),
                        "sample_min": min(samples) if samples else None,
                        "sample_max": max(samples) if samples else None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=out_schema
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL PNG decode: luma plane (integer
    r+g+b — no divide, exact) → horizontal gradient sign bits packed into a
    56-bit long (8 rows × 7 adjacent-column comparisons) — the classic
    near-duplicate image fingerprint (dHash), computed from the stdlib PNG
    codec's reconstructed pixels.

    Output: one row per image (doc_id, dhash).  Downstream dedup groups by
    the hash (or bit-bands it for hamming tolerance, exactly like simhash).
    Narrow Arrow-batched per-row compute — the 100 TB plan is scan →
    mapInPandas → hash-keyed aggregate, no shuffle before the group-by.
    """
    import pandas as pd

    from stellar_etl_spark.functions.codecs import png_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, px = png_decode(bytes(p))
                a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
                luma = a.sum(axis=2, dtype=np.int64)
                # classic dHash fixes the grid BEFORE comparing: sample a
                # deterministic 8x8 nearest-neighbor grid of the luma plane
                # (identity when the input is already 8x8), so every image
                # size yields a valid 56-bit hash — without this, shifts of
                # h*(w-1)-1 >= 64 bits overflow int64 into garbage hashes
                grid = luma[
                    np.ix_((np.arange(8) * h) // 8, (np.arange(8) * w) // 8)
                ]
                bits = (grid[:, 1:] > grid[:, :-1]).astype(np.int64)
                weights = (
                    np.int64(1)
                    << (np.arange(8)[:, None] * 7 + np.arange(7))
                )
                rows.append(
                    {"doc_id": d, "dhash": int((bits * weights).sum())}
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema="doc_id long, dhash long"
    )


def audio_activity_stats(media: DataFrame) -> DataFrame:
    """Audio-curation activity features over REAL WAV decode: zero-crossing
    count (strict sign flips), silence-sample count (|s| below a fixed
    gate), and peak amplitude per clip — the cheap VAD-ish screens a speech
    pipeline runs before any model touches the audio.

    All-integer per-clip compute from the stdlib PCM16 reader; the oracle
    re-derives the samples arithmetically, so the decode must reproduce
    every sample exactly.
    """
    import pandas as pd

    from stellar_etl_spark.functions.codecs import wav_decode

    out_schema = (
        "doc_id long, n_samples long, zero_crossings long, "
        "n_silence long, peak int"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                _sr, _ch, samples = wav_decode(bytes(p))
                s = np.asarray(samples, dtype=np.int64)
                rows.append(
                    {
                        "doc_id": d,
                        "n_samples": len(s),
                        "zero_crossings": int(((s[:-1] * s[1:]) < 0).sum()),
                        "n_silence": int((np.abs(s) < 100).sum()),
                        "peak": int(np.abs(s).max()) if len(s) else None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=out_schema
    )


def media_byte_features(media: DataFrame) -> DataFrame:
    """Deterministic per-payload byte features via mapInPandas — the
    feature-extraction slot where a real model/codec would plug in.

    Features: n_bytes, first_byte, byte_sum (mod 2^31-1), checksum_md5.
    Arrow moves the binary column in batches; the loop is per-payload numpy,
    not per-byte Python.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        "doc_id long, n_bytes long, first_byte long, byte_sum long, "
        "checksum_md5 string"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(a) for a in arrs],
                    "first_byte": [int(a[0]) if len(a) else None for a in arrs],
                    "byte_sum": [
                        int(a.sum(dtype=np.int64)) % 2147483647 for a in arrs
                    ],
                    "checksum_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    # no fan_out_small here: the per-payload work is cheap relative to
    # Python-worker startup, so a small input is better served by one
    # Arrow stream than by spinning up defaultParallelism workers
    return media.select("doc_id", "payload").mapInPandas(extract, schema=out_schema)


def frame_sample(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, every_nth: int = 1
) -> DataFrame:
    """Fixed-size frame sampling over the payload: 1→N fan-out to
    (doc_id, frame_idx, frame_md5) keeping every ``every_nth`` frame.

    Pure column expressions: ``sequence`` + ``transform`` + ``posexplode`` —
    JVM-side, no UDF, partition-parallel at any corpus size.

    The fingerprint is md5 over the UPPERCASE-HEX rendering of the frame
    bytes, not the raw bytes: hex is a lossless, deterministic encoding,
    and it keeps the fingerprint expressible in engines whose md5 only
    accepts strings (DuckDB's md5 is VARCHAR-only — raw byte slices of
    unicode payloads are not valid VARCHARs there).  Byte-correct for ANY
    payload; no ASCII restriction.
    """
    n_frames = F.ceil(F.octet_length("payload") / F.lit(frame_bytes)).cast("int")
    # guard n_frames = 0: sequence(0, -1) DESCENDS ([0, -1]) and would emit
    # a phantom frame for an empty payload — 0 bytes is 0 frames
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    frames = F.transform(
        idx,
        lambda i: F.md5(
            F.hex(
                F.substring(
                    F.col("payload"), i * frame_bytes + 1, F.lit(frame_bytes)
                )
            )
        ),
    )
    return (
        media.select("doc_id", F.posexplode(frames).alias("frame_idx", "frame_md5"))
        .where((F.col("frame_idx") % every_nth) == 0)
    )


def resize_signal(
    media: DataFrame, target_len: int = 32
) -> DataFrame:
    """Nearest-neighbor resample of the payload byte signal to a fixed
    length — the deterministic stand-in for image resize (same mapInPandas
    slot; a real pipeline swaps the strided gather for cv2/PIL resize).
    Index map is the classic ``src = floor(i * n / target)``; output keeps
    the resampled md5 so downstream dedup can run on resized content.
    Narrow (no shuffle), Arrow-batched.

    Like :func:`frame_sample`, the fingerprint is md5 over the
    uppercase-hex rendering of the resized bytes (lossless; portable to
    VARCHAR-only md5 engines).  Byte-correct for any payload.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    out_schema = "doc_id long, n_bytes long, resized_len long, resized_md5 string"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_base = np.arange(target_len, dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8)
                n = len(a)
                if n == 0:
                    rows.append((doc_id, 0, 0, None))
                    continue
                res = a[idx_base * n // target_len]
                digest = hashlib.md5(
                    res.tobytes().hex().upper().encode("ascii")
                ).hexdigest()
                rows.append((doc_id, n, target_len, digest))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "resized_len", "resized_md5"]
            )

    return media.select("doc_id", "payload").mapInPandas(resize, schema=out_schema)


WAVEFORM_WINDOW = 256  # samples per analysis window


def waveform_window_stats(
    media: DataFrame, window: int = WAVEFORM_WINDOW
) -> DataFrame:
    """Audio-shaped analysis: interpret the payload as little-endian int16
    PCM and emit per-window RMS/peak/zero-crossing stats — the filter
    signals an audio curation pipeline runs before transcription (silence
    trimming, clipping detection).

    Arrow-batched ``mapInPandas`` with numpy vectorization inside — the
    1→N window fan-out happens Python-side because the window count depends
    on the byte length.  All arithmetic is integer/deterministic (RMS kept
    as the integer mean of squares; no float trancendentals), so results
    are engine- and partitioning-independent.  A real codec would replace
    the int16 reinterpretation; everything else is the production shape.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        "doc_id long, window_idx long, n_samples long, "
        "mean_square long, peak_abs long, zero_crossings long"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "window_idx", "n_samples",
                "mean_square", "peak_abs", "zero_crossings",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                usable = len(raw) - (len(raw) % 2)
                if usable == 0:
                    continue
                samples = np.frombuffer(raw[:usable], dtype="<i2").astype(np.int64)
                for w in range(0, len(samples), window):
                    seg = samples[w : w + window]
                    signs = np.sign(seg)
                    nz = signs != 0
                    crossings = int(np.sum(np.abs(np.diff(signs[nz])) == 2))
                    rows["doc_id"].append(doc_id)
                    rows["window_idx"].append(w // window)
                    rows["n_samples"].append(len(seg))
                    rows["mean_square"].append(int(np.sum(seg * seg)) // len(seg))
                    rows["peak_abs"].append(int(np.max(np.abs(seg))))
                    rows["zero_crossings"].append(crossings)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(stats, out_schema)
