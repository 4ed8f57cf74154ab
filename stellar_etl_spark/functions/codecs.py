"""Stdlib-only media codecs for the multimodal operators.

The container has no imaging/audio libraries, so the codec slot the
reference-pipeline pattern needs (decode → features inside mapInPandas)
is implemented directly from the public file-format specs with only
``zlib`` and ``struct``:

- PNG (RFC 2083): signature check, IHDR parse, IDAT concat + zlib
  inflate, per-scanline un-filtering (all five filter types 0-4:
  None/Sub/Up/Average/Paeth).  8-bit gray(a)/RGB(A) supported — the
  training-data cases.  The encoder emits any filter type, so the
  decoder's reconstruction loop is roundtrip-tested against every one.
- WAV (RIFF PCM): fmt/data chunk walk, 16-bit little-endian PCM.

These are real decoders over real bytes — the deterministic payload
GENERATORS for tests/queries live beside them so a closed-form SQL oracle
can re-derive the decoded aggregates without ever seeing the bytes.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Minimal but standard-conformant PNG writer (8-bit depth).

    ``pixels`` is row-major interleaved (len == width*height*channels).
    ``filter_type`` applies the same filter to every scanline — used to
    exercise each decoder reconstruction path.
    """
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        else:
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if filter_type == 1:
                    pred = a
                elif filter_type == 2:
                    pred = b
                elif filter_type == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                raw.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, row-major pixel bytes).

    Full five-filter reconstruction per the spec; 8-bit depth,
    non-interlaced, color types 0/2/4/6.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad IDAT length")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def wav_encode(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """16-bit PCM RIFF/WAVE writer (one fmt + one data chunk)."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """WAV bytes → (sample_rate, channels, int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = None
    pcm = b""
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, sample_rate = struct.unpack(
                "<HHI", payload[:8]
            )
            (bits,) = struct.unpack("<H", payload[14:16])
            if fmt_code != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif tag == b"data":
            pcm = payload
    if sample_rate is None:
        raise ValueError("missing fmt chunk")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return sample_rate, channels, samples


# ---------------------------------------------------------------------------
# Deterministic payload generators (test/query fixtures with closed-form
# SQL twins: pixel i of doc d is (3*d + i) % 251; sample i is
# ((7*d + i) % 2001) - 1000)
# ---------------------------------------------------------------------------

IMG_W, IMG_H, IMG_C = 8, 8, 3
N_SAMPLES, SAMPLE_RATE = 64, 8000


def synth_png(doc_id: int, filter_type: int = 0) -> bytes:
    n = IMG_W * IMG_H * IMG_C
    pixels = bytes((3 * doc_id + i) % 251 for i in range(n))
    return png_encode(IMG_W, IMG_H, pixels, IMG_C, filter_type)


def synth_wav(doc_id: int) -> bytes:
    samples = [((7 * doc_id + i) % 2001) - 1000 for i in range(N_SAMPLES)]
    return wav_encode(SAMPLE_RATE, samples)
