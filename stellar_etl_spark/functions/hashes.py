"""Bit-exact hash primitives: FarmHash Fingerprint64 and FNV-64a.

The reference derives asset ids via FarmHash ``Fingerprint64(code+issuer+type)``
cast to int64 (internal/transform/asset.go:72-77; native XLM is the constant
-5706705804583548011, internal/transform/operation.go:377-379), and orderbook
star-schema dim ids via FNV-64a (internal/transform/offer_normalized.go:
108-113,142-147,173-178).

FarmHash here is a pure-Python port of the public-domain farmhashna::Hash64
(github.com/google/farmhash, farmhash.cc) — no external package needed.  Both
are exposed as Arrow-vectorized pandas UDFs; they sit OFF the hot path (ids
are computed once per entity row, not per scan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MASK64 = (1 << 64) - 1

_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F

# farmhash.Fingerprint64("native") as int64 — reference hard-codes this
# (operation.go:377-379); used as a self-test vector in tests.
NATIVE_ASSET_ID = -5706705804583548011


def _rot(v: int, s: int) -> int:
    if s == 0:
        return v
    return ((v >> s) | (v << (64 - s))) & MASK64


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & MASK64


def _f64(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 8], "little")


def _f32(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 4], "little")


def _h16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & MASK64
    a ^= a >> 47
    b = ((v ^ a) * mul) & MASK64
    b ^= b >> 47
    return (b * mul) & MASK64


def _h0to16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + n * 2) & MASK64
        a = (_f64(s, 0) + _K2) & MASK64
        b = _f64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & MASK64
        d = ((_rot(a, 25) + b) * mul) & MASK64
        return _h16(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & MASK64
        a = _f32(s, 0)
        return _h16((n + (a << 3)) & MASK64, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * _K2 ^ z * _K0) & MASK64) * _K2) & MASK64
    return _K2


def _h17to32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & MASK64
    a = (_f64(s, 0) * _K1) & MASK64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & MASK64
    d = (_f64(s, n - 16) * _K2) & MASK64
    return _h16(
        (_rot((a + b) & MASK64, 43) + _rot(c, 30) + d) & MASK64,
        (a + _rot((b + _K2) & MASK64, 18) + c) & MASK64,
        mul,
    )


def _h33to64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & MASK64
    a = (_f64(s, 0) * _K2) & MASK64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & MASK64
    d = (_f64(s, n - 16) * _K2) & MASK64
    y = (_rot((a + b) & MASK64, 43) + _rot(c, 30) + d) & MASK64
    z = _h16(y, (a + _rot((b + _K2) & MASK64, 18) + c) & MASK64, mul)
    e = (_f64(s, 16) * mul) & MASK64
    f = _f64(s, 24)
    g = ((y + _f64(s, n - 32)) * mul) & MASK64
    h = ((z + _f64(s, n - 24)) * mul) & MASK64
    return _h16(
        (_rot((e + f) & MASK64, 43) + _rot(g, 30) + h) & MASK64,
        (e + _rot((f + a) & MASK64, 18) + g) & MASK64,
        mul,
    )


def _weak32(w: int, x: int, y: int, z: int, a: int, b: int) -> tuple[int, int]:
    a = (a + w) & MASK64
    b = _rot((b + a + z) & MASK64, 21)
    c = a
    a = (a + x + y) & MASK64
    b = (b + _rot(a, 44)) & MASK64
    return (a + z) & MASK64, (b + c) & MASK64


def _weak32_at(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    return _weak32(_f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24), a, b)


def farmhash_fingerprint64(data: bytes | str) -> int:
    """FarmHash Fingerprint64 (farmhashna::Hash64), returned as signed int64
    to match the reference's ``int64(hash)`` cast (asset.go:75-77)."""
    s = data.encode("utf-8") if isinstance(data, str) else data
    n = len(s)
    if n <= 16:
        u = _h0to16(s)
    elif n <= 32:
        u = _h17to32(s)
    elif n <= 64:
        u = _h33to64(s)
    else:
        u = _hash_long(s)
    return u - (1 << 64) if u >= (1 << 63) else u


def _hash_long(s: bytes) -> int:
    n = len(s)
    seed = 81
    x = seed
    y = (seed * _K1 + 113) & MASK64
    z = (_shift_mix((y * _K2 + 113) & MASK64) * _K2) & MASK64
    v = (0, 0)
    w = (0, 0)
    x = (x * _K2 + _f64(s, 0)) & MASK64

    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _f64(s, i + 8)) & MASK64, 37) * _K1) & MASK64
        y = (_rot((y + v[1] + _f64(s, i + 48)) & MASK64, 42) * _K1) & MASK64
        x ^= w[1]
        y = (y + v[0] + _f64(s, i + 40)) & MASK64
        z = (_rot((z + w[0]) & MASK64, 33) * _K1) & MASK64
        v = _weak32_at(s, i, (v[1] * _K1) & MASK64, (x + w[0]) & MASK64)
        w = _weak32_at(s, i + 32, (z + w[1]) & MASK64, (y + _f64(s, i + 16)) & MASK64)
        z, x = x, z
        i += 64
        if i == end:
            break
    # Tail over the LAST 64 bytes.  Unlike the loop, every multiply here
    # uses the data-dependent ``mul``, not k1 — verified bit-exactly against
    # Guava's FarmHashFingerprint64 (the same farmhashna::Hash64) and the
    # reference's real-mainnet asset-id goldens (tests/test_golden_parity.py).
    mul = (_K1 + ((z & 0xFF) << 1)) & MASK64
    i = last64
    w = ((w[0] + ((n - 1) & 63)) & MASK64, w[1])
    v = ((v[0] + w[0]) & MASK64, v[1])
    w = ((w[0] + v[0]) & MASK64, w[1])
    x = (_rot((x + y + v[0] + _f64(s, i + 8)) & MASK64, 37) * mul) & MASK64
    y = (_rot((y + v[1] + _f64(s, i + 48)) & MASK64, 42) * mul) & MASK64
    x ^= (w[1] * 9) & MASK64
    y = (y + v[0] * 9 + _f64(s, i + 40)) & MASK64
    z = (_rot((z + w[0]) & MASK64, 33) * mul) & MASK64
    v = _weak32_at(s, i, (v[1] * mul) & MASK64, (x + w[0]) & MASK64)
    w = _weak32_at(s, i + 32, (z + w[1]) & MASK64, (y + _f64(s, i + 16)) & MASK64)
    z, x = x, z
    return _h16(
        (_h16(v[0], w[0], mul) + _shift_mix(y) * _K0 + z) & MASK64,
        (_h16(v[1], w[1], mul) + x) & MASK64,
        mul,
    )


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def fnv64a(data: bytes | str) -> int:
    """FNV-1a 64-bit, signed int64 (offer_normalized.go:108-113)."""
    s = data.encode("utf-8") if isinstance(data, str) else data
    h = _FNV_OFFSET
    for byte in s:
        h = ((h ^ byte) * _FNV_PRIME) & MASK64
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(LongType())
def fnv64a_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: fnv64a(v) if v is not None else None)


@pandas_udf(LongType())
def fnv64a_offer_dim_udf(
    offer_id: pd.Series, amount: pd.Series, price: pd.Series
) -> pd.Series:
    """FNV-64a of Go's ``fmt.Sprintf("%d/%f/%f", id, amount, price)``
    (offer_normalized.go extractDimOffer).  The 6-dp %f MUST round the
    exact binary double (Go/C semantics, which Python shares) — Java's
    ``format_string`` rounds the shortest decimal repr HALF_UP instead and
    diverges on values like 135 stroops = 0.0000135 (exact-binary
    0.0000134999… → ``0.000013``, Java → ``0.000014``), hence the
    Python-side formatting."""
    return pd.Series(
        [
            None
            if i is None
            else fnv64a("%d/%f/%f" % (int(i), float(a), float(p)))
            for i, a, p in zip(offer_id, amount, price)
        ],
        dtype="object",
    )


def asset_id_series(code: pd.Series, issuer: pd.Series, asset_type: pd.Series) -> pd.Series:
    out = []
    for c, i, t in zip(code, issuer, asset_type):
        if t is None:
            out.append(None)
        else:
            out.append(farmhash_fingerprint64((c or "") + (i or "") + t))
    return pd.Series(out, dtype="object")


@pandas_udf(LongType())
def asset_id_udf(code: pd.Series, issuer: pd.Series, asset_type: pd.Series) -> pd.Series:
    """Asset id = farmhash64(code+issuer+type) (asset.go:72-77)."""
    return asset_id_series(code, issuer, asset_type)


def asset_id(code, issuer, asset_type) -> Column:
    return asset_id_udf(code, issuer, asset_type)
