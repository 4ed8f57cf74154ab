"""Scalar column helpers mirroring the reference's utils (SURVEY.md §2.7).

All pure column expressions — JVM-side, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    # standard PySpark convention: str → column name, else literal
    if isinstance(x, Column):
        return x
    return F.col(x) if isinstance(x, str) else F.lit(x)


def stroops_to_real(col) -> Column:
    """stroops / 1e7 with an exact decimal intermediate
    (utils/main.go:84-87 uses big.Rat; Decimal(20,7) is the columnar twin)."""
    return (_c(col).cast("decimal(20,0)") / F.lit(10_000_000).cast("decimal(8,0)")).cast(
        "double"
    )


def timepoint_to_utc(col) -> Column:
    """Unix seconds → UTC timestamp (utils/main.go:40-46)."""
    return F.to_timestamp(F.from_unixtime(_c(col)))


def hash_to_hex(col) -> Column:
    """binary hash → lowercase hex (utils/main.go:33-37)."""
    return F.lower(F.hex(_c(col)))


def interval_string(lo, hi) -> Column:
    """Half-open interval rendering ``[lo,hi)``; hi==0 → unbounded ``[lo,)``
    (transaction.go:99-110)."""
    lo_c, hi_c = _c(lo), _c(hi)
    return F.when(
        hi_c.isNull() | (hi_c == 0), F.format_string("[%d,)", lo_c.cast("long"))
    ).otherwise(F.format_string("[%d,%d)", lo_c.cast("long"), hi_c.cast("long")))


def price_to_float(n, d) -> Column:
    """Rational price N/D → double by plain float division — the OFFERS
    state table's semantics (offer.go:63-66)."""
    return _c(n).cast("double") / _c(d).cast("double")


def price_rounded7(n, d) -> Column:
    """Operation-details price: ``ParseFloat(Price.String())`` — the
    rational rendered to 7 decimal places first (big.Rat FloatString:
    round half away from zero), then parsed back (addPriceDetails,
    operation.go:409-421).  0.7692300692... → 0.7692301, NOT the raw
    quotient.  Integer arithmetic end-to-end: r = ⌊(2·n·10⁷ + d) / 2d⌋
    computed via pmod so no double precision is lost above 2⁵³."""
    nl, dl = _c(n).cast("long"), _c(d).cast("long")
    x = nl * F.lit(20_000_000).cast("long") + dl
    y = dl * F.lit(2).cast("long")
    q = (x - F.pmod(x, y)).cast("decimal(38,0)") / y.cast("decimal(19,0)")
    return (
        q.cast("decimal(30,0)")
        / F.lit(10_000_000).cast("decimal(8,0)")
    ).cast("decimal(30,7)").cast("double")


_TWO_63 = 9223372036854775808  # 2^63
_TWO_64_DEC = "18446744073709551616"  # 2^64 as a decimal literal


def i128_to_string(hi, lo) -> Column:
    """Signed 128-bit integer from (hi, lo) 64-bit parts → decimal string
    (contract_data.go:366-378 assembles SAC balances this way; the reference
    keeps them as Go big.Int rendered to string, schema.go:519).

    value = hi * 2^64 + uint64(lo), computed in Decimal(38,0) — exact for
    the full i128 range of practical SAC amounts (|v| < 10^38)."""
    hi_d = _c(hi).cast("decimal(38,0)")
    lo_raw = _c(lo).cast("decimal(38,0)")
    # reinterpret lo's signed long as unsigned
    lo_u = F.when(_c(lo) < 0, lo_raw + F.lit(_TWO_64_DEC).cast("decimal(38,0)")).otherwise(
        lo_raw
    )
    return (hi_d * F.lit(_TWO_64_DEC).cast("decimal(38,0)") + lo_u).cast("string")
