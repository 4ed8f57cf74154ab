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
    """Rational price N/D → double (operation.go:409-421, offer.go:63-66)."""
    return _c(n).cast("double") / _c(d).cast("double")
