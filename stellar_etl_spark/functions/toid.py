"""TOID (total-order id) packing as pure column expressions.

Semantics from the reference's bit layout (internal/toid/main.go:60-171):
``id = ledger<<32 | tx<<12 | op`` — 32/20/12 bits.  Synthetic offer ids
(internal/toid/synt_offer_id.go:28-42) flag TOID-typed ids in bit 62.

Everything here is a JVM-side column expression (shiftleft / bitwise or) —
no UDFs, fully codegen-able, valid at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TX_MASK = (1 << 20) - 1  # ≤1_048_575 txs/ledger (toid/main.go:37-47)
OP_MASK = (1 << 12) - 1  # ≤4_095 ops/tx
LEDGER_MAX = (1 << 31) - 1  # int32 ledger (toid/main.go New() signature)
OFFER_TYPE_SHIFT = 62  # synt_offer_id.go: 2nd-highest bit


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def toid(ledger, tx=0, op=0) -> Column:
    """Pack (ledger, tx, op) into the 64-bit total-order id.

    The ledger input is domain-guarded to the reference's int32 (the id
    is a SIGNED 64-bit total order, so ledger bits live in 32..62 —
    toid/main.go New() takes int32): the reference gets this for free
    from Go's type system, but a Spark long outside [0, 2^31) would make
    ``shiftleft(_, 32)`` WRAP SILENTLY into the sign bit or beyond (Spark
    shifts discard overflow bits with no ANSI error — measured:
    shiftleft(2^61, 20) = 0 while DuckDB's ``<<`` raises), producing
    corrupt ids that collide with or mis-sort against real ones.  A
    garbage upstream id now fails loudly instead.  tx/op are masked,
    matching the reference.  A NULL ledger PROPAGATES NULL (unknown id,
    matching the oracle's NULL << 32) — only a present-but-out-of-domain
    value raises; assert_true treats a NULL condition as failure, so the
    NULL case must be explicitly allowed in the guard."""
    led = _c(ledger).cast("long")
    guard = F.assert_true(
        led.isNull() | ((led >= 0) & (led <= F.lit(LEDGER_MAX))),
        F.lit("TOID ledger sequence outside the int32 domain"),
    )
    led = F.when(guard.isNull(), led)
    return (
        F.shiftleft(led, 32)
        .bitwiseOR(F.shiftleft(_c(tx).cast("long").bitwiseAND(F.lit(TX_MASK)), 12))
        .bitwiseOR(_c(op).cast("long").bitwiseAND(F.lit(OP_MASK)))
    )


def toid_ledger(id_col) -> Column:
    return F.shiftright(_c(id_col).cast("long"), 32)


def toid_tx(id_col) -> Column:
    return F.shiftright(_c(id_col).cast("long"), 12).bitwiseAND(F.lit(TX_MASK))


def toid_op(id_col) -> Column:
    return _c(id_col).cast("long").bitwiseAND(F.lit(OP_MASK))


def encode_offer_id(id_col, toid_type: bool) -> Column:
    """synt_offer_id.go:28-35 — set bit 62 for TOID-typed synthetic ids."""
    raw = _c(id_col).cast("long")
    if not toid_type:
        return raw
    return raw.bitwiseOR(F.lit(1 << OFFER_TYPE_SHIFT))


def decode_offer_id(encoded) -> Column:
    """synt_offer_id.go:38-42 — strip the 2 type bits."""
    return _c(encoded).cast("long").bitwiseAND(F.lit((1 << OFFER_TYPE_SHIFT) - 1))


def decode_offer_id_type(encoded) -> Column:
    return F.shiftright(_c(encoded).cast("long"), OFFER_TYPE_SHIFT)
