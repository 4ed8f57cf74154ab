"""CAP-38 constant-product AMM arithmetic (reference: trade.go:350-399
delegating to stellar/go orderbook.CalculatePoolPayout).

The payout uses exact big-integer math — ``y = floor[(1-F)·Y·x / (X·10000 +
(10000-F)·x)]`` with everything upscaled to bips — and the rounding slippage
is the relative rounding loss in bips.  int64 products overflow, so this is
a vectorized Arrow pandas UDF over Python bigints; it only runs on LP atoms
of path-payment ops (a tiny fraction of trade rows), never the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MAX_I64 = (1 << 63) - 1
MIN_I64 = -(1 << 63)
_MAX_BIPS = 10_000


def _pool_payout_slippage(reserve_in: int, reserve_out: int, received: int,
                          fee_bips: int) -> int | None:
    """Rounding-slippage bips of the CAP-38 pool payout; None on the
    degenerate zero-denominator case (reference returns !ok → overflow
    sentinel chosen by the caller)."""
    if received > MAX_I64 - reserve_in:
        return None
    f = _MAX_BIPS - fee_bips
    denom = reserve_in * _MAX_BIPS + received * f
    if denom == 0:
        return None
    numer = reserve_out * received * f
    result, rem = divmod(numer, denom)
    if rem == 0 or result == 0:
        return 0
    # (unrounded - floor) / unrounded * 10000, rounded up:
    # = rem / numer * 10000 since unrounded = numer/denom, floor = result
    return -((-rem * _MAX_BIPS) // numer)


@pandas_udf(LongType())
def rounding_slippage_udf(
    op_type: pd.Series,
    amount_sold: pd.Series,
    amount_bought: pd.Series,
    reserve_sold: pd.Series,
    reserve_deposited: pd.Series,
    fee_bips: pd.Series,
) -> pd.Series:
    """Per-atom rounding slippage (trade.go:350-399): strict-receive (type 2)
    feeds the DISBURSED amount, strict-send (type 13) the DEPOSITED amount;
    overflow falls back to MaxInt64 / MinInt64 respectively (the reference's
    documented workarounds for stellar/go#4203)."""
    out = []
    for t, sold, bought, r_sold, r_dep, fee in zip(
        op_type, amount_sold, amount_bought, reserve_sold, reserve_deposited,
        fee_bips,
    ):
        if pd.isna(r_sold) or pd.isna(r_dep) or pd.isna(fee) or t not in (2, 13):
            out.append(None)
            continue
        amount = int(sold) if t == 2 else int(bought)
        bips = _pool_payout_slippage(int(r_dep), int(r_sold), amount, int(fee))
        if bips is None:
            bips = MAX_I64 if t == 2 else MIN_I64
        out.append(bips)
    return pd.Series(out, dtype="object")
