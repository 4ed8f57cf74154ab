"""Token-transfer self-verification — the repo's twin of the reference's
``token_transfer.VerifyEvents`` double-check (token_transfer.go:15-25, which
delegates to stellar/go's processors/token_transfer verifier): re-derive the
net classic balance movement implied by the token-transfer EVENTS and
reconcile it against the balance deltas the ledger-entry CHANGE stream
records for the same ledger — two independent readings of the same meta.

Scope matches the classic surface the reference verifier checks:

- ``account`` entries → native XLM balances per G... holder;
- ``trustline`` entries → credit-asset balances per G... holder
  (pool-share trustlines excluded — no token-transfer event moves them).

Holders that are NOT classic accounts (SAC contract holders ``C...``,
liquidity pools ``L...``, claimable balances ``B...``) keep their balances in
contract_data / liquidity_pool / claimable_balance entries and are outside
this reconciliation; their event sides are skipped symmetrically.

Scale shape: two linear projections (one over events, one over changes), each
partial-aggregated map-side, meeting in ONE full-outer hash join keyed by
(ledger, holder, asset) — no windows, no driver state.  At 100 TB the join
keys are ledger-prefixed so AQE splits any hot ledger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.transforms.token_transfer import (
    EVENT_KINDS,
    canonical_asset_parts,
)


def _is_classic_account(c: Column) -> Column:
    return c.isNotNull() & c.startswith("G") & (F.length(c) == 56)


def _entry_asset(entry: Column) -> Column:
    """Canonical 'TYPE:CODE:ISSUER' for a trustline entry's asset — the same
    three-part concat the event stream carries (token_transfer.go:132-151)."""
    a = entry["asset"]
    typ = F.when(
        F.length(a["asset_code"]) > 4, F.lit("credit_alphanum12")
    ).otherwise(F.lit("credit_alphanum4"))
    return F.concat_ws(":", typ, a["asset_code"], a["asset_issuer"])


def verify_token_transfers(events: DataFrame, changes: DataFrame) -> DataFrame:
    """Reconcile derived token-transfer events against ledger-entry balance
    deltas; one row per (ledger_sequence, holder, asset) where EITHER side
    moved, with both sides and a ``matched`` flag.

    ``events`` is the CONTRACT_EVENTS_DDL-shaped stream (classic-derived
    union Soroban-decoded); ``changes`` is the CHANGES_DDL stream from
    ``decode_changes`` over the SAME ledgers.  A complete event derivation
    reconciles to zero mismatches — the assertion the reference runs inline
    on every ledger (and aborts the transform on failure); here it is an
    explicit audit DataFrame so pipelines can gate or sample it.

    Event-side ledger rules (EventsProcessor semantics):
      - transfer: ``from`` −amount, ``to`` +amount
      - mint:     ``to`` +amount (supply enters — the issuer holds no
        trustline in its own asset, so no debit side exists)
      - burn / clawback / fee: ``from`` −amount
    Fee events always count — fees are charged on failed transactions too,
    so the fee debit must stay even when tx_successful is false (the
    classic-derived stream stamps fee rows successful; the Soroban-decoded
    stream carries the real flag).  Op events count only for successful
    transactions whose invocation succeeded, the same
    ``tx_successful & in_successful_contract_call`` gate
    ``transform_token_transfer`` applies.

    Asset keys are canonicalized to the three-part 'TYPE:CODE:ISSUER'
    form via :func:`canonical_asset_parts` before grouping — Soroban SAC
    events carry the two-part SEP-41 'CODE:ISSUER' topic while the
    change side builds the three-part concat."""
    ev = events.where(
        F.col("sac_kind").isin(*EVENT_KINDS)
        & (
            (F.col("sac_kind") == "fee")
            | (
                F.col("tx_successful")
                & F.col("in_successful_contract_call")
            )
        )
    )
    ev_asset = canonical_asset_parts(F.col("sac_asset"))[0]
    debit = ev.where(
        (F.col("sac_kind") != "mint") & _is_classic_account(F.col("sac_from"))
    ).select(
        "ledger_sequence",
        F.col("sac_from").alias("holder"),
        ev_asset.alias("asset"),
        (-F.col("sac_amount")).alias("_d"),
    )
    credit = ev.where(
        F.col("sac_kind").isin("transfer", "mint")
        & _is_classic_account(F.col("sac_to"))
    ).select(
        "ledger_sequence",
        F.col("sac_to").alias("holder"),
        ev_asset.alias("asset"),
        F.col("sac_amount").alias("_d"),
    )
    event_net = (
        debit.unionByName(credit)
        .groupBy("ledger_sequence", "holder", "asset")
        .agg(F.sum("_d").alias("event_net"))
    )

    acct = changes.where(F.col("entry_type") == "account").select(
        "ledger_sequence",
        F.coalesce(F.col("post.account_id"), F.col("pre.account_id")).alias(
            "holder"
        ),
        F.lit("native").alias("asset"),
        (
            F.coalesce(F.col("post.balance"), F.lit(0))
            - F.coalesce(F.col("pre.balance"), F.lit(0))
        ).alias("_d"),
    )
    tl_entry = F.coalesce(F.col("post"), F.col("pre"))
    tl = changes.where(
        (F.col("entry_type") == "trustline")
        & tl_entry["pool_id"].isNull()  # pool shares move via LP ops only
    ).select(
        "ledger_sequence",
        F.coalesce(F.col("post.account_id"), F.col("pre.account_id")).alias(
            "holder"
        ),
        _entry_asset(tl_entry).alias("asset"),
        (
            F.coalesce(F.col("post.balance"), F.lit(0))
            - F.coalesce(F.col("pre.balance"), F.lit(0))
        ).alias("_d"),
    )
    balance_delta = (
        acct.unionByName(tl)
        .groupBy("ledger_sequence", "holder", "asset")
        .agg(F.sum("_d").alias("balance_delta"))
    )

    both = event_net.join(
        balance_delta, ["ledger_sequence", "holder", "asset"], "full_outer"
    ).select(
        "ledger_sequence",
        "holder",
        "asset",
        F.coalesce(F.col("event_net"), F.lit(0)).alias("event_net"),
        F.coalesce(F.col("balance_delta"), F.lit(0)).alias("balance_delta"),
    )
    # both-zero keys (sequence bumps, trustline auth flips, limit changes)
    # are legitimate no-movement changes — drop them so the audit table is
    # proportional to actual token movement, not to meta volume
    return both.where(
        (F.col("event_net") != 0) | (F.col("balance_delta") != 0)
    ).select(
        "*",
        (F.col("event_net") == F.col("balance_delta")).alias("matched"),
    )
