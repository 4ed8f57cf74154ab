"""Rebuild wire-byte LedgerCloseMeta fixtures from the TRADES goldens.

The trades goldens (`/root/reference/testdata/trades/*.golden`, ledgers
28770265-75, cmd/export_trades_test.go) carry no raw XDR — only the
reference's output rows.  But every value a trade row exposes is a pure
function of the claim atoms in the op RESULT, the resting offer of a
manage-offer success, and the pre-change offer entry in the op META
(trade.go:21-162, 264-304).  So the golden rows themselves pin the exact
wire content those structures must have had:

- claim atom  = (selling_account, selling_offer_id, assets, amounts×1e7)
- result resting offer present ⇔ buying_offer_id is NOT TOID-typed
- meta pre-change offer price = (price_n, price_d) for the sold offer
- TOID ⇒ ledger seq / tx index / op index (filler txs+ops reproduce them)

This module re-encodes those structures into real LedgerCloseMeta V0 bytes
(every amount, account, asset, offer id and price is mainnet's own — only
the untraded envelope scaffolding is synthetic), giving the full
bronze → silver → transform_trade pipeline a golden-pinned end-to-end
fixture including the reverse price scan and the real-vs-synthetic
buying-offer-id branch.
"""

from __future__ import annotations

import json
import os
from decimal import Decimal

from golden_lcm import _closed_at_unix, golden_rows

TOID_BIT = 1 << 62


def _stroops(real: float) -> int:
    # golden floats are stroops/1e7 printed by Go %g — exact back-conversion
    # via decimal string, never binary-float multiply
    return int(Decimal(str(real)) * 10_000_000)


def _ed(strkey_addr: str) -> bytes:
    from stellar_etl_spark.functions.strkey import decode_strkey

    return decode_strkey(strkey_addr)[1]


def _asset(row: dict, side: str) -> dict:
    t = row[f"{side}_asset_type"]
    if t == "native":
        return {"type": "native"}
    return {
        "type": t,
        "code": row[f"{side}_asset_code"],
        "issuer": _ed(row[f"{side}_asset_issuer"]),
    }


def unique_golden_trades() -> dict[int, dict]:
    """history_operation_id → golden row (files overlap; rows are equal)."""
    out: dict[int, dict] = {}
    for row in golden_rows("trades"):
        out[int(row["history_operation_id"])] = row
    return out


def _filler_op() -> dict:
    return {"source": None, "type": 11, "body": {"bump_to": 1}}


def _filler_result() -> dict:
    return {"code": 0, "type": 11, "inner_code": 0}


def _trade_op(row: dict) -> dict:
    # manage_sell_offer scaffolding: the body is never read by the trade
    # transform (atoms/meta drive everything); type 3 gives the golden's
    # null seller_is_exact.  No op source → buyer falls back to tx source.
    return {
        "source": None,
        "type": 3,
        "body": {
            "selling": _asset(row, "buying"),
            "buying": _asset(row, "selling"),
            "amount": 1,
            "price": (1, 1),
            "offer_id": 0,
        },
    }


def _trade_result(row: dict) -> dict:
    atom = {
        "atom_type": "order_book",
        "seller_id": _ed(row["selling_account_address"]),
        "offer_id": int(row["selling_offer_id"]),
        "asset_sold": _asset(row, "selling"),
        "amount_sold": _stroops(row["selling_amount"]),
        "asset_bought": _asset(row, "buying"),
        "amount_bought": _stroops(row["buying_amount"]),
    }
    buying_id = int(row["buying_offer_id"])
    if buying_id & TOID_BIT:
        success = {"offers_claimed": [atom], "effect": 2, "offer": None}
    else:
        success = {
            "offers_claimed": [atom],
            "effect": 0,  # CREATED — carries the real resting offer
            "offer": {
                "seller_id": _ed(row["buying_account_address"]),
                "offer_id": buying_id,
                "selling": _asset(row, "buying"),
                "buying": _asset(row, "selling"),
                "amount": 1,
                "price": (1, 1),
                "flags": 0,
            },
        }
    return {"code": 0, "type": 3, "inner_code": 0, "success": success}


def _trade_changes(row: dict) -> list[dict]:
    """STATE(pre offer with the golden price) + REMOVED — the reverse price
    scan (trade.go:264-304) must find exactly this pre entry."""
    from stellar_etl_spark.sources import xdr_ledger as XL

    seller = _ed(row["selling_account_address"])
    offer_id = int(row["selling_offer_id"])
    pre_entry = {
        "last_modified_ledger": 1,
        "type": XL.ENTRY_OFFER,
        "data": {
            "seller_id": seller,
            "offer_id": offer_id,
            "selling": _asset(row, "selling"),
            "buying": _asset(row, "buying"),
            "amount": _stroops(row["selling_amount"]) + 7,
            "price": (int(row["price_n"]), int(row["price_d"])),
            "flags": 0,
        },
        "sponsoring_id": None,
        "has_ext_v1": False,
    }
    return [
        # decoy pre-change for a DIFFERENT offer — the scan must skip it
        {
            "change_type": XL.CHANGE_STATE,
            "entry": {
                **pre_entry,
                "data": {**pre_entry["data"], "offer_id": offer_id + 1,
                         "price": (999, 1)},
            },
        },
        {
            "change_type": XL.CHANGE_REMOVED,
            "key": {
                "type": XL.ENTRY_OFFER,
                "seller_id": seller,
                "offer_id": offer_id + 1,
            },
        },
        {"change_type": XL.CHANGE_STATE, "entry": pre_entry},
        {
            "change_type": XL.CHANGE_REMOVED,
            "key": {
                "type": XL.ENTRY_OFFER,
                "seller_id": seller,
                "offer_id": offer_id,
            },
        },
    ]


def assemble_trade_lcms() -> dict[int, bytes]:
    """ledger_sequence → LedgerCloseMeta V0 bytes whose trade content is
    pinned by the trades goldens (filler txs/ops reproduce the TOIDs)."""
    from stellar_etl_spark.sources.xdr import (
        LedgerHeader,
        encode_ledger_close_meta_v0,
        transaction_hash,
    )

    PUBLIC = "Public Global Stellar Network ; September 2015"

    by_ledger: dict[int, dict[int, list[tuple[int, dict]]]] = {}
    closed: dict[int, int] = {}
    for op_id, row in unique_golden_trades().items():
        seq = op_id >> 32
        txi = (op_id >> 12) & 0xFFFFF
        opi = (op_id & 0xFFF) - 1  # TOID stores op_index + 1
        by_ledger.setdefault(seq, {}).setdefault(txi, []).append((opi, row))
        closed[seq] = _closed_at_unix(row["ledger_closed_at"])

    out: dict[int, bytes] = {}
    for seq, txs in sorted(by_ledger.items()):
        envelopes, processing = [], []
        for txi in range(1, max(txs) + 1):
            trade_ops = dict(txs.get(txi, []))
            n_ops = (max(trade_ops) + 1) if trade_ops else 1
            ops, op_results, op_metas = [], [], []
            for oi in range(n_ops):
                if oi in trade_ops:
                    row = trade_ops[oi]
                    ops.append(_trade_op(row))
                    op_results.append(_trade_result(row))
                    op_metas.append({"changes": _trade_changes(row)})
                else:
                    ops.append(_filler_op())
                    op_results.append(_filler_result())
                    op_metas.append({"changes": []})
            source = (
                _ed(next(iter(trade_ops.values()))["buying_account_address"])
                if trade_ops
                else bytes([txi % 256]) * 32
            )
            env = {
                "type": "v0",
                "tx": {
                    "source": {"ed25519": source, "id": None},
                    "fee": 100 * n_ops,
                    "seq_num": (seq << 12) + txi,
                    "preconditions": {},
                    "memo": {"type": "none"},
                    "operations": ops,
                },
                "signatures": [],
            }
            envelopes.append(env)
            processing.append(
                {
                    "result": {
                        "transaction_hash": transaction_hash(env, PUBLIC),
                        "result": {
                            "fee_charged": 100 * n_ops,
                            "code": 0,
                            "op_results": op_results,
                        },
                    },
                    "fee_changes": [],
                    "meta": {
                        "version": 1,
                        "tx_changes_before": [],
                        "operations": op_metas,
                        "tx_changes_after": [],
                        "soroban": None,
                    },
                }
            )
        header = LedgerHeader(ledger_seq=seq, close_time=closed[seq])
        out[seq] = encode_ledger_close_meta_v0(
            header, envelopes, entry_hash=b"\x33" * 32, tx_processing=processing
        )
    return out


def write_trade_ledger_dir(path: str) -> dict[int, bytes]:
    os.makedirs(path, exist_ok=True)
    lcms = assemble_trade_lcms()
    for seq, raw in lcms.items():
        with open(os.path.join(path, f"{seq}.xdr"), "wb") as f:
            f.write(raw)
    return lcms
