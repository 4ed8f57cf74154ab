"""Rebuild wire-byte LedgerCloseMeta fixtures from the CHANGES-family goldens.

Like tests/golden_trades.py, the change-export goldens
(`/root/reference/testdata/changes/*.golden` — pools, claimable balances,
config settings, contract code/data, ttl — plus the accounts / signers /
trustlines bucket-read goldens) carry no raw XDR, but every output value is
a pure projection of one LedgerEntry + change type
(cmd/export_ledger_entry_changes.go:116-259, internal/transform/
{liquidity_pool,claimable_balance,config_setting,contract_code,
contract_data,ttl,account,account_signer,trustline}.go).  So the golden
rows pin the exact entries the wire must have carried; this module
re-encodes them into real LedgerCloseMeta V0 bytes (one synthetic tx per
ledger whose op meta holds that ledger's entry changes — every id, amount,
asset, claimant predicate, wasm hash and bucket-window value is mainnet's
own) and the tests replay bronze → decode_changes → per-entity transforms
against the golden rows.

The offers bucket-read golden is NOT reconstructible: its asset columns
are FarmHash ids only (no code/issuer anywhere in the file), and the hash
is not invertible — documented skip.

ledger_entry_change wrapping: 0 created → CREATED(entry); 1 updated →
STATE(entry)+UPDATED(entry); 2 removed → STATE(entry)+REMOVED(key) (the
golden values come from PRE for removed rows, utils/main.go:836-845).
"""

from __future__ import annotations

import base64
import os
from decimal import Decimal

from golden_lcm import _closed_at_unix, golden_rows


def _stroops(real: float) -> int:
    return int(Decimal(str(real)) * 10_000_000)


def _ed(strkey_addr: str) -> bytes:
    from stellar_etl_spark.functions.strkey import decode_strkey

    return decode_strkey(strkey_addr)[1]


def _asset(row: dict, prefix: str) -> dict:
    t = row[f"{prefix}_type"]
    if t == "native":
        return {"type": "native"}
    return {
        "type": t,
        "code": row[f"{prefix}_code"],
        "issuer": _ed(row[f"{prefix}_issuer"]),
    }


def _pred_from_ref(j: dict) -> dict:
    """Inverse of silver.predicate_ref_json — reference JSON → decoded
    predicate dict (the wire content)."""
    if "unconditional" in j:
        return {"type": "unconditional"}
    if "and" in j:
        return {"type": "and", "preds": [_pred_from_ref(q) for q in j["and"]]}
    if "or" in j:
        return {"type": "or", "preds": [_pred_from_ref(q) for q in j["or"]]}
    if "not" in j:
        return {
            "type": "not",
            "pred": _pred_from_ref(j["not"]) if j["not"] else None,
        }
    if "abs_before_epoch" in j:
        return {
            "type": "before_absolute_time",
            "abs_before": int(j["abs_before_epoch"]),
        }
    if "rel_before" in j:
        return {
            "type": "before_relative_time",
            "rel_before": int(j["rel_before"]),
        }
    raise ValueError(f"unknown predicate JSON {j}")


# --------------------------------------------------------------------------
# per-entity golden row → (entry_type, entry data dict)
# --------------------------------------------------------------------------


def _pool_entry(r: dict) -> tuple[int, dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL

    return XL.ENTRY_POOL, {
        "pool_id": bytes.fromhex(r["liquidity_pool_id"]),
        "asset_a": _asset(r, "asset_a"),
        "asset_b": _asset(r, "asset_b"),
        "fee": r["fee"],
        "reserve_a": _stroops(r["asset_a_amount"]),
        "reserve_b": _stroops(r["asset_b_amount"]),
        "total_pool_shares": _stroops(r["pool_share_count"]),
        "pool_shares_trust_line_count": r["trustline_count"],
    }


def _cb_entry(r: dict) -> tuple[int, dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL

    return XL.ENTRY_CLAIMABLE, {
        # golden balance_id is the serialized ClaimableBalanceId hex:
        # 4-byte type-0 prefix + 32-byte hash
        "balance_id": bytes.fromhex(r["balance_id"][8:]),
        "claimants": [
            {
                "destination": _ed(c["destination"]),
                "predicate": _pred_from_ref(c["predicate"]),
            }
            for c in r["claimants"]
        ],
        "asset": _asset(r, "asset"),
        "amount": _stroops(r["asset_amount"]),
        "flags": r["flags"] if r.get("flags") else None,
    }


def _config_entry(r: dict) -> tuple[int, dict]:
    """All 14 union arms appear in the golden; fields the output schema
    doesn't carry (e.g. write_fee_1kb_bucket_list_low) default to Go zero
    values — the transform never reads them back, so parity holds on every
    field the golden pins."""
    from stellar_etl_spark.sources import xdr_ledger as XL

    cid = r["config_setting_id"]
    if cid in XL._CONFIG_ARMS:  # noqa: SLF001 — fixture builder
        data: dict = {"config_setting_id": cid}
        for f, t in XL._CONFIG_ARMS[cid]:  # noqa: SLF001
            v = r.get(f) or 0
            data[f] = bool(v) if t == "bool" else int(v)
        return XL.ENTRY_CONFIG, data
    if cid in (6, 7):
        key = (
            "contract_cost_params_cpu_insns"
            if cid == 6
            else "contract_cost_params_mem_bytes"
        )
        params = [
            {
                "const_term": int(p["ConstTerm"]),
                "linear_term": int(p["LinearTerm"]),
            }
            for p in r[key]
        ]
        return XL.ENTRY_CONFIG, {"config_setting_id": cid, key: params}
    if cid == 12:
        return XL.ENTRY_CONFIG, {
            "config_setting_id": 12,
            "bucket_list_size_window": [
                int(v) for v in r["bucket_list_size_window"]
            ],
        }
    raise ValueError(f"unsupported golden config arm {cid}")


def _code_entry(r: dict) -> tuple[int, dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL

    cost = None
    if r.get("contract_code_ext_v") == 1:
        cost = {
            f: r[f]
            for f in XL._COST_INPUT_FIELDS  # noqa: SLF001 — fixture builder
        }
    return XL.ENTRY_CONTRACT_CODE, {
        "hash": bytes.fromhex(r["contract_code_hash"]),
        "code": base64.b64decode(r.get("contract_code") or ""),
        "cost_inputs": cost,
    }


def _data_entry(r: dict) -> tuple[int, dict]:
    """contract_data_xdr is the FULL ContractDataEntry b64 — decode it
    directly; reconstruction is exact by construction."""
    from stellar_etl_spark.sources import xdr_ledger as XL
    from stellar_etl_spark.sources.xdr import Reader

    data = XL._read_contract_data_entry(  # noqa: SLF001 — fixture builder
        Reader(base64.b64decode(r["contract_data_xdr"]))
    )
    return XL.ENTRY_CONTRACT_DATA, data


def _ttl_entry(r: dict) -> tuple[int, dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL

    return XL.ENTRY_TTL, {
        "key_hash": bytes.fromhex(r["key_hash"]),
        "live_until_ledger_seq": r["live_until_ledger_seq"],
    }


def _account_entry(r: dict, signer_rows: list[dict]) -> tuple[int, dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL

    acct = r["account_id"]
    explicit = [s for s in signer_rows if s["signer"] != acct]
    has_liab = r.get("buying_liabilities") or r.get("selling_liabilities")
    sponsors = [
        _ed(s["sponsor"]) if s.get("sponsor") else None for s in explicit
    ]
    has_v2 = any(x is not None for x in sponsors)
    return XL.ENTRY_ACCOUNT, {
        "account_id": _ed(acct),
        "balance": r["balance"],
        "seq_num": r["sequence_number"],
        "num_subentries": r["num_subentries"],
        "inflation_dest": (
            _ed(r["inflation_destination"])
            if r.get("inflation_destination")
            else None
        ),
        "flags": r["flags"],
        "home_domain": r["home_domain"],
        "thresholds": [
            r["master_weight"], r["threshold_low"], r["threshold_medium"],
            r["threshold_high"],
        ],
        "signers": [
            {
                "key": {"type": 0, "key": _ed(s["signer"])},
                "weight": s["weight"],
            }
            for s in explicit
        ],
        "liabilities": (
            {
                "buying": r.get("buying_liabilities", 0),
                "selling": r.get("selling_liabilities", 0),
            }
            if has_liab or has_v2
            else None
        ),
        "num_sponsored": 0 if has_v2 else None,
        "num_sponsoring": 0 if has_v2 else None,
        "signer_sponsoring_ids": sponsors if has_v2 else None,
        "seq_ledger": None,
        "seq_time": None,
    }


def _trustline_entry(r: dict) -> tuple[int, dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL

    tmap = {0: "native", 1: "credit_alphanum4", 2: "credit_alphanum12"}
    asset = {
        "type": tmap[r["asset_type"]],
        "code": r["asset_code"],
        "issuer": _ed(r["asset_issuer"]),
    }
    has_liab = r.get("buying_liabilities") or r.get("selling_liabilities")
    return XL.ENTRY_TRUSTLINE, {
        "account_id": _ed(r["account_id"]),
        "asset": asset,
        "balance": r["balance"],
        "limit": r["trust_line_limit"],
        "flags": r["flags"],
        "liabilities": (
            {
                "buying": r.get("buying_liabilities", 0),
                "selling": r.get("selling_liabilities", 0),
            }
            if has_liab
            else None
        ),
        "liquidity_pool_use_count": None,
    }


# --------------------------------------------------------------------------
# LCM assembly
# --------------------------------------------------------------------------


def _changes_for(entry_type: int, data: dict, change_code: int,
                 last_modified: int, sponsor: str | None) -> list[dict]:
    from stellar_etl_spark.sources import xdr_ledger as XL
    from stellar_etl_spark.sources.silver import _entry_to_key

    entry = {
        "last_modified_ledger": last_modified,
        "type": entry_type,
        "data": data,
        "sponsoring_id": _ed(sponsor) if sponsor else None,
        "has_ext_v1": bool(sponsor),
    }
    if change_code == 0:
        return [{"change_type": XL.CHANGE_CREATED, "entry": entry}]
    if change_code == 1:
        return [
            {"change_type": XL.CHANGE_STATE, "entry": entry},
            {"change_type": XL.CHANGE_UPDATED, "entry": entry},
        ]
    return [
        {"change_type": XL.CHANGE_STATE, "entry": entry},
        {"change_type": XL.CHANGE_REMOVED, "key": _entry_to_key(entry)},
    ]


def collect_change_goldens() -> dict[str, list[dict]]:
    """entity → golden rows: one entry per changes/*.golden file (the six
    change-export entities) plus the bucket-read families."""
    import glob
    import json

    by_entity: dict[str, list[dict]] = {}
    for path in sorted(
        glob.glob("/root/reference/testdata/changes/*.golden")
    ):
        name = os.path.basename(path).replace(".golden", "")
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rows.append(json.loads(line))
        by_entity[name] = rows
    by_entity["accounts"] = golden_rows("accounts")
    by_entity["signers"] = golden_rows("signers")
    by_entity["trustlines"] = golden_rows("trustlines")
    return by_entity


def assemble_change_lcms() -> dict[int, bytes]:
    """ledger_sequence → LedgerCloseMeta V0 bytes carrying every golden
    change of that ledger in one synthetic tx's op meta."""
    from stellar_etl_spark.sources.xdr import (
        LedgerHeader,
        encode_ledger_close_meta_v0,
        transaction_hash,
    )

    PUBLIC = "Public Global Stellar Network ; September 2015"
    g = collect_change_goldens()

    # dedupe the bucket-read *_exact / *_off overlap (identical rows)
    def uniq(rows: list[dict], key) -> list[dict]:
        seen, out = set(), []
        for r in rows:
            k = key(r)
            if k not in seen:
                seen.add(k)
                out.append(r)
        return out

    accounts = uniq(g["accounts"], lambda r: r["account_id"])
    signers_by_acct: dict[str, list[dict]] = {}
    for s in uniq(
        g["signers"], lambda r: (r["account_id"], r["signer"])
    ):
        signers_by_acct.setdefault(s["account_id"], []).append(s)
    # the same trustline appears at two snapshot heights across the exact/
    # off bucket files — both are real states, keep one change per height
    trustlines = uniq(
        g["trustlines"],
        lambda r: (r["ledger_key"], r["last_modified_ledger"]),
    )

    # ledger → list of change dicts
    per_ledger: dict[int, list[dict]] = {}
    closed: dict[int, int] = {}

    def add(seq: int, closed_at: str | None, changes: list[dict]):
        per_ledger.setdefault(seq, []).extend(changes)
        if closed_at:
            closed[seq] = _closed_at_unix(closed_at)

    for name, build in (
        ("pools", _pool_entry),
        ("claimable_balances", _cb_entry),
        ("config_setting", _config_entry),
        ("contract_code", _code_entry),
        ("contract_data", _data_entry),
        ("ttl", _ttl_entry),
    ):
        for r in g[name]:
            t, data = build(r)
            add(
                r["ledger_sequence"],
                r.get("closed_at"),
                _changes_for(
                    t, data, r["ledger_entry_change"],
                    r["last_modified_ledger"], r.get("sponsor"),
                ),
            )

    for r in accounts:
        t, data = _account_entry(r, signers_by_acct.get(r["account_id"], []))
        add(
            r["last_modified_ledger"],
            None,
            _changes_for(t, data, 0, r["last_modified_ledger"], None),
        )
    for r in trustlines:
        t, data = _trustline_entry(r)
        add(
            r["last_modified_ledger"],
            None,
            _changes_for(t, data, 0, r["last_modified_ledger"], None),
        )

    out: dict[int, bytes] = {}
    for seq, changes in sorted(per_ledger.items()):
        env = {
            "type": "v0",
            "tx": {
                "source": {"ed25519": b"\x07" * 32, "id": None},
                "fee": 100,
                "seq_num": seq,
                "preconditions": {},
                "memo": {"type": "none"},
                "operations": [
                    {"source": None, "type": 11, "body": {"bump_to": 1}}
                ],
            },
            "signatures": [],
        }
        processing = [
            {
                "result": {
                    "transaction_hash": transaction_hash(env, PUBLIC),
                    "result": {
                        "fee_charged": 100,
                        "code": 0,
                        "op_results": [
                            {"code": 0, "type": 11, "inner_code": 0}
                        ],
                    },
                },
                "fee_changes": [],
                "meta": {
                    "version": 2,
                    "tx_changes_before": [],
                    "operations": [{"changes": changes}],
                    "tx_changes_after": [],
                    "soroban": None,
                },
            }
        ]
        header = LedgerHeader(
            ledger_seq=seq, close_time=closed.get(seq, 1_700_000_000)
        )
        out[seq] = encode_ledger_close_meta_v0(
            header, [env], entry_hash=b"\x44" * 32, tx_processing=processing
        )
    return out


def write_change_ledger_dir(path: str) -> dict[int, bytes]:
    os.makedirs(path, exist_ok=True)
    lcms = assemble_change_lcms()
    for seq, raw in lcms.items():
        with open(os.path.join(path, f"{seq}.xdr"), "wb") as f:
            f.write(raw)
    return lcms
