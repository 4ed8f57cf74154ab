"""Ledger-entry / result / meta XDR surface (RFC 4506, public Stellar
protocol definitions: Stellar-ledger-entries.x, Stellar-ledger.x,
Stellar-transaction.x, Stellar-contract.x).

Extends sources/xdr.py (header + envelopes) with the remaining wire
structures the reference's semantic core consumes:

- ``SCVal`` — the recursive Soroban value union (contract data, events).
- ``LedgerKey`` / ``LedgerEntry`` — all ten entry types incl. account
  extensions v1-v3, trustline pool shares, contract data/code, TTLs.
- ``LedgerEntryChanges`` — created/updated/removed/state/restored.
- ``TransactionResult`` — fee, result-code tree, per-op results with claim
  atoms and offer entries (the trades input), fee-bump inner results.
- ``TransactionMeta`` V0-V3 with Soroban meta (contract events, fee ext).

Every decoder has a mirroring encoder; the test-of-record is byte-exact
decode→encode roundtrips over the REAL mainnet blobs embedded in the
reference's golden files (tx_result / tx_meta / tx_fee_meta base64), plus
synthetic roundtrips for arms mainnet data doesn't exercise.

Unknown union arms raise ``XdrError`` — XDR cannot skip unknown content,
and a silent misparse would corrupt everything after it.
"""

from __future__ import annotations

from stellar_etl_spark.sources.xdr import (
    Reader,
    Writer,
    XdrError,
    read_account_id,
    read_asset,
    read_claimable_balance_id,
    read_claimant,
    read_muxed_account,
    read_price,
    write_account_id,
    write_asset,
    write_claimant,
    write_muxed_account,
)

# ---------------------------------------------------------------------------
# SignerKey (Stellar-types.x)
# ---------------------------------------------------------------------------


def read_signer_key(r: Reader) -> dict:
    t = r.u32()
    if t in (0, 1, 2):
        return {"type": t, "key": r.opaque(32)}
    if t == 3:  # ed25519 signed payload
        return {"type": 3, "key": r.opaque(32), "payload": r.var_opaque(64)}
    raise XdrError(f"bad SignerKey type {t}")


def write_signer_key(w: Writer, s: dict):
    w.u32(s["type"]).opaque(s["key"])
    if s["type"] == 3:
        w.var_opaque(s["payload"])


# ---------------------------------------------------------------------------
# SCVal (Stellar-contract.x)
# ---------------------------------------------------------------------------


def read_sc_address(r: Reader) -> dict:
    t = r.u32()
    if t == 0:
        return {"type": "account", "account_id": read_account_id(r)}
    if t == 1:
        return {"type": "contract", "contract_id": r.opaque(32)}
    if t == 2:  # muxed account (protocol 23)
        return {"type": "muxed_account", "id": r.u64(), "ed25519": r.opaque(32)}
    if t == 3:
        return {"type": "claimable_balance", "balance_id": read_claimable_balance_id(r)}
    if t == 4:
        return {"type": "liquidity_pool", "pool_id": r.opaque(32)}
    raise XdrError(f"bad SCAddress type {t}")


def write_sc_address(w: Writer, a: dict):
    t = a["type"]
    if t == "account":
        w.u32(0)
        write_account_id(w, a["account_id"])
    elif t == "contract":
        w.u32(1).opaque(a["contract_id"])
    elif t == "muxed_account":
        w.u32(2).u64(a["id"]).opaque(a["ed25519"])
    elif t == "claimable_balance":
        w.u32(3).u32(0).opaque(a["balance_id"])
    elif t == "liquidity_pool":
        w.u32(4).opaque(a["pool_id"])
    else:
        raise XdrError(f"bad SCAddress type {t}")


# Nesting bound for the recursive SCVal union — the reference's generated
# Go XDR enforces a decode depth limit too; without one, a crafted ~12-byte-
# per-level vec chain turns into a Python RecursionError instead of a clean
# XdrError.  64 is far beyond any real SCVal (a handful of levels) while
# keeping the worst-case Python stack (~5 frames/level, plus the auth-
# invocation tree that can wrap SCVals) well under the interpreter limit.
SC_VAL_MAX_DEPTH = 64


def read_sc_val(r: Reader, _depth: int = 0) -> dict:
    if _depth > SC_VAL_MAX_DEPTH:
        raise XdrError(f"SCVal nesting exceeds {SC_VAL_MAX_DEPTH}")
    t = r.u32()
    if t == 0:
        return {"bool": r.bool()}
    if t == 1:
        return {"void": None}
    if t == 2:  # SCError
        et = r.i32()
        if et == 0:  # SCE_CONTRACT
            return {"error": {"type": et, "contract_code": r.u32()}}
        return {"error": {"type": et, "code": r.i32()}}
    if t == 3:
        return {"u32": r.u32()}
    if t == 4:
        return {"i32": r.i32()}
    if t == 5:
        return {"u64": r.u64()}
    if t == 6:
        return {"i64": r.i64()}
    if t == 7:
        return {"timepoint": r.u64()}
    if t == 8:
        return {"duration": r.u64()}
    if t == 9:
        return {"u128": {"hi": r.u64(), "lo": r.u64()}}
    if t == 10:
        return {"i128": {"hi": r.i64(), "lo": r.u64()}}
    if t == 11:
        return {"u256": [r.u64() for _ in range(4)]}
    if t == 12:
        return {"i256": [r.u64() for _ in range(4)]}
    if t == 13:
        return {"bytes": r.var_opaque()}
    if t == 14:
        return {"string": r.var_opaque()}
    if t == 15:
        return {"symbol": r.string(32)}
    if t == 16:
        return {
            "vec": r.optional(
                lambda: r.array(lambda: read_sc_val(r, _depth + 1))
            )
        }
    if t == 17:
        return {
            "map": r.optional(
                lambda: r.array(
                    lambda: {
                        "key": read_sc_val(r, _depth + 1),
                        "val": read_sc_val(r, _depth + 1),
                    }
                )
            )
        }
    if t == 18:
        return {"address": read_sc_address(r)}
    if t == 19:
        ex = r.u32()
        if ex == 0:  # WASM
            executable = {"wasm_hash": r.opaque(32)}
        elif ex == 1:  # STELLAR_ASSET
            executable = {"stellar_asset": None}
        else:
            raise XdrError(f"bad ContractExecutable {ex}")
        storage = r.optional(
            lambda: r.array(
                lambda: {
                    "key": read_sc_val(r, _depth + 1),
                    "val": read_sc_val(r, _depth + 1),
                }
            )
        )
        return {"instance": {"executable": executable, "storage": storage}}
    if t == 20:
        return {"ledger_key_contract_instance": None}
    if t == 21:
        return {"ledger_key_nonce": r.i64()}
    raise XdrError(f"bad SCVal type {t}")


def write_sc_val(w: Writer, v: dict):
    (k, x) = next(iter(v.items()))
    if k == "bool":
        w.u32(0).bool(x)
    elif k == "void":
        w.u32(1)
    elif k == "error":
        w.u32(2).i32(x["type"])
        if x["type"] == 0:
            w.u32(x["contract_code"])
        else:
            w.i32(x["code"])
    elif k == "u32":
        w.u32(3).u32(x)
    elif k == "i32":
        w.u32(4).i32(x)
    elif k == "u64":
        w.u32(5).u64(x)
    elif k == "i64":
        w.u32(6).i64(x)
    elif k == "timepoint":
        w.u32(7).u64(x)
    elif k == "duration":
        w.u32(8).u64(x)
    elif k == "u128":
        w.u32(9).u64(x["hi"]).u64(x["lo"])
    elif k == "i128":
        w.u32(10).i64(x["hi"]).u64(x["lo"])
    elif k == "u256":
        w.u32(11)
        for part in x:
            w.u64(part)
    elif k == "i256":
        w.u32(12)
        for part in x:
            w.u64(part)
    elif k == "bytes":
        w.u32(13).var_opaque(x)
    elif k == "string":
        w.u32(14).var_opaque(x)
    elif k == "symbol":
        w.u32(15).string(x)
    elif k == "vec":
        w.u32(16)
        if x is None:
            w.bool(False)
        else:
            w.bool(True).u32(len(x))
            for e in x:
                write_sc_val(w, e)
    elif k == "map":
        w.u32(17)
        if x is None:
            w.bool(False)
        else:
            w.bool(True).u32(len(x))
            for e in x:
                write_sc_val(w, e["key"])
                write_sc_val(w, e["val"])
    elif k == "address":
        w.u32(18)
        write_sc_address(w, x)
    elif k == "instance":
        w.u32(19)
        ex = x["executable"]
        if "wasm_hash" in ex:
            w.u32(0).opaque(ex["wasm_hash"])
        else:
            w.u32(1)
        if x["storage"] is None:
            w.bool(False)
        else:
            w.bool(True).u32(len(x["storage"]))
            for e in x["storage"]:
                write_sc_val(w, e["key"])
                write_sc_val(w, e["val"])
    elif k == "ledger_key_contract_instance":
        w.u32(20)
    elif k == "ledger_key_nonce":
        w.u32(21).i64(x)
    else:
        raise XdrError(f"bad SCVal kind {k}")


# ---------------------------------------------------------------------------
# LedgerKey / LedgerEntry (Stellar-ledger-entries.x)
# ---------------------------------------------------------------------------

ENTRY_ACCOUNT, ENTRY_TRUSTLINE, ENTRY_OFFER, ENTRY_DATA = 0, 1, 2, 3
ENTRY_CLAIMABLE, ENTRY_POOL, ENTRY_CONTRACT_DATA = 4, 5, 6
ENTRY_CONTRACT_CODE, ENTRY_CONFIG, ENTRY_TTL = 7, 8, 9

ENTRY_TYPE_NAMES = {
    ENTRY_ACCOUNT: "account",
    ENTRY_TRUSTLINE: "trustline",
    ENTRY_OFFER: "offer",
    ENTRY_DATA: "data",
    ENTRY_CLAIMABLE: "claimable_balance",
    ENTRY_POOL: "liquidity_pool",
    ENTRY_CONTRACT_DATA: "contract_data",
    ENTRY_CONTRACT_CODE: "contract_code",
    ENTRY_CONFIG: "config_setting",
    ENTRY_TTL: "ttl",
}


def read_trustline_asset(r: Reader) -> dict:
    tag = r.u32()
    if tag == 3:  # pool share
        return {"type": "pool_share", "pool_id": r.opaque(32)}
    r.pos -= 4
    return read_asset(r)


def write_trustline_asset(w: Writer, a: dict):
    if a.get("type") == "pool_share":
        w.u32(3).opaque(a["pool_id"])
    else:
        write_asset(w, a)


def read_ledger_key(r: Reader) -> dict:
    t = r.u32()
    if t == ENTRY_ACCOUNT:
        body = {"account_id": read_account_id(r)}
    elif t == ENTRY_TRUSTLINE:
        body = {"account_id": read_account_id(r), "asset": read_trustline_asset(r)}
    elif t == ENTRY_OFFER:
        body = {"seller_id": read_account_id(r), "offer_id": r.i64()}
    elif t == ENTRY_DATA:
        body = {"account_id": read_account_id(r), "data_name": r.string(64)}
    elif t == ENTRY_CLAIMABLE:
        body = {"balance_id": read_claimable_balance_id(r)}
    elif t == ENTRY_POOL:
        body = {"pool_id": r.opaque(32)}
    elif t == ENTRY_CONTRACT_DATA:
        body = {
            "contract": read_sc_address(r),
            "key": read_sc_val(r),
            "durability": r.i32(),
        }
    elif t == ENTRY_CONTRACT_CODE:
        body = {"hash": r.opaque(32)}
    elif t == ENTRY_CONFIG:
        body = {"config_setting_id": r.i32()}
    elif t == ENTRY_TTL:
        body = {"key_hash": r.opaque(32)}
    else:
        raise XdrError(f"bad LedgerKey type {t}")
    return {"type": t, **body}


def write_ledger_key(w: Writer, k: dict):
    t = k["type"]
    w.u32(t)
    if t == ENTRY_ACCOUNT:
        write_account_id(w, k["account_id"])
    elif t == ENTRY_TRUSTLINE:
        write_account_id(w, k["account_id"])
        write_trustline_asset(w, k["asset"])
    elif t == ENTRY_OFFER:
        write_account_id(w, k["seller_id"])
        w.i64(k["offer_id"])
    elif t == ENTRY_DATA:
        write_account_id(w, k["account_id"])
        w.string(k["data_name"])
    elif t == ENTRY_CLAIMABLE:
        w.u32(0).opaque(k["balance_id"])
    elif t == ENTRY_POOL:
        w.opaque(k["pool_id"])
    elif t == ENTRY_CONTRACT_DATA:
        write_sc_address(w, k["contract"])
        write_sc_val(w, k["key"])
        w.i32(k["durability"])
    elif t == ENTRY_CONTRACT_CODE:
        w.opaque(k["hash"])
    elif t == ENTRY_CONFIG:
        w.i32(k["config_setting_id"])
    elif t == ENTRY_TTL:
        w.opaque(k["key_hash"])
    else:
        raise XdrError(f"bad LedgerKey type {t}")


def _read_liabilities(r: Reader) -> dict:
    return {"buying": r.i64(), "selling": r.i64()}


def _read_account_entry(r: Reader) -> dict:
    e = {
        "account_id": read_account_id(r),
        "balance": r.i64(),
        "seq_num": r.i64(),
        "num_subentries": r.u32(),
        "inflation_dest": r.optional(lambda: read_account_id(r)),
        "flags": r.u32(),
        "home_domain": r.string(32),
        "thresholds": list(r.opaque(4)),
        "signers": r.array(
            lambda: {"key": read_signer_key(r), "weight": r.u32()}, 20
        ),
        "liabilities": None,
        "num_sponsored": None,
        "num_sponsoring": None,
        "signer_sponsoring_ids": None,
        "seq_ledger": None,
        "seq_time": None,
    }
    ext = r.u32()
    if ext == 0:
        return e
    if ext != 1:
        raise XdrError(f"bad AccountEntry ext {ext}")
    e["liabilities"] = _read_liabilities(r)
    ext2 = r.u32()
    if ext2 == 0:
        return e
    if ext2 != 2:
        raise XdrError(f"bad AccountEntryV1 ext {ext2}")
    e["num_sponsored"] = r.u32()
    e["num_sponsoring"] = r.u32()
    e["signer_sponsoring_ids"] = r.array(
        lambda: r.optional(lambda: read_account_id(r)), 20
    )
    ext3 = r.u32()
    if ext3 == 0:
        return e
    if ext3 != 3:
        raise XdrError(f"bad AccountEntryV2 ext {ext3}")
    ep = r.u32()
    if ep != 0:
        raise XdrError(f"bad ExtensionPoint {ep}")
    e["seq_ledger"] = r.u32()
    e["seq_time"] = r.u64()
    return e


def _write_account_entry(w: Writer, e: dict):
    write_account_id(w, e["account_id"])
    w.i64(e["balance"]).i64(e["seq_num"]).u32(e["num_subentries"])
    w.optional(e["inflation_dest"], lambda a: write_account_id(w, a))
    w.u32(e["flags"]).string(e["home_domain"])
    w.opaque(bytes(e["thresholds"]))
    w.u32(len(e["signers"]))
    for s in e["signers"]:
        write_signer_key(w, s["key"])
        w.u32(s["weight"])
    if e["liabilities"] is None:
        w.u32(0)
        return
    w.u32(1)
    w.i64(e["liabilities"]["buying"]).i64(e["liabilities"]["selling"])
    if e["num_sponsored"] is None:
        w.u32(0)
        return
    w.u32(2)
    w.u32(e["num_sponsored"]).u32(e["num_sponsoring"])
    w.u32(len(e["signer_sponsoring_ids"]))
    for sid in e["signer_sponsoring_ids"]:
        w.optional(sid, lambda a: write_account_id(w, a))
    if e["seq_ledger"] is None:
        w.u32(0)
        return
    w.u32(3).u32(0)
    w.u32(e["seq_ledger"]).u64(e["seq_time"])


def _read_trustline_entry(r: Reader) -> dict:
    e = {
        "account_id": read_account_id(r),
        "asset": read_trustline_asset(r),
        "balance": r.i64(),
        "limit": r.i64(),
        "flags": r.u32(),
        "liabilities": None,
        "liquidity_pool_use_count": None,
    }
    ext = r.u32()
    if ext == 0:
        return e
    if ext != 1:
        raise XdrError(f"bad TrustLineEntry ext {ext}")
    e["liabilities"] = _read_liabilities(r)
    ext2 = r.u32()
    if ext2 == 0:
        return e
    if ext2 != 2:
        raise XdrError(f"bad TrustLineEntryV1 ext {ext2}")
    e["liquidity_pool_use_count"] = r.i32()
    ext3 = r.u32()
    if ext3 != 0:
        raise XdrError(f"bad TrustLineEntryV2 ext {ext3}")
    return e


def _write_trustline_entry(w: Writer, e: dict):
    write_account_id(w, e["account_id"])
    write_trustline_asset(w, e["asset"])
    w.i64(e["balance"]).i64(e["limit"]).u32(e["flags"])
    if e["liabilities"] is None:
        w.u32(0)
        return
    w.u32(1)
    w.i64(e["liabilities"]["buying"]).i64(e["liabilities"]["selling"])
    if e["liquidity_pool_use_count"] is None:
        w.u32(0)
        return
    w.u32(2).i32(e["liquidity_pool_use_count"]).u32(0)


def read_offer_entry(r: Reader) -> dict:
    e = {
        "seller_id": read_account_id(r),
        "offer_id": r.i64(),
        "selling": read_asset(r),
        "buying": read_asset(r),
        "amount": r.i64(),
        "price": read_price(r),
        "flags": r.u32(),
    }
    ext = r.u32()
    if ext != 0:
        raise XdrError(f"bad OfferEntry ext {ext}")
    return e


def write_offer_entry(w: Writer, e: dict):
    write_account_id(w, e["seller_id"])
    w.i64(e["offer_id"])
    write_asset(w, e["selling"])
    write_asset(w, e["buying"])
    w.i64(e["amount"])
    w.i32(e["price"][0]).i32(e["price"][1])
    w.u32(e["flags"]).u32(0)


def _read_claimable_entry(r: Reader) -> dict:
    e = {
        "balance_id": read_claimable_balance_id(r),
        "claimants": r.array(lambda: read_claimant(r), 10),
        "asset": read_asset(r),
        "amount": r.i64(),
        "flags": None,
    }
    ext = r.u32()
    if ext == 0:
        return e
    if ext != 1:
        raise XdrError(f"bad ClaimableBalanceEntry ext {ext}")
    e["flags"] = r.u32()
    ext2 = r.u32()
    if ext2 != 0:
        raise XdrError(f"bad ClaimableBalanceEntryV1 ext {ext2}")
    return e


def _write_claimable_entry(w: Writer, e: dict):
    w.u32(0).opaque(e["balance_id"])
    w.u32(len(e["claimants"]))
    for c in e["claimants"]:
        write_claimant(w, c)
    write_asset(w, e["asset"])
    w.i64(e["amount"])
    if e["flags"] is None:
        w.u32(0)
    else:
        w.u32(1).u32(e["flags"]).u32(0)


def _read_pool_entry(r: Reader) -> dict:
    pool_id = r.opaque(32)
    body_t = r.u32()
    if body_t != 0:
        raise XdrError(f"bad LiquidityPoolType {body_t}")
    return {
        "pool_id": pool_id,
        "asset_a": read_asset(r),
        "asset_b": read_asset(r),
        "fee": r.i32(),
        "reserve_a": r.i64(),
        "reserve_b": r.i64(),
        "total_pool_shares": r.i64(),
        "pool_shares_trust_line_count": r.i64(),
    }


def _write_pool_entry(w: Writer, e: dict):
    w.opaque(e["pool_id"]).u32(0)
    write_asset(w, e["asset_a"])
    write_asset(w, e["asset_b"])
    w.i32(e["fee"])
    w.i64(e["reserve_a"]).i64(e["reserve_b"])
    w.i64(e["total_pool_shares"]).i64(e["pool_shares_trust_line_count"])


def _read_contract_data_entry(r: Reader) -> dict:
    ep = r.u32()
    if ep != 0:
        raise XdrError(f"bad ExtensionPoint {ep}")
    return {
        "contract": read_sc_address(r),
        "key": read_sc_val(r),
        "durability": r.i32(),
        "val": read_sc_val(r),
    }


def _write_contract_data_entry(w: Writer, e: dict):
    w.u32(0)
    write_sc_address(w, e["contract"])
    write_sc_val(w, e["key"])
    w.i32(e["durability"])
    write_sc_val(w, e["val"])


_COST_INPUT_FIELDS = (
    "n_instructions n_functions n_globals n_table_entries n_types "
    "n_data_segments n_elem_segments n_imports n_exports n_data_segment_bytes"
).split()


def _read_contract_code_entry(r: Reader) -> dict:
    ext = r.u32()
    cost = None
    if ext == 1:
        ep = r.u32()
        if ep != 0:
            raise XdrError(f"bad ExtensionPoint {ep}")
        cost = {f: r.u32() for f in _COST_INPUT_FIELDS}
    elif ext != 0:
        raise XdrError(f"bad ContractCodeEntry ext {ext}")
    return {"hash": r.opaque(32), "code": r.var_opaque(), "cost_inputs": cost}


def _write_contract_code_entry(w: Writer, e: dict):
    if e["cost_inputs"] is None:
        w.u32(0)
    else:
        w.u32(1).u32(0)
        for f in _COST_INPUT_FIELDS:
            w.u32(e["cost_inputs"][f])
    w.opaque(e["hash"]).var_opaque(e["code"])


# ConfigSettingEntry union arms (Stellar-contract-config-setting.x) as
# (field, xdr-type) sequences — positional, so read/write share the spec.
_CONFIG_ARMS: dict[int, list[tuple[str, str]]] = {
    0: [("contract_max_size_bytes", "u32")],
    1: [  # compute v0
        ("ledger_max_instructions", "i64"),
        ("tx_max_instructions", "i64"),
        ("fee_rate_per_instructions_increment", "i64"),
        ("tx_memory_limit", "u32"),
    ],
    2: [  # ledger cost v0
        ("ledger_max_read_ledger_entries", "u32"),
        ("ledger_max_read_bytes", "u32"),
        ("ledger_max_write_ledger_entries", "u32"),
        ("ledger_max_write_bytes", "u32"),
        ("tx_max_read_ledger_entries", "u32"),
        ("tx_max_read_bytes", "u32"),
        ("tx_max_write_ledger_entries", "u32"),
        ("tx_max_write_bytes", "u32"),
        ("fee_read_ledger_entry", "i64"),
        ("fee_write_ledger_entry", "i64"),
        ("fee_read_1kb", "i64"),
        ("bucket_list_target_size_bytes", "i64"),
        ("write_fee_1kb_bucket_list_low", "i64"),
        ("write_fee_1kb_bucket_list_high", "i64"),
        ("bucket_list_write_fee_growth_factor", "u32"),
    ],
    3: [("fee_historical_1kb", "i64")],
    4: [  # events v0
        ("tx_max_contract_events_size_bytes", "u32"),
        ("fee_contract_events_1kb", "i64"),
    ],
    5: [  # bandwidth v0
        ("ledger_max_txs_size_bytes", "u32"),
        ("tx_max_size_bytes", "u32"),
        ("fee_tx_size_1kb", "i64"),
    ],
    8: [("contract_data_key_size_bytes", "u32")],
    9: [("contract_data_entry_size_bytes", "u32")],
    10: [  # state archival
        ("max_entry_ttl", "u32"),
        ("min_temporary_ttl", "u32"),
        ("min_persistent_ttl", "u32"),
        ("persistent_rent_rate_denominator", "i64"),
        ("temp_rent_rate_denominator", "i64"),
        ("max_entries_to_archive", "u32"),
        ("bucket_list_size_window_sample_size", "u32"),
        ("bucket_list_window_sample_period", "u32"),
        ("eviction_scan_size", "u32"),
        ("starting_eviction_scan_level", "u32"),
    ],
    11: [("ledger_max_tx_count", "u32")],
    13: [  # eviction iterator
        ("bucket_list_level", "u32"),
        ("is_curr_bucket", "bool"),
        ("bucket_file_offset", "u64"),
    ],
}


def _read_cost_params(r: Reader) -> list[dict]:
    def one():
        ep = r.u32()
        if ep != 0:
            raise XdrError(f"bad ExtensionPoint {ep}")
        return {"const_term": r.i64(), "linear_term": r.i64()}

    return r.array(one)


def _read_config_entry(r: Reader) -> dict:
    cid = r.i32()
    if cid in _CONFIG_ARMS:
        out = {"config_setting_id": cid}
        for f, t in _CONFIG_ARMS[cid]:
            out[f] = getattr(r, t)()
        return out
    if cid in (6, 7):  # cost params cpu / mem: ContractCostParamEntry<>
        key = (
            "contract_cost_params_cpu_insns"
            if cid == 6
            else "contract_cost_params_mem_bytes"
        )
        return {"config_setting_id": cid, key: _read_cost_params(r)}
    if cid == 12:  # bucket list size window: uint64<>
        return {
            "config_setting_id": 12,
            "bucket_list_size_window": r.array(r.u64),
        }
    raise XdrError(f"unsupported ConfigSettingEntry id {cid}")


def _write_config_entry(w: Writer, e: dict):
    cid = e["config_setting_id"]
    w.i32(cid)
    if cid in _CONFIG_ARMS:
        for f, t in _CONFIG_ARMS[cid]:
            getattr(w, t)(e[f])
        return
    if cid in (6, 7):
        key = (
            "contract_cost_params_cpu_insns"
            if cid == 6
            else "contract_cost_params_mem_bytes"
        )
        params = e[key]
        w.u32(len(params))
        for p in params:
            w.u32(0).i64(p["const_term"]).i64(p["linear_term"])
        return
    if cid == 12:
        window = e["bucket_list_size_window"]
        w.u32(len(window))
        for v in window:
            w.u64(v)
        return
    raise XdrError(f"unsupported ConfigSettingEntry id {cid}")


def read_ledger_entry(r: Reader) -> dict:
    last_modified = r.u32()
    t = r.u32()
    if t == ENTRY_ACCOUNT:
        data = _read_account_entry(r)
    elif t == ENTRY_TRUSTLINE:
        data = _read_trustline_entry(r)
    elif t == ENTRY_OFFER:
        data = read_offer_entry(r)
    elif t == ENTRY_DATA:
        data = {
            "account_id": read_account_id(r),
            "data_name": r.string(64),
            "data_value": r.var_opaque(64),
        }
        ext = r.u32()
        if ext != 0:
            raise XdrError(f"bad DataEntry ext {ext}")
    elif t == ENTRY_CLAIMABLE:
        data = _read_claimable_entry(r)
    elif t == ENTRY_POOL:
        data = _read_pool_entry(r)
    elif t == ENTRY_CONTRACT_DATA:
        data = _read_contract_data_entry(r)
    elif t == ENTRY_CONTRACT_CODE:
        data = _read_contract_code_entry(r)
    elif t == ENTRY_CONFIG:
        data = _read_config_entry(r)
    elif t == ENTRY_TTL:
        data = {"key_hash": r.opaque(32), "live_until_ledger_seq": r.u32()}
    else:
        raise XdrError(f"bad LedgerEntryType {t}")
    ext = r.u32()
    sponsoring = None
    if ext == 1:
        sponsoring = r.optional(lambda: read_account_id(r))
        ep = r.u32()
        if ep != 0:
            raise XdrError(f"bad LedgerEntryExtensionV1 ext {ep}")
    elif ext != 0:
        raise XdrError(f"bad LedgerEntry ext {ext}")
    return {
        "last_modified_ledger": last_modified,
        "type": t,
        "data": data,
        "sponsoring_id": sponsoring,
        "has_ext_v1": ext == 1,
    }


def write_ledger_entry(w: Writer, e: dict):
    w.u32(e["last_modified_ledger"]).u32(e["type"])
    t, data = e["type"], e["data"]
    if t == ENTRY_ACCOUNT:
        _write_account_entry(w, data)
    elif t == ENTRY_TRUSTLINE:
        _write_trustline_entry(w, data)
    elif t == ENTRY_OFFER:
        write_offer_entry(w, data)
    elif t == ENTRY_DATA:
        write_account_id(w, data["account_id"])
        w.string(data["data_name"]).var_opaque(data["data_value"]).u32(0)
    elif t == ENTRY_CLAIMABLE:
        _write_claimable_entry(w, data)
    elif t == ENTRY_POOL:
        _write_pool_entry(w, data)
    elif t == ENTRY_CONTRACT_DATA:
        _write_contract_data_entry(w, data)
    elif t == ENTRY_CONTRACT_CODE:
        _write_contract_code_entry(w, data)
    elif t == ENTRY_CONFIG:
        _write_config_entry(w, data)
    elif t == ENTRY_TTL:
        w.opaque(data["key_hash"]).u32(data["live_until_ledger_seq"])
    else:
        raise XdrError(f"bad LedgerEntryType {t}")
    if e["has_ext_v1"]:
        w.u32(1)
        w.optional(e["sponsoring_id"], lambda a: write_account_id(w, a))
        w.u32(0)
    else:
        w.u32(0)


# ---------------------------------------------------------------------------
# LedgerEntryChanges
# ---------------------------------------------------------------------------

CHANGE_CREATED, CHANGE_UPDATED, CHANGE_REMOVED, CHANGE_STATE = 0, 1, 2, 3
CHANGE_RESTORED = 4


def read_ledger_entry_change(r: Reader) -> dict:
    t = r.u32()
    if t in (CHANGE_CREATED, CHANGE_UPDATED, CHANGE_STATE, CHANGE_RESTORED):
        return {"change_type": t, "entry": read_ledger_entry(r)}
    if t == CHANGE_REMOVED:
        return {"change_type": t, "key": read_ledger_key(r)}
    raise XdrError(f"bad LedgerEntryChangeType {t}")


def write_ledger_entry_change(w: Writer, c: dict):
    w.u32(c["change_type"])
    if c["change_type"] == CHANGE_REMOVED:
        write_ledger_key(w, c["key"])
    else:
        write_ledger_entry(w, c["entry"])


def read_ledger_entry_changes(r: Reader) -> list[dict]:
    return r.array(lambda: read_ledger_entry_change(r))


def write_ledger_entry_changes(w: Writer, cs: list[dict]):
    w.u32(len(cs))
    for c in cs:
        write_ledger_entry_change(w, c)


# ---------------------------------------------------------------------------
# ClaimAtom (trade results)
# ---------------------------------------------------------------------------


def read_claim_atom(r: Reader) -> dict:
    t = r.u32()
    if t == 0:  # V0: raw ed25519 seller
        return {
            "atom_type": "v0",
            "seller_ed25519": r.opaque(32),
            "offer_id": r.i64(),
            "asset_sold": read_asset(r),
            "amount_sold": r.i64(),
            "asset_bought": read_asset(r),
            "amount_bought": r.i64(),
        }
    if t == 1:  # ORDER_BOOK
        return {
            "atom_type": "order_book",
            "seller_id": read_account_id(r),
            "offer_id": r.i64(),
            "asset_sold": read_asset(r),
            "amount_sold": r.i64(),
            "asset_bought": read_asset(r),
            "amount_bought": r.i64(),
        }
    if t == 2:  # LIQUIDITY_POOL
        return {
            "atom_type": "lp",
            "pool_id": r.opaque(32),
            "asset_sold": read_asset(r),
            "amount_sold": r.i64(),
            "asset_bought": read_asset(r),
            "amount_bought": r.i64(),
        }
    raise XdrError(f"bad ClaimAtomType {t}")


def write_claim_atom(w: Writer, a: dict):
    t = a["atom_type"]
    if t == "v0":
        w.u32(0).opaque(a["seller_ed25519"])
        w.i64(a["offer_id"])
    elif t == "order_book":
        w.u32(1)
        write_account_id(w, a["seller_id"])
        w.i64(a["offer_id"])
    elif t == "lp":
        w.u32(2).opaque(a["pool_id"])
    else:
        raise XdrError(f"bad ClaimAtomType {t}")
    write_asset(w, a["asset_sold"])
    w.i64(a["amount_sold"])
    write_asset(w, a["asset_bought"])
    w.i64(a["amount_bought"])


# ---------------------------------------------------------------------------
# Operation results
# ---------------------------------------------------------------------------

# OperationType → whether the opINNER arm carries a payload and which
_SIMPLE_VOID_RESULT_OPS = {5, 6, 7, 10, 11, 15, 16, 17, 18, 19, 20, 21, 22, 23}


def _read_path_payment_success(r: Reader) -> dict:
    offers = r.array(lambda: read_claim_atom(r))
    last = {
        "destination": read_account_id(r),
        "asset": read_asset(r),
        "amount": r.i64(),
    }
    return {"offers": offers, "last": last}


def _write_path_payment_success(w: Writer, s: dict):
    w.u32(len(s["offers"]))
    for a in s["offers"]:
        write_claim_atom(w, a)
    write_account_id(w, s["last"]["destination"])
    write_asset(w, s["last"]["asset"])
    w.i64(s["last"]["amount"])


def _read_manage_offer_success(r: Reader) -> dict:
    claimed = r.array(lambda: read_claim_atom(r))
    eff = r.u32()
    offer = None
    if eff in (0, 1):  # CREATED / UPDATED
        offer = read_offer_entry(r)
    elif eff != 2:  # DELETED
        raise XdrError(f"bad ManageOfferEffect {eff}")
    return {"offers_claimed": claimed, "effect": eff, "offer": offer}


def _write_manage_offer_success(w: Writer, s: dict):
    w.u32(len(s["offers_claimed"]))
    for a in s["offers_claimed"]:
        write_claim_atom(w, a)
    w.u32(s["effect"])
    if s["effect"] in (0, 1):
        write_offer_entry(w, s["offer"])


def read_operation_result(r: Reader) -> dict:
    code = r.i32()
    if code != 0:  # opBAD_AUTH etc — all void
        return {"code": code}
    t = r.u32()
    out: dict = {"code": 0, "type": t}
    inner = r.i32()
    out["inner_code"] = inner
    if t in (0, 1):  # create_account / payment — void either way
        pass
    elif t in (2, 13):  # path payments
        if inner == 0:
            out["success"] = _read_path_payment_success(r)
        elif inner == -9:  # NO_ISSUER carries the asset
            out["no_issuer_asset"] = read_asset(r)
    elif t in (3, 4, 12):  # offer ops
        if inner == 0:
            out["success"] = _read_manage_offer_success(r)
    elif t == 8:  # account merge
        if inner == 0:
            out["source_account_balance"] = r.i64()
    elif t == 9:  # inflation
        if inner == 0:
            out["payouts"] = r.array(
                lambda: {"destination": read_account_id(r), "amount": r.i64()}
            )
    elif t == 14:  # create claimable balance
        if inner == 0:
            out["balance_id"] = read_claimable_balance_id(r)
    elif t == 24:  # invoke host function
        if inner == 0:
            out["return_hash"] = r.opaque(32)
    elif t in (25, 26):  # footprint ops — void
        pass
    elif t in _SIMPLE_VOID_RESULT_OPS:
        pass
    else:
        raise XdrError(f"unsupported OperationResult op type {t}")
    return out


def write_operation_result(w: Writer, res: dict):
    w.i32(res["code"])
    if res["code"] != 0:
        return
    t = res["type"]
    w.u32(t).i32(res["inner_code"])
    inner = res["inner_code"]
    if t in (2, 13):
        if inner == 0:
            _write_path_payment_success(w, res["success"])
        elif inner == -9:
            write_asset(w, res["no_issuer_asset"])
    elif t in (3, 4, 12):
        if inner == 0:
            _write_manage_offer_success(w, res["success"])
    elif t == 8 and inner == 0:
        w.i64(res["source_account_balance"])
    elif t == 9 and inner == 0:
        w.u32(len(res["payouts"]))
        for p in res["payouts"]:
            write_account_id(w, p["destination"])
            w.i64(p["amount"])
    elif t == 14 and inner == 0:
        w.u32(0).opaque(res["balance_id"])
    elif t == 24 and inner == 0:
        w.opaque(res["return_hash"])


# ---------------------------------------------------------------------------
# TransactionResult
# ---------------------------------------------------------------------------

TX_RESULT_CODE_NAMES = {
    1: "TransactionResultCodeTxFeeBumpInnerSuccess",
    0: "TransactionResultCodeTxSuccess",
    -1: "TransactionResultCodeTxFailed",
    -2: "TransactionResultCodeTxTooEarly",
    -3: "TransactionResultCodeTxTooLate",
    -4: "TransactionResultCodeTxMissingOperation",
    -5: "TransactionResultCodeTxBadSeq",
    -6: "TransactionResultCodeTxBadAuth",
    -7: "TransactionResultCodeTxInsufficientBalance",
    -8: "TransactionResultCodeTxNoAccount",
    -9: "TransactionResultCodeTxInsufficientFee",
    -10: "TransactionResultCodeTxBadAuthExtra",
    -11: "TransactionResultCodeTxInternalError",
    -12: "TransactionResultCodeTxNotSupported",
    -13: "TransactionResultCodeTxFeeBumpInnerFailed",
    -14: "TransactionResultCodeTxBadSponsorship",
    -15: "TransactionResultCodeTxBadMinSeqAgeOrGap",
    -16: "TransactionResultCodeTxMalformed",
    -17: "TransactionResultCodeTxSorobanInvalid",
}


def _read_inner_tx_result(r: Reader) -> dict:
    fee = r.i64()
    code = r.i32()
    out: dict = {"fee_charged": fee, "code": code}
    if code in (0, -1):
        out["op_results"] = r.array(lambda: read_operation_result(r))
    ext = r.u32()
    if ext != 0:
        raise XdrError(f"bad InnerTransactionResult ext {ext}")
    return out


def _write_inner_tx_result(w: Writer, res: dict):
    w.i64(res["fee_charged"]).i32(res["code"])
    if res["code"] in (0, -1):
        w.u32(len(res["op_results"]))
        for o in res["op_results"]:
            write_operation_result(w, o)
    w.u32(0)


def read_transaction_result(r: Reader) -> dict:
    fee = r.i64()
    code = r.i32()
    out: dict = {"fee_charged": fee, "code": code}
    if code in (1, -13):  # fee-bump inner success/failed
        out["inner_hash"] = r.opaque(32)
        out["inner_result"] = _read_inner_tx_result(r)
    elif code in (0, -1):
        out["op_results"] = r.array(lambda: read_operation_result(r))
    ext = r.u32()
    if ext != 0:
        raise XdrError(f"bad TransactionResult ext {ext}")
    return out


def write_transaction_result(w: Writer, res: dict):
    w.i64(res["fee_charged"]).i32(res["code"])
    if res["code"] in (1, -13):
        w.opaque(res["inner_hash"])
        _write_inner_tx_result(w, res["inner_result"])
    elif res["code"] in (0, -1):
        w.u32(len(res["op_results"]))
        for o in res["op_results"]:
            write_operation_result(w, o)
    w.u32(0)


def read_transaction_result_pair(r: Reader) -> dict:
    """TransactionResultPair — the form LedgerTransactionOutput stores in
    ``tx_result`` (ledger_transaction.go): tx hash + result."""
    return {"transaction_hash": r.opaque(32), "result": read_transaction_result(r)}


def write_transaction_result_pair(w: Writer, p: dict):
    w.opaque(p["transaction_hash"])
    write_transaction_result(w, p["result"])


def result_successful(res: dict) -> bool:
    """transaction.Result.Successful(): success or fee-bump inner success."""
    return res["code"] in (0, 1)


# ---------------------------------------------------------------------------
# TransactionMeta V0-V3 + Soroban meta
# ---------------------------------------------------------------------------


def _read_contract_event(r: Reader) -> dict:
    ep = r.u32()
    if ep != 0:
        raise XdrError(f"bad ExtensionPoint {ep}")
    contract_id = r.optional(lambda: r.opaque(32))
    event_type = r.i32()  # 0 system, 1 contract, 2 diagnostic
    v = r.u32()
    if v != 0:
        raise XdrError(f"bad ContractEvent body v {v}")
    topics = r.array(lambda: read_sc_val(r))
    data = read_sc_val(r)
    return {
        "contract_id": contract_id,
        "type": event_type,
        "topics": topics,
        "data": data,
    }


def _write_contract_event(w: Writer, e: dict):
    w.u32(0)
    w.optional(e["contract_id"], w.opaque)
    w.i32(e["type"]).u32(0)
    w.u32(len(e["topics"]))
    for t in e["topics"]:
        write_sc_val(w, t)
    write_sc_val(w, e["data"])


def _read_soroban_meta(r: Reader) -> dict:
    ext = r.u32()
    fees = None
    if ext == 1:
        ep = r.u32()
        if ep != 0:
            raise XdrError(f"bad ExtensionPoint {ep}")
        fees = {
            "total_non_refundable_resource_fee_charged": r.i64(),
            "total_refundable_resource_fee_charged": r.i64(),
            "rent_fee_charged": r.i64(),
        }
    elif ext != 0:
        raise XdrError(f"bad SorobanTransactionMeta ext {ext}")
    events = r.array(lambda: _read_contract_event(r))
    return_value = read_sc_val(r)
    diagnostics = r.array(
        lambda: {
            "in_successful_contract_call": r.bool(),
            "event": _read_contract_event(r),
        }
    )
    return {
        "fees": fees,
        "events": events,
        "return_value": return_value,
        "diagnostic_events": diagnostics,
    }


def _write_soroban_meta(w: Writer, m: dict):
    if m["fees"] is None:
        w.u32(0)
    else:
        w.u32(1).u32(0)
        w.i64(m["fees"]["total_non_refundable_resource_fee_charged"])
        w.i64(m["fees"]["total_refundable_resource_fee_charged"])
        w.i64(m["fees"]["rent_fee_charged"])
    w.u32(len(m["events"]))
    for e in m["events"]:
        _write_contract_event(w, e)
    write_sc_val(w, m["return_value"])
    w.u32(len(m["diagnostic_events"]))
    for d in m["diagnostic_events"]:
        w.bool(d["in_successful_contract_call"])
        _write_contract_event(w, d["event"])


def read_transaction_meta(r: Reader) -> dict:
    v = r.u32()
    if v == 0:
        return {
            "version": 0,
            "tx_changes_before": [],
            "operations": r.array(
                lambda: {"changes": read_ledger_entry_changes(r)}
            ),
            "tx_changes_after": [],
            "soroban": None,
        }
    if v == 1:
        before = read_ledger_entry_changes(r)
        ops = r.array(lambda: {"changes": read_ledger_entry_changes(r)})
        return {
            "version": 1,
            "tx_changes_before": before,
            "operations": ops,
            "tx_changes_after": [],
            "soroban": None,
        }
    if v == 2:
        return {
            "version": 2,
            "tx_changes_before": read_ledger_entry_changes(r),
            "operations": r.array(
                lambda: {"changes": read_ledger_entry_changes(r)}
            ),
            "tx_changes_after": read_ledger_entry_changes(r),
            "soroban": None,
        }
    if v == 3:
        ep = r.u32()
        if ep != 0:
            raise XdrError(f"bad ExtensionPoint {ep}")
        return {
            "version": 3,
            "tx_changes_before": read_ledger_entry_changes(r),
            "operations": r.array(
                lambda: {"changes": read_ledger_entry_changes(r)}
            ),
            "tx_changes_after": read_ledger_entry_changes(r),
            "soroban": r.optional(lambda: _read_soroban_meta(r)),
        }
    raise XdrError(f"unsupported TransactionMeta version {v}")


def write_transaction_meta(w: Writer, m: dict):
    v = m["version"]
    w.u32(v)
    if v == 3:
        w.u32(0)
    if v in (1, 2, 3):
        write_ledger_entry_changes(w, m["tx_changes_before"])
    w.u32(len(m["operations"]))
    for op in m["operations"]:
        write_ledger_entry_changes(w, op["changes"])
    if v in (2, 3):
        write_ledger_entry_changes(w, m["tx_changes_after"])
    if v == 3:
        w.optional(m["soroban"], lambda s: _write_soroban_meta(w, s))
