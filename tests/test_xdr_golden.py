"""XDR codec validation against REAL mainnet wire bytes.

The reference's golden files embed base64 XDR blobs produced by mainnet:
``ledger_header`` (LedgerHeader), ``tx_envelope`` (TransactionEnvelope),
``tx_result`` (TransactionResult / TransactionResultPair), ``tx_fee_meta``
(LedgerEntryChanges), ``tx_meta`` (TransactionMeta V0-V3).  Every blob must
decode fully AND re-encode byte-identically — the strongest possible
correctness check for the pure-Python codec, with zero hand-built
expectations.  Transaction hashes recompute from the envelope bytes and
must equal the goldens' ``transaction_hash``.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import base64
import glob
import json
import os

import pytest

from stellar_etl_spark.sources.xdr import (
    Reader,
    Writer,
    read_ledger_header,
    read_transaction_envelope,
    transaction_hash,
    write_ledger_header,
    write_transaction_envelope,
)
from stellar_etl_spark.sources.xdr_ledger import (
    read_ledger_entry_changes,
    read_transaction_meta,
    read_transaction_result,
    read_transaction_result_pair,
    result_successful,
    write_ledger_entry_changes,
    write_transaction_meta,
    write_transaction_result,
    write_transaction_result_pair,
)

GOLDEN_DIR = "/root/reference/testdata"
PUBLIC = "Public Global Stellar Network ; September 2015"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not available"
)


def rows(*dirs):
    for d in dirs:
        for path in sorted(glob.glob(f"{GOLDEN_DIR}/{d}/*.golden")):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("{"):
                        yield json.loads(line)


def roundtrip(raw: bytes, read_fn, write_fn):
    r = Reader(raw)
    v = read_fn(r)
    assert r.pos == len(raw), f"{len(raw) - r.pos} trailing bytes"
    w = Writer()
    write_fn(w, v)
    assert w.bytes() == raw, "re-encode differs"
    return v


class TestMainnetRoundtrips:
    def test_ledger_headers(self):
        n = 0
        for r in rows("ledgers"):
            raw = base64.b64decode(r["ledger_header"])
            h = roundtrip(
                raw,
                read_ledger_header,
                lambda w, v: write_ledger_header(w, v),
            )
            assert h.ledger_seq == r["sequence"]
            assert h.total_coins == r["total_coins"]
            assert h.ledger_version == r["protocol_version"]
            n += 1
        assert n > 400

    def test_envelopes(self):
        n = 0
        for r in rows("transactions", "ledger_transactions"):
            raw = base64.b64decode(r["tx_envelope"])
            roundtrip(raw, read_transaction_envelope, write_transaction_envelope)
            n += 1
        assert n > 700

    def test_transaction_hashes_recompute(self):
        n = 0
        for r in rows("transactions"):
            env = read_transaction_envelope(
                Reader(base64.b64decode(r["tx_envelope"]))
            )
            assert (
                transaction_hash(env, PUBLIC).hex() == r["transaction_hash"]
            ), r["transaction_hash"]
            n += 1
        assert n > 700

    def test_results(self):
        n = 0
        for r in rows("transactions"):
            raw = base64.b64decode(r["tx_result"])
            res = roundtrip(
                raw, read_transaction_result, write_transaction_result
            )
            assert result_successful(res) == r["successful"]
            n += 1
        # ledger_transactions stores the hash-prefixed PAIR form
        for r in rows("ledger_transactions"):
            raw = base64.b64decode(r["tx_result"])
            roundtrip(
                raw, read_transaction_result_pair, write_transaction_result_pair
            )
            n += 1
        assert n > 700

    def test_fee_meta_ledger_changes(self):
        n = 0
        for r in rows("transactions", "ledger_transactions"):
            raw = base64.b64decode(r["tx_fee_meta"])
            roundtrip(raw, read_ledger_entry_changes, write_ledger_entry_changes)
            n += 1
        assert n > 700

    def test_transaction_meta(self):
        """Full apply meta — exercises every LedgerEntry type and the
        recursive SCVal surface on real Soroban data."""
        n = 0
        versions = set()
        for r in rows("transactions", "ledger_transactions"):
            raw = base64.b64decode(r["tx_meta"])
            m = roundtrip(raw, read_transaction_meta, write_transaction_meta)
            versions.add(m["version"])
            n += 1
        assert n > 700
        assert versions  # at least one mainnet meta version exercised

    def test_result_fee_charged_matches_golden(self):
        n = 0
        for r in rows("transactions"):
            res = read_transaction_result(
                Reader(base64.b64decode(r["tx_result"]))
            )
            assert res["fee_charged"] == r["fee_charged"], r["transaction_hash"]
            n += 1
        assert n > 700


class TestSyntheticArms:
    """Roundtrips for union arms mainnet goldens don't exercise."""

    def test_config_and_ttl_entries(self):
        from stellar_etl_spark.sources.xdr_ledger import (
            read_ledger_entry,
            write_ledger_entry,
        )

        for data, t in [
            ({"config_setting_id": 0, "contract_max_size_bytes": 65536}, 8),
            (
                {
                    "config_setting_id": 1,
                    "ledger_max_instructions": 5_000_000,
                    "tx_max_instructions": 1_000_000,
                    "fee_rate_per_instructions_increment": 25,
                    "tx_memory_limit": 41_943_040,
                },
                8,
            ),
            (
                {
                    "config_setting_id": 6,
                    "contract_cost_params_cpu_insns": [
                        {"const_term": 4, "linear_term": 0},
                        {"const_term": 35, "linear_term": 36},
                    ],
                },
                8,
            ),
            (
                {
                    "config_setting_id": 12,
                    "bucket_list_size_window": [11185701000] * 3,
                },
                8,
            ),
            (
                {
                    "config_setting_id": 10,
                    "max_entry_ttl": 3110400,
                    "min_temporary_ttl": 17280,
                    "min_persistent_ttl": 2073600,
                    "persistent_rent_rate_denominator": 1402,
                    "temp_rent_rate_denominator": 2804,
                    "max_entries_to_archive": 1000,
                    "bucket_list_size_window_sample_size": 30,
                    "bucket_list_window_sample_period": 64,
                    "eviction_scan_size": 100000,
                    "starting_eviction_scan_level": 7,
                },
                8,
            ),
            ({"key_hash": b"\x0a" * 32, "live_until_ledger_seq": 999}, 9),
        ]:
            e = {
                "last_modified_ledger": 7,
                "type": t,
                "data": data,
                "sponsoring_id": None,
                "has_ext_v1": False,
            }
            w = Writer()
            write_ledger_entry(w, e)
            assert read_ledger_entry(Reader(w.bytes())) == e

    def test_restored_change_and_sponsorship_ext(self):
        from stellar_etl_spark.sources.xdr_ledger import (
            CHANGE_RESTORED,
            read_ledger_entry_change,
            write_ledger_entry_change,
        )

        entry = {
            "last_modified_ledger": 3,
            "type": 3,
            "data": {
                "account_id": b"\x01" * 32,
                "data_name": "cfg",
                "data_value": b"\x05\x06",
            },
            "sponsoring_id": b"\x02" * 32,
            "has_ext_v1": True,
        }
        c = {"change_type": CHANGE_RESTORED, "entry": entry}
        w = Writer()
        write_ledger_entry_change(w, c)
        assert read_ledger_entry_change(Reader(w.bytes())) == c

    def test_scval_muxed_address_and_nonce(self):
        from stellar_etl_spark.sources.xdr_ledger import (
            read_sc_val,
            write_sc_val,
        )

        vals = [
            {"address": {"type": "muxed_account", "id": 9, "ed25519": b"\x03" * 32}},
            {"ledger_key_nonce": 1234567},
            {"i256": [1, 2, 3, 4]},
            {"error": {"type": 0, "contract_code": 5}},
            {
                "instance": {
                    "executable": {"stellar_asset": None},
                    "storage": [{"key": {"symbol": "k"}, "val": {"u32": 1}}],
                }
            },
        ]
        for v in vals:
            w = Writer()
            write_sc_val(w, v)
            assert read_sc_val(Reader(w.bytes())) == v
