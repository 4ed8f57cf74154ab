"""FULL-PIPELINE mainnet parity: raw reassembled LedgerCloseMeta bytes →
bronze → silver decode → transforms, compared row-by-row against the
reference's golden exports for the same ledgers (cmd/test_utils.go:39-163
goldens; tests/golden_lcm.py rebuilds the wire bytes).

This is the strongest correctness gate in the repo: every byte of input is
mainnet's own, every expected row is the reference's own output, and the
whole distributed pipeline (binaryFile scan → Arrow decode → the effect /
token-transfer expression trees) runs end to end — nothing is mocked.
"""

from __future__ import annotations

import base64
import json
import os

import pytest

from golden_lcm import golden_rows, have_goldens, write_golden_ledger_dir

pytestmark = pytest.mark.skipif(
    not have_goldens(), reason="reference goldens not available"
)


def _details_equal(g, m) -> bool:
    if isinstance(g, dict) and isinstance(m, dict):
        return set(g) == set(m) and all(_details_equal(g[k], m[k]) for k in g)
    if isinstance(g, list) and isinstance(m, list):
        return len(g) == len(m) and all(
            _details_equal(a, b) for a, b in zip(g, m)
        )
    if isinstance(g, float) or isinstance(m, float):
        try:
            return abs(float(g) - float(m)) <= 1e-9 * max(1.0, abs(float(g)))
        except (TypeError, ValueError):
            return False
    return g == m


@pytest.fixture(scope="module")
def silver(spark, tmp_path_factory):
    from stellar_etl_spark.sources.bronze import (
        decode_ledger_files,
        read_ledger_files,
    )
    from stellar_etl_spark.sources.silver import (
        decode_ledgers,
        decode_operations,
        decode_transactions,
    )

    d = str(tmp_path_factory.mktemp("golden_lcm"))
    lcms = write_golden_ledger_dir(d)
    bronze = decode_ledger_files(read_ledger_files(spark, d)).cache()
    return {
        "seqs": set(lcms),
        "transactions": decode_transactions(bronze),
        "operations": decode_operations(bronze),
        "ledgers": decode_ledgers(bronze),
    }


class TestEffectsMainnetParity:
    def test_all_effect_rows_recompute(self, silver):
        """Every effects-golden row whose ledger we can reassemble must be
        produced EXACTLY: id, type, address, muxed address, and the full
        details object (amount strings, trade family fields, allow_trust
        double-emission, flag spellings) — 155 real rows incl. 8-effect
        trade families and path-payment chains."""
        from stellar_etl_spark.transforms.effects import transform_effects

        eff = transform_effects(
            silver["operations"],
            silver["transactions"],
            ledgers=silver["ledgers"],
        ).collect()
        mine = {r["id"]: r.asDict() for r in eff}

        golden = {
            row["id"]: row
            for row in golden_rows("effects")
            if row["ledger_sequence"] in silver["seqs"]
        }
        assert len(golden) >= 150

        missing = sorted(k for k in golden if k not in mine)
        assert missing == [], f"effects missing: {missing[:5]}"
        extra = sorted(
            k
            for k, m in mine.items()
            if k not in golden and m["ledger_sequence"] in silver["seqs"]
        )
        assert extra == [], f"unexpected extra effects: {extra[:5]}"

        for k, g in golden.items():
            m = mine[k]
            assert int(g["operation_id"]) == int(m["operation_id"])
            assert g["type"] == m["type"], k
            assert g["type_string"] == m["type_string"], k
            assert g["address"] == m["address"], k
            assert g["address_muxed"] == m["address_muxed"], k
            assert g["closed_at"] == m["closed_at"].strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ), k
            gd = g.get("details") or {}
            md = json.loads(m.get("details") or "{}")
            assert _details_equal(gd, md), (
                f"{k}: golden={json.dumps(gd, sort_keys=True)[:200]} "
                f"mine={json.dumps(md, sort_keys=True)[:200]}"
            )


class TestTransactionsMainnetParity:
    def test_all_transaction_rows_recompute(self, silver):
        """Every shared column of every golden history_transactions row
        (700+) matches: ids, fees, memo enum names, bounds strings,
        signature strkeys, the BARE-result tx_result blob, null-vs-empty
        extra_signers."""
        from stellar_etl_spark.transforms.transaction import (
            transform_transaction,
        )

        out = transform_transaction(
            silver["transactions"], silver["ledgers"]
        ).collect()
        mine = {int(r["id"]): r.asDict() for r in out}

        n = 0
        for g in golden_rows("transactions"):
            if g["ledger_sequence"] not in silver["seqs"]:
                continue
            k = int(g["id"])
            assert k in mine, k
            m = mine[k]
            for field in sorted(set(g) & set(m)):
                if field in ("closed_at", "created_at"):
                    continue
                gv, mv = g.get(field), m.get(field)
                if isinstance(gv, bool) or isinstance(mv, bool):
                    gv = gv in (True, "true", "True")
                    mv = mv in (True, "true", "True")
                elif isinstance(gv, (int, float)) and mv is not None:
                    mv = type(gv)(mv)
                if gv in ("", None) and mv in ("", None):
                    continue
                assert gv == mv, (k, field, gv, mv)
            n += 1
        assert n >= 700


class TestLedgersMainnetParity:
    def test_all_ledger_rows_recompute(self, silver):
        """The golden history_ledgers rows for the reassembled range match:
        TOID ids, tx/op counts incl. the string-typed tx_set count, pool
        and fee scalars, hex hashes, node id + signature, and the Go
        zero-value defaults for pre-Soroban fields."""
        from stellar_etl_spark.transforms.ledger import transform_ledger

        out = transform_ledger(
            silver["ledgers"], silver["transactions"]
        ).collect()
        mine = {r["sequence"]: r.asDict() for r in out}

        n = 0
        for g in golden_rows("ledgers"):
            if g["sequence"] not in mine:
                continue
            m = mine[g["sequence"]]
            for field in sorted(set(g) & set(m)):
                if field == "closed_at":
                    continue
                gv, mv = g.get(field), m.get(field)
                if isinstance(gv, (int, float)) and mv is not None:
                    mv = type(gv)(mv)
                if gv in ("", None) and mv in ("", None):
                    continue
                assert gv == mv, (g["sequence"], field, gv, mv)
            n += 1
        assert n >= 11


class TestOperationsMainnetParity:
    def test_all_operation_rows_recompute(self, silver):
        """Every golden history_operations row (2200+, seven op types incl.
        1900 manage-offer ops and 91 path payments) recomputes exactly:
        ids, type switch, source fallback, result/trace codes, and the full
        details map — bare asset_* keys with FarmHash ids, 7-dp-rounded
        prices, from/funder/trustee account roles, the dual string/number
        source_amount of failed path payments."""
        from stellar_etl_spark.transforms.operation import transform_operation

        out = transform_operation(
            silver["operations"],
            silver["transactions"],
            ledgers=silver["ledgers"],
        ).collect()
        mine = {int(r["id"]): r.asDict() for r in out}

        golden = {
            int(row["id"]): row
            for row in golden_rows("operations")
            if row["ledger_sequence"] in silver["seqs"]
        }
        assert len(golden) >= 2200

        missing = sorted(k for k in golden if k not in mine)
        assert missing == [], f"ops missing: {missing[:5]}"

        for k, g in golden.items():
            m = mine[k]
            for field in (
                "type", "type_string", "source_account",
                "operation_result_code", "operation_trace_code",
            ):
                assert g.get(field) == m.get(field), (k, field)
            assert int(g["transaction_id"]) == int(m["transaction_id"])
            gd = g.get("details") or {}
            md = json.loads(m.get("details_json") or "{}")
            assert _details_equal(gd, md), (
                f"{k} {g['type_string']}: "
                f"golden={json.dumps(gd, sort_keys=True)[:200]} "
                f"mine={json.dumps(md, sort_keys=True)[:200]}"
            )


class TestTokenTransfersMainnetParity:
    def test_all_token_transfer_rows_recompute(self, silver):
        """All 728 golden token-transfer rows (650 fee + 78 transfer)
        recompute from the classic-operation event derivation: per-atom
        fill pairs, final path-payment transfers, merges, payments, fees —
        matched on (topic, operation_id, from, to, asset, amount_raw)."""
        from stellar_etl_spark.transforms.token_events import (
            derive_token_transfer_events,
        )
        from stellar_etl_spark.transforms.token_transfer import (
            transform_token_transfer,
        )

        out = transform_token_transfer(
            derive_token_transfer_events(
                silver["operations"],
                silver["transactions"],
                ledgers=silver["ledgers"],
            )
        ).collect()

        def key(topic, op_id, frm, to, asset, amount_raw):
            return (
                topic,
                None if op_id is None else int(op_id),
                frm,
                to,
                asset,
                str(amount_raw),
            )

        mine: dict = {}
        for r in out:
            d = r.asDict()
            k = key(
                d["event_topic"], d["operation_id"], d["from"], d["to"],
                d["asset"], d["amount_raw"],
            )
            mine[k] = mine.get(k, 0) + 1

        golden: dict = {}
        n = 0
        for g in golden_rows("token_transfers"):
            if g["ledger_sequence"] not in silver["seqs"]:
                continue
            k = key(
                g["event_topic"], g["operation_id"], g["from"], g["to"],
                g["asset"], g["amount_raw"],
            )
            golden[k] = golden.get(k, 0) + 1
            n += 1
        assert n >= 700

        gonly = {k: v for k, v in golden.items() if mine.get(k, 0) != v}
        monly = {k: v for k, v in mine.items() if golden.get(k, 0) != v}
        assert gonly == {}, f"golden-only: {list(gonly)[:5]}"
        assert monly == {}, f"mine-only: {list(monly)[:5]}"


class TestTradesGoldenParity:
    @pytest.fixture(scope="class")
    def trade_frames(self, spark, tmp_path_factory):
        from golden_trades import write_trade_ledger_dir

        from stellar_etl_spark.sources.bronze import (
            decode_ledger_files,
            read_ledger_files,
        )
        from stellar_etl_spark.sources.silver import (
            decode_ledgers,
            decode_operations,
            decode_transactions,
        )

        d = str(tmp_path_factory.mktemp("golden_trades"))
        lcms = write_trade_ledger_dir(d)
        bronze = decode_ledger_files(read_ledger_files(spark, d)).cache()
        return {
            "seqs": set(lcms),
            "transactions": decode_transactions(bronze),
            "operations": decode_operations(bronze),
            "ledgers": decode_ledgers(bronze),
        }

    def test_all_trade_rows_recompute(self, trade_frames):
        """Every golden history_trades row recomputes from wire bytes whose
        trade content is the golden's own values (tests/golden_trades.py):
        the reverse pre-change price scan skips the decoy entry and lands
        on the golden (price_n, price_d); real resting-offer buying ids and
        synthetic TOID-typed ids both reproduce; amounts, FarmHash asset
        ids, strkeys, order and closed_at are exact.  Pins
        trade.go:21-162 + 264-304 semantics on mainnet values."""
        from golden_trades import unique_golden_trades

        from stellar_etl_spark.transforms.trade import transform_trade

        out = transform_trade(
            trade_frames["operations"],
            trade_frames["ledgers"],
            transactions=trade_frames["transactions"],
        ).collect()
        mine = {int(r["history_operation_id"]): r.asDict() for r in out}

        golden = unique_golden_trades()
        assert len(golden) >= 5

        missing = sorted(k for k in golden if k not in mine)
        assert missing == [], f"trades missing: {missing}"
        extra = sorted(k for k in mine if k not in golden)
        assert extra == [], f"unexpected extra trades: {extra}"

        for k, g in golden.items():
            m = mine[k]
            assert g["order"] == m["order"], k
            assert g["ledger_closed_at"] == m["ledger_closed_at"].strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ), k
            for field in (
                "selling_account_address", "selling_asset_type",
                "buying_account_address", "buying_asset_type",
                "selling_asset_id", "buying_asset_id",
                "price_n", "price_d", "trade_type",
                "selling_offer_id", "buying_offer_id",
                "liquidity_pool_fee", "rounding_slippage", "seller_is_exact",
                "selling_liquidity_pool_id",
                "selling_liquidity_pool_id_strkey",
            ):
                gv, mv = g.get(field), m.get(field)
                if gv in ("", None) and mv in ("", None):
                    continue
                if isinstance(gv, (int, float)) and mv is not None:
                    mv = type(gv)(mv)
                assert gv == mv, (k, field, gv, mv)
            for field in ("selling_asset_code", "selling_asset_issuer",
                          "buying_asset_code", "buying_asset_issuer"):
                gv, mv = g.get(field), m.get(field)
                assert (gv or "") == (mv or ""), (k, field, gv, mv)
            for field in ("selling_amount", "buying_amount"):
                assert abs(g[field] - m[field]) <= 1e-12 * max(
                    1.0, abs(g[field])
                ), (k, field, g[field], m[field])


class TestTradesMainnetConsistency:
    def test_trades_match_golden_trade_effects(self, silver):
        """transform_trade over the PURE-mainnet reassembled range
        (30822015-25: real manage-offer results with real resting offers
        and real pre-change metas) must agree with the reference's own
        golden TRADE EFFECTS for the same ledgers: same atom count (each
        trade emits a buyer+seller effect pair), and for every buyer-side
        effect a trade row with the same operation, sold offer, seller and
        both amounts."""
        from decimal import Decimal

        from stellar_etl_spark.transforms.trade import transform_trade

        trades = transform_trade(
            silver["operations"],
            silver["ledgers"],
            transactions=silver["transactions"],
        ).collect()

        by_op: dict = {}
        for r in trades:
            d = r.asDict()
            by_op.setdefault(int(d["history_operation_id"]), []).append(d)

        eff = [
            row
            for row in golden_rows("effects")
            if row["ledger_sequence"] in silver["seqs"]
            and row["type_string"] == "trade"
        ]
        assert len(eff) >= 8 and len(eff) % 2 == 0
        n_trade_rows = sum(len(v) for v in by_op.values())
        assert n_trade_rows == len(eff) // 2

        matched = 0
        for e in eff:
            det = e["details"]
            cands = by_op.get(int(e["operation_id"]), [])
            assert cands, f"no trade rows for op {e['operation_id']}"
            # buyer-side effect: counterparty seller + sold offer id match
            hits = [
                t
                for t in cands
                if t["selling_offer_id"] == det["offer_id"]
                and t["selling_account_address"] == det["seller"]
                and Decimal(det["bought_amount"])
                == Decimal(str(t["selling_amount"]))
                and Decimal(det["sold_amount"])
                == Decimal(str(t["buying_amount"]))
                and e["address"] == t["buying_account_address"]
            ]
            if hits:
                matched += 1
        # exactly the buyer-side half of the pairs fully matches a trade row
        assert matched == len(eff) // 2


class TestLedgerTransactionsMainnetParity:
    def test_blob_columns_roundtrip(self, silver):
        """transform_ledger_transaction's four XDR blob columns must equal
        the goldens byte-for-byte (they re-encode from parsed structs, so
        this doubles as a codec re-encode check through the whole Spark
        path)."""
        from stellar_etl_spark.transforms.transaction import (
            transform_ledger_transaction,
        )

        rows = transform_ledger_transaction(
            silver["transactions"], ledgers=silver["ledgers"]
        ).collect()
        mine = {}
        for r in rows:
            d = r.asDict()
            mine[(d["ledger_sequence"], d["tx_envelope"])] = d

        n = 0
        for g in golden_rows("ledger_transactions"):
            if g["ledger_sequence"] not in silver["seqs"]:
                continue
            key = (g["ledger_sequence"], g["tx_envelope"])
            assert key in mine, f"missing tx in ledger {g['ledger_sequence']}"
            m = mine[key]
            assert g["tx_result"] == m["tx_result"]
            assert g["tx_meta"] == m["tx_meta"]
            assert g["tx_fee_meta"] == m["tx_fee_meta"]
            # the LedgerHeaderHistoryEntry blob re-encodes byte-identically
            assert g["tx_ledger_history"] == m["tx_ledger_history"]
            assert g["closed_at"] == m["closed_at"].strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            n += 1
        assert n >= 59
