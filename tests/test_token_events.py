"""Classic-operation → token-transfer-event derivation tests
(transforms/token_events.py; reference: token_transfer.go:14-76 delegating
to stellar/go's EventsProcessor classification)."""

from __future__ import annotations

import pytest

import fixtures as fx
from stellar_etl_spark.schemas import OPERATIONS_DDL, TRANSACTIONS_DDL
from stellar_etl_spark.transforms.token_events import (
    derive_token_transfer_events,
)
from stellar_etl_spark.transforms.token_transfer import transform_token_transfer

ISSUER = fx.ACCOUNT_B
USD = ("credit_alphanum4", "USD", ISSUER)
NATIVE = ("native", None, None)


@pytest.fixture(scope="module")
def data(spark):
    ops = [
        # plain payment A → C in USD: transfer
        fx._op(2, 1, 0, 1, fx._body(to=fx.ACCOUNT_C, asset=USD, amount=50)),
        # payment FROM the issuer: mint to the destination
        fx._op(2, 1, 1, 1,
               fx._body(to=fx.ACCOUNT_C, asset=USD, amount=70),
               source=ISSUER),
        # payment TO the issuer: burn from the source
        fx._op(2, 1, 2, 1, fx._body(to=ISSUER, asset=USD, amount=30)),
        # native payment from the issuer account: still a transfer —
        # native has no issuer
        fx._op(2, 1, 3, 1,
               fx._body(to=fx.ACCOUNT_C, asset=NATIVE, amount=11),
               source=ISSUER),
        # create_account: native transfer of the starting balance
        fx._op(2, 2, 0, 0,
               fx._body(account=fx.ACCOUNT_C, starting_balance=900)),
        # account_merge: native transfer of the swept result amount
        fx._op(2, 2, 1, 8,
               fx._body(account=fx.ACCOUNT_C, source_amount=12345)),
        # clawback: issuer pulls back from the holder
        fx._op(2, 2, 2, 19,
               fx._body(from_=fx.ACCOUNT_C, asset=USD, amount=5)),
        # failed tx: no operation events
        fx._op(2, 3, 0, 1,
               fx._body(to=fx.ACCOUNT_C, asset=USD, amount=99),
               successful=False),
    ]
    txs = [
        fx._tx(2, 1), fx._tx(2, 2),
        fx._tx(2, 3, successful=False, fee_charged=77),
    ]
    spark_ops = spark.createDataFrame(ops, OPERATIONS_DDL)
    spark_txs = spark.createDataFrame(txs, TRANSACTIONS_DDL)
    events = derive_token_transfer_events(spark_ops, spark_txs)
    out = transform_token_transfer(events)
    return None, events.collect(), out.collect()


class TestClassification:
    def _by_op(self, events):
        return {
            (r.tx_index, r.sac_op_index): r
            for r in events
            if r.sac_op_index is not None
        }

    def test_payment_transfer(self, data):
        _, events, _ = data
        e = self._by_op(events)[(1, 0)]
        assert e.sac_kind == "transfer"
        assert e.sac_from == fx.ACCOUNT_A  # tx-source fallback
        assert e.sac_to == fx.ACCOUNT_C
        assert e.sac_amount == 50
        assert e.sac_asset == f"credit_alphanum4:USD:{ISSUER}"  # 3-part assetConcat

    def test_issuer_source_is_mint(self, data):
        _, events, _ = data
        e = self._by_op(events)[(1, 1)]
        assert e.sac_kind == "mint"
        assert e.sac_to == fx.ACCOUNT_C and e.sac_amount == 70

    def test_issuer_destination_is_burn(self, data):
        _, events, _ = data
        e = self._by_op(events)[(1, 2)]
        assert e.sac_kind == "burn"
        assert e.sac_from == fx.ACCOUNT_A and e.sac_amount == 30

    def test_native_has_no_issuer_semantics(self, data):
        _, events, _ = data
        e = self._by_op(events)[(1, 3)]
        assert e.sac_kind == "transfer" and e.sac_asset == "native"

    def test_create_account_and_merge_native_transfers(self, data):
        _, events, _ = data
        ca = self._by_op(events)[(2, 0)]
        assert (ca.sac_kind, ca.sac_asset, ca.sac_amount) == (
            "transfer", "native", 900,
        )
        assert ca.sac_to == fx.ACCOUNT_C
        mg = self._by_op(events)[(2, 1)]
        assert (mg.sac_kind, mg.sac_amount) == ("transfer", 12345)

    def test_clawback(self, data):
        _, events, _ = data
        e = self._by_op(events)[(2, 2)]
        assert e.sac_kind == "clawback"
        assert e.sac_from == fx.ACCOUNT_C and e.sac_amount == 5

    def test_failed_tx_ops_emit_nothing_but_fee_remains(self, data):
        _, events, _ = data
        tx3 = [r for r in events if r.tx_index == 3]
        assert [r.sac_kind for r in tx3] == ["fee"]
        assert tx3[0].sac_amount == 77

    def test_fee_events_per_tx(self, data):
        _, events, _ = data
        fees = [r for r in events if r.sac_kind == "fee"]
        assert len(fees) == 3  # one per transaction
        assert all(r.sac_op_index is None and r.sac_to is None for r in fees)

    def test_sac_contract_ids_join_classic_to_soroban(self, data):
        """Every event carries the asset's SAC contract id — the SAME
        derivation transform_contract_data verifies, so the id spaces
        join (contract_data.go:283-297)."""
        _, events, _ = data
        native = {r.contract_id for r in events if r.sac_asset == "native"}
        usd = {
            r.contract_id for r in events if r.sac_asset == f"credit_alphanum4:USD:{ISSUER}"
        }
        assert len(native) == 1 and len(usd) == 1 and native != usd
        cid = next(iter(native))
        assert cid.startswith("C") and len(cid) == 56
        # cross-check against the independent Python derivation
        from stellar_etl_spark.functions.strkey import (
            VERSION_CONTRACT,
            decode_strkey,
        )

        ver, payload = decode_strkey(cid)
        assert ver == VERSION_CONTRACT
        assert payload == fx.sac_contract_id(bytes([0, 0, 0, 0]))


class TestDownstream:
    def test_transform_consumes_derived_events(self, data):
        _, _, out = data
        by_topic = {}
        for r in out:
            by_topic.setdefault(r.event_topic, []).append(r)
        assert set(by_topic) == {"transfer", "mint", "burn", "clawback", "fee"}
        # fee rows have null operation_id (tx-level), others a TOID
        assert all(r.operation_id is None for r in by_topic["fee"])
        assert all(r.operation_id is not None for r in by_topic["transfer"])
        t = by_topic["mint"][0]
        assert t.to == fx.ACCOUNT_C and t.__getattr__("from") is None
        assert t.asset_code == "USD" and t.asset_issuer == ISSUER
