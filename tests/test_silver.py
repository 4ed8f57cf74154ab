"""End-to-end silver path: real XDR wire bytes → bronze → decoded
transaction/operation rows → the production entity transforms
(sources/silver.py; reference: input/ledgers.go → input/{transactions,
operations}.go → transform_*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_spark.functions.strkey import VERSION_ACCOUNT, encode_strkey
from stellar_etl_spark.sources.silver import (
    decode_operations,
    decode_transactions,
)
from stellar_etl_spark.sources.xdr import (
    LedgerHeader,
    encode_ledger_close_meta_v0,
    encode_ledger_close_meta_v1,
)

A = b"\x01" * 32
B = b"\x02" * 32
GA = encode_strkey(VERSION_ACCOUNT, A)
GB = encode_strkey(VERSION_ACCOUNT, B)
USD = {"type": "credit_alphanum4", "code": "USD", "issuer": B}

PAYMENT = {
    "source": None,
    "type": 1,
    "body": {
        "destination": {"ed25519": B, "id": None},
        "asset": USD,
        "amount": 150_000_000,
    },
}
OFFER = {
    "source": {"ed25519": B, "id": None},
    "type": 3,
    "body": {
        "selling": USD,
        "buying": {"type": "native"},
        "amount": 80_000_000,
        "price": (1, 4),
        "offer_id": 42,
    },
}


def _sig():
    return [{"hint": b"\x01\x02\x03\x04", "signature": b"\xaa" * 64}]


def _env(ops, memo=None, seq_num=7, fee=100):
    return {
        "type": "v1",
        "tx": {
            "source": {"ed25519": A, "id": None},
            "fee": fee,
            "seq_num": seq_num,
            "preconditions": {
                "time_bounds": {"min_time": 5, "max_time": 50}
            },
            "memo": memo or {"type": "text", "text": "hi"},
            "operations": ops,
        },
        "signatures": _sig(),
    }


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    from stellar_etl_spark.sources.bronze import (
        decode_ledger_files,
        read_ledger_files,
    )

    tmp = tmp_path_factory.mktemp("silver")
    h2 = LedgerHeader(
        ledger_version=20, close_time=1_704_067_210, ledger_seq=2,
        total_coins=10**12,
    )
    raw2 = encode_ledger_close_meta_v0(h2, [_env([PAYMENT, OFFER])])
    h3 = LedgerHeader(
        ledger_version=21, close_time=1_704_067_215, ledger_seq=3,
        total_coins=10**12,
    )
    bump = {
        "type": "fee_bump",
        "fee_source": {"ed25519": B, "id": None},
        "fee": 5000,
        "inner": _env([PAYMENT], memo={"type": "none"}),
        "signatures": _sig(),
    }
    raw3 = encode_ledger_close_meta_v1(h3, [[bump]])
    (tmp / "2.xdr").write_bytes(raw2)
    (tmp / "3.xdr").write_bytes(raw3)
    return decode_ledger_files(read_ledger_files(spark, str(tmp)))


class TestSilverDecode:
    def test_transactions_from_wire_bytes(self, bronze):
        rows = {
            (r.ledger_sequence, r.tx_index): r
            for r in decode_transactions(bronze).collect()
        }
        t = rows[(2, 1)]
        assert t.source_account == GA
        assert t.memo_type == "text" and t.memo == "hi"
        assert (t.time_bounds_min, t.time_bounds_max) == (5, 50)
        assert t.operation_count == 2
        fb = rows[(3, 1)]
        assert fb.is_fee_bump and fb.fee_account == GB
        assert fb.max_fee == 5000

    def test_operations_from_wire_bytes(self, bronze):
        ops = {
            (r.ledger_sequence, r.tx_index, r.op_index): r
            for r in decode_operations(bronze).collect()
        }
        pay = ops[(2, 1, 0)]
        assert pay.type == 1
        assert pay.body.to == GB
        assert pay.body.asset.asset_code == "USD"
        assert pay.body.asset.asset_issuer == GB
        off = ops[(2, 1, 1)]
        assert off.type == 3 and off.source_account == GB
        assert (off.body.price_n, off.body.price_d) == (1, 4)
        assert off.body.offer_id == 42
        # fee-bump inner operations surface under the outer tx index
        assert (3, 1, 0) in ops

    def test_transforms_consume_silver(self, spark, bronze):
        """The same production transforms run on XDR-decoded rows: TOID ids,
        memo clearing, [a,b) bounds, details JSON — no fixture shortcuts."""
        import json

        from stellar_etl_spark.transforms.operation import transform_operation
        from stellar_etl_spark.transforms.transaction import (
            transform_transaction,
        )

        txs = decode_transactions(bronze)
        ledgers = bronze.select(
            F.col("sequence"),
            F.col("closed_at"),
            F.col("protocol_version"),
        )
        out = {
            (r.ledger_sequence, r.application_order): r
            for r in transform_transaction(txs, ledgers).collect()
        }
        t = out[(2, 1)]
        assert t.id == (2 << 32) | (1 << 12)
        assert t.time_bounds == "[5,50)"
        assert t.account == GA
        assert out[(3, 1)].memo is None  # memo none cleared

        ops = transform_operation(decode_operations(bronze), txs, ledgers)
        rows = {r.id: r for r in ops.collect()}
        pay = rows[(2 << 32) | (1 << 12) | 1]
        assert pay.type_string == "payment"
        d = json.loads(pay.details_json)
        assert d["to"] == GB and d["amount"] == 15.0
        assert pay.closed_at is not None
