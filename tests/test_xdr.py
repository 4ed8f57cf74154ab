"""Pure-Python XDR codec tests (sources/xdr.py): encode → decode roundtrips
over real wire bytes built by the tests themselves, plus the V0/V1
LedgerCloseMeta normalization parity target (input/ledgers.go:33-50)."""

from __future__ import annotations

import struct

import pytest

from stellar_etl_spark.sources.xdr import (
    LedgerHeader,
    Reader,
    Writer,
    XdrError,
    encode_ledger_close_meta_v0,
    encode_ledger_close_meta_v1,
    parse_ledger_close_meta,
    read_ledger_header,
    read_transaction_envelope,
    real_lcm_decoder,
    write_ledger_header,
    write_transaction_envelope,
)

A = b"\x01" * 32
B = b"\x02" * 32
USD = {"type": "credit_alphanum4", "code": "USD", "issuer": B}
L12 = {"type": "credit_alphanum12", "code": "LONGCODE", "issuer": B}


def _sig(n=1):
    return [{"hint": b"\x09\x08\x07\x06", "signature": b"\xaa" * 64}] * n


def _env_v1(ops, memo=None, precond=None, source_id=None):
    return {
        "type": "v1",
        "tx": {
            "source": {"ed25519": A, "id": source_id},
            "fee": 100,
            "seq_num": 12345,
            "preconditions": precond or {},
            "memo": memo or {"type": "none"},
            "operations": ops,
            "soroban_data": None,
        },
        "signatures": _sig(),
    }


PAYMENT = {
    "source": None,
    "type": 1,
    "body": {"destination": {"ed25519": B, "id": None}, "asset": USD, "amount": 5},
}


class TestPrimitives:
    def test_padding_alignment(self):
        w = Writer()
        w.var_opaque(b"abc")  # 3 bytes → 1 pad byte
        raw = w.bytes()
        assert len(raw) == 8
        assert Reader(raw).var_opaque() == b"abc"

    def test_big_endian_ints(self):
        w = Writer()
        w.u32(0x01020304).i64(-2)
        raw = w.bytes()
        assert raw[:4] == b"\x01\x02\x03\x04"
        assert struct.unpack(">q", raw[4:])[0] == -2

    def test_truncation_raises(self):
        with pytest.raises(XdrError, match="truncated"):
            Reader(b"\x00\x01").u32()


class TestLedgerHeader:
    def test_roundtrip_all_fields(self):
        h = LedgerHeader(
            ledger_version=21,
            previous_ledger_hash=A,
            tx_set_hash=B,
            close_time=1_700_000_000,
            ledger_seq=30_822_015,
            total_coins=1_054_439_020_873_472_865,
            fee_pool=18_168_300_436_601,
            base_fee=100,
            base_reserve=5_000_000,
            max_tx_set_size=1000,
        )
        w = Writer()
        write_ledger_header(w, h)
        out = read_ledger_header(Reader(w.bytes()))
        assert out == h


class TestEnvelopes:
    @pytest.mark.parametrize(
        "op",
        [
            PAYMENT,
            {"source": None, "type": 0,
             "body": {"destination": A, "starting_balance": 10**7}},
            {"source": {"ed25519": B, "id": 7}, "type": 3,
             "body": {"selling": USD, "buying": {"type": "native"},
                      "amount": 50, "price": (1, 4), "offer_id": 42}},
            {"source": None, "type": 13,
             "body": {"send_asset": USD, "send_amount": 9,
                      "destination": {"ed25519": B, "id": None},
                      "dest_asset": L12, "dest_amount": 8, "path": [USD, L12]}},
            {"source": None, "type": 5,
             "body": {"inflation_dest": A, "clear_flags": 4, "set_flags": 3,
                      "master_weight": 1, "low_threshold": 0,
                      "med_threshold": 2, "high_threshold": 3,
                      "home_domain": "example.com",
                      "signer": {"key": {"type": 0, "key": B}, "weight": 5}}},
            {"source": None, "type": 6, "body": {"line": L12, "limit": 10**10}},
            {"source": None, "type": 8,
             "body": {"destination": {"ed25519": B, "id": None}}},
            {"source": None, "type": 10,
             "body": {"data_name": "cfg", "data_value": b"\x01\x02"}},
            {"source": None, "type": 11, "body": {"bump_to": 999}},
        ],
    )
    def test_v1_roundtrip_per_op(self, op):
        env = _env_v1([op])
        w = Writer()
        write_transaction_envelope(w, env)
        assert read_transaction_envelope(Reader(w.bytes())) == env

    def test_v0_roundtrip_with_time_bounds(self):
        env = {
            "type": "v0",
            "tx": {
                "source": {"ed25519": A, "id": None},
                "fee": 200,
                "seq_num": 7,
                "preconditions": {
                    "time_bounds": {"min_time": 0, "max_time": 1595884487}
                },
                "memo": {"type": "text", "text": "hello"},
                "operations": [PAYMENT],
            },
            "signatures": _sig(2),
        }
        w = Writer()
        write_transaction_envelope(w, env)
        assert read_transaction_envelope(Reader(w.bytes())) == env

    def test_fee_bump_roundtrip(self):
        env = {
            "type": "fee_bump",
            "fee_source": {"ed25519": B, "id": 3},
            "fee": 5000,
            "inner": _env_v1([PAYMENT], memo={"type": "id", "id": 77}),
            "signatures": _sig(),
        }
        w = Writer()
        write_transaction_envelope(w, env)
        assert read_transaction_envelope(Reader(w.bytes())) == env

    def test_preconditions_v2_roundtrip(self):
        env = _env_v1(
            [PAYMENT],
            precond={
                "time_bounds": {"min_time": 5, "max_time": 50},
                "ledger_bounds": {"min_ledger": 2, "max_ledger": 9},
                "min_seq_num": 100,
                "min_seq_age": 3600,
                "min_seq_ledger_gap": 2,
                "extra_signers": [{"type": 0, "key": B}],
            },
        )
        w = Writer()
        write_transaction_envelope(w, env)
        assert read_transaction_envelope(Reader(w.bytes())) == env

    def test_muxed_account_discriminants(self):
        env = _env_v1([PAYMENT], source_id=918273)
        w = Writer()
        write_transaction_envelope(w, env)
        raw = w.bytes()
        # MuxedAccount med25519 tag 0x100 right after the envelope tag
        assert raw[4:8] == b"\x00\x00\x01\x00"
        assert read_transaction_envelope(Reader(raw)) == env

    def test_unknown_op_type_raises(self):
        """XDR cannot skip an unknown union arm — the parser must refuse,
        never misparse."""
        from stellar_etl_spark.sources.xdr import read_operation

        w = Writer()
        w.u32(0)  # no source account
        w.u32(99)  # not an operation type
        with pytest.raises(XdrError, match="unsupported operation"):
            read_operation(Reader(w.bytes()))

    def test_all_27_operation_types_roundtrip(self):
        """Every operation type the protocol defines encodes and decodes —
        full GetOperations envelope coverage."""
        from stellar_etl_spark.sources.xdr import read_operation, write_operation

        sc_addr = {"type": "contract", "contract_id": b"\x07" * 32}
        bodies = {
            0: {"destination": A, "starting_balance": 10**7},
            1: PAYMENT["body"],
            2: {"send_asset": USD, "send_amount": 9,
                "destination": {"ed25519": B, "id": None},
                "dest_asset": L12, "dest_amount": 8, "path": []},
            3: {"selling": USD, "buying": {"type": "native"}, "amount": 5,
                "price": (1, 4), "offer_id": 42},
            4: {"selling": USD, "buying": {"type": "native"}, "amount": 5,
                "price": (1, 4)},
            5: {"inflation_dest": None, "clear_flags": None, "set_flags": 1,
                "master_weight": None, "low_threshold": None,
                "med_threshold": None, "high_threshold": None,
                "home_domain": None, "signer": None},
            6: {"line": {"type": "pool_share", "asset_a": USD,
                         "asset_b": {"type": "native"}, "fee": 30},
                "limit": 10**10},
            7: {"trustor": A, "asset_code": "USD", "authorize": 1},
            8: {"destination": {"ed25519": B, "id": None}},
            9: {},
            10: {"data_name": "k", "data_value": b"\x01"},
            11: {"bump_to": 7},
            12: {"selling": USD, "buying": {"type": "native"}, "amount": 5,
                 "price": (1, 4), "offer_id": 0},
            13: {"send_asset": USD, "send_amount": 9,
                 "destination": {"ed25519": B, "id": None},
                 "dest_asset": L12, "dest_amount": 8, "path": [USD]},
            14: {"asset": USD, "amount": 5, "claimants": [
                {"destination": A,
                 "predicate": {"type": "not", "pred": {"type": "unconditional"}}}]},
            15: {"balance_id": b"\x04" * 32},
            16: {"sponsored_id": B},
            17: {},
            18: {"ledger_key": {"type": 2, "seller_id": A, "offer_id": 42}},
            19: {"asset": USD, "from": {"ed25519": B, "id": None}, "amount": 3},
            20: {"balance_id": b"\x04" * 32},
            21: {"trustor": A, "asset": USD, "clear_flags": 2, "set_flags": 1},
            22: {"pool_id": b"\x05" * 32, "max_amount_a": 10, "max_amount_b": 20,
                 "min_price": (1, 2), "max_price": (2, 1)},
            23: {"pool_id": b"\x05" * 32, "amount": 9, "min_amount_a": 1,
                 "min_amount_b": 2},
            24: {"host_function": {"invoke_contract": {
                    "contract_address": sc_addr, "function_name": "transfer",
                    "args": [{"symbol": "x"}, {"i128": {"hi": 0, "lo": 5}}]}},
                 "auth": [{
                    "credentials": {"source_account": None},
                    "root_invocation": {
                        "function": {"contract_fn": {
                            "contract_address": sc_addr,
                            "function_name": "transfer", "args": []}},
                        "sub_invocations": []}}]},
            25: {"extend_to": 1000},
            26: {},
        }
        covered = 0
        for t, body in bodies.items():
            op = {"source": None, "type": t, "body": body}
            w = Writer()
            write_operation(w, op)
            assert read_operation(Reader(w.bytes())) == op, t
            covered += 1
        assert covered == 27  # the complete operation union


class TestLedgerCloseMeta:
    def _header(self, seq=2, t=1_704_067_210, proto=20):
        return LedgerHeader(
            ledger_version=proto,
            previous_ledger_hash=A,
            close_time=t,
            ledger_seq=seq,
            total_coins=10**12,
            fee_pool=100,
        )

    def test_v0_roundtrip_and_normalization(self):
        envs = [_env_v1([PAYMENT]), _env_v1([PAYMENT, PAYMENT])]
        raw = encode_ledger_close_meta_v0(
            self._header(), envs, tx_processing=[]
        )
        meta = parse_ledger_close_meta(raw)
        assert meta["version"] == 0
        assert meta["header"].ledger_seq == 2
        # ledgers.go:33-50: V0 exposes TransactionSet txs directly
        assert meta["envelopes"] == envs
        assert meta["tx_processing"] == []
        assert meta["tail"] == b""

    def test_v1_flattens_phases(self):
        """V1 GeneralizedTransactionSet: envelopes across phases/components
        flatten to the same list the reference's TransactionEnvelopes()
        yields (ledgers.go:43-50)."""
        p1 = [_env_v1([PAYMENT])]
        p2 = [_env_v1([PAYMENT]), _env_v1([PAYMENT])]
        raw = encode_ledger_close_meta_v1(self._header(seq=9, proto=21), [p1, p2])
        meta = parse_ledger_close_meta(raw)
        assert meta["version"] == 1
        assert meta["header"].ledger_version == 21
        assert meta["envelopes"] == p1 + p2

    def test_real_decoder_bronze_fields(self):
        raw = encode_ledger_close_meta_v0(
            self._header(seq=5, t=1_700_000_123, proto=19),
            [_env_v1([PAYMENT])] * 3,
        )
        d = real_lcm_decoder(raw)
        assert d == {
            "sequence": 5,
            "closed_at_unix": 1_700_000_123,
            "protocol_version": 19,
            "tx_count": 3,
        }

    def test_bad_version_raises(self):
        with pytest.raises(XdrError, match="version"):
            parse_ledger_close_meta(b"\x00\x00\x00\x09" + b"\x00" * 64)


class TestBronzeIntegration:
    def test_decode_ledger_files_real_xdr(self, spark, tmp_path):
        """End-to-end: write real XDR wire bytes as one-ledger-per-file
        objects, scan with binaryFile, decode with the DEFAULT (real)
        decoder, assert bronze rows."""
        from stellar_etl_spark.sources.bronze import (
            decode_ledger_files,
            read_ledger_files,
        )

        for seq in (2, 3, 4):
            h = LedgerHeader(
                ledger_version=20,
                close_time=1_704_067_200 + 5 * seq,
                ledger_seq=seq,
            )
            raw = encode_ledger_close_meta_v0(h, [_env_v1([PAYMENT])] * (seq - 1))
            (tmp_path / f"{seq}.xdr").write_bytes(raw)

        files = read_ledger_files(spark, str(tmp_path))
        rows = {r.sequence: r for r in decode_ledger_files(files).collect()}
        assert set(rows) == {2, 3, 4}
        assert rows[3].tx_count == 2
        assert rows[3].protocol_version == 20
        assert rows[4].closed_at.timestamp() == 1_704_067_220


class TestScValArmParity:
    """Byte-level + JSON-shape checks for the ScVal arms the mainnet/change
    goldens never exercise (round-3 verdict item 6): u256/i256 limbs, both
    SCError union arms, timepoint/duration, and a nested map-of-vectors.
    The wire bytes are HAND-PACKED here (not produced by the writer under
    test), so decode, re-encode, and the xdrjson-shaped rendering are each
    checked independently."""

    @staticmethod
    def _arm(raw: bytes):
        import json

        from stellar_etl_spark.sources.xdr import Reader, Writer
        from stellar_etl_spark.sources.xdr_ledger import (
            read_sc_val,
            write_sc_val,
        )
        from stellar_etl_spark.sources.silver import sc_val_json

        v = read_sc_val(Reader(raw))
        w = Writer()
        write_sc_val(w, v)
        assert w.bytes() == raw, "re-encode is not byte-exact"
        return json.loads(sc_val_json(v))

    def test_u256_named_limbs(self):
        import struct

        raw = struct.pack(">I4Q", 11, 1, 2, 3, 4)
        assert self._arm(raw) == {
            "u256": {"hi_hi": 1, "hi_lo": 2, "lo_hi": 3, "lo_lo": 4}
        }

    def test_i256_signed_hi_limb(self):
        import struct

        # hi_hi = -1 as two's-complement u64 on the wire
        raw = struct.pack(">I4Q", 12, (1 << 64) - 1, 2, 3, 4)
        assert self._arm(raw) == {
            "i256": {"hi_hi": -1, "hi_lo": 2, "lo_hi": 3, "lo_lo": 4}
        }

    def test_error_contract_arm(self):
        import struct

        raw = struct.pack(">IiI", 2, 0, 5)  # SCE_CONTRACT, contractCode 5
        assert self._arm(raw) == {"error": {"contract": 5}}

    def test_error_code_arm(self):
        import struct

        # SCE_WASM_VM (1) + SCEC_EXCEEDED_LIMIT (5)
        raw = struct.pack(">Iii", 2, 1, 5)
        assert self._arm(raw) == {"error": {"wasm_vm": "exceeded_limit"}}

    def test_timepoint_and_duration(self):
        import struct

        assert self._arm(struct.pack(">IQ", 7, 1714314460)) == {
            "timepoint": 1714314460
        }
        assert self._arm(struct.pack(">IQ", 8, 3600)) == {"duration": 3600}

    def test_string_renders_utf8(self):
        import struct

        raw = struct.pack(">II", 14, 5) + b"admin\x00\x00\x00"
        assert self._arm(raw) == {"string": "admin"}

    def test_nested_map_of_vectors(self):
        import struct

        def sym(s: str) -> bytes:
            pad = (4 - len(s) % 4) % 4
            return struct.pack(">II", 15, len(s)) + s.encode() + b"\x00" * pad

        # map{ "assets" -> vec[ symbol "USD", i128{0, 7} ] }
        val = (
            struct.pack(">III", 17, 1, 1)  # map, some, 1 entry
            + sym("assets")
            + struct.pack(">III", 16, 1, 2)  # vec, some, 2 elems
            + sym("USD")
            + struct.pack(">IqQ", 10, 0, 7)  # i128 hi=0 lo=7
        )
        assert self._arm(val) == {
            "map": [
                {
                    "key": {"symbol": "assets"},
                    "val": {
                        "vec": [
                            {"symbol": "USD"},
                            {"i128": {"hi": 0, "lo": 7}},
                        ]
                    },
                }
            ]
        }

    def test_contract_instance_rendering(self):
        import struct

        # SCV_CONTRACT_INSTANCE, wasm executable, storage some-empty
        raw = (
            struct.pack(">II", 19, 0)
            + bytes(range(32))
            + struct.pack(">II", 1, 0)
        )
        assert self._arm(raw) == {
            "contract_instance": {
                "executable": {"wasm": bytes(range(32)).hex()},
                "storage": [],
            }
        }

    def test_stellar_asset_executable(self):
        import struct

        raw = struct.pack(">III", 19, 1, 0)  # stellar_asset, storage None
        assert self._arm(raw) == {
            "contract_instance": {
                "executable": "stellar_asset",
                "storage": None,
            }
        }
