"""Mutation/truncation fuzz of the XDR codec over REAL mainnet golden blobs.

Behavioral spec = the reference's strict generated-Go decode
(internal/input/ledgers.go:25 unmarshals the raw LedgerCloseMeta and aborts
on any error): a corrupted input must either

  (a) raise ``XdrError`` — the ONLY exception type allowed to escape the
      codec (never struct.error / UnicodeDecodeError / RecursionError /
      MemoryError), or
  (b) decode successfully AND re-encode byte-exactly to the consumed prefix
      of the mutated input.  A flipped byte can land in a value field —
      that is legitimately different data, not a misparse; the canonical
      re-encode proves the parser consumed every byte faithfully.  A
      "successful" decode whose re-encode differs from what it consumed IS
      a silent misparse and fails the test.

Pure-Python fuzz (no Spark session) — runs the codec on thousands of
mutated blobs in seconds.  Deterministic seeds; no time/entropy sources.
"""

from __future__ import annotations

import base64

import pytest


from golden_lcm import assemble_golden_lcms, golden_rows, have_goldens

from stellar_etl_spark.sources.xdr import (
    Reader,
    Writer,
    XdrError,
    read_ledger_header,
    read_transaction_envelope,
    real_lcm_decoder,
    write_ledger_header,
    write_transaction_envelope,
)
from stellar_etl_spark.sources.xdr_ledger import (
    read_ledger_entry_changes,
    read_transaction_meta,
    read_transaction_result,
    write_ledger_entry_changes,
    write_transaction_meta,
    write_transaction_result,
)

# deep fuzz corpus: slow tier (fast XDR coverage: test_xdr.py, test_xdr_golden.py)
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not have_goldens(), reason="reference goldens unavailable"
    ),
]

# (decode, encode) pairs fuzzable with the canonical re-encode property.
PAIRS = {
    "tx_envelope": (read_transaction_envelope, write_transaction_envelope),
    "tx_result": (read_transaction_result, write_transaction_result),
    "tx_meta": (read_transaction_meta, write_transaction_meta),
    "tx_fee_meta": (read_ledger_entry_changes, write_ledger_entry_changes),
}

ALLOWED = (XdrError,)


def _golden_blobs(column: str, limit: int = 40) -> list[bytes]:
    seen: set[bytes] = set()
    out: list[bytes] = []
    for row in golden_rows("transactions"):
        b = base64.b64decode(row[column])
        if b not in seen:
            seen.add(b)
            out.append(b)
        if len(out) >= limit:
            break
    assert out, f"no golden {column} blobs"
    return out


def _check(decode, encode, mutated: bytes) -> str:
    """Run the fuzz contract on one mutated blob; return a failure message
    or '' on compliance."""
    r = Reader(mutated)
    try:
        v = decode(r)
    except ALLOWED:
        return ""
    except Exception as e:  # noqa: BLE001 — the contract IS the except type
        return f"leaked {type(e).__name__}: {e!r}"
    w = Writer()
    try:
        encode(w, v)
    except Exception as e:  # noqa: BLE001
        return f"decode ok but re-encode raised {type(e).__name__}: {e!r}"
    if w.bytes() != mutated[: r.pos]:
        return (
            f"SILENT MISPARSE: decode consumed {r.pos} bytes but re-encode "
            f"differs (len {len(w.bytes())})"
        )
    return ""


def _xorshift(state: int) -> int:
    # tiny deterministic PRNG — no random module, reproducible everywhere
    state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
    state ^= state >> 7
    state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
    return state


class TestComponentBlobFuzz:
    @pytest.mark.parametrize("column", sorted(PAIRS))
    def test_byte_flips(self, column):
        decode, encode = PAIRS[column]
        failures = []
        for blob in _golden_blobs(column):
            s = 0x9E3779B97F4A7C15 ^ len(blob)
            for _ in range(60):
                s = _xorshift(s)
                pos = s % len(blob)
                s = _xorshift(s)
                flip = (s % 255) + 1  # never a zero XOR (no-op)
                m = bytearray(blob)
                m[pos] ^= flip
                msg = _check(decode, encode, bytes(m))
                if msg:
                    failures.append(f"{column} pos={pos} xor={flip}: {msg}")
        assert failures == [], failures[:5]

    @pytest.mark.parametrize("column", sorted(PAIRS))
    def test_truncations(self, column):
        decode, encode = PAIRS[column]
        failures = []
        for blob in _golden_blobs(column):
            s = 0xDEADBEEFCAFEF00D ^ len(blob)
            cuts = {0, 1, 2, 3, 4, len(blob) - 1}
            for _ in range(30):
                s = _xorshift(s)
                cuts.add(s % len(blob))
            for cut in sorted(c for c in cuts if 0 <= c < len(blob)):
                msg = _check(decode, encode, blob[:cut])
                if msg:
                    failures.append(f"{column} cut={cut}: {msg}")
        assert failures == [], failures[:5]

    @pytest.mark.parametrize("column", sorted(PAIRS))
    def test_length_field_inflation(self, column):
        """Overwrite aligned 32-bit words with huge values — mutated length
        prefixes must bounds-check against the remaining bytes, never
        attempt a multi-GB allocation or busy-loop."""
        decode, encode = PAIRS[column]
        failures = []
        for blob in _golden_blobs(column, limit=15):
            for word in range(0, min(len(blob) // 4, 64)):
                for big in (b"\xff\xff\xff\xff", b"\x7f\xff\xff\xff"):
                    m = bytearray(blob)
                    m[word * 4 : word * 4 + 4] = big
                    msg = _check(decode, encode, bytes(m))
                    if msg:
                        failures.append(f"{column} word={word}: {msg}")
        assert failures == [], failures[:5]


class _TracingReader(Reader):
    """Records the byte offset of every 4-byte word read (u32/i32 — every
    union discriminant, length prefix, bool and enum goes through these),
    so the swap fuzz can target exactly the positions the parser actually
    interprets as structure."""

    __slots__ = ("word_positions",)

    def __init__(self, buf: bytes):
        super().__init__(buf)
        self.word_positions: list[int] = []

    def u32(self) -> int:
        self.word_positions.append(self.pos)
        return super().u32()

    def i32(self) -> int:
        self.word_positions.append(self.pos)
        return super().i32()


class TestDiscriminantSwapFuzz:
    """Round-9 verdict item 6: structure-aware union-arm swaps.  Random byte
    flips almost always turn a discriminant into an INVALID value (clean
    XdrError); rewriting each structurally-read word to each *valid other*
    arm (op types 0–26 — covering memo kinds 0–4, change types 0–3, meta
    versions, SCVal tags as subsets) steers the decode INTO a different
    arm's parser, where arm-confusion bugs live: two arms sharing a parse
    path with subtly different field order, padding, or sign would decode
    "successfully" but re-encode differently — the canonical re-encode
    check (same contract as the byte-flip fuzz) catches exactly that.
    Spec: the reference's generated-Go strict decode over
    internal/transform/operation.go:584-1173's 27-arm switch."""

    ARMS = list(range(27))
    MAX_POSITIONS = 200

    @pytest.mark.parametrize("column", sorted(PAIRS))
    def test_valid_arm_swaps_canonical(self, column):
        decode, encode = PAIRS[column]
        failures = []
        for blob in _golden_blobs(column, limit=6):
            tr = _TracingReader(blob)
            decode(tr)  # clean golden must decode; collect word offsets
            positions = tr.word_positions
            if len(positions) > self.MAX_POSITIONS:
                # even stride sample keeps deep tx_meta blobs affordable
                stride = len(positions) / self.MAX_POSITIONS
                positions = [
                    positions[int(i * stride)]
                    for i in range(self.MAX_POSITIONS)
                ]
            for pos in positions:
                orig = int.from_bytes(blob[pos : pos + 4], "big")
                for arm in self.ARMS:
                    if arm == orig:
                        continue
                    m = bytearray(blob)
                    m[pos : pos + 4] = arm.to_bytes(4, "big")
                    msg = _check(decode, encode, bytes(m))
                    if msg:
                        failures.append(
                            f"{column} pos={pos} {orig}->{arm}: {msg}"
                        )
        assert failures == [], failures[:5]


class TestLcmFuzz:
    """Top-level real_lcm_decoder: corrupted LedgerCloseMeta must raise
    XdrError or decode cleanly — never leak another exception type."""

    @pytest.fixture(scope="class")
    def lcms(self):
        return list(assemble_golden_lcms().values())

    def _probe(self, mutated: bytes) -> str:
        try:
            real_lcm_decoder(mutated)
        except ALLOWED:
            return ""
        except Exception as e:  # noqa: BLE001
            return f"leaked {type(e).__name__}: {e!r}"
        return ""

    def test_byte_flips_and_truncations(self, lcms):
        failures = []
        for blob in lcms:
            s = 0xA5A5A5A55A5A5A5A ^ len(blob)
            for _ in range(120):
                s = _xorshift(s)
                pos = s % len(blob)
                s = _xorshift(s)
                flip = (s % 255) + 1
                m = bytearray(blob)
                m[pos] ^= flip
                msg = self._probe(bytes(m))
                if msg:
                    failures.append(f"flip pos={pos} xor={flip}: {msg}")
            for _ in range(40):
                s = _xorshift(s)
                msg = self._probe(blob[: s % len(blob)])
                if msg:
                    failures.append(f"truncate: {msg}")
        assert failures == [], failures[:5]

    def test_discriminant_swaps_no_leak(self, lcms, monkeypatch):
        """Round-9 extension of the swap fuzz to the TOP-LEVEL decoder:
        every word the full LCM parse (tx_processing included) actually
        reads, rewritten to each valid other arm 0-26 — steering the parse
        into sibling arms deep in the result/meta stream where foreign
        exceptions (struct.error, KeyError, RecursionError) could lurk.
        Contract: XdrError or clean decode, nothing else escapes.  (The
        component fuzz adds the stronger canonical re-encode check; the
        assembled LCM has no single re-encoder, so the leak contract is
        the bar here.)"""
        from stellar_etl_spark.sources import xdr as xdr_mod
        from stellar_etl_spark.sources.xdr import parse_ledger_close_meta

        captured: list = []

        class _Capture(_TracingReader):
            def __init__(self, buf: bytes):
                super().__init__(buf)
                captured.append(self)

        failures = []
        for blob in lcms[:2]:
            captured.clear()
            with monkeypatch.context() as m:
                m.setattr(xdr_mod, "Reader", _Capture)
                parse_ledger_close_meta(blob, tx_processing=True)
            # captured[0] is the top-level reader over the original blob;
            # nested readers (if any) index other buffers — skip them
            positions = captured[0].word_positions
            if len(positions) > 200:
                stride = len(positions) / 200
                positions = [positions[int(i * stride)] for i in range(200)]
            for pos in positions:
                orig = int.from_bytes(blob[pos : pos + 4], "big")
                for arm in range(27):
                    if arm == orig:
                        continue
                    mblob = bytearray(blob)
                    mblob[pos : pos + 4] = arm.to_bytes(4, "big")
                    try:
                        parse_ledger_close_meta(
                            bytes(mblob), tx_processing=True
                        )
                    except ALLOWED:
                        pass
                    except Exception as e:  # noqa: BLE001 — the contract
                        failures.append(
                            f"pos={pos} {orig}->{arm}: leaked "
                            f"{type(e).__name__}: {e!r}"
                        )
        assert failures == [], failures[:5]

    def test_version_discriminant_sweep(self, lcms):
        """Every possible LCM version word: only 0/1 decode (V2+ unknown
        arms raise), and nothing leaks."""
        blob = lcms[0]
        for v in list(range(8)) + [0xFFFFFFFF]:
            m = bytearray(blob)
            m[0:4] = v.to_bytes(4, "big")
            msg = self._probe(bytes(m))
            assert msg == "", f"version={v}: {msg}"


class TestCraftedHostiles:
    """Hand-crafted adversarial shapes the random fuzz is unlikely to hit."""

    def test_deep_scval_nesting_raises_xdrerror(self):
        """A 10k-level vec chain must hit the depth guard, not the Python
        recursion limit (SCVal: type=16 vec, optional=1, len=1, ...)."""
        from stellar_etl_spark.sources.xdr_ledger import read_sc_val

        level = (16).to_bytes(4, "big") + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
        blob = level * 10_000 + (1).to_bytes(4, "big")  # innermost: void
        with pytest.raises(XdrError, match="nesting"):
            read_sc_val(Reader(blob))

    def test_deep_auth_invocation_raises_xdrerror(self):
        from stellar_etl_spark.sources.xdr import (
            _read_soroban_authorized_invocation,
        )

        # SorobanAuthorizedFunction type=0 (contract_fn) needs args; use a
        # minimal InvokeContractArgs: SCAddress(contract, 32 zero bytes),
        # fn symbol "a", zero args — then sub_invocations len=1, repeat.
        args = (
            (1).to_bytes(4, "big")  # SCAddress type contract
            + b"\x00" * 32
            + (1).to_bytes(4, "big") + b"a\x00\x00\x00"  # symbol "a"
            + (0).to_bytes(4, "big")  # 0 call args
        )
        level = (0).to_bytes(4, "big") + args + (1).to_bytes(4, "big")
        blob = level * 2_000
        with pytest.raises(XdrError, match="nesting|truncated"):
            _read_soroban_authorized_invocation(Reader(blob))

    def test_nonzero_padding_rejected(self):
        """RFC 4506 §3 residual bytes must be zero — the strict decode the
        reference's generated Go XDR applies."""
        r = Reader((1).to_bytes(4, "big") + b"a\x01\x00\x00")
        with pytest.raises(XdrError, match="padding"):
            r.var_opaque()

    def test_invalid_utf8_string_raises_xdrerror(self):
        r = Reader((2).to_bytes(4, "big") + b"\xff\xfe\x00\x00")
        with pytest.raises(XdrError, match="utf-8"):
            r.string()

    def test_huge_array_length_is_bounds_checked(self):
        """len=0xFFFFFFFF must fail on the FIRST element read (lazy range),
        not preallocate."""
        r = Reader(b"\xff\xff\xff\xff")
        with pytest.raises(XdrError, match="truncated"):
            r.array(lambda: r.u32())


class TestBronzePathFailsLoudly:
    """The production entry point: a corrupted ledger FILE in a bronze batch
    must fail the Spark job with the XdrError surfaced — never silently
    yield wrong or partial rows for that batch.  Mirrors the reference's
    abort-on-decode-error (internal/input/ledgers.go:25)."""

    def test_corrupted_ledger_file_fails_job(self, spark, tmp_path):
        import os

        from golden_lcm import write_golden_ledger_dir

        from stellar_etl_spark.sources.bronze import (
            decode_ledger_files,
            read_ledger_files,
        )
        from stellar_etl_spark.sources.silver import decode_transactions

        d = str(tmp_path / "ledgers")
        lcms = write_golden_ledger_dir(d)
        assert len(lcms) >= 2
        # clean decode first: all ledgers come back
        clean = decode_ledger_files(read_ledger_files(spark, d))
        assert clean.count() == len(lcms)

        victim = sorted(os.listdir(d))[0]
        p = os.path.join(d, victim)
        raw = open(p, "rb").read()

        # (a) truncation INSIDE the envelope region → the bronze prefix
        # decode itself must fail the job
        with open(p, "wb") as fh:
            fh.write(raw[: len(raw) // 16])
        bad = decode_ledger_files(read_ledger_files(spark, d))
        with pytest.raises(Exception) as ei:
            bad.collect()
        assert "XdrError" in str(ei.value) or "truncated" in str(ei.value)

        # (b) truncation in the tx-processing TAIL: bronze is a prefix
        # decode by design (tx_processing=False — silver owns the tail),
        # so bronze still yields the header row, but the SILVER decode
        # that consumes results/meta must fail loudly — never emit
        # partial tx rows for the broken ledger
        with open(p, "wb") as fh:
            fh.write(raw[: len(raw) // 2])
        bronze = decode_ledger_files(read_ledger_files(spark, d))
        assert bronze.count() == len(lcms)  # prefix intact
        with pytest.raises(Exception) as ei2:
            decode_transactions(bronze).collect()
        assert "XdrError" in str(ei2.value) or "truncated" in str(ei2.value)
