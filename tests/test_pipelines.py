"""End-to-end pipeline tests: fixture silver tables → transform → sinks on a
tmp dir (the reference's golden-file CLI test model, cmd/*_test.go)."""

from __future__ import annotations

import glob
import json

import fixtures as fx
from stellar_etl_spark.plans import (
    EXPORT_PIPELINES,
    export_ledger_entry_changes,
    export_ledgers,
    export_trades,
    get_ledger_range_from_times,
)


def _read_jsonl(path_glob: str) -> list[dict]:
    rows = []
    for f in glob.glob(path_glob):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    return rows


class TestPipelines:
    def test_registry_covers_reference_commands(self):
        # the 11 export subcommands + the range lookup (SURVEY.md §2.1/§3)
        assert len(EXPORT_PIPELINES) == 12

    def test_export_ledgers_jsonl(self, spark, tmp_path):
        export_ledgers(
            fx.ledgers_df(spark),
            fx.transactions_df(spark),
            str(tmp_path),
            start=2,
            end=3,
            extra_fields={"network": "testnet"},
        )
        rows = _read_jsonl(str(tmp_path / "ledgers.jsonl" / "part-*"))
        assert {r["sequence"] for r in rows} == {2, 3}
        by_seq = {r["sequence"]: r for r in rows}
        assert by_seq[2]["tx_set_operation_count"] == "4"
        assert by_seq[2]["network"] == "testnet"
        # explicit nulls present (ExportEntry parity)
        assert "node_id" in by_seq[2]

    def test_export_trades_range_filter(self, spark, tmp_path):
        out = export_trades(
            fx.operations_df(spark), fx.ledgers_df(spark), str(tmp_path),
            start=3, end=3,
        )
        rows = _read_jsonl(str(tmp_path / "trades.jsonl" / "part-*"))
        assert len(rows) == out.count() == 2

    def test_export_changes_batched_entities(self, spark, tmp_path):
        out = export_ledger_entry_changes(
            fx.changes_df(spark), str(tmp_path), batch_size=64
        )
        assert set(out) == set(
            "accounts account_signers trustlines offers liquidity_pools "
            "claimable_balances contract_code contract_data config_settings "
            "ttls".split()
        )
        accounts = _read_jsonl(str(tmp_path / "accounts" / "part-*"))
        assert {a["account_id"] for a in accounts} == {fx.ACCOUNT_A, fx.ACCOUNT_B}
        # nonce contract-data entry dropped by the transform
        cd = _read_jsonl(str(tmp_path / "contract_data" / "part-*"))
        assert len(cd) == 1

    def test_ledger_range_lookup(self, spark):
        import datetime as dt

        r = get_ledger_range_from_times(
            fx.ledgers_df(spark),
            fx.EPOCH,
            fx.EPOCH + dt.timedelta(seconds=7),
        ).collect()[0]
        assert (r.start_seq, r.end_seq) == (2, 3)
