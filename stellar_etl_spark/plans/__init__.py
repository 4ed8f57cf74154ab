"""Export pipelines — the reference's 11 CLI commands as composable jobs."""

from stellar_etl_spark.plans.pipelines import (
    EXPORT_PIPELINES,
    export_assets,
    export_contract_events,
    export_effects,
    export_ledger_entry_changes,
    export_ledger_transactions,
    export_ledgers,
    export_operations,
    export_orderbooks,
    export_token_transfers,
    export_trades,
    export_transactions,
    get_ledger_range_from_times,
)

__all__ = [
    "EXPORT_PIPELINES",
    "export_assets",
    "export_contract_events",
    "export_effects",
    "export_ledger_entry_changes",
    "export_ledger_transactions",
    "export_ledgers",
    "export_operations",
    "export_orderbooks",
    "export_token_transfers",
    "export_trades",
    "export_transactions",
    "get_ledger_range_from_times",
]
