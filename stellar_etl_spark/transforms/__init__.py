"""Stellar entity transforms — each module mirrors one reference transform
file (internal/transform/*.go) as a pure DataFrame→DataFrame function built
from column expressions (SURVEY.md §2.3)."""

from stellar_etl_spark.transforms.asset import transform_asset
from stellar_etl_spark.transforms.changes import (
    account_signers_changed,
    extract_entry_from_change,
    transform_account,
    transform_claimable_balance,
    transform_contract_code,
    transform_offer,
    transform_pool,
    transform_signers,
    transform_trustline,
    transform_ttl,
)
from stellar_etl_spark.transforms.contract_events import transform_contract_events
from stellar_etl_spark.transforms.effects import transform_effects, transform_sac_effects
from stellar_etl_spark.transforms.ledger import transform_ledger
from stellar_etl_spark.transforms.offer_normalized import transform_offer_normalized
from stellar_etl_spark.transforms.operation import transform_operation
from stellar_etl_spark.transforms.token_transfer import transform_token_transfer
from stellar_etl_spark.transforms.trade import transform_trade
from stellar_etl_spark.transforms.transaction import transform_transaction

__all__ = [
    "account_signers_changed",
    "extract_entry_from_change",
    "transform_account",
    "transform_asset",
    "transform_claimable_balance",
    "transform_contract_code",
    "transform_contract_events",
    "transform_effects",
    "transform_sac_effects",
    "transform_ledger",
    "transform_offer",
    "transform_offer_normalized",
    "transform_operation",
    "transform_pool",
    "transform_signers",
    "transform_token_transfer",
    "transform_trade",
    "transform_transaction",
    "transform_trustline",
    "transform_ttl",
]
