"""Authoritative per-entity output field sets, transcribed from the
reference's code-defined schemas (internal/transform/schema.go json tags):

- LedgerOutput            schema.go:13-36
- TransactionOutput       schema.go:38-79
- LedgerTransactionOutput schema.go:81-89
- AccountOutput           schema.go:92-116
- AccountSignerOutput     schema.go:119-129
- OperationOutput         schema.go:132-145
- ClaimableBalanceOutput  schema.go:148-166
- PoolOutput              schema.go:189-211
- AssetOutput             schema.go:214-221
- TrustlineOutput         schema.go:224-244
- OfferOutput             schema.go:247-269
- TradeOutput             schema.go:272-298
- EffectOutput            schema.go:373-384
- ContractDataOutput      schema.go:511-532
- ContractCodeOutput      schema.go:534-555
- ConfigSettingOutput     schema.go:557-606
- TtlOutput               schema.go:608-616
- ContractEventOutput     schema.go:618-633
- TokenTransferOutput     schema.go:635-653

``tests/test_golden_parity.py`` asserts every transform emits exactly these
columns (order-insensitive) plus at most the documented ``EXTRA_ALLOWED``
engine columns, and cross-checks the field sets against the reference's own
golden files (testdata/*/*.golden) when present.
"""

from __future__ import annotations

GOLDEN_FIELDS: dict[str, tuple[str, ...]] = {
    "ledgers": (
        "sequence", "ledger_hash", "previous_ledger_hash", "ledger_header",
        "transaction_count", "operation_count", "successful_transaction_count",
        "failed_transaction_count", "tx_set_operation_count", "closed_at",
        "total_coins", "fee_pool", "base_fee", "base_reserve",
        "max_tx_set_size", "protocol_version", "id", "soroban_fee_write_1kb",
        "node_id", "signature", "total_byte_size_of_bucket_list",
    ),
    "transactions": (
        "transaction_hash", "ledger_sequence", "account", "account_muxed",
        "account_sequence", "max_fee", "fee_charged", "operation_count",
        "tx_envelope", "tx_result", "tx_meta", "tx_fee_meta", "created_at",
        "memo_type", "memo", "time_bounds", "successful", "id", "fee_account",
        "fee_account_muxed", "inner_transaction_hash", "new_max_fee",
        "ledger_bounds", "min_account_sequence", "min_account_sequence_age",
        "min_account_sequence_ledger_gap", "extra_signers", "closed_at",
        "resource_fee", "soroban_resources_instructions",
        "soroban_resources_read_bytes", "soroban_resources_write_bytes",
        "transaction_result_code", "inclusion_fee_bid", "inclusion_fee_charged",
        "resource_fee_refund", "non_refundable_resource_fee_charged",
        "refundable_resource_fee_charged", "rent_fee_charged", "tx_signers",
    ),
    "ledger_transactions": (
        "ledger_sequence", "tx_envelope", "tx_result", "tx_meta",
        "tx_fee_meta", "tx_ledger_history", "closed_at",
    ),
    "accounts": (
        "account_id", "balance", "buying_liabilities", "selling_liabilities",
        "sequence_number", "sequence_ledger", "sequence_time",
        "num_subentries", "inflation_destination", "flags", "home_domain",
        "master_weight", "threshold_low", "threshold_medium", "threshold_high",
        "sponsor", "num_sponsored", "num_sponsoring", "last_modified_ledger",
        "ledger_entry_change", "deleted", "closed_at", "ledger_sequence",
    ),
    "account_signers": (
        "account_id", "signer", "weight", "sponsor", "last_modified_ledger",
        "ledger_entry_change", "deleted", "closed_at", "ledger_sequence",
    ),
    "operations": (
        "source_account", "source_account_muxed", "type", "type_string",
        "details", "transaction_id", "id", "closed_at",
        "operation_result_code", "operation_trace_code", "ledger_sequence",
        "details_json",
    ),
    "claimable_balances": (
        "balance_id", "claimants", "asset_code", "asset_issuer", "asset_type",
        "asset_id", "asset_amount", "sponsor", "flags", "last_modified_ledger",
        "ledger_entry_change", "deleted", "closed_at", "ledger_sequence",
        "balance_id_strkey",
    ),
    "liquidity_pools": (
        "liquidity_pool_id", "type", "fee", "trustline_count",
        "pool_share_count", "asset_a_type", "asset_a_code", "asset_a_issuer",
        "asset_a_amount", "asset_a_id", "asset_b_type", "asset_b_code",
        "asset_b_issuer", "asset_b_amount", "asset_b_id",
        "last_modified_ledger", "ledger_entry_change", "deleted", "closed_at",
        "ledger_sequence", "liquidity_pool_id_strkey",
    ),
    "assets": (
        "asset_code", "asset_issuer", "asset_type", "asset_id", "closed_at",
        "ledger_sequence",
    ),
    "trustlines": (
        "ledger_key", "account_id", "asset_code", "asset_issuer", "asset_type",
        "asset_id", "balance", "trust_line_limit", "liquidity_pool_id",
        "buying_liabilities", "selling_liabilities", "flags",
        "last_modified_ledger", "ledger_entry_change", "sponsor", "deleted",
        "closed_at", "ledger_sequence", "liquidity_pool_id_strkey",
    ),
    "offers": (
        "seller_id", "offer_id", "selling_asset_type", "selling_asset_code",
        "selling_asset_issuer", "selling_asset_id", "buying_asset_type",
        "buying_asset_code", "buying_asset_issuer", "buying_asset_id",
        "amount", "pricen", "priced", "price", "flags", "last_modified_ledger",
        "ledger_entry_change", "deleted", "sponsor", "closed_at",
        "ledger_sequence",
    ),
    "trades": (
        "order", "ledger_closed_at", "selling_account_address",
        "selling_asset_code", "selling_asset_issuer", "selling_asset_type",
        "selling_asset_id", "selling_amount", "buying_account_address",
        "buying_asset_code", "buying_asset_issuer", "buying_asset_type",
        "buying_asset_id", "buying_amount", "price_n", "price_d",
        "selling_offer_id", "buying_offer_id", "selling_liquidity_pool_id",
        "liquidity_pool_fee", "history_operation_id", "trade_type",
        "rounding_slippage", "seller_is_exact",
        "selling_liquidity_pool_id_strkey",
    ),
    "effects": (
        "address", "address_muxed", "operation_id", "details", "type",
        "type_string", "closed_at", "ledger_sequence", "index", "id",
    ),
    "contract_data": (
        "contract_id", "contract_key_type", "contract_durability",
        "asset_code", "asset_issuer", "asset_type", "balance_holder",
        "balance", "last_modified_ledger", "ledger_entry_change", "deleted",
        "closed_at", "ledger_sequence", "ledger_key_hash", "key",
        "key_decoded", "val", "val_decoded", "contract_data_xdr",
        "ledger_key_hash_base_64",
    ),
    "contract_code": (
        "contract_code_hash", "contract_code_ext_v", "last_modified_ledger",
        "ledger_entry_change", "deleted", "closed_at", "ledger_sequence",
        "ledger_key_hash", "contract_code", "n_instructions", "n_functions",
        "n_globals", "n_table_entries", "n_types", "n_data_segments",
        "n_elem_segments", "n_imports", "n_exports", "n_data_segment_bytes",
        "ledger_key_hash_base_64",
    ),
    "config_settings": (
        "config_setting_id", "contract_max_size_bytes",
        "ledger_max_instructions", "tx_max_instructions",
        "fee_rate_per_instructions_increment", "tx_memory_limit",
        "ledger_max_read_ledger_entries", "ledger_max_read_bytes",
        "ledger_max_write_ledger_entries", "ledger_max_write_bytes",
        "tx_max_read_ledger_entries", "tx_max_read_bytes",
        "tx_max_write_ledger_entries", "tx_max_write_bytes",
        "fee_read_ledger_entry", "fee_write_ledger_entry", "fee_read_1kb",
        "bucket_list_target_size_bytes", "write_fee_1kb_bucket_list_low",
        "write_fee_1kb_bucket_list_high",
        "bucket_list_write_fee_growth_factor", "fee_historical_1kb",
        "tx_max_contract_events_size_bytes", "fee_contract_events_1kb",
        "ledger_max_txs_size_bytes", "tx_max_size_bytes", "fee_tx_size_1kb",
        "contract_cost_params_cpu_insns", "contract_cost_params_mem_bytes",
        "contract_data_key_size_bytes", "contract_data_entry_size_bytes",
        "max_entry_ttl", "min_temporary_ttl", "min_persistent_ttl",
        "auto_bump_ledgers", "persistent_rent_rate_denominator",
        "temp_rent_rate_denominator", "max_entries_to_archive",
        "bucket_list_size_window_sample_size", "eviction_scan_size",
        "starting_eviction_scan_level", "ledger_max_tx_count",
        "bucket_list_size_window", "last_modified_ledger",
        "ledger_entry_change", "deleted", "closed_at", "ledger_sequence",
    ),
    "ttls": (
        "key_hash", "live_until_ledger_seq", "last_modified_ledger",
        "ledger_entry_change", "deleted", "closed_at", "ledger_sequence",
    ),
    "contract_events": (
        "transaction_hash", "transaction_id", "successful", "ledger_sequence",
        "closed_at", "in_successful_contract_call", "contract_id", "type",
        "type_string", "topics", "topics_decoded", "data", "data_decoded",
        "contract_event_xdr",
    ),
    "token_transfers": (
        "transaction_hash", "transaction_id", "operation_id", "event_topic",
        "from", "to", "asset", "asset_type", "asset_code", "asset_issuer",
        "amount", "amount_raw", "contract_id", "ledger_sequence", "closed_at",
        "to_muxed", "to_muxed_id",
    ),
}

# Engine-side columns we intentionally emit BEYOND the reference's schema —
# internal keys the compaction/routing operators use, plus ordering columns
# useful downstream.  Kept to a short, documented list so drift fails tests.
EXTRA_ALLOWED: dict[str, frozenset[str]] = {
    "accounts": frozenset({"ledger_entry_key"}),
    "account_signers": frozenset({"ledger_entry_key", "signer_order"}),
    "trustlines": frozenset({"ledger_entry_key"}),
    "offers": frozenset({"ledger_entry_key"}),
    "liquidity_pools": frozenset({"ledger_entry_key", "sponsor"}),
    "claimable_balances": frozenset({"ledger_entry_key"}),
    "contract_data": frozenset({"ledger_entry_key", "sponsor"}),
    "contract_code": frozenset({"ledger_entry_key", "sponsor"}),
    "config_settings": frozenset({"ledger_entry_key", "sponsor"}),
    "ttls": frozenset({"ledger_entry_key", "sponsor"}),
    "transactions": frozenset({"application_order"}),
    "ledger_transactions": frozenset({"application_order", "transaction_hash"}),
    "operations": frozenset(
        {"application_order", "transaction_hash", "transaction_successful",
         "sponsor"}
    ),
    "effects": frozenset({"operation_type"}),
    "assets": frozenset({"operation_id"}),
    "token_transfers": frozenset({"event_type"}),
}
