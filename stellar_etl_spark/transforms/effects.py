"""history_effects fan-out (reference: internal/transform/effects.go:23-166).

Shape: per successful-tx operation, build an ARRAY of effect structs with a
``when`` chain keyed on op type (the reference's addXEffects dispatcher,
effects.go:73-135), then ``posexplode`` — the 1→N pattern without any
row-at-a-time code.  Effect id = "{operation_id}-{index}" (effects.go:162);
index is the emission position within the op.

Covered builders (the high-frequency classic set): create_account, payment,
path payments (as payment effects), account_merge, change_trust,
allow_trust/set_trust_line_flags, set_options signer effects, manage_data,
bump_sequence, create/claim claimable balance, clawback, inflation.
Soroban/SAC event effects live in transforms.token_transfer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.scalars import stroops_to_real
from stellar_etl_spark.functions.toid import toid

# Effect type ids/strings (schema.go:372-481 enum subset).
EFFECT_TYPES = {
    "account_created": 0,
    "account_removed": 1,
    "account_credited": 2,
    "account_debited": 3,
    "account_thresholds_updated": 4,
    "account_home_domain_updated": 5,
    "account_flags_updated": 6,
    "signer_created": 10,
    "signer_removed": 11,
    "signer_updated": 12,
    "trustline_created": 20,
    "trustline_removed": 21,
    "trustline_updated": 22,
    "trustline_flags_updated": 26,
    "claimable_balance_created": 50,
    "claimable_balance_claimant_created": 51,
    "claimable_balance_claimed": 52,
    "account_sponsorship_created": 60,
    "account_sponsorship_updated": 61,
    "account_sponsorship_removed": 62,
    "data_created": 40,
    "data_removed": 41,
    "data_updated": 42,
    "sequence_bumped": 43,
    "trade": 33,
    "liquidity_pool_deposited": 90,
    "liquidity_pool_withdrew": 91,
    "liquidity_pool_trade": 92,
}


def _effect(kind: str, address: Column, details: Column) -> Column:
    return F.struct(
        F.lit(kind).alias("type_string"),
        F.lit(EFFECT_TYPES[kind]).cast("int").alias("type"),
        address.alias("address"),
        details.alias("details_json"),
    )


def _j(**kv) -> Column:
    return F.to_json(
        F.struct(*[v.alias(k) for k, v in kv.items()]), {"ignoreNullFields": "true"}
    )


def transform_effects(operations: DataFrame, transactions: DataFrame) -> DataFrame:
    """One row per emitted effect; only successful txs emit (effects.go:55-57)."""
    tx_src = transactions.select(
        F.col("ledger_sequence").alias("_ls"),
        F.col("tx_index").alias("_ti"),
        F.col("source_account").alias("_tx_source"),
    )
    ops = operations.where(F.col("tx_successful")).join(
        tx_src,
        (operations.ledger_sequence == tx_src._ls)
        & (operations.tx_index == tx_src._ti),
        "left",
    )

    body = F.col("body")
    source = F.coalesce(F.col("source_account"), F.col("_tx_source"))
    t = F.col("type")
    amount = stroops_to_real(body["amount"])
    asset_json = _j(
        asset_type=body["asset"]["asset_type"],
        asset_code=body["asset"]["asset_code"],
        asset_issuer=body["asset"]["asset_issuer"],
        amount=amount,
    )
    empty = F.array().cast(
        "array<struct<type_string:string,type:int,address:string,details_json:string>>"
    )

    # trade effects from claim atoms (effects.go addTradeEffects): one effect
    # for each side of every non-zero atom; LP counter-parties get the LP
    # variant.  flatten(transform(...)) keeps the fan-out JVM-side.
    live_atoms = F.filter(
        F.coalesce(
            F.col("claim_atoms"),
            F.array().cast(operations.schema["claim_atoms"].dataType),
        ),
        lambda a: (a["amount_sold"] != 0) | (a["amount_bought"] != 0),
    )

    def _atom_details(a, sold_first: bool):
        give, got = (a["asset_sold"], a["asset_bought"])
        give_amt, got_amt = (a["amount_sold"], a["amount_bought"])
        if not sold_first:
            give, got, give_amt, got_amt = got, give, got_amt, give_amt
        return _j(
            offer_id=a["offer_id"],
            sold_asset_type=give["asset_type"],
            sold_asset_code=give["asset_code"],
            sold_amount=stroops_to_real(give_amt),
            bought_asset_type=got["asset_type"],
            bought_asset_code=got["asset_code"],
            bought_amount=stroops_to_real(got_amt),
            liquidity_pool_id=a["pool_id"],
        )

    trade_effects = F.flatten(
        F.transform(
            live_atoms,
            lambda a: F.array(
                # buyer side: the op source bought what the atom sold
                F.struct(
                    F.when(a["atom_type"] == "lp", F.lit("liquidity_pool_trade"))
                    .otherwise(F.lit("trade"))
                    .alias("type_string"),
                    F.when(
                        a["atom_type"] == "lp",
                        F.lit(EFFECT_TYPES["liquidity_pool_trade"]),
                    )
                    .otherwise(F.lit(EFFECT_TYPES["trade"]))
                    .cast("int")
                    .alias("type"),
                    source.alias("address"),
                    _atom_details(a, sold_first=False).alias("details_json"),
                ),
                # seller side: the resting offer's owner (or the pool)
                F.struct(
                    F.when(a["atom_type"] == "lp", F.lit("liquidity_pool_trade"))
                    .otherwise(F.lit("trade"))
                    .alias("type_string"),
                    F.when(
                        a["atom_type"] == "lp",
                        F.lit(EFFECT_TYPES["liquidity_pool_trade"]),
                    )
                    .otherwise(F.lit(EFFECT_TYPES["trade"]))
                    .cast("int")
                    .alias("type"),
                    F.coalesce(a["seller_id"], a["pool_id"]).alias("address"),
                    _atom_details(a, sold_first=True).alias("details_json"),
                ),
            ),
        )
    )

    effects_array = (
        # create_account → account_created + account_debited + signer_created
        # (effects.go addAccountCreatedEffects)
        F.when(
            t == 0,
            F.array(
                _effect(
                    "account_created",
                    body["account"],
                    _j(starting_balance=stroops_to_real(body["starting_balance"])),
                ),
                _effect(
                    "account_debited",
                    source,
                    _j(
                        asset_type=F.lit("native"),
                        amount=stroops_to_real(body["starting_balance"]),
                    ),
                ),
                _effect(
                    "signer_created",
                    body["account"],
                    _j(weight=F.lit(1), public_key=body["account"]),
                ),
            ),
        )
        # payment / path payments → credited + debited
        .when(
            t.isin(1, 2, 13),
            F.array(
                _effect("account_credited", body["to"], asset_json),
                _effect("account_debited", F.coalesce(body["from"], source), asset_json),
            ),
        )
        # account_merge → removed + credited(dest) + debited(src)
        .when(
            t == 8,
            F.array(
                _effect(
                    "account_debited",
                    source,
                    _j(asset_type=F.lit("native"), amount=amount),
                ),
                _effect(
                    "account_credited",
                    body["to"],
                    _j(asset_type=F.lit("native"), amount=amount),
                ),
                _effect("account_removed", source, _j(account=source)),
            ),
        )
        # change_trust → trustline created (limit>0) or removed (limit==0)
        .when(
            (t == 6) & (body["limit"] > 0),
            F.array(
                _effect(
                    "trustline_created",
                    source,
                    _j(
                        asset_type=body["line"]["asset_type"],
                        asset_code=body["line"]["asset_code"],
                        asset_issuer=body["line"]["asset_issuer"],
                        limit=stroops_to_real(body["limit"]),
                    ),
                )
            ),
        )
        .when(
            (t == 6) & (body["limit"] == 0),
            F.array(
                _effect(
                    "trustline_removed",
                    source,
                    _j(
                        asset_type=body["line"]["asset_type"],
                        asset_code=body["line"]["asset_code"],
                        asset_issuer=body["line"]["asset_issuer"],
                    ),
                )
            ),
        )
        # allow_trust / set_trust_line_flags → trustline_flags_updated
        .when(
            t.isin(7, 21),
            F.array(
                _effect(
                    "trustline_flags_updated",
                    body["trustor"],
                    _j(trustor=body["trustor"], authorized=body["authorize"]),
                )
            ),
        )
        # set_options → thresholds / home domain / signer effects
        .when(
            t == 5,
            F.concat(
                F.when(
                    body["low_threshold"].isNotNull(),
                    F.array(
                        _effect(
                            "account_thresholds_updated",
                            source,
                            _j(
                                low_threshold=body["low_threshold"],
                                med_threshold=body["med_threshold"],
                                high_threshold=body["high_threshold"],
                            ),
                        )
                    ),
                ).otherwise(empty),
                F.when(
                    body["home_domain"].isNotNull(),
                    F.array(
                        _effect(
                            "account_home_domain_updated",
                            source,
                            _j(home_domain=body["home_domain"]),
                        )
                    ),
                ).otherwise(empty),
                F.when(
                    body["signer_key"].isNotNull() & (body["signer_weight"] > 0),
                    F.array(
                        _effect(
                            "signer_created",
                            source,
                            _j(
                                public_key=body["signer_key"],
                                weight=body["signer_weight"],
                            ),
                        )
                    ),
                )
                .when(
                    body["signer_key"].isNotNull() & (body["signer_weight"] == 0),
                    F.array(
                        _effect(
                            "signer_removed",
                            source,
                            _j(public_key=body["signer_key"]),
                        )
                    ),
                )
                .otherwise(empty),
            ),
        )
        # manage_data → data created/removed/updated
        .when(
            (t == 10) & body["data_value"].isNotNull(),
            F.array(
                _effect(
                    "data_created",
                    source,
                    _j(name=body["data_name"], value=body["data_value"]),
                )
            ),
        )
        .when(
            (t == 10) & body["data_value"].isNull(),
            F.array(_effect("data_removed", source, _j(name=body["data_name"]))),
        )
        # bump_sequence → sequence_bumped
        .when(
            t == 11,
            F.array(
                _effect(
                    "sequence_bumped", source, _j(new_seq=body["bump_to"])
                )
            ),
        )
        # create_claimable_balance → created + one claimant effect per claimant
        .when(
            t == 14,
            F.concat(
                F.array(
                    _effect(
                        "claimable_balance_created",
                        source,
                        _j(balance_id=body["balance_id"], amount=amount),
                    )
                ),
                F.transform(
                    body["claimants"],
                    lambda c: _effect(
                        "claimable_balance_claimant_created",
                        c["destination"],
                        _j(balance_id=body["balance_id"], amount=amount),
                    ),
                ),
            ),
        )
        # claim_claimable_balance → claimed + credited (effects.go claimant
        # receives the held asset)
        .when(
            t == 15,
            F.concat(
                F.array(
                    _effect(
                        "claimable_balance_claimed",
                        source,
                        _j(balance_id=body["balance_id"]),
                    )
                ),
                F.when(
                    body["amount"].isNotNull(),
                    F.array(_effect("account_credited", source, asset_json)),
                ).otherwise(empty),
            ),
        )
        # clawback → debited(from) + credited(issuer=source)
        .when(
            t == 19,
            F.array(
                _effect("account_debited", body["from"], asset_json),
                _effect("account_credited", source, asset_json),
            ),
        )
        # begin_sponsoring_future_reserves → sponsorship created
        .when(
            t == 16,
            F.array(
                _effect(
                    "account_sponsorship_created",
                    body["sponsored_id"],
                    _j(sponsor=source),
                )
            ),
        )
        # liquidity pool deposit / withdraw
        .when(
            t == 22,
            F.array(
                _effect(
                    "liquidity_pool_deposited",
                    source,
                    _j(
                        liquidity_pool_id=body["pool_id"],
                        shares_received=stroops_to_real(body["shares"]),
                    ),
                )
            ),
        )
        .when(
            t == 23,
            F.array(
                _effect(
                    "liquidity_pool_withdrew",
                    source,
                    _j(
                        liquidity_pool_id=body["pool_id"],
                        shares_redeemed=stroops_to_real(body["shares"]),
                    ),
                )
            ),
        )
        .otherwise(empty)
    )

    # trade-capable ops append one effect pair per live claim atom
    effects_array = F.concat(
        effects_array,
        F.when(t.isin(2, 3, 4, 12, 13), trade_effects).otherwise(empty),
    )

    # change-driven sponsorship state machine (effects.go:225-368): each of
    # the op's entry changes emits created/updated/removed when the sponsor
    # transitions — pure array transform over the co-indexed change list.
    chg = F.coalesce(
        F.col("changes"), F.array().cast(operations.schema["changes"].dataType)
    )

    def _sponsorship(c):
        pre_s, post_s = c["pre"]["sponsor"], c["post"]["sponsor"]
        holder = F.coalesce(c["post"]["account_id"], c["pre"]["account_id"], source)
        return (
            F.when(
                pre_s.isNull() & post_s.isNotNull(),
                F.array(
                    _effect(
                        "account_sponsorship_created", holder, _j(sponsor=post_s)
                    )
                ),
            )
            .when(
                pre_s.isNotNull() & post_s.isNotNull() & (pre_s != post_s),
                F.array(
                    _effect(
                        "account_sponsorship_updated",
                        holder,
                        _j(former_sponsor=pre_s, new_sponsor=post_s),
                    )
                ),
            )
            .when(
                pre_s.isNotNull() & post_s.isNull(),
                F.array(
                    _effect(
                        "account_sponsorship_removed",
                        holder,
                        _j(former_sponsor=pre_s),
                    )
                ),
            )
            .otherwise(empty)
        )

    effects_array = F.concat(
        effects_array, F.flatten(F.transform(chg, _sponsorship))
    )

    op_id = toid(F.col("ledger_sequence"), F.col("tx_index"), F.col("op_index") + 1)
    exploded = ops.select(
        op_id.alias("operation_id"),
        F.col("ledger_sequence"),
        F.col("type").alias("operation_type"),
        F.posexplode(effects_array).alias("index", "e"),
    )
    return exploded.select(
        F.concat_ws("-", F.col("operation_id"), F.col("index")).alias("id"),
        F.col("operation_id"),
        F.col("index"),
        F.col("e")["type"].alias("type"),
        F.col("e")["type_string"].alias("type_string"),
        F.col("e")["address"].alias("address"),
        F.col("e")["details_json"].alias("details_json"),
        F.col("ledger_sequence"),
        F.col("operation_type"),
    )
