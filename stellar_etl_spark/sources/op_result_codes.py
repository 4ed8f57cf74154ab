"""Per-operation-type inner result-code names (operation trace codes).

The reference surfaces each operation's per-type result enum as its Go
``String()`` name — e.g. ``ManageBuyOfferResultCodeManageBuyOfferSuccess``
(getOperationTraceCode, internal/transform/operation.go:168-231).  The enum
values and member names below are the public XDR definitions
(Stellar-transaction.x result enums, one per operation type); the Go
rendering is ``<EnumType>Code<CamelCasedMember>`` and both parts are
reproduced verbatim.

``create_passive_sell_offer`` (type 4) shares ``ManageSellOfferResult`` —
its result arm is declared with that type, so its trace names are the
ManageSellOffer ones (same as the reference's output).
"""

from __future__ import annotations

_SELL_OFFER = (
    "ManageSellOfferResultCode",
    {
        0: "ManageSellOfferSuccess",
        -1: "ManageSellOfferMalformed",
        -2: "ManageSellOfferSellNoTrust",
        -3: "ManageSellOfferBuyNoTrust",
        -4: "ManageSellOfferSellNotAuthorized",
        -5: "ManageSellOfferBuyNotAuthorized",
        -6: "ManageSellOfferLineFull",
        -7: "ManageSellOfferUnderfunded",
        -8: "ManageSellOfferCrossSelf",
        -9: "ManageSellOfferSellNoIssuer",
        -10: "ManageSellOfferBuyNoIssuer",
        -11: "ManageSellOfferNotFound",
        -12: "ManageSellOfferLowReserve",
    },
)

# op type -> (enum type name, {inner code -> camel-cased member name})
OP_INNER_CODES: dict[int, tuple[str, dict[int, str]]] = {
    0: (
        "CreateAccountResultCode",
        {
            0: "CreateAccountSuccess",
            -1: "CreateAccountMalformed",
            -2: "CreateAccountUnderfunded",
            -3: "CreateAccountLowReserve",
            -4: "CreateAccountAlreadyExist",
        },
    ),
    1: (
        "PaymentResultCode",
        {
            0: "PaymentSuccess",
            -1: "PaymentMalformed",
            -2: "PaymentUnderfunded",
            -3: "PaymentSrcNoTrust",
            -4: "PaymentSrcNotAuthorized",
            -5: "PaymentNoDestination",
            -6: "PaymentNoTrust",
            -7: "PaymentNotAuthorized",
            -8: "PaymentLineFull",
            -9: "PaymentNoIssuer",
        },
    ),
    2: (
        "PathPaymentStrictReceiveResultCode",
        {
            0: "PathPaymentStrictReceiveSuccess",
            -1: "PathPaymentStrictReceiveMalformed",
            -2: "PathPaymentStrictReceiveUnderfunded",
            -3: "PathPaymentStrictReceiveSrcNoTrust",
            -4: "PathPaymentStrictReceiveSrcNotAuthorized",
            -5: "PathPaymentStrictReceiveNoDestination",
            -6: "PathPaymentStrictReceiveNoTrust",
            -7: "PathPaymentStrictReceiveNotAuthorized",
            -8: "PathPaymentStrictReceiveLineFull",
            -9: "PathPaymentStrictReceiveNoIssuer",
            -10: "PathPaymentStrictReceiveTooFewOffers",
            -11: "PathPaymentStrictReceiveOfferCrossSelf",
            -12: "PathPaymentStrictReceiveOverSendmax",
        },
    ),
    3: _SELL_OFFER,
    4: _SELL_OFFER,
    5: (
        "SetOptionsResultCode",
        {
            0: "SetOptionsSuccess",
            -1: "SetOptionsLowReserve",
            -2: "SetOptionsTooManySigners",
            -3: "SetOptionsBadFlags",
            -4: "SetOptionsInvalidInflation",
            -5: "SetOptionsCantChange",
            -6: "SetOptionsUnknownFlag",
            -7: "SetOptionsThresholdOutOfRange",
            -8: "SetOptionsBadSigner",
            -9: "SetOptionsInvalidHomeDomain",
            -10: "SetOptionsAuthRevocableRequired",
        },
    ),
    6: (
        "ChangeTrustResultCode",
        {
            0: "ChangeTrustSuccess",
            -1: "ChangeTrustMalformed",
            -2: "ChangeTrustNoIssuer",
            -3: "ChangeTrustInvalidLimit",
            -4: "ChangeTrustLowReserve",
            -5: "ChangeTrustSelfNotAllowed",
            -6: "ChangeTrustTrustLineMissing",
            -7: "ChangeTrustCannotDelete",
            -8: "ChangeTrustNotAuthMaintainLiabilities",
        },
    ),
    7: (
        "AllowTrustResultCode",
        {
            0: "AllowTrustSuccess",
            -1: "AllowTrustMalformed",
            -2: "AllowTrustNoTrustLine",
            -3: "AllowTrustTrustNotRequired",
            -4: "AllowTrustCantRevoke",
            -5: "AllowTrustSelfNotAllowed",
            -6: "AllowTrustLowReserve",
        },
    ),
    8: (
        "AccountMergeResultCode",
        {
            0: "AccountMergeSuccess",
            -1: "AccountMergeMalformed",
            -2: "AccountMergeNoAccount",
            -3: "AccountMergeImmutableSet",
            -4: "AccountMergeHasSubEntries",
            -5: "AccountMergeSeqnumTooFar",
            -6: "AccountMergeDestFull",
            -7: "AccountMergeIsSponsor",
        },
    ),
    9: (
        "InflationResultCode",
        {0: "InflationSuccess", -1: "InflationNotTime"},
    ),
    10: (
        "ManageDataResultCode",
        {
            0: "ManageDataSuccess",
            -1: "ManageDataNotSupportedYet",
            -2: "ManageDataNameNotFound",
            -3: "ManageDataLowReserve",
            -4: "ManageDataInvalidName",
        },
    ),
    11: (
        "BumpSequenceResultCode",
        {0: "BumpSequenceSuccess", -1: "BumpSequenceBadSeq"},
    ),
    12: (
        "ManageBuyOfferResultCode",
        {
            0: "ManageBuyOfferSuccess",
            -1: "ManageBuyOfferMalformed",
            -2: "ManageBuyOfferSellNoTrust",
            -3: "ManageBuyOfferBuyNoTrust",
            -4: "ManageBuyOfferSellNotAuthorized",
            -5: "ManageBuyOfferBuyNotAuthorized",
            -6: "ManageBuyOfferLineFull",
            -7: "ManageBuyOfferUnderfunded",
            -8: "ManageBuyOfferCrossSelf",
            -9: "ManageBuyOfferSellNoIssuer",
            -10: "ManageBuyOfferBuyNoIssuer",
            -11: "ManageBuyOfferNotFound",
            -12: "ManageBuyOfferLowReserve",
        },
    ),
    13: (
        "PathPaymentStrictSendResultCode",
        {
            0: "PathPaymentStrictSendSuccess",
            -1: "PathPaymentStrictSendMalformed",
            -2: "PathPaymentStrictSendUnderfunded",
            -3: "PathPaymentStrictSendSrcNoTrust",
            -4: "PathPaymentStrictSendSrcNotAuthorized",
            -5: "PathPaymentStrictSendNoDestination",
            -6: "PathPaymentStrictSendNoTrust",
            -7: "PathPaymentStrictSendNotAuthorized",
            -8: "PathPaymentStrictSendLineFull",
            -9: "PathPaymentStrictSendNoIssuer",
            -10: "PathPaymentStrictSendTooFewOffers",
            -11: "PathPaymentStrictSendOfferCrossSelf",
            -12: "PathPaymentStrictSendUnderDestmin",
        },
    ),
    14: (
        "CreateClaimableBalanceResultCode",
        {
            0: "CreateClaimableBalanceSuccess",
            -1: "CreateClaimableBalanceMalformed",
            -2: "CreateClaimableBalanceLowReserve",
            -3: "CreateClaimableBalanceNoTrust",
            -4: "CreateClaimableBalanceNotAuthorized",
            -5: "CreateClaimableBalanceUnderfunded",
        },
    ),
    15: (
        "ClaimClaimableBalanceResultCode",
        {
            0: "ClaimClaimableBalanceSuccess",
            -1: "ClaimClaimableBalanceDoesNotExist",
            -2: "ClaimClaimableBalanceCannotClaim",
            -3: "ClaimClaimableBalanceLineFull",
            -4: "ClaimClaimableBalanceNoTrust",
            -5: "ClaimClaimableBalanceNotAuthorized",
        },
    ),
    16: (
        "BeginSponsoringFutureReservesResultCode",
        {
            0: "BeginSponsoringFutureReservesSuccess",
            -1: "BeginSponsoringFutureReservesMalformed",
            -2: "BeginSponsoringFutureReservesAlreadySponsored",
            -3: "BeginSponsoringFutureReservesRecursive",
        },
    ),
    17: (
        "EndSponsoringFutureReservesResultCode",
        {
            0: "EndSponsoringFutureReservesSuccess",
            -1: "EndSponsoringFutureReservesNotSponsored",
        },
    ),
    18: (
        "RevokeSponsorshipResultCode",
        {
            0: "RevokeSponsorshipSuccess",
            -1: "RevokeSponsorshipDoesNotExist",
            -2: "RevokeSponsorshipNotSponsor",
            -3: "RevokeSponsorshipLowReserve",
            -4: "RevokeSponsorshipOnlyTransferable",
            -5: "RevokeSponsorshipMalformed",
        },
    ),
    19: (
        "ClawbackResultCode",
        {
            0: "ClawbackSuccess",
            -1: "ClawbackMalformed",
            -2: "ClawbackNotClawbackEnabled",
            -3: "ClawbackNoTrust",
            -4: "ClawbackUnderfunded",
        },
    ),
    20: (
        "ClawbackClaimableBalanceResultCode",
        {
            0: "ClawbackClaimableBalanceSuccess",
            -1: "ClawbackClaimableBalanceDoesNotExist",
            -2: "ClawbackClaimableBalanceNotIssuer",
            -3: "ClawbackClaimableBalanceNotClawbackEnabled",
        },
    ),
    21: (
        "SetTrustLineFlagsResultCode",
        {
            0: "SetTrustLineFlagsSuccess",
            -1: "SetTrustLineFlagsMalformed",
            -2: "SetTrustLineFlagsNoTrustLine",
            -3: "SetTrustLineFlagsCantRevoke",
            -4: "SetTrustLineFlagsInvalidState",
            -5: "SetTrustLineFlagsLowReserve",
        },
    ),
    22: (
        "LiquidityPoolDepositResultCode",
        {
            0: "LiquidityPoolDepositSuccess",
            -1: "LiquidityPoolDepositMalformed",
            -2: "LiquidityPoolDepositNoTrust",
            -3: "LiquidityPoolDepositNotAuthorized",
            -4: "LiquidityPoolDepositUnderfunded",
            -5: "LiquidityPoolDepositLineFull",
            -6: "LiquidityPoolDepositBadPrice",
            -7: "LiquidityPoolDepositPoolFull",
        },
    ),
    23: (
        "LiquidityPoolWithdrawResultCode",
        {
            0: "LiquidityPoolWithdrawSuccess",
            -1: "LiquidityPoolWithdrawMalformed",
            -2: "LiquidityPoolWithdrawNoTrust",
            -3: "LiquidityPoolWithdrawUnderfunded",
            -4: "LiquidityPoolWithdrawLineFull",
            -5: "LiquidityPoolWithdrawUnderMinimum",
        },
    ),
    24: (
        "InvokeHostFunctionResultCode",
        {
            0: "InvokeHostFunctionSuccess",
            -1: "InvokeHostFunctionMalformed",
            -2: "InvokeHostFunctionTrapped",
            -3: "InvokeHostFunctionResourceLimitExceeded",
            -4: "InvokeHostFunctionEntryArchived",
            -5: "InvokeHostFunctionInsufficientRefundableFee",
        },
    ),
    25: (
        "ExtendFootprintTtlResultCode",
        {
            0: "ExtendFootprintTtlSuccess",
            -1: "ExtendFootprintTtlMalformed",
            -2: "ExtendFootprintTtlResourceLimitExceeded",
            -3: "ExtendFootprintTtlInsufficientRefundableFee",
        },
    ),
    26: (
        "RestoreFootprintResultCode",
        {
            0: "RestoreFootprintSuccess",
            -1: "RestoreFootprintMalformed",
            -2: "RestoreFootprintResourceLimitExceeded",
            -3: "RestoreFootprintInsufficientRefundableFee",
        },
    ),
}


def trace_code_name(op_type: int, inner_code: int | None) -> str | None:
    """``<EnumType>Code<Member>`` Go rendering of the per-type inner
    result, or None when the outer code wasn't opINNER / type unknown."""
    if inner_code is None:
        return None
    ent = OP_INNER_CODES.get(op_type)
    if ent is None:
        return None
    enum_name, members = ent
    member = members.get(inner_code)
    return f"{enum_name}{member}" if member else None
