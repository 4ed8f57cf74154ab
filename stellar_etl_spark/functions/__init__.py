from stellar_etl_spark.functions.toid import (  # noqa: F401
    toid,
    toid_ledger,
    toid_tx,
    toid_op,
    encode_offer_id,
    decode_offer_id,
    decode_offer_id_type,
)
from stellar_etl_spark.functions.hashes import (  # noqa: F401
    farmhash_fingerprint64,
    fnv64a,
    NATIVE_ASSET_ID,
    asset_id_udf,
    fnv64a_udf,
)
from stellar_etl_spark.functions.strkey import (  # noqa: F401
    encode_strkey,
    decode_strkey,
    VERSION_ACCOUNT,
    VERSION_MUXED,
    VERSION_CONTRACT,
    VERSION_LIQUIDITY_POOL,
    strkey_account_udf,
    strkey_contract_udf,
    strkey_pool_udf,
)
from stellar_etl_spark.functions.scalars import (  # noqa: F401
    stroops_to_real,
    timepoint_to_utc,
    interval_string,
    hash_to_hex,
    price_to_float,
)
