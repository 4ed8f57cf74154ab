from stellar_etl_spark.operators.compaction import compact_changes  # noqa: F401
from stellar_etl_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    shingles,
    minhash_signature,
    minhash_lsh_candidates,
    near_dup_pairs,
    simhash,
)
from stellar_etl_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    label_centroids,
    lsh_bucket_topk,
)
from stellar_etl_spark.operators.text import (  # noqa: F401
    tokenize,
    token_stats,
    quality_score,
    language_id,
    doc_fingerprint,
)
from stellar_etl_spark.operators.ranges import ledger_range_for_times  # noqa: F401
