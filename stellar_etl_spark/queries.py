"""The engine's query registry — every entry here is exported through
``__spark_entry__.queries()`` and hash-checked against a DuckDB oracle
(``stellar_etl_spark.oracles``) by the driver.

Cross-engine determinism rules used throughout (see tools/check_correctness.py):
  - money/value aggregation happens in DECIMAL (exact, order-independent),
    cast to DOUBLE only at the edge;
  - timestamps are epoch-nanos longs (catalog.table) — ``ts div 1000`` is
    DuckDB's ``epoch_us`` bit-for-bit;
  - every float that survives non-exact arithmetic (cosines, averages of
    doubles) is rounded to 6 digits on both sides;
  - every computed column is aliased identically in Spark and SQL.

Scale notes are on each query: what shuffles, what broadcasts, what would
change at 100 TB (mostly: nothing — that's the point).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellar_etl_spark.catalog import ns, table
from stellar_etl_spark.entity_queries import ENTITY_QUERIES
from stellar_etl_spark.functions.toid import (
    decode_offer_id_type,
    encode_offer_id,
    toid,
    toid_ledger,
    toid_op,
    toid_tx,
)
from stellar_etl_spark.operators.compaction import compact_changes
from stellar_etl_spark.operators.dedup import (
    exact_dedup,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from stellar_etl_spark.operators.ranges import ledger_range_for_times
from stellar_etl_spark.operators.similarity import (
    cosine_topk,
    label_centroids,
    lsh_bucket_topk,
)
from stellar_etl_spark.operators.similarity import embedding_near_dup_pairs
from stellar_etl_spark.operators.text import (
    bpe_token_stats,
    doc_fingerprint,
    language_id,
    quality_score,
    rolling_fingerprint,
    token_stats,
)


def _dec(col, p: int = 12, s: int = 4):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) else col.cast(
        f"decimal({p},{s})"
    )


EMB_DIM = 64  # the corpus's embedding dimensionality (TESTDATA.md)


def emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings under the VALID-VECTOR contract: similarity, clustering,
    and quantization all need a non-NULL vector OF THE CORPUS DIMENSION,
    and cosine needs a direction — a zero-norm row divides by zero under
    ANSI, and a dimension-mismatched row (ingestion bug, wrong model)
    would feed ragged sub-vectors into the PQ/IVF numpy kernels and
    truncated dot products into the HOF scorers.  Both engine sides
    exclude NULL, all-zero, and wrong-dimension vectors (a shadowing CTE
    in the oracles); a no-op on driver data, which has no degenerate
    vectors.
    The filter is a scan-adjacent predicate — no shuffle, and written
    with codegen-friendly array_min/array_max (not an ``exists`` HOF,
    which is CodegenFallback and would interpret a per-row lambda on the
    hot embeddings scan feeding 9+ similarity queries at 100 TB).
    Equivalence with ``exists(x -> x != 0)`` under WHERE semantics:
    array_min/array_max skip NULL elements, so a vector with some
    non-NULL nonzero element forces min != 0 or max != 0; all-zero /
    all-NULL-element / empty vectors coalesce to (0, 0) and are
    excluded, exactly as the NULL-propagating HOF was."""
    e = table(spark, sf_dir, "embeddings")
    zero = F.lit(0.0)
    return e.where(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == EMB_DIM)
        & ~(
            (F.coalesce(F.array_min("embedding"), zero) == zero)
            & (F.coalesce(F.array_max("embedding"), zero) == zero)
        )
    )


def _ntz(s: str):
    """Date-string literal → epoch-nanos long, matching catalog.table()'s
    timestamp contract (every time column is an epoch-nanos long)."""
    return F.lit(ns(s))


def _ts(col: str):
    """Epoch-nanos long column → UTC timestamp, for calendar functions
    (year/date_format/to_date).  Integer `div` keeps the conversion exact —
    float division would lose precision above 2^53 nanos (~1970+104 days)."""
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def _year(col: str):
    # long, not int: DuckDB year() is BIGINT and the driver hash is
    # representation-sensitive — keep output-year columns width-aligned
    return F.year(_ts(col)).cast("long")


def _one():
    # lazy: F.lit needs an active session (module may be imported before one)
    return F.lit(1).cast("decimal(6,4)")


def _dsum(expr):
    # Round in the exact DECIMAL domain (HALF_UP in both engines), THEN cast:
    # both engines then cast the same small-scale decimal to double, giving
    # bit-identical results. Rounding after the cast is engine-dependent at
    # .0005 boundaries (Spark rounds the double's shortest decimal repr,
    # DuckDB the exact binary value).
    return F.round(F.sum(expr), 3).cast("double")


# --------------------------------------------------------------------------
# Relational analytics (TPC-H-shaped; exercises scan/filter/join/agg/window)
# --------------------------------------------------------------------------


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary. One scan → hash aggregate; the shipdate filter and the
    column pruning both reach the parquet scan (verified via explain)."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= _ntz("2000-09-02")
    )
    disc_price = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    charge = disc_price * (_one() + _dec("l_tax", 6, 4))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(_dec("l_quantity")).alias("sum_qty"),
        _dsum(_dec("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc_price).alias("sum_disc_price"),
        _dsum(charge).alias("sum_charge"),
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        ),
        F.count(F.lit(1)).alias("count_order"),
    )


def tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority style join: customer (dim, broadcast) ⨝ orders ⨝
    lineitem, then top-10 by exact-decimal revenue."""
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < _ntz("1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > _ntz("1998-01-01")
    )
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_dsum(revenue).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format(_ts("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_day"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join: orders having any heavy lineitem. Left-semi keeps
    the build side small; no row duplication, no distinct needed."""
    orders = table(spark, sf_dir, "orders")
    heavy = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem ⨝ orders, then dim chain customer→nation→
    region all broadcast — a single shuffle on the fact join key."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz("1996-01-01"))
        & (F.col("o_orderdate") < _ntz("1998-01-01"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate with a tight range predicate — everything pushes to
    the scan; at 100 TB this reads only matching row groups."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dsum(_dec("l_extendedprice") * _dec("l_discount", 6, 4)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking partitioned by nation — bounded partitions, safe at any
    scale (no global sort)."""
    from pyspark.sql.window import Window

    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("n_name", "rnk", "c_name", "c_acctbal")
    )


def props_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured details column (the reference's OperationDetails JSON
    pattern, schema.go:137): extract + aggregate."""
    ev = table(spark, sf_dir, "events")
    # try_cast: a props field holding a non-numeric value contributes NULL
    # (sum skips it) instead of failing the scan — JSON blobs carry no
    # schema promise (no-op on driver data; both engines agree)
    return ev.groupBy("event_type").agg(
        F.sum(
            F.get_json_object("props", "$.k").try_cast("long")
        ).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


def snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a compacted change batch into a point-in-time snapshot (the
    consumer side of the reference's per-batch change export): base = state
    after events < 500, delta = the rest compacted as one batch
    (annihilated keys leave the base untouched; deleted keys drop; the rest
    upsert).  One key-shuffle full-outer apply."""
    from pyspark.sql.window import Window

    from stellar_etl_spark.operators.merge import upsert_snapshot

    # the synthetic change mapping needs a key and a type: NULL user_id /
    # event_type rows are out of the change-stream contract (oracle
    # filters identically; DuckDB's max_by also SKIPS null values, so a
    # NULL event_type would diverge engines on "last" semantics)
    ev = table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    key = F.col("user_id").cast("string").alias("ledger_key")

    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    base = (
        ev.where(F.col("event_id") < 500)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("event_type") != "error"))
        .select(key, "event_id", "event_type", "value")
    )
    delta_changes = ev.where(F.col("event_id") >= 500).select(
        F.lit(0).alias("batch_id"),
        key,
        F.col("event_id").alias("ledger_sequence"),
        F.lit(0).alias("change_index"),
        F.when(F.col("event_type") == "signup", 0)
        .when(F.col("event_type") == "error", 2)
        .otherwise(1)
        .alias("change_type"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
    )
    delta = compact_changes(delta_changes).select(
        "ledger_key", "event_id", "event_type", "value", "deleted"
    )
    out = upsert_snapshot(
        base, delta, ["ledger_key"], ["event_id", "event_type", "value"]
    )
    return out.select(
        "ledger_key",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def waveform_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-curation window stats over binary payloads (int16-PCM
    reinterpretation of the deterministic media stand-in): Arrow-batched
    mapInPandas with numpy inside, 1→N window fan-out, all-integer
    arithmetic — the oracle recomputes the samples byte-by-byte in SQL."""
    from stellar_etl_spark.operators.multimodal import (
        attach_media,
        waveform_window_stats,
    )

    # byte-correct for any unicode text: the oracle twin reconstructs the
    # samples from hex(encode(text)) pairs, so no ASCII restriction
    docs = table(spark, sf_dir, "documents")
    return waveform_window_stats(attach_media(docs), window=256)


def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (priority sampling, Duffield-Lund-
    Thorup): priority = weight / u with u a content-hash uniform — heavier
    documents are proportionally likelier to make the top-k.  Chosen over
    the A-ES u^(1/w) key because w/u needs NO transcendentals: one integer-
    to-double division is bit-identical on both engines, so the sample is
    reproducible across engines, partitionings, and runs.  TakeOrdered
    top-k — per-partition partial top-k, no global sort."""
    docs = table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long") + F.lit(1)
    priority = F.col("n_chars").cast("double") / h.cast("double")
    return (
        docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"),
                    priority.alias("priority"))
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(200)
    )


def variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VariantType: ``parse_json`` once
    into the binary variant encoding, then typed ``try_variant_get`` path
    extractions — the scale answer when several fields are pulled from the
    same JSON blob (one parse, not one per ``get_json_object`` path).
    Same OperationDetails pattern as props_json_agg (schema.go:137).

    MALFORMED-JSON contract: ``try_parse_json`` yields a NULL variant for
    a syntactically invalid blob (plain ``parse_json`` throws), so a
    malformed props row still counts in n_events and contributes NULL to
    the typed extractions — matching get_json_object's NULL and the
    oracle's ``json_valid`` guard (DuckDB's ``->>`` hard-errors on
    malformed JSON).  A no-op on driver data, whose props are valid."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.try_parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get("v", "$.k", "long").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


# --------------------------------------------------------------------------
# Stellar-semantics operators over the synthetic workload
# --------------------------------------------------------------------------


def toid_pack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOID pack/unpack + synthetic offer id as pure bit expressions
    (toid/main.go:130-171, synt_offer_id.go:28-42)."""
    li = table(spark, sf_dir, "lineitem")
    packed = toid(
        F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_suppkey").bitwiseAND(F.lit(4095))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        packed.alias("toid"),
        toid_ledger(packed).alias("dec_ledger"),
        toid_tx(packed).alias("dec_tx"),
        toid_op(packed).alias("dec_op"),
        encode_offer_id(packed, toid_type=True).alias("synthetic_offer_id"),
        decode_offer_id_type(encode_offer_id(packed, toid_type=True)).alias(
            "offer_id_type"
        ),
    )


def ledger_close_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extractCounts semantics (transform/ledger.go:120-153): per-group tx
    counts with successful/failed split and the string-typed total quirk
    (ledger.go:151)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("attempted_tx_count"),
        F.count(F.when(F.col("event_type") != "error", 1)).alias("successful_tx_count"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("failed_tx_count"),
        F.sum(
            F.when(F.col("event_type").isin("purchase", "click", "view"), 1).otherwise(0)
        ).alias("operation_count"),
        F.count(F.lit(1)).cast("string").alias("tx_set_operation_count"),
        _dsum(_dec("value", 10, 4)).alias("total_value"),
    )


def change_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangeCompactor semantics (input/changes.go:104-151) applied to the
    events stream: signup=create, error=remove, else update; 250-event
    batches; last state per (batch, user) with create/remove annihilation."""
    # keyed, typed events only (see snapshot_upsert; oracle matches)
    ev = table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    changes = ev.select(
        F.expr("event_id div 250").alias("batch_id"),
        F.col("user_id").cast("string").alias("ledger_key"),
        F.col("event_id").alias("ledger_sequence"),
        F.lit(0).alias("change_index"),
        F.when(F.col("event_type") == "signup", 0)
        .when(F.col("event_type") == "error", 2)
        .otherwise(1)
        .alias("change_type"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
    )
    out = compact_changes(changes)
    return out.select(
        "batch_id",
        "ledger_key",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("effective_change_type"),
        F.col("deleted"),
    )


def batch_windows_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute batch windows (the reference's 64-ledger ≈ 5 min
    batch cadence, utils/main.go:269) as epoch-bucket aggregation."""
    ev = table(spark, sf_dir, "events")
    bucket = F.expr("(ts div 1000) div 300000000")
    return ev.groupBy(
        bucket.alias("bucket_id"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _dsum(_dec("value", 10, 4)).alias("total_value"),
    )


def first_sighting_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """history_assets first-sighting dedup semantics (transform/asset.go:
    downstream dedup): earliest record per key via min-struct hash aggregate
    (no window sort — map-side combinable)."""
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct(F.col("ts"), F.col("event_id"))).alias("f")
    )
    return first.select(
        "user_id",
        "event_type",
        F.col("f.event_id").alias("first_event_id"),
        F.expr("f.ts div 1000").alias("first_ts_us"),
    )


def time_to_sequence_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetLedgerRange semantics (input/ledger_range.go:32-68): smallest id
    range covering a time window; answered from min/max statistics."""
    ev = table(spark, sf_dir, "events").withColumnRenamed("event_id", "sequence")
    return ledger_range_for_times(
        ev, ns("2024-01-10"), ns("2024-01-20"), seq_col="sequence", time_col="ts"
    )


# --------------------------------------------------------------------------
# Text analysis / dedup / similarity (training-data pipeline operators)
# --------------------------------------------------------------------------


def word_explode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N fan-out (the reference's tx→operations explode pattern,
    input/operations.go:58-70) over document tokens."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("doc_id"), F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = token_stats(table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_chars_measured").cast("long").alias("n_chars_measured"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
    )


def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = quality_score(table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "lexical_diversity",
        "stopword_ratio",
        F.col("quality_score").cast("long").alias("quality_score"),
    )


def language_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = language_id(table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "lang_pred", F.col("lang_score").cast("long").alias("lang_score")
    )


def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(table(spark, sf_dir, "documents"))


def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


def segment_dedup_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level segment dedup with document reconstruction (the
    C4/RefinedWeb duplicate-line removal pass): global first-occurrence-
    wins over 8-word segments via a packed-rank min aggregate (no window,
    no global sort), then per-doc reassembly."""
    from stellar_etl_spark.operators.dedup import segment_dedup

    return segment_dedup(table(spark, sf_dir, "documents"))


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands × 2 rows) candidates, exact Jaccard ≥ 0.5
    verification. The LSH band join is the only corpus-wide shuffle."""
    return near_dup_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        num_perm=8,
        bands=4,
        rows_per_band=2,
        threshold=0.5,
    )


def ngram_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (loss-free) n-gram Jaccard near-dup: PPJoin-style rarest-first
    prefix filtering — candidate-complete, no LSH false negatives — then
    exact set Jaccard ≥ 0.5 on survivors."""
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3,
        threshold=0.5,
    )


def tfidf_cosine_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join (integer-scaled idf weights so
    dot products are exact; df-cutoff bounds the token-join fan-out)."""
    from stellar_etl_spark.operators.similarity import tfidf_cosine_pairs

    return tfidf_cosine_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        max_df_ratio=0.3, threshold=0.3,
    )


def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(table(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(
        emb_table(spark, sf_dir), query_ids=[0, 1, 2, 3, 4], k=5
    ).select("query_id", F.col("rank").cast("long").alias("rnk"), "nbr_id", "cosine_sim")


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = label_centroids(emb_table(spark, sf_dir))
    return out.select(
        "label", F.col("dim").cast("long").alias("dim"), "centroid_val"
    )


def ivf_knn_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via coarse partitions — the 100 TB scale path
    (probes nprobe/ncells of the corpus). Deterministic end to end (exact
    centroids, tie-broken probe ranking), so it still has an exact oracle."""
    return lsh_bucket_topk(
        emb_table(spark, sf_dir), query_ids=[0, 1, 2, 3, 4], k=5, nprobe=3
    ).select("query_id", F.col("rank").cast("long").alias("rnk"), "nbr_id", "cosine_sim")


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-nation shipping volume by year: fact join + broadcast dims with a
    cross-pair predicate, grouped by year."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01"))
        & (F.col("l_shipdate") < _ntz("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", _year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery HAVING: suppliers×parts whose value exceeds a fraction
    of the global total — the total is a broadcast 1-row cross join, never a
    driver-side collect."""
    li = table(spark, sf_dir, "lineitem")
    value = _dec("l_extendedprice") * _dec("l_quantity")
    per_part = li.groupBy("l_partkey").agg(_dsum(value).alias("part_value"))
    total = li.agg((F.sum(value).cast("double") * 0.0005).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation ratio (CASE inside SUM) — one scan, one
    scalar result."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1997-07-01"))
    )
    part = table(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(promo).cast("double") * 100.0 / F.sum(revenue).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN + COUNT(DISTINCT): part demographics excluding flagged
    suppliers (anti join), distinct-agg after."""
    part = table(spark, sf_dir, "part").where(F.col("p_size").isin(9, 14, 23, 45))
    li = table(spark, sf_dir, "lineitem")
    bad_supp = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with HAVING: customers with any order above a quantity
    total — aggregate → semi join → enrich."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 270)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format(_ts("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_day"),
            "total_qty",
        )
    )


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-clause predicate (the OR-of-ANDs Catalyst must keep
    push-downable via CNF extraction)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    cond = (
        ((F.col("p_brand") == "Brand#15") & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#19") & (F.col("l_quantity").between(20, 30)))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS + scalar-subquery filter: wealthy customers with
    no orders, grouped by country-code prefix."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ntz("1998-06-01")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg(_dec("c_acctbal", 12, 2).cast("double")).alias("avg_bal")
    )
    cc = (F.col("c_nationkey") % 5).cast("int")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where((F.col("c_acctbal") > F.col("avg_bal")) & cc.isin(1, 2, 3))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(cc.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(_dec("c_acctbal", 12, 2)).alias("totacctbal"),
        )
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share by year (q8 shape, adapted to the slim schema):
    conditional-sum ratio over a star join — all dims broadcast, the only
    shuffle is the final tiny year-grouped aggregate."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(_year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_7", revenue).otherwise(zero)
                ).cast("double")
                / F.sum(revenue).cast("double"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year (q9 shape, no partsupp in the
    schema): LIKE-filtered part dim broadcast, orders joined only for the
    year — nothing here widens at 100 TB except the fact scan."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            _year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer (q10 shape): date-windowed orders
    × returned lineitems, grouped by customer; the deterministic HAVING
    threshold replaces q10's top-20 (no unstable double-ordered LIMIT)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz("1997-01-01"))
        & (F.col("o_orderdate") < _ntz("1998-01-01"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(_dsum(revenue).alias("revenue"))
        .where(F.col("revenue") > 3000)
    )


def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count histogram (q13 shape): filtered LEFT join so
    zero-order customers survive, two-level aggregation — the classic
    count-of-counts, still two cheap shuffles at any scale."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by windowed revenue (q15 shape): aggregate → join on
    the exact-decimal max — ties-safe across engines because the comparison
    happens before any double cast."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1997-07-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(revenue).alias("_rev_exact")
    )
    max_rev = per_supp.agg(F.max("_rev_exact").alias("_max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .where(F.col("_rev_exact") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev_exact"), 3).cast("double").alias("total_revenue"),
        )
    )


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity order revenue (q17 shape): the correlated per-part AVG
    subquery becomes aggregate-then-join — map-side combinable, no window
    sort, broadcast both the part dim and the tiny per-part averages."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#15", "Brand#23")
    )
    li_parts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = li_parts.groupBy(F.col("p_partkey").alias("_ak")).agg(
        (F.avg(_dec("l_quantity").cast("double")) * 0.2).alias("qty_threshold")
    )
    return (
        li_parts.join(F.broadcast(avg_qty), F.col("p_partkey") == F.col("_ak"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 3
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-late supplier per multi-supplier order (q21 shape, 'late' =
    shipped >60 days after order date on finalized orders).  The classic
    EXISTS/NOT-EXISTS double self-join collapses into ONE per-order
    aggregate + semi join back — linear, skew-free, no O(n²) self-join."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.lit(60 * 86_400_000_000_000),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
        F.max(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_late_supp"),
    )
    culprits = per_order.where(
        (F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1)
    )
    return (
        culprits.join(F.broadcast(supp), F.col("_late_supp") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region → nation → grand total) — Spark's native
    ROLLUP; partial aggregation keeps the extra grouping sets cheap."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    # two-phase rollup: pre-aggregate to (region, nation) in EXACT decimal,
    # then ROLLUP over the tiny base — the grouping-set Expand runs on
    # |regions × nations| rows instead of tripling the fact scan. Decimal
    # sums are associative, so results equal the direct rollup bit-for-bit.
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).alias("_rev"), F.count(F.lit(1)).alias("_n"))
    )
    return base.rollup("r_name", "n_name").agg(
        F.round(F.sum("_rev"), 3).cast("double").alias("revenue"),
        F.sum("_n").alias("n_items"),
    )


def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no orders since 1998,
    counted per nation. Anti-join build side is the filtered orders scan."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ntz("1998-01-01")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            _dsum(_dec("c_acctbal", 12, 2)).alias("dormant_balance"),
        )
    )


def media_byte_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload + Arrow-batched pandas feature
    extraction (operators/multimodal.py) — the mapInPandas slot where a real
    codec/model plugs in."""
    from stellar_etl_spark.operators.multimodal import attach_media, media_byte_features

    media = attach_media(table(spark, sf_dir, "documents"))
    return media_byte_features(media)


def media_resize_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic nearest-neighbor resize of the payload byte signal to 32
    bytes (the image-resize slot, byte-level stand-in) + md5 of the result."""
    from stellar_etl_spark.operators.multimodal import attach_media, resize_signal

    # byte-correct for any unicode text: the fingerprint hashes the hex
    # rendering of the resampled bytes, which the oracle rebuilds from
    # hex(encode(text)) — no ASCII restriction
    media = attach_media(table(spark, sf_dir, "documents"))
    return resize_signal(media, target_len=32)


def media_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary frame sampling 1→N fan-out: every 2nd 64-byte frame per doc."""
    from stellar_etl_spark.operators.multimodal import attach_media, frame_sample

    # byte-correct for any unicode text: frame fingerprints hash the hex
    # rendering of each byte frame, oracle-expressible via hex(encode(text))
    media = attach_media(table(spark, sf_dir, "documents"))
    return frame_sample(media, frame_bytes=64, every_nth=2)


def bpe_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_stats(table(spark, sf_dir, "documents"))


def rolling_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_fingerprint(table(spark, sf_dir, "documents"))


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by coarse cell (label)."""
    return embedding_near_dup_pairs(
        emb_table(spark, sf_dir), threshold=0.42
    )


def running_state_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamOrderbooks semantics (input/orderbooks.go:194-237) on the events
    stream: cumulative last-state-per-user at every 250-event snapshot
    boundary, removals (errors) masking prior state until the user reappears."""
    from stellar_etl_spark.operators.state import running_snapshots

    ev = table(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id").cast("string").alias("ledger_key"),
        F.col("event_id").alias("ledger_sequence"),
        F.lit(0).alias("change_index"),
        F.when(F.col("event_type") == "error", 2).otherwise(1).alias("change_type"),
        F.col("event_id"),
        F.col("value"),
    )
    out = running_snapshots(changes, snapshot_every=250)
    return out.select(
        "snapshot_id",
        F.col("ledger_key").alias("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based deterministic 10% sample — reproducible across runs,
    engines, and partitionings (unlike rand()-based sampling); the standard
    trick for stable training-data splits."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return docs.where(bucket < 10).select("doc_id", "source", "n_chars")


def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus domain-mix balancing: down-sample every source to the
    smallest source's token budget (the "equal mixing weights" pass of a
    training-data pipeline).  The per-source rate is DATA-DEPENDENT
    (budget / source_tokens, where budget = min source token count), so
    unlike stratified_sample it flows through a broadcast join of the
    per-source aggregate + a 1-row broadcast budget — and membership is
    decided in exact integer math (bucket * source_tokens <
    1_000_000 * budget), never a float threshold.  Scale: one partial agg
    per source, two broadcasts, a map-side filter, one final agg — no
    windows, no skew-sensitive shuffle."""
    docs = table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.sum("n_chars").alias("source_tokens"),
        F.count(F.lit(1)).alias("source_docs"),
    )
    budget = stats.agg(F.min("source_tokens").alias("budget"))
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    ) % 1000000
    kept = (
        docs.join(F.broadcast(stats), "source")
        .crossJoin(F.broadcast(budget))
        .where(bucket * F.col("source_tokens") < F.lit(1000000) * F.col("budget"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_chars").alias("tokens_kept"),
        F.first("source_tokens").alias("source_tokens"),
        F.first("source_docs").alias("source_docs"),
        F.first("budget").alias("token_budget"),
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling with deterministic hash thresholds —
    curated sources kept at 50%, the long tail at 5%.  Same reproducibility
    contract as deterministic_sample, but the rate is a per-stratum config
    (broadcast-free: a when-chain, not a join)."""
    docs = table(spark, sf_dir, "documents")
    rate = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3"), F.lit(500)
    ).otherwise(F.lit(50))
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    ) % 1000
    return docs.where(bucket < rate).select("doc_id", "source", "n_chars")


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with reconstruction-error
    stats — the 4× compression step for an embedding store; floor-based
    rounding keeps codes engine-deterministic."""
    from stellar_etl_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(emb_table(spark, sf_dir))


def lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model (corpus-unigram) quality score per doc — the
    perplexity-style filter signal; integer-scaled logs keep the per-doc
    sum exact under any partitioning."""
    from stellar_etl_spark.operators.text import unigram_logprob_score

    return unigram_logprob_score(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-bucketed corpus profile: the unigram-LM quality score
    fed through the EXACT distributed ntile(10) (total-order tie-break on
    (score_micro, doc_id), no global window), then per-bucket volume
    stats — the CCNet-style "keep the best-perplexity buckets" pass."""
    from stellar_etl_spark.operators.ranking import distributed_ntile
    from stellar_etl_spark.operators.text import unigram_logprob_score

    s = unigram_logprob_score(table(spark, sf_dir, "documents"), "doc_id", "text")
    # avg_logprob is micro_int / 1e6 by construction; recover the exact
    # integer for a float-free global ordering
    s = s.withColumn(
        "avg_micro", F.round(F.col("avg_logprob") * 1000000).cast("long")
    ).localCheckpoint(eager=False)  # the LM-score subtree feeds 3 rank passes
    b = distributed_ntile(s, "avg_micro", ["doc_id"], 10, out="bucket")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("avg_logprob").alias("min_score"),
        F.max("avg_logprob").alias("max_score"),
    )


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary build + OOV audit: top-100 corpus tokens
    by (count desc, token asc) — a TakeOrdered, not a global sort — then
    per-document out-of-vocabulary rate via a broadcast semi-mark join,
    with the rate in exact integer round-6 arithmetic."""
    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.util import exact_ratio_round6

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize_words(F.col("text"))).alias("t")
    )
    cf = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    vocab = cf.orderBy(F.desc("c"), "t").limit(100).select(
        "t", F.lit(1).alias("_in")
    )
    out = (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        exact_ratio_round6("n_oov", "n_tokens").alias("oov_rate"),
    )


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-way split (90/5/5 by content hash) with per-split
    corpus stats — the reproducible-split contract every training pipeline
    needs: membership depends only on content, never on partitioning, row
    order, or engine."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-20 word bigrams by frequency.  TakeOrdered
    (distributed partial top-k per partition, no global sort materialization);
    (count desc, bigram) is a total order, so the cut is deterministic."""
    docs = table(spark, sf_dir, "documents")
    b = (
        docs.select(F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> concat(w[i], ' ', w[i + 1]))"
                )
            ).alias("bigram")
        )
    )
    return (
        b.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


def buyer_cohort_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join shape: 1996 vs 1997 buyer cohorts with per-side
    order counts and a membership segment — the reconciliation pattern
    (both sides pre-aggregated, so the outer join runs on compact keys)."""
    orders = table(spark, sf_dir, "orders")
    a = (
        orders.where(_year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_1996"))
    )
    b = (
        orders.where(_year("o_orderdate") == 1997)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_1997"))
    )
    j = a.join(b, "custkey", "full_outer")
    return j.select(
        "custkey",
        F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
        F.coalesce("n_1997", F.lit(0)).alias("n_1997"),
        F.when(F.col("n_1996").isNotNull() & F.col("n_1997").isNotNull(), "both")
        .when(F.col("n_1996").isNotNull(), "only_1996")
        .otherwise("only_1997")
        .alias("segment"),
    )


def repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op shape: customers ordering in BOTH 1996 and 1997 — INTERSECT
    (hash-dedup semi semantics), Catalyst plans it as an aggregate+join."""
    orders = table(spark, sf_dir, "orders")
    a = orders.where(_year("o_orderdate") == 1996).select("o_custkey")
    b = orders.where(_year("o_orderdate") == 1997).select("o_custkey")
    return a.intersect(b)


def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile: doc counts, char volume, exact interpolated
    median/p90 of doc length — one hash-aggregate shuffle."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


def clean_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (URL strip, whitespace collapse, lowercase) — the
    cleaning step that precedes dedup in a corpus pipeline."""
    from stellar_etl_spark.operators.text import clean_text

    return clean_text(table(spark, sf_dir, "documents"))


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active in week N who return in week N+1 —
    a self-join on the compacted (user, week) activity set, counted per
    week. The activity set is tiny relative to raw events (pre-aggregation
    before the join, the scale-safe order)."""
    ev = table(spark, sf_dir, "events")
    weekly = ev.select(
        F.col("user_id"), F.expr("(ts div 1000) div 604800000000").alias("wk")
    ).distinct()
    nxt = weekly.select(
        F.col("user_id").alias("u2"), (F.col("wk") - 1).alias("wk2")
    )
    return (
        weekly.join(
            nxt, (weekly.user_id == nxt.u2) & (weekly.wk == nxt.wk2), "left"
        )
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count(F.col("u2")).alias("n_retained"),
        )
    )


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified near-dup graph (iterative
    min-label propagation) — the cluster grouping a dedup pipeline keeps one
    survivor per."""
    from stellar_etl_spark.operators.dedup import dedup_clusters

    return dedup_clusters(
        table(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.5
    )


BM25_TERMS = ["hash", "join", "scan", "filter", "sort"]


def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 keyword search over the corpus — corpus stats collapse to
    one broadcast row; the score is a single fixed-order expression tree, so
    floats are engine- and partitioning-stable."""
    from stellar_etl_spark.operators.text import bm25_search

    return bm25_search(
        table(spark, sf_dir, "documents"), "doc_id", "text", BM25_TERMS
    )


def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile profile of order values: EXACT ntile(10) via the two-phase
    distributed rank (coarse value-range histogram → broadcast cumulative
    offsets → per-bucket row_number), then per-decile bounds/mass.  No
    global window — every stage stays parallel at any scale, yet the
    result is bit-identical to ``ntile(10) OVER (ORDER BY ...)``."""
    from stellar_etl_spark.operators.ranking import distributed_ntile

    orders = table(spark, sf_dir, "orders")
    ranked = distributed_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        ["o_orderkey"],
        10,
        out="decile",
    ).select(_dec("o_totalprice", 18, 4).alias("p"), "decile")
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("p"), 3).cast("double").alias("lo"),
        F.round(F.max("p"), 3).cast("double").alias("hi"),
        F.round(F.sum("p"), 3).cast("double").alias("total"),
    )


def sliding_windows_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (15-min window, 5-min slide): each event
    lands in exactly 3 overlapping windows via Spark's native window() —
    the Expand stays map-side, then one hash aggregate."""
    ev = table(spark, sf_dir, "events")
    w = F.window(
        F.timestamp_micros(F.expr("ts div 1000")), "15 minutes", "5 minutes"
    )
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(10,4)")), 3)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def user_value_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity history over the purchase change stream: every value a
    user held, with [valid_from, valid_to) microsecond intervals and an
    is_current marker — the dimensional-history twin of change compaction."""
    from stellar_etl_spark.operators.scd import scd2_history

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id", "event_id", F.expr("ts div 1000").alias("ts_us"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    h = scd2_history(ev, ["user_id"], "ts_us", order_cols=["event_id"])
    return h.select(
        "user_id",
        "event_id",
        F.round(F.col("v"), 6).cast("double").alias("value"),
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
    )


def hourly_value_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: hourly value sums per event type on a DENSE grid —
    missing hours synthesized and filled by last-observation-carried-forward
    (TimescaleDB time_bucket_gapfill + locf semantics)."""
    from stellar_etl_spark.operators.timeseries import gapfill_locf

    # grid membership comes from VALUED events: a NULL-value row neither
    # sums nor "un-gaps" an hour (oracle filters identically)
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.expr("(ts div 1000) div 3600000000").alias("hr"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("event_type", "hr")
        .agg(F.round(F.sum("v"), 3).cast("double").alias("value_sum"))
    )
    filled = gapfill_locf(hourly, "hr", ["value_sum"], keys=["event_type"])
    return filled.select(
        "event_type",
        "hr",
        (F.col("hr") * F.lit(3_600_000_000)).alias("hour_start_us"),
        "value_sum",
        "is_gap",
    )


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type matrix via Spark's native pivot (explicit value
    list keeps it a single pass, no value-discovery job)."""
    ev = table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping sets in one
    pass (Expand keeps it map-side; exact decimal sums, rounded once)."""
    li = table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    # two-phase cube: pre-aggregate to the |flags × statuses| base in exact
    # decimal, then Expand only the tiny base — same bit-for-bit results
    # (decimal sums are associative), fact scan touched once
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(revenue).alias("rev"), F.count(F.lit(1)).alias("cnt")
    )
    cubed = (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("cnt").alias("n_items"),
            F.round(F.sum("rev"), 3).cast("double").alias("revenue"),
        )
    )
    return cubed.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
        F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
        "n_items",
        "revenue",
    )


def revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a 7-day trailing moving average — exact
    decimal daily sums, window framed ROWS 6 PRECEDING.  The day-grain series
    is bounded (one row per day), so the single-partition window is fine at
    any SF; the heavy work (the daily aggregate) is fully parallel."""
    from pyspark.sql.window import Window

    # dateless orders cannot be placed on a daily series — and a NULL day
    # group would sort NULLS FIRST in Spark's window ORDER BY vs NULLS LAST
    # in DuckDB's, shifting every trailing frame (no-op on driver data)
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(
        F.to_date(_ts("o_orderdate")).alias("day")
    ).agg(F.sum(_dec("o_totalprice", 18, 4)).alias("d"))
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.round(F.col("d"), 3).cast("double").alias("revenue"),
        F.round(
            (F.sum("d").over(w).cast("double") / F.count(F.lit(1)).over(w)), 3
        ).alias("ma7"),
    )


def errors_in_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: count error events landing inside each
    user session (sessions built from non-error events).  Bucket-decomposed
    equi-join — no broadcast-nested-loop range join anywhere."""
    from stellar_etl_spark.operators.intervals import point_in_interval_join
    from stellar_etl_spark.operators.sessionize import session_stats

    ev = table(spark, sf_dir, "events")
    base = ev.where(F.col("event_type") != "error").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    sessions = session_stats(base).select(
        "user_id", "session_idx", "session_start_us", "session_end_us"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    matched = point_in_interval_join(
        errors,
        sessions,
        point_ts="ts_us",
        start_col="session_start_us",
        end_col="session_end_us",
        bucket_us=3_600_000_000,
        keys=["user_id"],
    )
    counts = matched.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_errors")
    )
    return sessions.join(counts, ["user_id", "session_idx"], "left").select(
        "user_id",
        "session_idx",
        "session_start_us",
        "session_end_us",
        F.coalesce(F.col("n_errors"), F.lit(0).cast("long")).alias("n_errors"),
    )


def active_sessions_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session concurrency profile: number of sessions overlapping each 5-min
    window — interval flattening by bucket explode + one count aggregate."""
    from stellar_etl_spark.operators.intervals import interval_overlap_count
    from stellar_etl_spark.operators.sessionize import session_stats

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    return interval_overlap_count(
        session_stats(ev), "session_start_us", "session_end_us", 300_000_000
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click-after-view → purchase-after-click):
    users reaching each stage.  Each stage's first qualifying time chains
    off the previous one as conditional window-mins over ONE user_id
    partitioning — a single scan and a single shuffle (the naive shape is
    three filtered scans + three stage aggregates + two joins; all of it
    keys on user_id, so the windows collapse it)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "tv",
            F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") >= F.col("tv")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("tc")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    # one row per user (groupBy on the window's partitioning key — no new
    # exchange), then a singleton conditional-count aggregate
    per_user = staged.groupBy("user_id").agg(
        F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    counts = per_user.agg(
        F.sum(F.when(F.col("tv").isNotNull(), 1).otherwise(0)).alias("n_v"),
        F.sum(F.when(F.col("tc").isNotNull(), 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("tp").isNotNull(), 1).otherwise(0)).alias("n_p"),
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_view").alias("stage"), F.col("n_v").alias("n_users")
                ),
                F.struct(
                    F.lit("2_click_after_view").alias("stage"),
                    F.col("n_c").alias("n_users"),
                ),
                F.struct(
                    F.lit("3_purchase_after_click").alias("stage"),
                    F.col("n_p").alias("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the user's most recent
    click/view at-or-before it — a cross-table as-of join, the general form of
    the reference's last-matching-pre-change reverse scan (trade.go:281-304).
    One shuffle on user_id (union + window), no range join."""
    from stellar_etl_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "event_type", "ts"
    )
    j = asof_join(
        purchases, touches, on="user_id", left_ts="ts", right_ts="ts",
        right_prefix="touch_",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.expr("ts div 1000").alias("purchase_us"),
        F.col("touch_event_id").alias("touch_id"),
        F.col("touch_event_type").alias("touch_type"),
        F.expr("touch_ts div 1000").alias("touch_us"),
        F.expr("ts div 1000 - touch_ts div 1000").alias("lag_us"),
    )


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance ≤ 2 on 16-bit fingerprints via
    pigeonhole bit-band LSH (candidate-complete) + exact popcount verify."""
    from stellar_etl_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        bits=16, max_distance=2,
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) over the events stream — data-driven
    windows next to the reference's fixed 64-ledger batches."""
    from stellar_etl_spark.operators.sessionize import session_stats

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    return session_stats(ev)


def sessionize_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase gap sessionization — identical result to sessionize_events
    but no task ever holds more than one (user, day) of events, so a hot
    user cannot serialize the stage.  Oracle: the single-pass SQL (results
    must be equal by construction)."""
    from stellar_etl_spark.operators.sessionize import session_stats_two_phase

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    return session_stats_two_phase(ev)


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token → sorted posting list of doc ids,
    bounded to 2 ≤ df ≤ 100 (the high-df cap is the scale guard — stop-word
    posting lists are unbounded; real IR systems shard or skip them).  One
    distinct-token explode + one grouped sort-collect."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            ),
        )
        .where((F.col("df") >= 2) & (F.col("df") <= 100))
    )


def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic for the events user_id join key: key cardinality and
    top-key concentration shares — the pre-join decision input for salting
    vs broadcast at scale.  Key-grain data never leaves the first
    aggregate."""
    from stellar_etl_spark.operators.skew import key_skew_profile

    ev = table(spark, sf_dir, "events")
    return key_skew_profile(ev, "user_id", top_k=10)


def metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long metric reshaping with native UNPIVOT (the inverse of
    event_type_pivot): per-priority aggregates melt into (metric, value)
    rows — a zero-shuffle Expand over the tiny aggregated base."""
    orders = table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice", 18, 4)), 3)
        .cast("double")
        .alias("total_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "max_price"],
        "metric",
        "value",
    )


def near_dup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-stage verification of MinHash near-dup candidates with an
    independent signal: exact Levenshtein distance over 60-char prefixes
    (both engines implement classic unit-cost Levenshtein, so the check is
    integer-exact).  The join back to texts touches only candidate ids —
    the corpus is never paired."""
    from stellar_etl_spark.operators.dedup import near_dup_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = near_dup_pairs(docs, "doc_id", "text", threshold=0.5)
    ta = docs.select(
        F.col("doc_id").alias("id_a"),
        F.substring("text", 1, 60).alias("_pa"),
    )
    tb = docs.select(
        F.col("doc_id").alias("id_b"),
        F.substring("text", 1, 60).alias("_pb"),
    )
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.levenshtein("_pa", "_pb").cast("long").alias("prefix_editdist"),
        )
    )


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3): mean/variance computed from
    EXACT decimal components (sum, sum-of-squares, count — one map-side-
    partial pass), then one identical IEEE double formula per row on both
    engines.  Never avg()/stddev() over raw doubles — those are
    summation-order-dependent and partitioning-unstable."""
    ev = table(spark, sf_dir, "events")
    v = _dec("value", 10, 4)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_ss"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    z_raw = (F.col("value") - mean) / F.sqrt(var)
    # Row membership is decided on the UNROUNDED z (IEEE-identical in both
    # engines); rounding is display-only.  Filtering on the rounded value
    # would reintroduce the ...5-boundary cross-engine divergence that the
    # exact-ratio paths elsewhere exist to avoid.
    return (
        j.where(var > 0)
        .where(F.abs(z_raw) > 3)
        .select(
            "event_id", "event_type", "value", F.round(z_raw, 6).alias("z")
        )
    )


def decile_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-decile mobility 1996→1997: per-year exact-decimal
    customer totals → EXACT ntile(10) with a total-order tie-break
    (spend, key) via the two-phase distributed rank — no global window,
    so the decile pass scales with customer cardinality — → transition
    counts."""
    from stellar_etl_spark.operators.ranking import distributed_ntile

    orders = table(spark, sf_dir, "orders")

    def year_deciles(year: int, alias: str):
        per_cust = (
            orders.where(_year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(_dec("o_totalprice", 18, 4)).alias("_spend"))
        )
        return distributed_ntile(
            per_cust, "_spend", ["o_custkey"], 10, out=alias
        ).select("o_custkey", alias)

    a = year_deciles(1996, "d_1996")
    b = year_deciles(1997, "d_1997")
    return (
        a.join(b, "o_custkey")
        .groupBy("d_1996", "d_1997")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning recipe a training corpus actually runs: quality
    gate → exact-dedup survivors (lowest id per content hash) → per-language
    corpus profile.  One semi join + two hash aggregates; every stage is the
    same operator exposed individually elsewhere in the registry."""
    docs = table(spark, sf_dir, "documents")
    q = quality_score(docs).where(F.col("quality_score") >= 2).select(
        "doc_id", "n_tokens"
    )
    survivors = exact_dedup(docs, "doc_id", "text").select("doc_id")
    kept = docs.join(survivors, "doc_id", "left_semi").join(q, "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape on the slim schema (no partsupp): the supply relation is the
    (part, supplier) pairs observed in lineitem, 'supply cost' the exact
    DECIMAL revenue sum.  The correlated MIN subquery decorrelates into a
    window-min over the aggregate — ONE shuffle on l_partkey serves both the
    aggregate and the window (same key), then both dims broadcast."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_size") < 15)
    supp = table(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_extendedprice")).alias("cost")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("cost").over(w)).where(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("cost", 3).cast("double").alias("supply_cost"),
        )
    )


def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape (shipmode → linestatus on the slim schema): lines shipped
    >30 days after order placement, split into high/low-priority counts by a
    conditional aggregate.  The date arithmetic stays a pushable column
    predicate on the join output; one shuffle for the orderkey join (lineitem
    and orders are both large), one tiny agg."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.lit(30 * 86_400_000_000_000)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: suppliers holding excess stock of any part — a nested
    aggregate (per part×supplier 1997 shipped quantity) filtered above a
    threshold, then a LEFT SEMI join back to supplier.  The semi join keeps
    only supplier columns flowing (no fan-out), and the aggregate output is
    small enough to broadcast as the semi-join build side."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1998-01-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    excess = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 50)
    )
    return (
        supp.join(
            F.broadcast(excess), supp.s_suppkey == excess.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name", "s_nationkey")
    )


def priority_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90 of order value) per
    priority class.  ``percentile`` buffers each group's values — fine for a
    bounded group count like this; the documented scale path for
    high-cardinality groups is ``approx_percentile`` (KLL-style sketch,
    mergeable map-side) at the cost of oracle-exactness."""
    orders = table(spark, sf_dir, "orders")
    pct = F.percentile(F.col("o_totalprice"), F.array(F.lit(0.5), F.lit(0.9)))
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("pcts"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            F.round(F.col("pcts")[0], 6).alias("p50_price"),
            F.round(F.col("pcts")[1], 6).alias("p90_price"),
            "n_orders",
        )
    )


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key mitigation: the events fact side joins a keyed dimension via
    an explicit 8-way salted join (fact rows spread across salts, dim rows
    replicated) — the reliable fix when one key owns a double-digit share of
    a 100 TB fact table and AQE's skew splitting can't help (e.g. a
    partial-agg-before-join plan).  Results are salt-invariant, so the oracle
    is the plain join."""
    from stellar_etl_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "user_id"
    )
    joined = salted_join(ev, cust, on="user_id", n_salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum(_dec("value", 10, 4)).alias("total_value"),
    )


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: deterministic synthetic PII (an email and a phone
    derived from doc_id) is injected, then scrubbed by the regex pass; the
    audit aggregates redaction counts per source.  Map-only until the final
    tiny aggregate."""
    from stellar_etl_spark.operators.text import pii_scrub

    docs = table(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    scrubbed = pii_scrub(seeded).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("emails_redacted"),
        F.sum("n_phones").alias("phones_redacted"),
        F.sum("chars_delta").alias("chars_delta_total"),
    )


def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (200 chars, 40 overlap): generate-and-explode
    map stage — output grain is chunks, no shuffle anywhere."""
    from stellar_etl_spark.operators.text import chunk_documents

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=200, overlap=40)


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit token packing into 512-token bins per source shard —
    the sequential-fold-per-shard shape (applyInPandas), shards parallel.
    Oracle is a recursive CTE stepping the identical fold."""
    from stellar_etl_spark.operators.packing import pack_next_fit

    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        # NULL text packs as a 0-token doc (joins the current bin) — both
        # engines coalesce identically; the fold kernel needs non-null sizes
        F.coalesce(
            F.size(F.split(F.col("text"), " ")), F.lit(0)
        ).alias("n_tokens"),
    )
    return pack_next_fit(
        sized, group_col="source", order_col="doc_id", size_col="n_tokens",
        budget=512,
    )


def supplier_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the part↔supplier supply graph
    (symmetric edges from distinct lineitem pairs) — the iterative-join
    execution shape; oracle unrolls the same 3 iterations as chained CTEs.
    Top-500 by rounded rank with total-order tie-break."""
    from stellar_etl_spark.operators.graph import pagerank

    li = table(spark, sf_dir, "lineitem")
    # Iterate over INTEGER node ids (p→2k, s→2k+1): narrower exchanges and
    # cheaper hashing than strings; the "p123"/"s45" labels the oracle uses
    # are built only for the final 500 rows.  broadcast_ranks is valid here
    # because |V| = |part|+|supplier| is dimension-sized (bounded catalog).
    # an edge needs BOTH endpoints: NULL part/supplier keys carry no graph
    # information and would diverge engines (Spark's joins drop NULL keys,
    # DuckDB's GROUP BY keeps a NULL node) — no-op on driver data
    fwd = (
        li.where(
            F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        # the union below references this subtree twice and ReuseExchange
        # does not collapse the two distinct aggregates; a LAZY checkpoint
        # executes it once (measured 3.3 s -> 2.3 s steady at sf0.1)
        .localCheckpoint(eager=False)
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(
        edges, iterations=3, damping=0.85, broadcast_ranks=True, symmetric=True
    )
    named = ranks.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("p")).otherwise(F.lit("s")),
            F.shiftright("node", 1).cast("string"),
        ).alias("node"),
        F.round("rank", 6).alias("rank"),
    )
    return named.orderBy(F.col("rank").desc(), "node").limit(500)


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k=8 over quantized embeddings — exact integer
    arithmetic end-to-end (quantize → integer L2 → round(sum/count) update),
    so the full assignment hash-matches the unrolled SQL oracle."""
    from stellar_etl_spark.operators.similarity import kmeans_fixed

    emb = emb_table(spark, sf_dir)
    return kmeans_fixed(emb, k=8, iterations=2)


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-50 ∪ cosine-ANN semantic top-50
    (query = the vec_id-0 embedding), fused by integer reciprocal-rank
    fusion.  Both candidate lists are TakeOrdered partial top-k cuts (no
    global sort of the corpus); the fusion joins two 50-row frames."""
    from stellar_etl_spark.operators.similarity import (
        cosine,
        hybrid_rrf,
    )
    from stellar_etl_spark.operators.text import bm25_search

    docs = table(spark, sf_dir, "documents")
    emb = emb_table(spark, sf_dir)

    lex = bm25_search(docs, "doc_id", "text", BM25_TERMS, limit=50)

    qvec = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qv")
    )
    sem = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            # rank on the UNROUNDED double: the expression tree is a fixed
            # left fold, so both engines compute the identical IEEE value —
            # rounding first would reintroduce the ...5-boundary divergence
            cosine(F.col("embedding"), F.col("_qv")).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(50)
    )
    return hybrid_rrf(lex, sem, "doc_id", "bm25", "cos", list_len=50)


def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: score every non-src0 document by hashed-unigram
    importance against the src0 target corpus — bucket-count tables stay
    ≤1024 rows (broadcast), per-doc sums are exact integers."""
    from stellar_etl_spark.operators.text import dsir_importance

    docs = table(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("source") == "src0"
    )
    return dsir_importance(docs)


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per (lang, source): BPE-ish subword tokens
    per whitespace word and bytes per token — the standard tokenizer-fit
    diagnostic before committing a vocab to a corpus.  Map-only token
    counting, one partial-aggregated shuffle; ratios via the exact-integer
    round-6 path."""
    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.text import BPE_PATTERN
    from stellar_etl_spark.operators.util import exact_ratio_round6

    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "source",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 1)
        ).alias("n_bpe"),
        F.size(tokenize_words(F.col("text"))).alias("n_words"),
        F.octet_length("text").alias("n_bytes"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "total_bpe_tokens",
            exact_ratio_round6("total_bpe_tokens", "total_words").alias(
                "fertility"
            ),
            exact_ratio_round6("total_bytes", "total_bpe_tokens").alias(
                "bytes_per_token"
            ),
        )
    )


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus: exact-integer k-means cells,
    within-cell pairwise cosine at τ=0.35, drop docs dominated by an
    earlier similar neighbor — the cluster-bounded semantic-dedup shape
    (never an all-pairs join)."""
    from stellar_etl_spark.operators.similarity import semdedup

    emb = emb_table(spark, sf_dir)
    return semdedup(emb, k=8, iterations=2, tau_n=7, tau_d=20)


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals per document (top-unigram /
    top-bigram token share) — a shuffle-free map stage over the corpus."""
    from stellar_etl_spark.operators.text import repetition_stats

    docs = table(spark, sf_dir, "documents")
    return repetition_stats(docs)


def ngram_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination sweep: docs whose 3-gram overlap with a
    held-out benchmark slice (doc_id ≡ 0 mod 97 — stand-in for an eval
    suite) exceeds 2%.  Benchmark n-gram set broadcasts; the corpus is never
    shuffled at n-gram grain."""
    from stellar_etl_spark.operators.text import ngram_contamination
    from stellar_etl_spark.operators.util import exact_ratio_round6

    docs = table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    rest = docs.where(F.col("doc_id") % 97 != 0)
    per_doc = ngram_contamination(
        rest, bench, n=3, threshold=0.02, carry_cols=("source",)
    )
    # integer sums only (order-independent); ONE division at the edge
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).alias(
            "n_contaminated"
        ),
        exact_ratio_round6(
            F.sum("n_contaminated"), F.sum("n_grams")
        ).alias("overlap_frac"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q3_top_orders": tpch_q3_top_orders,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q5_region_revenue": tpch_q5_region_revenue,
    "tpch_q6_revenue_forecast": tpch_q6_revenue_forecast,
    "tpch_q7_nation_volume": tpch_q7_nation_volume,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q16_supplier_cnt": tpch_q16_supplier_cnt,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "tpch_q19_disjunctive": tpch_q19_disjunctive,
    "tpch_q22_global_sales_opportunity": tpch_q22_global_sales_opportunity,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q13_order_distribution": tpch_q13_order_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_quantity": tpch_q17_small_quantity,
    "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
    "supplier_nation_revenue": supplier_nation_revenue,
    "top_customers_per_nation": top_customers_per_nation,
    "props_json_agg": props_json_agg,
    "toid_pack_roundtrip": toid_pack_roundtrip,
    "ledger_close_agg": ledger_close_agg,
    "change_compaction": change_compaction,
    "batch_windows_5min": batch_windows_5min,
    "first_sighting_dedup": first_sighting_dedup,
    # entity transforms over derived stellar-shaped inputs (entity_queries.py)
    **ENTITY_QUERIES,
    "time_to_sequence_range": time_to_sequence_range,
    "word_explode_counts": word_explode_counts,
    "token_stats": token_stats_q,
    "text_quality_score": text_quality_q,
    "language_id": language_id_q,
    "doc_fingerprint": doc_fingerprint_q,
    "exact_dedup": exact_dedup_q,
    "segment_dedup_reconstruct": segment_dedup_reconstruct,
    "minhash_near_dup": minhash_near_dup,
    "ngram_jaccard_near_dup": ngram_jaccard_near_dup,
    "simhash_fingerprint": simhash_fingerprint,
    "simhash_near_dup": simhash_near_dup,
    "asof_attribution": asof_attribution,
    "funnel_conversion": funnel_conversion,
    "errors_in_sessions": errors_in_sessions,
    "active_sessions_per_window": active_sessions_per_window,
    "hourly_value_gapfill": hourly_value_gapfill,
    "event_type_pivot": event_type_pivot,
    "cube_sales": cube_sales,
    "revenue_moving_avg": revenue_moving_avg,
    "stratified_sample": stratified_sample,
    "domain_mix_sample": domain_mix_sample,
    "train_val_test_split": train_val_test_split,
    "lm_quality_score": lm_quality_score,
    "perplexity_buckets": perplexity_buckets,
    "vocab_oov_rate": vocab_oov_rate,
    "embedding_quantization": embedding_quantization,
    "top_bigrams": top_bigrams,
    "repeat_buyers": repeat_buyers,
    "buyer_cohort_overlap": buyer_cohort_overlap,
    "user_value_scd2": user_value_scd2,
    "tfidf_cosine_sim": tfidf_cosine_sim,
    "order_value_deciles": order_value_deciles,
    "bm25_keyword_search": bm25_keyword_search,
    "sliding_windows_15min": sliding_windows_15min,
    "knn_cosine_bruteforce": knn_cosine_bruteforce,
    "embedding_label_centroids": embedding_label_centroids,
    "ivf_knn_approx": ivf_knn_approx,
    "rollup_revenue": rollup_revenue,
    "dormant_customers": dormant_customers,
    "media_byte_features": media_byte_features_q,
    "media_frame_sample": media_frame_sample_q,
    "media_resize_signature": media_resize_signature,
    "bpe_token_stats": bpe_token_stats_q,
    "rolling_fingerprint": rolling_fingerprint_q,
    "embedding_near_dup": embedding_near_dup,
    "deterministic_sample": deterministic_sample,
    "corpus_stats_by_source": corpus_stats_by_source,
    "running_state_snapshots": running_state_snapshots,
    "training_data_pipeline": training_data_pipeline,
    "sessionize_events": sessionize_events,
    "near_dup_clusters": near_dup_clusters,
    "clean_text": clean_text_q,
    "weekly_retention": weekly_retention,
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q12_late_shipments": tpch_q12_late_shipments,
    "tpch_q20_excess_stock_suppliers": tpch_q20_excess_stock_suppliers,
    "priority_price_percentiles": priority_price_percentiles,
    "salted_skew_join": salted_skew_join,
    "pii_scrub_stats": pii_scrub_stats,
    "repetition_quality": repetition_quality,
    "ngram_contamination": ngram_contamination_report,
    "document_chunking": document_chunking,
    "sequence_packing": sequence_packing,
    "supplier_part_pagerank": supplier_part_pagerank,
    "kmeans_clusters": kmeans_clusters,
    "semantic_dedup": semantic_dedup,
    "hybrid_rrf_search": hybrid_rrf_search,
    "dsir_selection": dsir_selection,
    "tokenizer_fertility": tokenizer_fertility,
    "variant_props_profile": variant_props_profile,
    "snapshot_upsert": snapshot_upsert,
    "waveform_windows": waveform_windows,
    "weighted_priority_sample": weighted_priority_sample,
    "sessionize_skew_safe": sessionize_skew_safe,
    "inverted_index": inverted_index,
    "join_key_skew_profile": join_key_skew_profile,
    "metrics_unpivot": metrics_unpivot,
    "near_dup_editdist": near_dup_editdist,
    "value_outliers": value_outliers,
    "decile_transition_matrix": decile_transition_matrix,
}

# round-3 additions go at the END so the driver's rotating correctness
# sample keeps its established ordering for pre-existing keys
from stellar_etl_spark.entity_queries import (  # noqa: E402
    offer_star_markets,
    offer_star_offers,
)

QUERIES["offer_star_offers"] = offer_star_offers
QUERIES["offer_star_markets"] = offer_star_markets


def media_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end: deterministic Paeth-filtered 8x8 RGB
    payloads per document → stdlib codec decode (functions/codecs.py) →
    per-image dimension + exact pixel aggregates.  The oracle re-derives
    pixel_sum/first/last in closed form from the generator formula
    pixel_i = (3*doc_id + i) mod 251 — the decode must invert the real
    zlib+filter encoding bit-exactly to match."""
    from stellar_etl_spark.operators.multimodal import (
        attach_png_media,
        decode_image,
    )

    docs = table(spark, sf_dir, "documents")
    return decode_image(attach_png_media(docs)).select(
        "doc_id", "width", "height", "channels", "n_pixel_bytes",
        "pixel_sum", "pixel_first", "pixel_last",
    )


def media_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE PCM16 decode end-to-end: 64 deterministic samples per
    document → stdlib codec decode → per-clip aggregates; oracle re-derives
    them from sample_i = ((7*doc_id + i) mod 2001) - 1000."""
    from stellar_etl_spark.operators.multimodal import (
        attach_wav_media,
        decode_audio,
    )

    docs = table(spark, sf_dir, "documents")
    return decode_audio(attach_wav_media(docs)).select(
        "doc_id", "sample_rate", "n_channels", "n_samples",
        "sample_sum", "sample_min", "sample_max",
    )


QUERIES["media_decode_image"] = media_decode_image
QUERIES["media_decode_audio"] = media_decode_audio


def pq_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN over the embeddings table: per-subspace
    exact-integer codebooks (2 Lloyd iterations, 8 subspaces x 16
    centroids over 64 dims), PQ codes, and an ADC top-20 for the query
    vector vec_id=0 — the billion-scale ANN pattern; the oracle unrolls
    the identical integer pipeline in SQL."""
    from stellar_etl_spark.operators.similarity import pq_ann

    emb = emb_table(spark, sf_dir)
    return pq_ann(emb, d=64, m=8, k=16, iterations=2, query_id=0, top=20)


QUERIES["pq_ann_search"] = pq_ann_search


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning over the documents corpus: three
    steps of corpus-weighted pair counting → argmax → everywhere-merge,
    with a per-step compression curve; the oracle unrolls the identical
    pipeline (pair explode, tie-broken argmax, double space-delimited
    replace) in SQL."""
    from stellar_etl_spark.operators.text import bpe_learn

    docs = table(spark, sf_dir, "documents")
    return bpe_learn(docs, steps=3)


QUERIES["bpe_learn_merges"] = bpe_learn_merges


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening: documents with doc_id % 7 == 3 play
    the NEW batch; the rest are the existing INDEX.  MinHash-LSH bands join
    new x index only, exact n-gram Jaccard verifies, and each new doc keeps
    its best match (max Jaccard, min index id) — the streaming-ingestion
    dedup shape."""
    from stellar_etl_spark.operators.dedup import dedup_against_index

    docs = table(spark, sf_dir, "documents")
    return dedup_against_index(
        docs, "doc_id", "text", is_new=F.col("doc_id") % 7 == 3
    )


QUERIES["incremental_dedup"] = incremental_dedup


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every document gets a
    pseudorandom but reproducible (shard, position) for a given epoch via
    an md5 hash of (doc_id, epoch) — the serving-side op that turns a
    static corpus into differently-ordered epochs with balanced shards,
    with no RNG state and no global sort (positions are per-shard
    windows).  Epoch 7, 8 shards."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 8
    ).cast("int")
    from pyspark.sql.window import Window

    shuffled = docs.select(
        F.col("doc_id"), key.alias("_key"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("_key", "doc_id")
    return shuffled.select(
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
        "doc_id",
    )


QUERIES["epoch_shuffle"] = epoch_shuffle


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application: replay the 3 learned BPE merges over the
    corpus and report per-document word/char/token counts — merge learning
    runs on distinct words, application is one join + sum over the
    corpus."""
    from stellar_etl_spark.operators.text import bpe_encode_corpus

    docs = table(spark, sf_dir, "documents")
    return bpe_encode_corpus(docs, steps=3)


QUERIES["bpe_encode_docs"] = bpe_encode_docs


def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents fall into power-of-two
    token buckets (cap 1024); per bucket, the padded-token cost of
    batching at the bucket boundary vs the real token count — the padding
    waste a training dataloader pays, computed with exact integer ratios.
    One hash aggregate; scales as a plain groupBy."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    capped = F.least(n_tok, F.lit(1024))
    # next power of two >= capped as an exact integer when-chain (libm
    # log2 of exact powers is not portable enough for a hash-compared key)
    bucket = F.lit(1024).cast("long")
    for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        bucket = F.when(capped <= b, F.lit(b).cast("long")).otherwise(bucket)
    agg = (
        docs.select(capped.alias("n"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("real_tokens"),
        )
    )
    padded = F.col("bucket") * F.col("n_docs")
    return agg.select(
        "bucket",
        "n_docs",
        "real_tokens",
        padded.alias("padded_tokens"),
        exact_ratio_round6(F.col("real_tokens"), padded).alias("fill_ratio"),
    )


QUERIES["length_bucket_batches"] = length_bucket_batches


def concat_chunk_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-then-chunk pretraining layout: the corpus,
    concatenated in doc_id order, cut into fixed 2048-char blocks that
    cross document boundaries; per block the contributing doc count, chars
    and first/last provenance ids.  The global offset is a TWO-PHASE
    distributed cumsum (coarse id-range buckets -> broadcast offsets), so
    no global window exists anywhere in the plan."""
    from stellar_etl_spark.operators.packing import concat_chunk_blocks as op

    return op(table(spark, sf_dir, "documents"), block_chars=2048)


QUERIES["concat_chunk_blocks"] = concat_chunk_blocks


def dup_span_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring audit (Lee et al. dedup shape, word grain):
    8-gram windows occurring more than once corpus-wide, merged per
    document into maximal duplicated spans.  Heavy shuffle = one md5-keyed
    hash aggregate; span merge is per-document gaps-and-islands."""
    from stellar_etl_spark.operators.dedup import dup_spans

    return dup_spans(table(spark, sf_dir, "documents"), n=8)


QUERIES["dup_span_detection"] = dup_span_detection


def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained data mixture: per source, admit documents in
    quality order (n_chars desc, doc_id tiebreak) while the running token
    total stays within a 600-token budget — the greedy per-domain
    selection a mixture-weighted training run makes.  The window is
    partitioned by source, so selection parallelizes across domains;
    skewed domains sub-shard upstream."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    scored = docs.select(
        "source", "doc_id", "n_chars", n_tok.alias("n_tokens")
    ).withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return scored.where(F.col("cum_tokens") <= 600).select(
        "source", "doc_id", "n_tokens", "cum_tokens"
    )


QUERIES["token_budget_mixture"] = token_budget_mixture


def cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor selection: connected near-dup clusters (same verified
    MinHash graph as near_dup_clusters) keep exactly one survivor — the
    longest document, doc_id tiebreak.  The survivor argmax is a single
    max(struct) aggregate per cluster, not a window."""
    from stellar_etl_spark.operators.dedup import dedup_clusters

    docs = table(spark, sf_dir, "documents")
    clusters = dedup_clusters(docs, "doc_id", "text", threshold=0.5)
    member = clusters.join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    best = member.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.max(
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_neg"))
        ).alias("_b"),
    )
    return best.select(
        "cluster_id",
        (-F.col("_b")["_neg"]).cast("long").alias("survivor_doc_id"),
        F.col("_b")["n_chars"].alias("survivor_chars"),
        "cluster_size",
    )


QUERIES["cluster_keep_best"] = cluster_keep_best


def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by exact-integer
    power iteration: Arrow-batched numpy Gram partials reduced by one
    (i,j)-keyed aggregate, three DECIMAL(38) matrix-vector iterations on
    the tiny Gram frame, one final double normalization (fixed-order fold
    + correctly-rounded sqrt).  No collect, no normalization drift."""
    from stellar_etl_spark.operators.similarity import pca_top_component

    return pca_top_component(emb_table(spark, sf_dir))


QUERIES["pca_power_iteration"] = pca_power_iteration


def source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: verified MinHash near-dup pairs
    rolled up to unordered source pairs — the per-domain leakage audit run
    before mixing corpora.  Rides the existing banded LSH + exact-Jaccard
    verify; the rollup adds two dimension joins and one hash aggregate."""
    from stellar_etl_spark.operators.dedup import near_dup_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = near_dup_pairs(docs, "doc_id", "text", threshold=0.5)
    src = docs.select("doc_id", "source")
    j = pairs.join(
        src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")),
        "id_a",
    ).join(
        src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")),
        "id_b",
    )
    return (
        j.select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


QUERIES["source_contamination"] = source_contamination


def feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the four lineitem measures from
    EXACT decimal moment components (one map-side-partial aggregate row:
    sums, squares, cross-products), then one identical IEEE double formula
    per pair — never corr()/stddev over raw doubles, which are
    summation-order-dependent."""
    li = table(spark, sf_dir, "lineitem")
    cols = {
        "quantity": _dec("l_quantity"),
        "extendedprice": _dec("l_extendedprice"),
        "discount": _dec("l_discount", 6, 4),
        "tax": _dec("l_tax", 6, 4),
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = list(cols)
    for a in names:
        aggs.append(F.sum(cols[a]).alias(f"_s_{a}"))
    for ai, a in enumerate(names):
        for b in names[ai:]:
            aggs.append(F.sum(cols[a] * cols[b]).alias(f"_p_{a}_{b}"))
    m = li.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("_n").cast("double")
        sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
        sab = F.col(f"_p_{a}_{b}").cast("double")
        saa = F.col(f"_p_{a}_{a}").cast("double")
        sbb = F.col(f"_p_{b}_{b}").cast("double")
        return (n * sab - sa * sb) / (
            F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        )

    pairs = [
        (a, b) for ai, a in enumerate(names) for b in names[ai + 1 :]
    ]
    # one aggregate row -> explode the 6 pair structs (the aggregate subtree
    # appears once in the plan, not once per pair)
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("feature_a"),
                F.lit(b).alias("feature_b"),
                F.round(corr(a, b), 6).alias("pearson_r"),
            )
            for a, b in pairs
        ]
    )
    return m.select(F.explode(pair_structs).alias("_x")).select("_x.*")


QUERIES["feature_correlations"] = feature_correlations


def dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: the previous dataset version (deterministically
    derived — docs with ``doc_id % 10 == 7`` not yet present, docs with
    ``doc_id % 10 == 3`` carrying an older text revision) full-outer-joined
    against the current version by doc_id, content compared by md5 — the
    added/removed/changed/unchanged audit run between dataset releases.
    One doc_id-keyed shuffle join + one hash aggregate; content hashes are
    computed map-side so the join carries 32-byte digests, not documents."""
    docs = table(spark, sf_dir, "documents")
    cur = docs.select("doc_id", "source", F.md5("text").alias("_h"))
    prev = (
        docs.where(F.col("doc_id") % 10 != 7)
        .select(
            "doc_id",
            "source",
            F.when(
                F.col("doc_id") % 10 == 3, F.md5(F.concat(F.lit("old:"), "text"))
            )
            .otherwise(F.md5("text"))
            .alias("_h"),
        )
    )
    j = prev.alias("p").join(
        cur.alias("c"), F.col("p.doc_id") == F.col("c.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("p.doc_id").isNull(), F.lit("added"))
        .when(F.col("c.doc_id").isNull(), F.lit("removed"))
        .when(F.col("p._h") != F.col("c._h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("c.source"), F.col("p.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


QUERIES["dataset_diff"] = dataset_diff


def label_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balanced deterministic downsample: every label keeps exactly
    min-class-count vectors, chosen by md5(vec_id) order (reproducible, no
    RNG state) — the class-rebalancing step before training a classifier
    head.  The min count is a 1-row broadcast; ranking windows partition by
    label so the selection parallelizes across classes."""
    emb = emb_table(spark, sf_dir)
    from pyspark.sql.window import Window

    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("_n"))
    m = counts.agg(F.min("_n").alias("_m"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = emb.select("label", "vec_id").withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(m), ranked["rk"] <= m["_m"]).select(
        "label", "vec_id", "rk"
    )


QUERIES["label_balanced_sample"] = label_balanced_sample


def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality gate per document — a shuffle-free map-only
    column program (split → distinct → per-char count via higher-order
    functions); the gibberish/boilerplate filter of the quality family."""
    from stellar_etl_spark.operators.text import char_entropy_stats

    docs = table(spark, sf_dir, "documents")
    return char_entropy_stats(docs)


QUERIES["char_entropy_quality"] = char_entropy_quality


def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty (share of shingles unique to the doc) —
    one doc-frequency hash aggregate plus a gram-keyed join; the soft
    scoring sibling of the dedup family."""
    from stellar_etl_spark.operators.text import ngram_novelty

    docs = table(spark, sf_dir, "documents")
    return ngram_novelty(docs)


QUERIES["ngram_novelty_score"] = ngram_novelty_score


def source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram KL divergence of each source from the corpus mixture — the
    domain-shift audit; integer-scaled logs keep it bit-deterministic."""
    from stellar_etl_spark.operators.text import source_token_kl

    docs = table(spark, sf_dir, "documents")
    return source_token_kl(docs)


QUERIES["source_kl_drift"] = source_kl_drift


def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (fastText/CCNet-style): hashed
    bag-of-ngrams linear scorer over every document — explode → pure-column
    weight lookup → doc-keyed integer aggregate; the classifier-inference
    slot of the filtering family."""
    from stellar_etl_spark.operators.text import hashed_ngram_score

    docs = table(spark, sf_dir, "documents")
    return hashed_ngram_score(docs)


QUERIES["quality_classifier_filter"] = quality_classifier_filter


def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum schedule: rank docs by token count into 5
    difficulty stages (exact ANSI ntile via the two-phase distributed rank
    — no single-partition window), then give each doc a deterministic
    within-stage position by md5 order (the epoch-shuffle idiom).  Output
    is the training order a curriculum loader would consume."""
    from pyspark.sql.window import Window

    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.ranking import distributed_ntile

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize_words(F.col("text"))).alias("difficulty")
    )
    staged = distributed_ntile(
        docs, "difficulty", ["doc_id"], k=5, out="stage"
    )
    pos = F.row_number().over(
        Window.partitionBy("stage").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return staged.select(
        "doc_id",
        F.col("difficulty").cast("long").alias("difficulty"),
        "stage",
        pos.cast("long").alias("stage_pos"),
    )


QUERIES["curriculum_stages"] = curriculum_stages


def embedding_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation-energy audit per label: what fraction of the
    embedding norm survives truncation to 8/16/32 dims — map-only fold plus
    one (k, label) hash aggregate."""
    from stellar_etl_spark.operators.similarity import truncation_energy_audit

    emb = emb_table(spark, sf_dir)
    return truncation_energy_audit(emb)


QUERIES["embedding_truncation_audit"] = embedding_truncation_audit


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF approximate kNN against the exact brute-force
    ground truth, per query — the standard ANN quality gate before trading
    exactness for the nprobe/ncells scan reduction.  Composes the two
    existing operators (each deterministic with a tie-broken rank order)
    and scores the overlap as an exact integer ratio; the join keys are
    (query, neighbor) over two k-bounded result sets, so cost is the two
    kNN plans plus a trivial join."""
    from stellar_etl_spark.operators.similarity import (
        cosine_topk,
        lsh_bucket_topk,
    )

    emb = emb_table(spark, sf_dir)
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, query_ids=qids, k=5).select(
        "query_id", "nbr_id"
    )
    approx = lsh_bucket_topk(emb, query_ids=qids, k=5, nprobe=3).select(
        "query_id", F.col("nbr_id").alias("a_nbr_id")
    )
    from stellar_etl_spark.operators.util import exact_ratio_round6

    hits = exact.join(
        # both sides are k-bounded result sets; broadcast keeps the tiny
        # overlap join out of sort-merge (plan hygiene, PLANS.md)
        F.broadcast(approx),
        (exact["query_id"] == approx["query_id"])
        & (exact["nbr_id"] == approx["a_nbr_id"]),
        "left",
    ).select(
        exact["query_id"].alias("query_id"),
        F.when(F.col("a_nbr_id").isNotNull(), 1).otherwise(0).alias("_hit"),
    )
    agg = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_hit").cast("long").alias("n_hits"),
    )
    return agg.select(
        "query_id",
        "k",
        "n_hits",
        exact_ratio_round6("n_hits", "k").alias("recall"),
    )


QUERIES["ann_recall_audit"] = ann_recall_audit


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export manifest over the packed corpus: one row per (source, bin)
    with doc/token counts and an order-independent md5 content digest —
    the bookkeeping a training loader uses to verify shard integrity.
    One hash aggregate over the packing output; the digest sorts the
    member list inside the row, so it is partitioning-independent."""
    packed = sequence_packing(spark, sf_dir)
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("content_digest"),
        )
    )


QUERIES["shard_manifest"] = shard_manifest


def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score per doc (add-one smoothing, corpus-trained)
    — the KenLM-style conditional-probability signal; integer-scaled logs
    keep every aggregate exact."""
    from stellar_etl_spark.operators.text import bigram_logprob_score

    docs = table(spark, sf_dir, "documents")
    return bigram_logprob_score(docs)


QUERIES["bigram_lm_quality"] = bigram_lm_quality


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: top-3 different-label neighbors
    for 20 anchors — broadcast anchors over the streamed corpus, label
    inequality as a pair-stream predicate."""
    from stellar_etl_spark.operators.similarity import hard_negative_mining

    emb = emb_table(spark, sf_dir)
    return hard_negative_mining(emb, anchor_ids=list(range(20)), k=3)


QUERIES["hard_negatives"] = hard_negatives


def bloom_dedup_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership screen over a split corpus: a 2048-bit /
    4-hash filter built on the even-doc_id half, probed by the odd half,
    with the exact membership join alongside so false positives are
    visible.  Build side collapses to <=2048 occupied bit positions
    (broadcast); probe side is a x4 explode + broadcast join — the corpus
    itself never shuffles for the screen, only the (tiny) exact-check
    join does."""
    from stellar_etl_spark.operators.dedup import bloom_screen

    docs = table(spark, sf_dir, "documents")
    build = docs.where(F.col("doc_id") % 2 == 0)
    probe = docs.where(F.col("doc_id") % 2 == 1)
    screened = bloom_screen(build, probe, "doc_id", "text", m=2048, k=4)
    build_texts = build.select(F.col("text").alias("_bt")).distinct()
    exact = probe.join(
        build_texts, probe["text"] == F.col("_bt"), "left"
    ).select("doc_id", F.col("_bt").isNotNull().alias("exact_dup"))
    return screened.join(exact, "doc_id").select(
        "doc_id", "n_set_hits", "bloom_hit", "exact_dup"
    )


QUERIES["bloom_dedup_screen"] = bloom_dedup_screen


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix: KMV (k=64 minimum hash values)
    Jaccard estimate per source pair, audited against the exact
    intersection/union — the sketch-based answer to "which crawl sources
    duplicate each other" that at 100 TB replaces the quadratic exact
    join with O(sources^2 * k) sketch rows."""
    from stellar_etl_spark.operators.sketch import kmv_source_overlap as kmv

    docs = table(spark, sf_dir, "documents")
    return kmv(docs, k=64, shingle_n=3, survivor_bits=2)


QUERIES["kmv_source_overlap"] = kmv_source_overlap


def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrency via the classic sweep line: each event spans
    [ts, ts + value seconds); +1/-1 boundary points, running sum, max.
    Scale shape: the running sum is windowed PER DAY (bounded partitions,
    parallel across days) and the cross-day carry-in comes from a
    <=#days-row aggregate of per-day nets — the only unpartitioned window
    runs over that tiny frame, never the event stream.  Duration is
    derived as floor(value * 1e6) microseconds: floor of an identical
    IEEE multiply is bit-deterministic across engines (no rounding-
    boundary trap)."""
    # an event without a duration is not an interval (oracle filters too)
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    t_us = F.expr("ts div 1000")
    dur_us = F.floor(F.col("value") * F.lit(1000000.0)).cast("long")
    starts = ev.select(t_us.alias("t"), F.lit(1).alias("delta"))
    ends = ev.select((t_us + dur_us).alias("t"), F.lit(-1).alias("delta"))
    pts = starts.union(ends).withColumn("day", F.expr("t div 86400000000"))
    from pyspark.sql.window import Window as W

    per_day_w = (
        W.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = pts.withColumn("_run", F.sum("delta").over(per_day_w))
    per_day = run.groupBy("day").agg(
        F.sum("delta").cast("long").alias("_day_net"),
        F.max("_run").cast("long").alias("_in_day_peak"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    # <= #days rows from here on: the global window is benign by bound.
    days_w = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    return (
        per_day.withColumn(
            "carry_in",
            F.coalesce(F.sum("_day_net").over(days_w), F.lit(0)).cast("long"),
        )
        .select(
            "day",
            "n_points",
            "carry_in",
            (F.col("carry_in") + F.col("_in_day_peak"))
            .cast("long")
            .alias("peak_concurrency"),
        )
    )


QUERIES["peak_concurrency"] = peak_concurrency


def bottom_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100-row uniform sample via bottom-k order statistics on a
    per-row content hash.  ORDER BY hash LIMIT k compiles to
    TakeOrderedAndProject: each partition keeps a local k, the driver
    merges k*partitions candidates — no global sort, no shuffle of the
    corpus; the complement to the hash-THRESHOLD samplers already in the
    registry (those give an exact rate, this gives an exact SIZE)."""
    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("sample_key"),
    )
    return keyed.orderBy("sample_key").limit(100)


QUERIES["bottom_k_sample"] = bottom_k_sample


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, dedup: bool = True
) -> DataFrame:
    """Part co-purchase edge list shared by the graph family (every 4th
    order; parts sharing an order are adjacent; a < b).  One groupBy packs
    each basket's DISTINCT parts sorted (collect_set == the per-basket
    distinct), and the ≤7-per-basket pair expansion happens INSIDE the row
    via nested transforms over the sorted array — the sorted order IS the
    a < b rule.  Replaces the per-order self-join formulation: identical
    row multiset, but one aggregate exchange instead of a distinct shuffle
    + a second shuffle of the same table + a sort-merge join."""
    sets = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_ps"))
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(_ps, (x, i) -> "
                "transform(slice(_ps, i + 2, size(_ps)), y -> "
                "struct(x AS a, y AS b))))"
            )
        ).alias("_e")
    ).select(F.col("_e.a").alias("a"), F.col("_e.b").alias("b"))
    return pairs.distinct() if dedup else pairs


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts appearing in
    the same order are adjacent; every 4th order sampled so the graph has
    a fixed measurable density).  Pair expansion is the in-row basket
    expansion of :func:`_copurchase_edges` — bounded at 7 lines/order, so
    O(21)·|orders| edge rows — and the census itself is the
    degree-ordered-orientation operator (out-degree capped at O(√E), no
    hub-quadratic wedge blowup)."""
    from stellar_etl_spark.operators.graph import triangle_stats

    edges = _copurchase_edges(spark, sf_dir, dedup=False)
    return triangle_stats(edges, "a", "b")


QUERIES["copurchase_triangles"] = copurchase_triangles


def pmi_top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by PMI over the corpus bigram stream (min count
    5) — the word2vec-style phrase-detection pass.  One corpus explode +
    hash agg; marginals re-aggregate the bigram-count table; TakeOrdered
    cut with a total-order tie-break."""
    from stellar_etl_spark.operators.text import pmi_collocations

    docs = table(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5, k=50)


QUERIES["pmi_top_collocations"] = pmi_top_collocations


def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type: open/close by (ts, event_id) order
    inside BOUNDED (day, type) window partitions — parallel across days,
    no global sort — high/low/count as plain aggregates, and the value
    sum rounded in the exact decimal domain (repo money idiom)."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "value",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
    ).withColumn("day", F.expr("t_us div 86400000000"))
    w = W.partitionBy("day", "event_type").orderBy("t_us", "event_id")
    wp = W.partitionBy("day", "event_type")
    r = base.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wp)
    )
    return r.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.when(F.col("_rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("_rn") == F.col("_n"), F.col("value"))).alias(
            "close"
        ),
        F.round(F.sum(_dec("value", 18, 6)), 3).cast("double").alias(
            "sum_value"
        ),
    )


QUERIES["ohlc_daily_bars"] = ohlc_daily_bars


def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly revenue trend: closed-form OLS slope over
    (month index, monthly revenue cents), every moment an exact integer
    (monthly revenue rounded once in the decimal domain → cents long;
    slope numerator/denominator as DECIMAL(38,0) products — a long
    n·Σxy overflows — and the final divide via the exact scaled-integer
    `div` so both engines round the identical rational).  Shape: one
    broadcast-dim join, two hash aggregates; the regression itself runs
    on ≤ nations × months rows."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _dec("l_extendedprice") * (_one() - _dec("l_discount", 6, 4))
    m = (
        (_year("l_shipdate") - F.lit(1995)) * 12
        + F.month(_ts("l_shipdate"))
        - 1
    ).cast("long")
    monthly = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", m.alias("m"))
        .agg(
            (F.round(F.sum(rev), 2) * 100).cast("long").alias("y_cents")
        )
    )
    s = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("m").cast("long").alias("_sx"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("_sxx"),
        F.sum("y_cents").cast("long").alias("total_cents"),
        F.sum(F.col("m") * F.col("y_cents")).cast("long").alias("_sxy"),
    )
    d38 = "decimal(38,0)"
    num = F.col("n_months").cast(d38) * F.col("_sxy").cast(d38) - F.col(
        "_sx"
    ).cast(d38) * F.col("total_cents").cast(d38)
    den = F.col("n_months").cast(d38) * F.col("_sxx").cast(d38) - F.col(
        "_sx"
    ).cast(d38) * F.col("_sx").cast(d38)
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("double")
    q = (F.abs(num) * 2_000_000 + den).cast(d38)
    slope = (
        sgn
        * F.expr(
            "CAST(_q div (2 * _den) AS DOUBLE)"
        )
        / F.lit(1_000_000.0)
    )
    return (
        s.withColumn("_q", q)
        .withColumn("_den", den)
        .select(
            "n_name",
            "n_months",
            "total_cents",
            F.when(F.col("_den") == 0, F.lit(None).cast("double"))
            .otherwise(slope)
            .alias("slope_cents_per_month"),
        )
    )


QUERIES["nation_revenue_trend"] = nation_revenue_trend


def winnowing_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (k=4 word-grams, window w=5) per document
    — the guaranteed-overlap near-copy fingerprint set.  One shuffle, two
    reused per-doc window passes (see operators/text.winnowing_fingerprint)."""
    from stellar_etl_spark.operators.text import winnowing_fingerprint

    return winnowing_fingerprint(table(spark, sf_dir, "documents"))


QUERIES["winnowing_fingerprint"] = winnowing_fingerprint_q


HOUR_US = 3_600_000_000


def session_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap (range) join at scale: for every user session
    (gap-based, 30 min), count the platform-wide ``error`` events that fired
    during it.  A naive range join is an O(sessions × errors) nested loop;
    here both sides are bucketed to the hour — sessions explode to their
    covered hour buckets (bounded: gap-based sessions span few hours), errors
    hash to exactly one bucket — so the overlap test becomes an EQUI-join on
    the bucket plus a residual BETWEEN, and each (session, error) pair meets
    exactly once (an error has one bucket).  Zero-error sessions are kept by
    the final left join."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    from stellar_etl_spark.operators.sessionize import session_stats

    sess = session_stats(ev.select("user_id", "event_id", "ts_us"))
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts_us").alias("err_us"),
        F.expr("(ts_us div 3600000000)").alias("b"),
    )
    sess_b = sess.withColumn(
        "b",
        F.explode(
            F.sequence(
                F.expr("session_start_us div 3600000000"),
                F.expr("session_end_us div 3600000000"),
            )
        ),
    )
    hits = (
        sess_b.join(errors, "b")
        .where(F.col("err_us").between(F.col("session_start_us"), F.col("session_end_us")))
        .groupBy("user_id", "session_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_errors_during"))
    )
    return sess.join(hits, ["user_id", "session_idx"], "left").select(
        "user_id",
        "session_idx",
        "session_start_us",
        "session_end_us",
        "n_events",
        F.coalesce("n_errors_during", F.lit(0)).cast("long").alias("n_errors_during"),
    )


QUERIES["session_error_overlap"] = session_error_overlap


def quantile_normalized_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of the token-count signal — each
    doc's within-source quantile is mapped onto the GLOBAL token-count
    distribution (the standard cross-source score calibration before
    quality-filtering a mixed corpus).  Every step is exact integer
    arithmetic: per-source ranks are bounded windows, the global rank uses
    the two-phase distributed ranking (no global window), and the target
    position ``1 + round((r-1)(N-1)/(n_s-1))`` is computed with scaled
    integer division — so the lookup is an equi-join on an integer rank."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.ranking import distributed_row_number

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())  # oracle filters identically
        .select(
            "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
        )
    )
    ws = W.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = docs.withColumn("src_rank", F.row_number().over(ws)).withColumn(
        "_ns", F.count(F.lit(1)).over(W.partitionBy("source"))
    )
    tot = docs.agg(F.count(F.lit(1)).alias("_N"))
    ranked = ranked.crossJoin(F.broadcast(tot))
    p = F.when(
        F.col("_ns") == 1, F.expr("(_N + 1) div 2")
    ).otherwise(
        1
        + F.expr(
            "((src_rank - 1) * (_N - 1) * 2 + (_ns - 1)) div (2 * (_ns - 1))"
        )
    )
    lookup = distributed_row_number(docs, "n_tokens", ["doc_id"], out="_g").select(
        F.col("_g"), F.col("n_tokens").alias("norm_tokens")
    )
    return (
        ranked.withColumn("_g", p.cast("long"))
        .join(lookup, "_g")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.col("src_rank").cast("long").alias("src_rank"),
            "norm_tokens",
        )
    )


QUERIES["quantile_normalized_tokens"] = quantile_normalized_tokens


def mad_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier profile per event type — the
    breakdown-point-0.5 twin of the z-score pass (value_outliers).  Exact
    medians come from VALUE-FREQUENCY tables (operators/robust.py), never a
    per-group sorted buffer: the shuffled state is bounded by the distinct
    cent-value domain, so five giant groups cannot OOM an aggregator at
    100 TB.  All order statistics stay integer (2×median, 4×MAD); the only
    doubles are exact halvings."""
    from stellar_etl_spark.operators.robust import mad_outlier_stats

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    cents = F.round(F.col("value").cast("decimal(18,6)") * 100, 0).cast("long")
    return mad_outlier_stats(ev, "event_type", cents)


QUERIES["mad_value_outliers"] = mad_value_outliers


def lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square + mutual-information independence audit of the (lang,
    source) contingency table — the standard check that a corpus's language
    mix is not confounded with its source mix before domain-weighted
    sampling.  The contingency table is one hash aggregate (≤ |langs|·
    |sources| cells); marginals re-aggregate it.  Both statistics are
    summed as EXACT integers: the chi-square cell is the exact rational
    (O·N − r·c)² / (r·c·N) rounded half-up in DECIMAL(38) scaled-integer
    arithmetic (a long overflows at the 2e6 scale), and the MI cell uses the
    repo's integer-scaled-log convention — so the cross-cell sums are
    order-independent on both engines."""
    # NULL lang/source is not a category (oracle filters identically)
    docs = table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    # the contingency table is tiny (|langs|·|sources| cells) and feeds four
    # consumers — the lazy checkpoint keeps the corpus scan single-pass
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).localCheckpoint(eager=False)
    r = cells.groupBy("lang").agg(F.sum("o").alias("r_tot"))
    c = cells.groupBy("source").agg(F.sum("o").alias("c_tot"))
    n = cells.agg(F.sum("o").alias("n_tot"))
    j = (
        cells.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
    )
    d38 = "decimal(38,0)"
    dev = (F.col("o") * F.col("n_tot") - F.col("r_tot") * F.col("c_tot")).cast(d38)
    den = (F.col("r_tot") * F.col("c_tot")).cast(d38) * F.col("n_tot").cast(d38)
    chi_cell = F.expr(
        "CAST((_num * 2000000 + _den) div (2 * _den) AS LONG)"
    )
    from stellar_etl_spark.operators.util import fixed_ln_micro

    # ln((o*n_tot)/(r_tot*c_tot)) as a SUM of single-count logs: each
    # argument stays one count (< 2^51 even at 100 TB corpora) instead of a
    # product of two, which overflows the fixed-point divider's headroom
    mi_cell = F.col("o") * (
        fixed_ln_micro("o", "r_tot") + fixed_ln_micro("n_tot", "c_tot")
    )
    per = (
        j.withColumn("_num", dev * dev)
        .withColumn("_den", den)
        .select(
            "lang",
            "source",
            chi_cell.alias("_chi"),
            mi_cell.alias("_mi"),
        )
    )
    dims = r.agg(F.count(F.lit(1)).alias("_nr")).crossJoin(
        c.agg(F.count(F.lit(1)).alias("_nc"))
    )
    return (
        per.agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("_chi").cast("long").alias("chi2_scaled"),
            F.sum("_mi").cast("long").alias("mi_scaled"),
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "n_cells",
            "chi2_scaled",
            "mi_scaled",
            ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("long").alias("dof"),
        )
    )


QUERIES["lang_source_independence"] = lang_source_independence


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: the corpus is cut into 10 equal doc-count
    slices (ANSI ntile over doc_id via the two-phase distributed rank — no
    global window), each token is attributed to the FIRST slice it appears in
    (a min aggregate — the trick that makes 'cumulative distinct' a single
    hash agg instead of 10 overlapping counts), and the running vocabulary
    size is a cumulative sum over the 10-row result."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.ranking import distributed_ntile

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sliced = distributed_ntile(docs, "doc_id", [], 10, out="slice")
    toks = sliced.select(
        "slice", F.explode(F.split("text", " ")).alias("tok")
    )
    # ONE pass over the token stream: the (slice, token) frequency table is
    # bounded by vocab × 10 and feeds both the occurrence totals and the
    # first-seen attribution; the lazy checkpoint stops its two consumers
    # from re-running the corpus tokenization.
    tok_slice = toks.groupBy("slice", "tok").agg(
        F.count(F.lit(1)).alias("_f")
    ).localCheckpoint(eager=False)
    first_seen = tok_slice.groupBy("tok").agg(F.min("slice").alias("first_slice"))
    new_per_slice = first_seen.groupBy("first_slice").agg(
        F.count(F.lit(1)).cast("long").alias("new_tokens")
    )
    occ = tok_slice.groupBy("slice").agg(
        F.sum("_f").cast("long").alias("n_occurrences")
    )
    out = occ.join(
        new_per_slice, occ.slice == new_per_slice.first_slice, "left"
    ).select(
        F.col("slice").cast("long").alias("slice"),
        "n_occurrences",
        F.coalesce("new_tokens", F.lit(0)).cast("long").alias("new_tokens"),
    )
    wc = W.orderBy("slice").rowsBetween(W.unboundedPreceding, W.currentRow)
    return out.withColumn(
        "cum_vocab", F.sum("new_tokens").over(wc).cast("long")
    )


QUERIES["vocab_growth_curve"] = vocab_growth_curve


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over the co-purchase pair stream
    (every 4th order, parts-per-order bounded at 7 so the per-basket pair
    expansion is O(21)): support / confidence / lift for every directed rule
    a→b with pair support ≥ 2, each ratio computed with the exact
    scaled-integer division so both engines round the identical rational.
    Shape: one basket-packing aggregate (pair expansion is an in-row HOF
    over the packed basket — no self-join), two hash aggregates, a
    broadcast 1-row total."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    lp = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        # one aggregate packs each basket's distinct parts; three consumers
        # (directed pair stream, item counts, basket total) share the cut —
        # replaces the distinct + self-join formulation, identical rows
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_ps"))
        .localCheckpoint(eager=False)
    )
    pairs = lp.select(
        F.explode(
            F.expr(
                "flatten(transform(_ps, x -> "
                "transform(filter(_ps, y -> y != x), y -> "
                "struct(x AS a, y AS b))))"
            )
        ).alias("_e")
    ).select(F.col("_e.a").alias("a"), F.col("_e.b").alias("b"))
    c_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    c_item = lp.select(F.explode("_ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).cast("long").alias("c_item"))
    n = lp.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    ca = c_item.select(F.col("l_partkey").alias("a"), F.col("c_item").alias("c_a"))
    cb = c_item.select(F.col("l_partkey").alias("b"), F.col("c_item").alias("c_b"))
    out = (
        c_ab.where(F.col("c_ab") >= 2)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "a",
        "b",
        "c_ab",
        "c_a",
        "c_b",
        "n_baskets",
        exact_ratio_round6(F.col("c_ab"), F.col("n_baskets")).alias("support"),
        exact_ratio_round6(F.col("c_ab"), F.col("c_a")).alias("confidence"),
        exact_ratio_round6(
            F.col("c_ab") * F.col("n_baskets"), F.col("c_a") * F.col("c_b")
        ).alias("lift"),
    )


QUERIES["association_rules"] = association_rules


def event_type_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the top-20 per-user event-type trigrams
    (ordered by ts, event_id) — the n-gram-over-event-streams primitive
    behind next-action models.  Two ``lead``s over bounded per-user windows
    (no arrays, no HOFs), one hash aggregate, a total-order TakeOrdered cut."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    tri = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    counts = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return counts.orderBy(F.col("n").desc(), "e1", "e2", "e3").limit(20)


QUERIES["event_type_trigrams"] = event_type_trigrams


def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral profile: event count, distinct action types, and
    the Shannon entropy of the user's event-type distribution — the
    user-segmentation feature (explorers vs single-action users).  Entropy
    is carried as the EXACT integer Σ c·round(1e6·ln(n/c)) (count-weighted
    scaled logs — the repo's integer-log convention), so the per-user sum is
    order-independent on both engines.  Shape: one (user, type) hash agg,
    a ≤|types|-row per-user window for the total, one final hash agg."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    counts = counts.withColumn(
        "n", F.sum("c").over(W.partitionBy("user_id")).cast("long")
    )
    from stellar_etl_spark.operators.util import fixed_ln_micro

    term = F.col("c") * fixed_ln_micro("n", "c")
    return counts.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(term).cast("long").alias("entropy_scaled"),
    )


QUERIES["user_behavior_entropy"] = user_behavior_entropy


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration:
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending-ranked customer
    totals — the inequality audit run before revenue-weighted decisions.
    Ranks come from the two-phase distributed rank (no global window); the
    moments are exact DECIMAL(38) integers and the final divide uses the
    scaled-integer half-up rounding, so the statistic is bit-identical
    cross-engine."""
    from stellar_etl_spark.operators.ranking import distributed_row_number

    orders = table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        (F.round(F.sum(_dec("o_totalprice", 18, 2)), 2) * 100)
        .cast("long")
        .alias("cents")
    )
    ranked = distributed_row_number(cust, "cents", ["o_custkey"], out="i")
    d38 = "decimal(38,0)"
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("i").cast(d38) * F.col("cents").cast(d38)).alias("_s1"),
    )
    num = (
        F.lit(2).cast(d38) * F.col("_s1")
        - (F.col("n_customers") + 1).cast(d38) * F.col("total_cents").cast(d38)
    )
    den = F.col("n_customers").cast(d38) * F.col("total_cents").cast(d38)
    return (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            "n_customers",
            "total_cents",
            (
                F.when(F.col("_num") < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
                * F.expr(
                    "CAST((abs(_num) * 2000000 + _den) div (2 * _den) AS DOUBLE)"
                )
                / F.lit(1_000_000.0)
            ).alias("gini"),
        )
    )


QUERIES["revenue_gini"] = revenue_gini


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation — the
    classic customer-scoring cube.  Each dimension is ranked with the
    two-phase distributed ANSI ntile (ties broken by custkey), so no global
    window ever serializes; the output is the ≤125-row segment cube with
    exact per-segment averages (scaled-integer division)."""
    from stellar_etl_spark.operators.ranking import distributed_ntile
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    orders = table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max(F.expr("o_orderdate div 86400000000000")).cast("long").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        (F.round(F.sum(_dec("o_totalprice", 18, 2)), 2) * 100)
        .cast("long")
        .alias("cents"),
    )
    # three ntile passes × three ranking phases each would re-derive the
    # orders aggregate 9×; checkpoint the per-customer frame once
    cust = cust.localCheckpoint(eager=False)
    # checkpoint between the chained ntiles too: each ranking is 3 passes
    # over its input, so an unbroken chain re-derives the previous ranking
    # 3x (9x for the third) and the logical plan grows multiplicatively
    cust = distributed_ntile(cust, "last_day", ["o_custkey"], 5, out="r_q")
    cust = cust.localCheckpoint(eager=False)
    cust = distributed_ntile(cust, "freq", ["o_custkey"], 5, out="f_q")
    cust = cust.localCheckpoint(eager=False)
    cust = distributed_ntile(cust, "cents", ["o_custkey"], 5, out="m_q")
    return cust.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("segment_cents"),
        exact_ratio_round6_wide(F.sum("cents"), F.count(F.lit(1))).alias(
            "avg_cents"
        ),
    )


QUERIES["rfm_segments"] = rfm_segments


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the part co-purchase graph (every
    4th order, ≤7 parts/basket → bounded pair expansion), 3 synchronous
    rounds with deterministic smallest-label tie-breaks — exactly
    unrollable in the oracle.  Output: communities with ≥2 members."""
    from stellar_etl_spark.operators.graph import label_propagation

    # dedup=False: label_propagation symmetrizes and DISTINCTs the edge
    # list itself (fwd ∪ rev → distinct), so a pre-deduped input would pay
    # the pair-stream distinct exchange twice for identical labels
    edges = _copurchase_edges(spark, sf_dir, dedup=False)
    # the part graph's node set is the parts CATALOG — dimension-sized by
    # construction — so the per-round label frame broadcasts (the pagerank
    # broadcast_ranks contract; invalid for data-scaled node sets)
    out = label_propagation(edges, iterations=3, broadcast_labels=True)
    return out.where(F.col("n_members") >= 2)


QUERIES["copurchase_communities"] = copurchase_communities


def dau_cumulative_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, new users, and the CUMULATIVE unique-user curve —
    the growth dashboard staple.  'Cumulative distinct' is NOT computed as
    |days| overlapping distincts: each user is attributed to their
    first-seen day (one min aggregate), so the whole curve is two hash
    aggregates plus a cumsum over the ≤|days|-row result."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 86400000000000").alias("day")
    )
    daily = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    newu = first.groupBy("first_day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    out = daily.join(newu, daily.day == newu.first_day, "left").select(
        "day",
        "dau",
        "n_events",
        F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
    )
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return out.withColumn(
        "cum_unique_users", F.sum("new_users").over(wc).cast("long")
    )


QUERIES["dau_cumulative_unique"] = dau_cumulative_unique


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) per-type value profile — the
    outlier-robust mean used when raw means are tail-dominated.  Exact
    order statistics from the value-frequency table (one raw pass, bounded
    shuffled state — operators/robust.winsorized_stats)."""
    from stellar_etl_spark.operators.robust import winsorized_stats

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    cents = F.round(F.col("value").cast("decimal(18,6)") * 100, 0).cast("long")
    return winsorized_stats(ev, "event_type", cents)


QUERIES["winsorized_value_stats"] = winsorized_value_stats


SPLIT_DAY = 19738  # 2024-01-16: midpoint of the synthetic events range


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a 'stored' base snapshot of
    per-type partial states (count / sum / min / max over days before the
    split) merged with a delta batch (days at/after it) WITHOUT touching
    base rows again — the mergeable-state property that makes 100 TB
    rollups incremental.  The oracle recomputes from scratch; equality
    proves the merge is lossless.  Shape: two partial hash aggs + one
    ≤|types|-row merge agg; avg divides exactly in the DECIMAL domain."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )

    def state(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.min("cents").cast("long").alias("mn"),
            F.max("cents").cast("long").alias("mx"),
        )

    base = state(ev.where(F.col("day") < SPLIT_DAY))
    delta = state(ev.where(F.col("day") >= SPLIT_DAY))
    merged = base.unionByName(delta).groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("s").cast("long").alias("total_cents"),
        F.min("mn").cast("long").alias("min_cents"),
        F.max("mx").cast("long").alias("max_cents"),
    )
    return merged.select(
        "event_type",
        "n_events",
        "total_cents",
        "min_cents",
        "max_cents",
        exact_ratio_round6_wide(F.col("total_cents"), F.col("n_events")).alias(
            "avg_cents"
        ),
    )


QUERIES["incremental_agg_merge"] = incremental_agg_merge


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily revenue series: the day
    maximizing |n·S_k − k·T| (the integer-scaled cumulative deviation from
    the mean — the classic level-shift statistic, kept EXACT by clearing
    the mean's denominator).  Daily totals are one hash agg; the cumulative
    scan is a ≤|days|-row window; the argmax is a 1-row TakeOrdered with a
    smallest-day tie-break."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        F.expr("ts div 86400000000000").alias("day"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").cast("long").alias("x"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("x").cast("long").alias("_t"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    scan = (
        daily.withColumn("_s", F.sum("x").over(w).cast("long"))
        .withColumn("_k", F.count(F.lit(1)).over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "day",
            "_n",
            (F.col("_n") * F.col("_s") - F.col("_k") * F.col("_t")).alias(
                "cusum_scaled"
            ),
        )
    )
    return (
        scan.orderBy(F.abs(F.col("cusum_scaled")).desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("_n").alias("n_days"),
            "cusum_scaled",
        )
    )


QUERIES["cusum_changepoint"] = cusum_changepoint


def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: each (type, dow) cell's
    average value vs the type's overall average, as the exact scaled ratio
    (avg_dow/avg_type = (s_dow·n_type)/(n_dow·s_type) — one rational, one
    half-up rounding, zero float accumulation).  Two hash aggregates and a
    broadcast join of the ≤|types|-row totals."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(ts div 86400000000000 + 4) % 7").alias("dow"),  # 1970-01-01 = Thu
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    cell = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_type"),
        F.sum("s").cast("long").alias("s_type"),
    )
    return cell.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n",
        "s",
        exact_ratio_round6_wide(
            F.col("s") * F.col("n_type"), F.col("n") * F.col("s_type")
        ).alias("seasonality_index"),
    )


QUERIES["dow_seasonality"] = dow_seasonality


def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: users grouped by first-seen WEEK,
    purchase revenue accumulated by weeks-since-signup — the standard
    retention-economics matrix.  First-seen is one min aggregate; the
    matrix is one hash agg over (cohort, age); the cumulative curve is a
    window bounded by the ≤|weeks| ages inside each cohort row-group."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts div 604800000000000").alias("week"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_weeks"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    wc = W.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return rev.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(wc).cast("long")
    )


QUERIES["cohort_ltv_matrix"] = cohort_ltv_matrix


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-1000 token frequencies: OLS slope of
    (ln rank, ln freq) — the corpus-health check that catches boilerplate
    floods (slope ≫ −1) and tokenizer damage.  Composition of the repo's
    exactness conventions: bounded TakeOrdered cut with total-order
    tie-break, two-phase distributed rank, integer-scaled logs, DECIMAL(38)
    OLS moments, scaled-integer final divide."""
    from stellar_etl_spark.operators.ranking import distributed_row_number

    docs = table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(1000)
    )
    # rank 1 = most frequent: rank ascending on (-freq, tok)
    ranked = distributed_row_number(
        freqs.withColumn("_nf", -F.col("freq")), "_nf", ["tok"], out="rank"
    )
    from stellar_etl_spark.operators.util import fixed_ln_micro

    pts = ranked.select(
        fixed_ln_micro("rank", "1").alias("x"),
        fixed_ln_micro("freq", "1").alias("y"),
    )
    d38 = "decimal(38,0)"
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("x").cast(d38).alias("_sx"),
        F.sum("y").cast(d38).alias("_sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("_sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("_sxy"),
    )
    num = F.col("n_tokens").cast(d38) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n_tokens").cast(d38) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    sgn = F.when(num < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            "n_tokens",
            (
                sgn
                * F.expr(
                    "CAST((abs(_num) * 2000000 + _den) div (2 * _den) AS DOUBLE)"
                )
                / F.lit(1_000_000.0)
            ).alias("zipf_slope"),
        )
    )


QUERIES["zipf_slope"] = zipf_slope


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key health audit across the star schema: orphan counts for
    lineitem→orders, lineitem→part, lineitem→supplier, orders→customer,
    customer→nation, supplier→nation — each one LEFT ANTI join (broadcast
    for dimension keys), emitted as one relation-per-row report with exact
    orphan rates.  The data-quality gate that runs before any pipeline
    promotes a snapshot."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    def audit(name, child, fk, parent, pk, bcast):
        p = parent.select(pk).distinct()
        if bcast:
            p = F.broadcast(p)
        orphans = child.join(p, child[fk] == p[pk], "left_anti")
        return (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .crossJoin(
                orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            )
            .select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_orphans",
                exact_ratio_round6(F.col("n_orphans"), F.col("n_rows")).alias(
                    "orphan_rate"
                ),
            )
        )

    checks = [
        audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey", False),
        audit("lineitem->part", li, "l_partkey", part, "p_partkey", True),
        audit("lineitem->supplier", li, "l_suppkey", supplier, "s_suppkey", True),
        audit("orders->customer", orders, "o_custkey", customer, "c_custkey", True),
        audit("customer->nation", customer, "c_nationkey", nation, "n_nationkey", True),
        audit("supplier->nation", supplier, "s_nationkey", nation, "n_nationkey", True),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


QUERIES["referential_integrity_audit"] = referential_integrity_audit


def daily_value_median_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type median-value trend — the robust centerline time
    series.  Reuses the frequency-table exact-median machinery with a
    (day, type) composite group: the shuffled state per day stays bounded
    by the distinct cent domain, so the trend is computable over any
    history length without per-group sorted buffers."""
    from stellar_etl_spark.operators.robust import _median2_from_freq

    # STRUCT group key: NULL event_type stays its own group (grouping /
    # struct-join semantics treat null fields as equal) with no sentinel
    # or delimiter collision classes — any event_type value round-trips
    ev = table(spark, sf_dir, "events").select(
        F.struct(
            F.expr("ts div 86400000000000").alias("day"),
            F.col("event_type"),
        ).alias("grp"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("_c"),
    )
    freq = ev.groupBy("grp", "_c").agg(F.count(F.lit(1)).alias("_f"))
    med = _median2_from_freq(freq, "grp", "_c", "_f")
    return med.select(
        F.col("grp.day").cast("long").alias("day"),
        F.col("grp.event_type").alias("event_type"),
        F.col("_n").cast("long").alias("n_events"),
        (F.col("_median2").cast("double") / 2.0).alias("median_cents"),
    )


QUERIES["daily_value_median_trend"] = daily_value_median_trend


def fulfillment_sla_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment SLA distribution: days from order placement to the
    LAST line shipment, bucketed per order priority — the operational-SLA
    twin of tpch_q4 (the synthetic lineitem carries l_shipdate only).  One
    lineitem max-ship aggregate, one fact join on the order key, exact
    integer day gaps, then a (priority, gap-bucket) hash agg."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("l_shipdate div 86400000000000").alias("rday")
    )
    last = li.groupBy("l_orderkey").agg(F.max("rday").alias("last_rday"))
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("o_orderdate div 86400000000000").alias("oday"),
    )
    j = orders.join(last, orders.o_orderkey == last.l_orderkey).select(
        "o_orderpriority", (F.col("last_rday") - F.col("oday")).alias("gap_days")
    )
    bucket = F.least(F.expr("gap_days div 30"), F.lit(4)).cast("long")
    return j.groupBy(
        "o_orderpriority", bucket.alias("gap_bucket_30d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


QUERIES["fulfillment_sla_histogram"] = fulfillment_sla_histogram


def active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks.  Island id
    = day − dense_rank(day) (constant within a run of consecutive days) —
    per-user windows bounded by that user's distinct active days; two hash
    aggregates close the streak lengths.  Output: per-user activity summary
    with the longest streak."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 86400000000000").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    isl = ev.withColumn(
        "island", F.col("day") - F.dense_rank().over(w)
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").cast("long").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.min("streak_start").cast("long").alias("first_active_day"),
    )


QUERIES["active_streaks"] = active_streaks


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — Pearson correlation
    of endpoint degrees over edges (Newman 2002), the structural audit that
    distinguishes hub-and-spoke from peer-to-peer topologies.  Every moment
    (Σ jk, Σ(j+k), Σ(j²+k²)) is an exact integer; the correlation's
    numerator/denominator are assembled in DECIMAL(38) and divided with the
    scaled-integer rounding.  Denominator under Newman's form: r =
    (S1·Sjk − Sj·Sk-ish) — we use the symmetric form with both edge
    directions, all integer."""
    e0 = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        e0.select(F.col("a").alias("v"))
        .unionAll(e0.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # symmetric edge stream (both directions) so the correlation is of the
    # (source degree, target degree) pair distribution
    sym = e0.unionAll(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    ed = (
        sym.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    d38 = "decimal(38,0)"
    s = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),  # 2|E|
        F.sum(F.col("da").cast(d38) * F.col("db").cast(d38)).alias("_sjk"),
        F.sum("da").cast(d38).alias("_sj"),
        F.sum(F.col("da").cast(d38) * F.col("da").cast(d38)).alias("_sjj"),
    )
    # by symmetry Σdb = Σda and Σdb² = Σda² over the bidirectional stream
    num = F.col("m2").cast(d38) * F.col("_sjk") - F.col("_sj") * F.col("_sj")
    den = F.col("m2").cast(d38) * F.col("_sjj") - F.col("_sj") * F.col("_sj")
    sgn = F.when(num < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            F.col("m2"),
            F.when(F.col("_den") == 0, F.lit(None).cast("double"))
            .otherwise(
                sgn
                * F.expr(
                    "CAST((abs(_num) * 2000000 + _den) div (2 * _den) AS DOUBLE)"
                )
                / F.lit(1_000_000.0)
            )
            .alias("assortativity"),
        )
    )


QUERIES["graph_degree_assortativity"] = graph_degree_assortativity


def pareto_revenue_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) analysis of revenue concentration: how many top
    customers cover 80% of revenue, and the top-decile share — computed on
    the EXACT global Lorenz curve via ``distributed_cumsum`` (two-phase
    prefix sums, fixed-size offset table, no single-partition window).
    Every comparison is integer (cum·5 ≥ total·4), every ratio a scaled
    exact division."""
    from stellar_etl_spark.operators.ranking import distributed_cumsum
    from stellar_etl_spark.operators.util import exact_ratio_round6, exact_ratio_round6_wide

    orders = table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        (F.round(F.sum(_dec("o_totalprice", 18, 2)), 2) * 100)
        .cast("long")
        .alias("cents")
    )
    # three consumers (totals, the 80% threshold scan, the top-decile
    # slice) — checkpoint the Lorenz frame so the multi-pass cumsum runs once
    lorenz = distributed_cumsum(
        cust, "cents", ["o_custkey"], out="cum", descending=True
    ).localCheckpoint(eager=False)
    tot = lorenz.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.max("cum").cast("long").alias("total_cents"),
    )
    j = lorenz.crossJoin(F.broadcast(tot))
    k80 = j.where(F.col("cum") * 5 >= F.col("total_cents") * 4).agg(
        F.min("cum_rank").cast("long").alias("k80")
    )
    top10 = j.where(
        F.col("cum_rank") * 10 <= F.col("n_customers")
    ).agg(F.sum("cents").cast("long").alias("top10_cents"))
    return (
        tot.crossJoin(F.broadcast(k80))
        .crossJoin(F.broadcast(top10))
        .select(
            "n_customers",
            "total_cents",
            "k80",
            exact_ratio_round6(F.col("k80"), F.col("n_customers")).alias(
                "k80_fraction"
            ),
            exact_ratio_round6_wide(
                F.col("top10_cents"), F.col("total_cents")
            ).alias("top10_share"),
        )
    )


QUERIES["pareto_revenue_point"] = pareto_revenue_point


def twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per (day, type): each observation
    weighted by its holding interval to the next same-day event — the
    finance-style aggregate where plain means are sampling-rate-biased.
    Weights are exact integer microseconds, the weighted sum is one long
    aggregate, and the divide is the scaled exact rational (DECIMAL
    domain).  Per-(day,type) windows are bounded; single-event groups emit
    NULL (zero holding time)."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.expr("ts div 86400000000000").alias("day"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    w = W.partitionBy("day", "event_type").orderBy("ts_us", "event_id")
    durs = ev.withColumn(
        "dur_us", F.coalesce(F.lead("ts_us").over(w) - F.col("ts_us"), F.lit(0))
    )
    agg = durs.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("cents") * F.col("dur_us")).cast("long").alias("_ws"),
        F.sum("dur_us").cast("long").alias("_wd"),
    )
    return agg.select(
        "day",
        "event_type",
        "n_events",
        F.when(F.col("_wd") == 0, F.lit(None).cast("double"))
        .otherwise(exact_ratio_round6_wide(F.col("_ws"), F.col("_wd")))
        .alias("twap_cents"),
    )


QUERIES["twap_daily"] = twap_daily


def stage_transition_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median transition time between consecutive user actions, per
    (from_type → to_type) pair — funnel-timing analysis.  Gaps are rounded
    to whole seconds (bounding the value domain), so the exact median comes
    from the frequency-table machinery: the shuffled state per pair is
    ≤ the observation-window length in seconds, never the event count."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.robust import _median2_from_freq

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    tr = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
        ((F.col("ts_us") - F.lag("ts_us").over(w)))
        .alias("_gap_us"),
    ).where(F.col("from_type").isNotNull())
    # STRUCT group key (as in daily_value_median_trend): NULL to_type stays
    # a group with no sentinel/delimiter collision classes
    grp = tr.select(
        F.struct("from_type", "to_type").alias("grp"),
        F.expr("_gap_us div 1000000").alias("_c"),
    )
    freq = grp.groupBy("grp", "_c").agg(F.count(F.lit(1)).alias("_f"))
    med = _median2_from_freq(freq, "grp", "_c", "_f")
    return med.select(
        F.col("grp.from_type").alias("from_type"),
        F.col("grp.to_type").alias("to_type"),
        F.col("_n").cast("long").alias("n_transitions"),
        (F.col("_median2").cast("double") / 2.0).alias("median_gap_s"),
    )


QUERIES["stage_transition_times"] = stage_transition_times


def revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels: each nation's revenue as
    an exact share of its region and of the world — the drill-down ratio
    table every BI layer needs.  One fact aggregate at the nation grain;
    region and global totals re-aggregate it (tiny frames, broadcast back);
    every share is one exact scaled division."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nrev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            (F.round(F.sum(_dec("o_totalprice", 18, 2)), 2) * 100)
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    rtot = nrev.groupBy("r_name").agg(
        F.sum("cents").cast("long").alias("region_cents")
    )
    gtot = nrev.agg(F.sum("cents").cast("long").alias("global_cents"))
    return (
        nrev.join(F.broadcast(rtot), "r_name")
        .crossJoin(F.broadcast(gtot))
        .select(
            "r_name",
            "n_name",
            "cents",
            exact_ratio_round6_wide(F.col("cents"), F.col("region_cents")).alias(
                "share_of_region"
            ),
            exact_ratio_round6_wide(F.col("cents"), F.col("global_cents")).alias(
                "share_of_global"
            ),
        )
    )


QUERIES["revenue_share_hierarchy"] = revenue_share_hierarchy


def column_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling report over the events table: per column — distinct
    count, null count, mode value and its frequency (argmax-by-struct with
    a smallest-value tie-break, no window).  The schema-drift early-warning
    profile a pipeline snapshots per partition; string-rendered mode keeps
    the report schema uniform across column types."""
    ev = table(spark, sf_dir, "events")

    def profile(col, render):
        c = F.col(col)
        counted = ev.groupBy(c.alias("_v")).agg(F.count(F.lit(1)).alias("_f"))
        nn = counted.where(F.col("_v").isNotNull())
        return (
            nn.agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
            .crossJoin(
                F.broadcast(
                    nn.orderBy(F.col("_f").desc(), F.col("_v").asc())
                    .limit(1)
                    .select(
                        render(F.col("_v")).alias("mode_value"),
                        F.col("_f").cast("long").alias("mode_count"),
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    counted.where(F.col("_v").isNull())
                    .agg(F.coalesce(F.sum("_f"), F.lit(0)).cast("long").alias("n_nulls"))
                )
            )
            .select(
                F.lit(col).alias("column"),
                "n_distinct",
                "n_nulls",
                "mode_value",
                "mode_count",
            )
        )

    cols = [
        ("event_type", lambda c: c),
        ("user_id", lambda c: c.cast("string")),
        ("event_id", lambda c: c.cast("string")),
    ]
    out = profile(*cols[0])
    for spec in cols[1:]:
        out = out.unionByName(profile(*spec))
    return out


QUERIES["column_profile_events"] = column_profile_events


def dn_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D7/D14 retention by signup-day cohort: of the users first seen on
    day d, the exact fraction active exactly N days later — the product
    dashboard curve.  First-seen is one min aggregate; each horizon is a
    semi-join of (cohort user, day d+N) against the distinct activity set;
    ratios are exact scaled divisions."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 86400000000000").alias("day")
    ).distinct().localCheckpoint(eager=False)
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    cohort = first.groupBy("d0").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    out = cohort
    for n in (1, 7, 14):
        act = first.join(
            ev,
            (first.user_id == ev.user_id) & (ev.day == first.d0 + n),
        ).groupBy("d0").agg(F.count(F.lit(1)).cast("long").alias(f"_r{n}"))
        out = out.join(act, "d0", "left").withColumn(
            f"_r{n}", F.coalesce(F.col(f"_r{n}"), F.lit(0))
        )
    return out.select(
        F.col("d0").alias("cohort_day"),
        "cohort_size",
        F.col("_r1").alias("retained_d1"),
        F.col("_r7").alias("retained_d7"),
        F.col("_r14").alias("retained_d14"),
        exact_ratio_round6(F.col("_r1"), F.col("cohort_size")).alias("d1_rate"),
        exact_ratio_round6(F.col("_r7"), F.col("cohort_size")).alias("d7_rate"),
        exact_ratio_round6(F.col("_r14"), F.col("cohort_size")).alias("d14_rate"),
    )


QUERIES["dn_retention"] = dn_retention


def wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: weekly cents plus the exact growth
    ratio vs the previous week (NULL for the first week / zero base).  The
    weekly series is one hash agg; the lag runs over the ≤|weeks| result
    rows."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "orders").select(
        F.expr("o_orderdate div 604800000000000").alias("week"),
        _dec("o_totalprice", 18, 2).alias("p"),
    )
    weekly = ev.groupBy("week").agg(
        (F.round(F.sum("p"), 2) * 100).cast("long").alias("cents")
    )
    w = W.orderBy("week")
    out = weekly.withColumn("_prev", F.lag("cents").over(w))
    return out.select(
        "week",
        "cents",
        F.when(
            F.col("_prev").isNull() | (F.col("_prev") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            exact_ratio_round6_wide(
                F.col("cents") - F.col("_prev"), F.col("_prev")
            )
        )
        .alias("wow_growth"),
    )


QUERIES["wow_growth"] = wow_growth


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment near-dup (C(A→B) = |A∩B|/|A| ≥ 0.8
    over 6-gram shingles) — catches sub-document duplication (quotes,
    embedded copies) that symmetric Jaccard under-scores.  Prefix-filtered
    candidate join (complete, no false negatives), exact integer
    verification.  6-grams + the 0.8 bar keep the asymmetric A-prefix ×
    B-full join collision-bounded on low-entropy corpora (3-grams over this
    vocab measured 3× slower; at 10× data the runtime is output-bound —
    the replicated probe corpus has ~500k TRUE containment pairs)."""
    from stellar_etl_spark.operators.dedup import ngram_containment_pairs

    docs = table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text", n=6, threshold=0.8)


QUERIES["containment_pairs"] = containment_pairs


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning: deterministic selection of
    3-token mask spans (stride-3 starts, hash-gated at ~15%) with per-doc
    masked-token accounting — the pre-tokenization pass a denoising
    pretraining pipeline runs to budget its objective.  Selection is a pure
    column hash (md5-prefix mod 100 < 15), so the plan is reproducible on
    any engine and any partitioning.  One posexplode + one hash agg."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", F.size(words).alias("n_tokens"), F.posexplode(words)
    )
    gate = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
        < 15
    )
    spans = base.where(
        (F.col("pos") % 3 == 0) & (F.col("pos") <= F.col("n_tokens") - 3) & gate
    ).groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_spans"))
    return (
        docs.select("doc_id", F.size(words).alias("n_tokens"))
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            (F.coalesce("n_spans", F.lit(0)) * 3).cast("long").alias("n_masked"),
            exact_ratio_round6(
                F.coalesce("n_spans", F.lit(0)) * 3, F.col("n_tokens")
            ).alias("mask_ratio"),
        )
    )


QUERIES["span_corruption_plan"] = span_corruption_plan


def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table: top-500 tokens weighted by
    count^0.75.  The fractional power is computed as sqrt(sqrt(c³)) — both
    sqrts are IEEE-754 correctly-rounded operations on BOTH engines,
    unlike libm pow whose last ulp is implementation-defined — then scaled
    to an integer weight; sampling probabilities are exact scaled ratios of
    those integers.  Bounded TakeOrdered cut, 1-row broadcast total."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(500)
    )
    w = F.round(
        F.sqrt(F.sqrt((F.col("c") * F.col("c") * F.col("c")).cast("double")))
        * 1_000_000
    ).cast("long")
    weighted = counts.withColumn("weight_scaled", w).localCheckpoint(eager=False)
    tot = weighted.agg(F.sum("weight_scaled").cast("long").alias("_t"))
    return weighted.crossJoin(F.broadcast(tot)).select(
        "tok",
        "c",
        "weight_scaled",
        exact_ratio_round6_wide(F.col("weight_scaled"), F.col("_t")).alias(
            "sample_prob"
        ),
    )


QUERIES["negative_sampling_table"] = negative_sampling_table


def grouped_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split + leakage audit: the split is a
    deterministic hash of the GROUP key (user), so no user can straddle
    splits — the audit proves it (cross-split user count must be 0) and
    reports per-split user/event volumes with exact fractions.  This is the
    contamination-safe alternative to row-hash splits for behavioral data."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tagged = ev.withColumn("split", split)
    per_user = tagged.groupBy("user_id").agg(
        F.countDistinct("split").alias("_nsplits"),
        F.min("split").alias("split"),
        F.count(F.lit(1)).cast("long").alias("_nev"),
    )
    leaked = per_user.agg(
        F.sum(F.when(F.col("_nsplits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaked_users")
    )
    tot = tagged.agg(F.count(F.lit(1)).cast("long").alias("_te"))
    return (
        per_user.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("_nev").cast("long").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(leaked))
        .select(
            "split",
            "n_users",
            "n_events",
            exact_ratio_round6(F.col("n_events"), F.col("_te")).alias(
                "event_fraction"
            ),
            "n_leaked_users",
        )
    )


QUERIES["grouped_split_leakage_audit"] = grouped_split_leakage_audit


def hapax_tail_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-tail health per source: vocabulary size, hapax legomena
    (once-seen tokens), hapax rate and type-token ratio — the corpus
    diversity profile that flags template floods (TTR collapse) and OCR
    noise (hapax explosion).  One (source, token) hash agg; every rate an
    exact scaled ratio."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
    ).select(
        "source",
        "vocab",
        "n_tokens",
        "hapax",
        exact_ratio_round6_wide(F.col("hapax"), F.col("vocab")).alias(
            "hapax_rate"
        ),
        exact_ratio_round6_wide(F.col("vocab"), F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
    )


QUERIES["hapax_tail_stats"] = hapax_tail_stats


def event_halflife_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type activity decay fit: OLS slope of ln(daily count) over days
    (the log-linear exponential-decay model), with the implied half-life as
    an exact rational of the integer-scaled slope (·ln 2 · 10⁶ = 693147
    micro-nats).  Integer moments throughout; growing series emit NULL
    half-life."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 86400000000000").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from stellar_etl_spark.operators.util import fixed_ln_micro

    base = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    pts = daily.join(F.broadcast(base), "event_type").select(
        "event_type",
        (F.col("day") - F.col("d0")).cast("long").alias("x"),
        fixed_ln_micro("c", "1").alias("y"),
    )
    d38 = "decimal(38,0)"
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast(d38).alias("_sx"),
        F.sum("y").cast(d38).alias("_sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("_sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("_sxy"),
    )
    num = F.col("n_days").cast(d38) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n_days").cast(d38) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    sgn = F.when(num < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    slope = sgn * F.expr(
        "CAST((abs(_num) * 2000000 + _den) div (2 * _den) AS DOUBLE)"
    ) / F.lit(1_000_000.0)
    out = (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn(
            "slope_micronats_per_day",
            F.when(F.col("_den") == 0, F.lit(None).cast("double")).otherwise(
                slope
            ),
        )
        # slope is in micro-nats/day (already ×1e6): slope_scaled as long
        .withColumn(
            "_slope_scaled",
            F.round(F.col("slope_micronats_per_day") * 1_000_000).cast("long"),
        )
    )
    return out.select(
        "event_type",
        "n_days",
        "slope_micronats_per_day",
        F.when(
            F.col("_slope_scaled").isNull() | (F.col("_slope_scaled") >= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            exact_ratio_round6_wide(
                F.lit(693_147_000_000), -F.col("_slope_scaled")
            )
        )
        .alias("half_life_days"),
    )


QUERIES["event_halflife_fit"] = event_halflife_fit


def boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean IR over the corpus: (`hash` AND `join`) OR `vector`, with
    per-clause match accounting — the exact-match retrieval layer under
    BM25.  Token membership is a map-only array test (no join, no shuffle
    until the final count); emits per-source match counts so the result is
    bounded."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    # a NULL-text doc matches no clause and must not poison the counts
    # with NULL flags (oracle filters identically)
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    has = lambda w: F.array_contains(toks, w)  # noqa: E731
    clause_and = has("hash") & has("join")
    clause_or = has("vector")
    return docs.select(
        "source",
        clause_and.alias("_a"),
        clause_or.alias("_b"),
        (clause_and | clause_or).alias("_m"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("_a").cast("int")).cast("long").alias("n_and_matches"),
        F.sum(F.col("_b").cast("int")).cast("long").alias("n_or_matches"),
        F.sum(F.col("_m").cast("int")).cast("long").alias("n_matches"),
    ).select(
        "source",
        "n_docs",
        "n_and_matches",
        "n_or_matches",
        "n_matches",
        exact_ratio_round6(F.col("n_matches"), F.col("n_docs")).alias(
            "match_rate"
        ),
    )


QUERIES["boolean_retrieval"] = boolean_retrieval


def basket_size_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact variance of basket size per order priority — population
    variance assembled from integer moments (n·Σx² − (Σx)²) / n² as ONE
    exact rational, never a float accumulation (the welford-vs-naive
    cross-engine trap).  Two hash aggregates."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    li = table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    d38 = "decimal(38,0)"
    s = j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("sz").cast("long").alias("total_lines"),
        F.sum(F.col("sz").cast(d38) * F.col("sz").cast(d38)).alias("_sxx"),
    )
    num = (
        F.col("n_orders").cast(d38) * F.col("_sxx")
        - F.col("total_lines").cast(d38) * F.col("total_lines").cast(d38)
    )
    den = F.col("n_orders").cast(d38) * F.col("n_orders").cast(d38)
    return (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            "o_orderpriority",
            "n_orders",
            "total_lines",
            exact_ratio_round6_wide(F.col("total_lines"), F.col("n_orders")).alias(
                "mean_lines"
            ),
            (
                F.expr(
                    "CAST((_num * 2000000 + _den) div (2 * _den) AS DOUBLE)"
                )
                / F.lit(1_000_000.0)
            ).alias("var_lines"),
        )
    )


QUERIES["basket_size_variance"] = basket_size_variance


def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the cosine between
    the centroid of even-id vectors and odd-id vectors (the A/B split a
    drift monitor compares across snapshots).  Centroids are round-6 per
    dimension (the repo's residual-double rule); the cosine folds the
    ROUNDED 64-dim vectors left-to-right with ``F.aggregate`` from zero
    init, so both engines execute the identical IEEE sequence."""
    emb = emb_table(spark, sf_dir)
    cent = (
        emb.select(
            "label",
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode(
                F.transform(F.col("embedding"), lambda x: x.cast("double"))
            ).alias("dim", "val"),
        )
        .groupBy("label", "half", "dim")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
        .groupBy("label", "half")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "cv"))
            ).alias("_sc")
        )
        .select(
            "label",
            "half",
            F.transform(F.col("_sc"), lambda s: s.getField("cv")).alias("v"),
        )
    )
    a = cent.where(F.col("half") == 0).select("label", F.col("v").alias("v0"))
    b = cent.where(F.col("half") == 1).select("label", F.col("v").alias("v1"))
    j = a.join(b, "label")

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda acc, x: acc + x)

    dot = fold(F.zip_with("v0", "v1", lambda x, y: x * y))
    n0 = fold(F.transform(F.col("v0"), lambda x: x * x))
    n1 = fold(F.transform(F.col("v1"), lambda x: x * x))
    return j.select(
        "label",
        F.round(dot / (F.sqrt(n0) * F.sqrt(n1)), 6).alias("centroid_cosine"),
    )


QUERIES["embedding_drift_by_label"] = embedding_drift_by_label


def resurrected_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-and-resurrection audit: per user, the largest silence between
    consecutive active days and how many ≥7-day silences they returned
    from — the lifecycle metric between plain retention and streaks.
    Bounded per-user lag windows over distinct active days; two hash
    aggregates."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 86400000000000").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    gaps = ev.withColumn("_gap", F.col("day") - F.lag("day").over(w))
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.max(F.coalesce("_gap", F.lit(0))).cast("long").alias("max_gap_days"),
        F.sum(F.when(F.col("_gap") >= 7, 1).otherwise(0))
        .cast("long")
        .alias("n_resurrections"),
    )


QUERIES["resurrected_users"] = resurrected_users


def clv_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-ready customer-lifetime-value features: tenure, recency,
    frequency, exact monetary totals, mean order value and mean inter-order
    gap — the feature-engineering projection a churn/LTV model trains on.
    One orders aggregate per customer; every ratio exact; gaps derive from
    (max−min)/(n−1) in closed form (no window needed for the MEAN gap)."""
    from stellar_etl_spark.operators.util import exact_ratio_round6, exact_ratio_round6_wide

    orders = table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.min(F.expr("o_orderdate div 86400000000000")).cast("long").alias("_first"),
        F.max(F.expr("o_orderdate div 86400000000000")).cast("long").alias("_last"),
        (F.round(F.sum(_dec("o_totalprice", 18, 2)), 2) * 100)
        .cast("long")
        .alias("monetary_cents"),
    )
    anchor = cust.agg(F.max("_last").alias("_now"))
    return cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        "frequency",
        "monetary_cents",
        (F.col("_now") - F.col("_last")).cast("long").alias("recency_days"),
        (F.col("_last") - F.col("_first")).cast("long").alias("tenure_days"),
        exact_ratio_round6_wide(F.col("monetary_cents"), F.col("frequency")).alias(
            "avg_order_cents"
        ),
        F.when(F.col("frequency") <= 1, F.lit(None).cast("double"))
        .otherwise(
            exact_ratio_round6(
                F.col("_last") - F.col("_first"), F.col("frequency") - 1
            )
        )
        .alias("mean_order_gap_days"),
    )


QUERIES["clv_features"] = clv_features


def seasonal_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (ŷ_d = y_{d−7}) over daily
    revenue per event type: MAE in exact cents and MAPE as the mean of
    per-day exact scaled ratios — the baseline every forecasting system
    must beat, evaluated with zero float accumulation.  Daily series is
    one hash agg; the 7-day lag runs over ≤|days| rows per type."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").cast("long").alias("y")
    )
    w = W.partitionBy("event_type").orderBy("day")
    f = daily.withColumn("yhat", F.lag("y", 7).over(w)).where(
        F.col("yhat").isNotNull() & (F.col("y") != 0)
    )
    # per-day absolute percentage error as a scaled integer (round6·1e6)
    ape = F.expr(
        "CAST((abs(y - yhat) * 2000000 + abs(y)) div (2 * abs(y)) AS LONG)"
    )
    s = f.withColumn("_ape", ape).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_forecasts"),
        F.sum(F.abs(F.col("y") - F.col("yhat"))).cast("long").alias("_sae"),
        F.sum("_ape").cast("long").alias("_sape"),
    )
    return s.select(
        "event_type",
        "n_forecasts",
        exact_ratio_round6_wide(F.col("_sae"), F.col("n_forecasts")).alias(
            "mae_cents"
        ),
        exact_ratio_round6_wide(F.col("_sape"), F.col("n_forecasts") * 1_000_000).alias(
            "mape"
        ),
    )


QUERIES["seasonal_naive_forecast_error"] = seasonal_naive_forecast_error


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily revenue per event type: the MEDIAN
    of all pairwise slopes — breakdown point 29%, immune to the outlier
    days that wreck OLS.  The day series per type is bounded (≤|days|
    rows), so the pairwise expansion is a bounded self-join (≤ |days|²/2
    pairs per type); each slope becomes an exact scaled integer
    (Δcents·10⁶ div Δdays) and the median comes from the frequency-table
    machinery."""
    from stellar_etl_spark.operators.robust import _median2_from_freq

    ev = (
        table(spark, sf_dir, "events")
        # typed, valued events only (oracle filters identically)
        .where(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("ts div 86400000000000").alias("day"),
            F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").cast("long").alias("y")
    ).localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("grp"),
        # exact half-up rounding of (Δy·1e6)/Δx in integers
        (
            F.when(F.col("b.y") - F.col("a.y") < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "(abs((b.y - a.y) * 1000000) * 2 + (b.day - a.day)) div (2 * (b.day - a.day))"
            )
        ).cast("long").alias("_c"),
    )
    freq = pairs.groupBy("grp", "_c").agg(F.count(F.lit(1)).alias("_f"))
    med = _median2_from_freq(freq, "grp", "_c", "_f")
    return med.select(
        F.col("grp").alias("event_type"),
        F.col("_n").cast("long").alias("n_pairs"),
        (F.col("_median2").cast("double") / 2.0).alias(
            "theil_sen_slope_scaled"
        ),
    )


QUERIES["theil_sen_trend"] = theil_sen_trend


def lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz decile table: customers cut into revenue deciles (ANSI ntile,
    two-phase), each decile's exact share of total revenue — the
    concentration table behind the Gini scalar.  10 output rows, every
    share an exact scaled ratio."""
    from stellar_etl_spark.operators.ranking import distributed_ntile
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    orders = table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        (F.round(F.sum(_dec("o_totalprice", 18, 2)), 2) * 100)
        .cast("long")
        .alias("cents")
    )
    tiled = distributed_ntile(cust, "cents", ["o_custkey"], 10, out="decile")
    dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("decile_cents"),
    ).localCheckpoint(eager=False)
    tot = dec.agg(F.sum("decile_cents").cast("long").alias("_t"))
    return dec.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "decile_cents",
        exact_ratio_round6_wide(F.col("decile_cents"), F.col("_t")).alias(
            "revenue_share"
        ),
    )


QUERIES["lorenz_deciles"] = lorenz_deciles


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal, k=4)
    over the embedding corpus — the classic 2-approximation for diverse
    data selection / facility location.  Seed = smallest vec_id; each round
    adds the point FARTHEST from its nearest chosen center (round-6 squared
    distance, vec_id tie-break — fully deterministic, so the oracle unrolls
    the identical 4 rounds).  Per round: one ≤k-row broadcast join + a
    1-row TakeOrdered — the corpus is scanned, never shuffled; the chosen
    frame is lazily checkpointed so the unrolled plan stays shallow.
    Output: the 4 centers in selection order plus the final coverage
    radius (max over the corpus of min-distance-to-set)."""
    emb = emb_table(spark, sf_dir).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=False)

    def d2(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    chosen = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("center_id"),
            F.col("v").alias("cv"),
            F.lit(1).cast("long").alias("sel_order"),
            F.lit(None).cast("double").alias("d2_at_selection"),
        )
        .localCheckpoint(eager=False)
    )
    for i in range(2, 5):
        md = (
            emb.join(F.broadcast(chosen.select("center_id", "cv")), how="cross")
            .select("vec_id", "v", d2(F.col("v"), F.col("cv")).alias("_d"))
            .groupBy("vec_id")
            .agg(F.min("_d").alias("_md"), F.first("v").alias("v"))
        )
        cand = (
            md.join(
                chosen.select(F.col("center_id").alias("vec_id")),
                "vec_id",
                "left_anti",
            )
            .orderBy(F.col("_md").desc(), "vec_id")
            .limit(1)
            .select(
                F.col("vec_id").alias("center_id"),
                F.col("v").alias("cv"),
                F.lit(i).cast("long").alias("sel_order"),
                F.col("_md").alias("d2_at_selection"),
            )
        )
        from stellar_etl_spark.operators.util import lineage_cut

        chosen = lineage_cut(chosen.unionByName(cand), round_no=i)

    coverage = (
        emb.join(F.broadcast(chosen.select("center_id", "cv")), how="cross")
        .select("vec_id", d2(F.col("v"), F.col("cv")).alias("_d"))
        .groupBy("vec_id")
        .agg(F.min("_d").alias("_md"))
        .agg(F.max("_md").alias("coverage_d2"))
    )
    return chosen.select("center_id", "sel_order", "d2_at_selection").crossJoin(
        F.broadcast(coverage)
    )


QUERIES["kcenter_coreset"] = kcenter_coreset


def token_coverage_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage point: how many top tokens cover 90% / 99% of
    all token occurrences — the vocab-size-vs-coverage trade a tokenizer
    design starts from.  Exact Zipf-mass Lorenz curve via
    ``distributed_cumsum`` (descending, two-phase prefix sums); thresholds
    are integer comparisons."""
    from stellar_etl_spark.operators.ranking import distributed_cumsum

    docs = table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum = distributed_cumsum(
        freqs, "c", ["tok"], out="cum", descending=True
    ).localCheckpoint(eager=False)
    tot = cum.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.max("cum").cast("long").alias("total_occurrences"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    k90 = j.where(F.col("cum") * 10 >= F.col("total_occurrences") * 9).agg(
        F.min("cum_rank").cast("long").alias("k90")
    )
    k99 = j.where(F.col("cum") * 100 >= F.col("total_occurrences") * 99).agg(
        F.min("cum_rank").cast("long").alias("k99")
    )
    return (
        tot.crossJoin(F.broadcast(k90))
        .crossJoin(F.broadcast(k99))
        .select("vocab", "total_occurrences", "k90", "k99")
    )


QUERIES["token_coverage_point"] = token_coverage_point


def error_exposure_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure analysis: purchase-conversion rate for users who hit ≥1
    error vs those who never did, plus the exact risk ratio — the
    treatment/control contingency read every incident review asks for.
    One per-user flag aggregate, one 2-row contingency, exact rates; the
    risk ratio is one rational of four integers."""
    from stellar_etl_spark.operators.util import exact_ratio_round6, exact_ratio_round6_wide

    # exposure is per USER: anonymous (NULL user_id) events have no user
    # to attribute to (oracle filters identically)
    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "error").cast("int")).alias("exposed"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    cells = per_user.groupBy("exposed").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).localCheckpoint(eager=False)
    rates = cells.select(
        F.col("exposed").cast("long").alias("exposed"),
        "n_users",
        "n_converted",
        exact_ratio_round6(F.col("n_converted"), F.col("n_users")).alias(
            "conversion_rate"
        ),
    )
    e = cells.where(F.col("exposed") == 1).select(
        F.col("n_converted").alias("_ce"), F.col("n_users").alias("_ne")
    )
    c = cells.where(F.col("exposed") == 0).select(
        F.col("n_converted").alias("_cc"), F.col("n_users").alias("_nc")
    )
    rr = e.crossJoin(c).select(
        F.when(
            (F.col("_cc") == 0) | (F.col("_ne") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            exact_ratio_round6_wide(
                F.col("_ce") * F.col("_nc"), F.col("_ne") * F.col("_cc")
            )
        )
        .alias("risk_ratio")
    )
    return rates.crossJoin(F.broadcast(rr))


QUERIES["error_exposure_conversion"] = error_exposure_conversion


def priority_segment_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for (order priority × customer market segment): the
    normalized-association version of the chi-square audit, on the sales
    side.  Chi-square cells are exact DECIMAL(38) rationals summed as
    scaled integers; V = sqrt(chi²/(N·min(r−1,c−1))) is one
    correctly-rounded sqrt of one exact rational — identical on both
    engines."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    cells = j.groupBy("o_orderpriority", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).localCheckpoint(eager=False)
    r = cells.groupBy("o_orderpriority").agg(F.sum("o").alias("r_tot"))
    c = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("c_tot"))
    n = cells.agg(F.sum("o").alias("n_tot"))
    d38 = "decimal(38,0)"
    jj = (
        cells.join(F.broadcast(r), "o_orderpriority")
        .join(F.broadcast(c), "c_mktsegment")
        .crossJoin(F.broadcast(n))
    )
    dev = (F.col("o") * F.col("n_tot") - F.col("r_tot") * F.col("c_tot")).cast(d38)
    den = (F.col("r_tot") * F.col("c_tot")).cast(d38) * F.col("n_tot").cast(d38)
    per = jj.withColumn("_num", dev * dev).withColumn("_den", den).select(
        F.expr("CAST((_num * 2000000 + _den) div (2 * _den) AS LONG)").alias(
            "_chi"
        ),
        "n_tot",
    )
    dims = r.agg(F.count(F.lit(1)).alias("_nr")).crossJoin(
        c.agg(F.count(F.lit(1)).alias("_nc"))
    )
    s = per.groupBy("n_tot").agg(
        F.sum("_chi").cast("long").alias("chi2_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return s.crossJoin(F.broadcast(dims)).select(
        F.col("n_tot").cast("long").alias("n_rows"),
        "n_cells",
        "chi2_scaled",
        F.round(
            F.sqrt(
                (F.col("chi2_scaled").cast("double") / 1_000_000.0)
                / (
                    F.col("n_tot").cast("double")
                    * F.least(F.col("_nr") - 1, F.col("_nc") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


QUERIES["priority_segment_cramers_v"] = priority_segment_cramers_v


def minhash_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-vs-truth calibration for the MinHash(8)/LSH(4×2) near-dup
    pass: per matching-slot bucket, the pair count and the EXACT mean
    Jaccard — the measurement that re-tunes banding on a new corpus (and
    the honesty check on every approximate-dedup deployment)."""
    from stellar_etl_spark.operators.dedup import minhash_calibration

    return minhash_calibration(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


QUERIES["minhash_calibration_curve"] = minhash_calibration_curve


def langid_confusion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation at scale: the language-ID predictor scored
    against the corpus's lang labels — per-class TP/FP/FN, precision,
    recall and F1, every metric an exact integer ratio (F1 = 2TP/(2TP+FP+FN)
    is one rational, no float P·R composition).  One confusion hash agg; the
    per-class reductions run over the ≤|langs|² confusion cells."""
    from stellar_etl_spark.operators.text import language_id
    from stellar_etl_spark.operators.util import exact_ratio_round6

    docs = table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "lang_pred")
    conf = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    classes = conf.select(F.col("lang").alias("cls")).union(
        conf.select(F.col("lang_pred").alias("cls"))
    ).distinct()
    j = classes.join(
        conf,
        (F.col("cls") == conf.lang) | (F.col("cls") == conf.lang_pred),
    )
    per = j.groupBy("cls").agg(
        F.sum(
            F.when((F.col("lang") == F.col("cls")) & (F.col("lang_pred") == F.col("cls")), F.col("n")).otherwise(0)
        ).cast("long").alias("tp"),
        F.sum(
            F.when((F.col("lang_pred") == F.col("cls")) & (F.col("lang") != F.col("cls")), F.col("n")).otherwise(0)
        ).cast("long").alias("fp"),
        F.sum(
            F.when((F.col("lang") == F.col("cls")) & (F.col("lang_pred") != F.col("cls")), F.col("n")).otherwise(0)
        ).cast("long").alias("fn"),
    )
    nz = lambda c: F.greatest(c, F.lit(1))  # noqa: E731
    return per.select(
        "cls",
        "tp",
        "fp",
        "fn",
        exact_ratio_round6(F.col("tp"), nz(F.col("tp") + F.col("fp"))).alias(
            "precision"
        ),
        exact_ratio_round6(F.col("tp"), nz(F.col("tp") + F.col("fn"))).alias(
            "recall"
        ),
        exact_ratio_round6(
            F.col("tp") * 2, nz(F.col("tp") * 2 + F.col("fp") + F.col("fn"))
        ).alias("f1"),
    )


QUERIES["langid_confusion_eval"] = langid_confusion_eval


def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test, arms assigned by a deterministic user
    hash (md5 parity) — the experimentation primitive.  Outcome: the user's
    purchase share exceeds the 1-in-5 base rate (ever-purchased saturates at
    1.0 on this event density and degenerates the test).  Counts and rates
    are exact; the z statistic is assembled from the exact rates with ONE
    fixed IEEE expression sequence (identical on both engines), rounded at
    the edge; a zero pooled variance emits NULL."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    ev = table(spark, sf_dir, "events")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) * 5
            > F.count(F.lit(1))
        )
        .cast("int")
        .alias("conv")
    ).withColumn("arm", arm)
    cells = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    ).localCheckpoint(eager=False)
    a = cells.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("c_a")
    )
    b = cells.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("c_b")
    )
    j = a.crossJoin(b)
    p_a = exact_ratio_round6(F.col("c_a"), F.col("n_a"))
    p_b = exact_ratio_round6(F.col("c_b"), F.col("n_b"))
    pool = exact_ratio_round6(F.col("c_a") + F.col("c_b"), F.col("n_a") + F.col("n_b"))
    var = pool * (F.lit(1.0) - pool) * (
        F.lit(1.0) / F.col("n_a").cast("double")
        + F.lit(1.0) / F.col("n_b").cast("double")
    )
    z = F.when(var <= 0, F.lit(None).cast("double")).otherwise(
        (p_a - p_b) / F.sqrt(var)
    )
    return j.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        p_a.alias("rate_a"),
        p_b.alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


QUERIES["ab_test_proportions"] = ab_test_proportions


def value_percentile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p10/p25/p50/p75/p90 grid per event type from the
    value-frequency table — multi-quantile profiling whose shuffled state
    is bounded by the distinct cent domain (the percentile-buffer OOM shape
    never appears).  Lower-order-statistic convention (value at
    ceil(n·p/100)), all integer positions."""
    from pyspark.sql.window import Window as W

    ev = (
        table(spark, sf_dir, "events")
        # typed, valued events only (oracle filters identically)
        .where(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
            .cast("long")
            .alias("_c"),
        )
    )
    freq = ev.groupBy("event_type", "_c").agg(F.count(F.lit(1)).alias("_f"))
    w = W.partitionBy("event_type").orderBy("_c")
    cum = freq.withColumn("_cum", F.sum("_f").over(w))
    tot = cum.groupBy("event_type").agg(F.sum("_f").cast("long").alias("_n"))
    j = cum.join(F.broadcast(tot), "event_type")

    def at(p):
        pos = F.expr(f"greatest((_n * {p} + 99) div 100, 1)")
        return F.min(F.when(F.col("_cum") >= pos, F.col("_c"))).cast("long")

    return j.groupBy("event_type").agg(
        F.max("_n").cast("long").alias("n_events"),
        at(10).alias("p10_cents"),
        at(25).alias("p25_cents"),
        at(50).alias("p50_cents"),
        at(75).alias("p75_cents"),
        at(90).alias("p90_cents"),
    )


QUERIES["value_percentile_grid"] = value_percentile_grid


def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after report of exact dedup per source: documents and tokens
    removed, largest duplicate family, exact removal rates — the
    summary a dedup pass publishes with its output.  One content-hash
    aggregate carrying token counts, one per-source reduction."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    docs = table(spark, sf_dir, "documents").select(
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    fam = docs.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("n_tok").alias("tok"),
    )
    rep = fam.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum((F.col("n") - 1) * F.col("tok")).cast("long").alias("tokens_removed"),
        F.max("n").cast("long").alias("largest_family"),
    )
    return rep.select(
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_removed"),
        "tokens_removed",
        "largest_family",
        exact_ratio_round6_wide(
            F.col("n_docs") - F.col("n_unique"), F.col("n_docs")
        ).alias("removal_rate"),
    )


QUERIES["dedup_impact_report"] = dedup_impact_report


def conditional_entropy_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy H(w₂|w₁) per language — the LM branching
    factor that separates natural text from templates.  Exact integer-scaled
    form: Σ c₁₂·round(10⁶·ln(c₁/c₁₂)) per lang (count-weighted scaled logs),
    emitted with the bigram total so the per-token entropy is one exact
    ratio.  Two hash aggregates; no float accumulation."""
    from pyspark.sql.window import Window as W

    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = docs.select("lang", "doc_id", F.posexplode(words).alias("pos", "w"))
    order = W.partitionBy("lang", "doc_id").orderBy("pos")
    bi = base.select(
        "lang", F.col("w").alias("w1"), F.lead("w").over(order).alias("w2")
    ).where(F.col("w2").isNotNull())
    c12 = bi.groupBy("lang", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).localCheckpoint(eager=False)
    c1 = c12.groupBy("lang", "w1").agg(F.sum("c12").cast("long").alias("c1"))
    from stellar_etl_spark.operators.util import fixed_ln_micro

    term = F.col("c12") * fixed_ln_micro("c1", "c12")
    s = c12.join(c1, ["lang", "w1"]).groupBy("lang").agg(
        F.sum("c12").cast("long").alias("n_bigrams"),
        F.sum(term).cast("long").alias("entropy_scaled_sum"),
    )
    return s.select(
        "lang",
        "n_bigrams",
        "entropy_scaled_sum",
        exact_ratio_round6_wide(
            F.col("entropy_scaled_sum"), F.col("n_bigrams") * 1_000_000
        ).alias("cond_entropy_nats"),
    )


QUERIES["conditional_entropy_bigram"] = conditional_entropy_bigram


def source_quality_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source leaderboard with uncertainty: mean doc quality score per
    source ± the 95% CI half-width — the ranked view a curation team acts
    on, with error bars so near-ties aren't over-read.  The score is the
    integer token count signal; mean and variance come from exact integer
    moments, and the half-width is 1.96·sqrt(var/n) as one fixed IEEE
    sequence over those exact inputs."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    docs = table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).cast("long").alias("x")
    )
    d38 = "decimal(38,0)"
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("x").cast("long").alias("_sx"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("_sxx"),
    )
    mean = exact_ratio_round6_wide(F.col("_sx"), F.col("n_docs"))
    var_num = (
        F.col("n_docs").cast(d38) * F.col("_sxx")
        - F.col("_sx").cast(d38) * F.col("_sx").cast(d38)
    )
    var_den = F.col("n_docs").cast(d38) * F.col("n_docs").cast(d38)
    var = F.expr(
        "CAST((_vnum * 2000000 + _vden) div (2 * _vden) AS DOUBLE)"
    ) / F.lit(1_000_000.0)
    return (
        s.withColumn("_vnum", var_num)
        .withColumn("_vden", var_den)
        .select(
            "source",
            "n_docs",
            mean.alias("mean_tokens"),
            var.alias("var_tokens"),
            F.round(
                F.lit(1.96)
                * F.sqrt(
                    (
                        F.expr(
                            "CAST((_vnum * 2000000 + _vden) div (2 * _vden) AS DOUBLE)"
                        )
                        / F.lit(1_000_000.0)
                    )
                    / F.col("n_docs").cast("double")
                ),
                6,
            ).alias("ci95_halfwidth"),
        )
    )


QUERIES["source_quality_leaderboard"] = source_quality_leaderboard


def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily revenue series — the time-series
    diagnostic that flags runaway trends (r→1) or alternation (r<0) before
    forecasting.  The (y_t, y_{t−1}) pairs come from a ≤|days| window; the
    correlation is assembled from exact DECIMAL(38) integer moments with one
    correctly-rounded sqrt at the edge."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        F.expr("ts div 86400000000000").alias("day"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").cast("long").alias("y"))
    w = W.orderBy("day")
    pairs = daily.withColumn("x", F.lag("y").over(w)).where(
        F.col("x").isNotNull()
    )
    d38 = "decimal(38,0)"
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast(d38).alias("_sx"),
        F.sum("y").cast(d38).alias("_sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("_sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y").cast(d38)).alias("_syy"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("_sxy"),
    )
    n = F.col("n_pairs").cast(d38)
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r = F.col("_num").cast("double") / (
        F.sqrt(F.col("_dx").cast("double")) * F.sqrt(F.col("_dy").cast("double"))
    )
    return (
        s.withColumn("_num", num)
        .withColumn("_dx", dx)
        .withColumn("_dy", dy)
        .select(
            "n_pairs",
            F.when(
                (F.col("_dx") == 0) | (F.col("_dy") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(F.round(r, 6))
            .alias("lag1_autocorr"),
        )
    )


QUERIES["daily_revenue_autocorr"] = daily_revenue_autocorr


def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — where user
    behavior settles in the long run.  Transition counts are one lag
    aggregate; the chain itself is a ≤|types|² cell table, so the 12 power
    iterations run on a broadcast-sized frame with EXACT integer-quantized
    probabilities each round (round(1e6·Σ πᵢ·pᵢⱼ) — the k-means quantized-
    iteration convention), making the fixed point reproducible in an
    unrolled oracle."""
    from pyspark.sql.window import Window as W

    # NULL event_type is not a state: a lag() across it would also fuse its
    # neighbors into a phantom transition, so drop those rows up front
    # (oracle filters identically)
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isNotNull())
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    tr = ev.select(
        F.lag("event_type").over(w).alias("a"),
        F.col("event_type").alias("b"),
    ).where(F.col("a").isNotNull())
    counts = tr.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    row_tot = counts.groupBy("a").agg(F.sum("c").cast("long").alias("ra"))
    # transition prob as an exact scaled integer (round half-up at 1e6)
    p = counts.join(F.broadcast(row_tot), "a").select(
        "a",
        "b",
        F.expr("(c * 2000000 + ra) div (2 * ra)").cast("long").alias("p6"),
    ).localCheckpoint(eager=False)
    states = counts.select(F.col("a").alias("s")).union(
        counts.select("b")
    ).distinct()
    # The chain is a ≤|types|² cell table — running 12 power-iteration
    # rounds as 12 joins+aggregates is pure scheduler latency on a frame
    # this small.  Instead the whole fixed point runs INSIDE one
    # expression: pack states and transition cells into a single row and
    # fold over sequence(1,12); each fold step is a transform() emitting
    # the next integer-quantized π vector.  Arithmetic is bit-identical to
    # the join form ((sum(w·p6)+500000) div 1e6 over longs); a state with
    # no inbound edge from a present state — i.e. one the join form would
    # emit NO row for — carries the sentinel -1 (π is always ≥ 0) so row
    # membership matches the unrolled oracle too.  The sentinel, not NULL:
    # the fold's init array is built from non-null literals, so its type
    # is array<bigint> containsNull=false, and Spark coerces the
    # accumulator to that type each round — a NULL entry would silently
    # read back as 0 and surface dropped states as spurious π=0 rows
    # (pinned in tests/test_markov_fold.py).  Zero per-round exchanges.
    wat = (
        "CASE WHEN array_position(_ss, {x}) = 0 THEN cast(-1 as bigint) "
        "ELSE element_at(w, cast(array_position(_ss, {x}) as int)) END"
    )
    step = (
        "transform(_ss, s -> CASE WHEN exists(_es, e -> e.b = s AND ("
        + wat.format(x="e.a")
        + ") >= 0) THEN (aggregate(filter(_es, e -> e.b = s AND ("
        + wat.format(x="e.a")
        + ") >= 0), cast(0 as bigint), (acc, e) -> acc + e.p6 * ("
        + wat.format(x="e.a")
        + ")) + 500000) div 1000000 ELSE cast(-1 as bigint) END)"
    )
    iter_sql = (
        "aggregate(sequence(1, 12), "
        "transform(_ss, s0 -> cast(200000 as bigint)), "  # init: 1e6/5
        f"(w, it) -> {step})"
    )
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    packed = (
        p.groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("a", "b", "p6"))).alias("_es"))
        .crossJoin(
            F.broadcast(
                states.agg(F.sort_array(F.collect_list("s")).alias("_ss"))
            )
        )
    )
    row = (
        packed.select("_ss", F.expr(iter_sql).alias("_w"))
        .select(
            F.explode(F.arrays_zip("_ss", "_w")).alias("_z"),
            F.expr(
                "aggregate(filter(_w, x -> x >= 0), "
                "cast(0 as bigint), (a2, x) -> a2 + x)"
            ).alias("_t"),
        )
        .where(F.col("_z._w") >= 0)
    )
    return row.select(
        F.col("_z._ss").alias("event_type"),
        F.col("_z._w").alias("pi_scaled"),
        exact_ratio_round6_wide(F.col("_z._w"), F.col("_t")).alias(
            "pi_normalized"
        ),
    )


QUERIES["event_markov_stationary"] = event_markov_stationary


def interevent_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of inter-event gaps per event type — the
    log-scale latency/arrival profile.  The bucket is the BINARY LENGTH of
    the gap in seconds (``conv(x,10,2)`` string length == DuckDB
    ``printf('%b')`` length) — no floating log2, whose libm form returns
    2.999… at exact powers of two and flips buckets between engines."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("_gap_us"),
    ).where(F.col("_gap_us").isNotNull())
    gap_s = F.expr("_gap_us div 1000000")
    bucket = F.when(gap_s <= 0, F.lit(0)).otherwise(
        F.length(F.conv(gap_s.cast("string"), 10, 2))
    ).cast("long")
    return gaps.groupBy(
        "event_type", bucket.alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min(gap_s).cast("long").alias("min_gap_s"),
        F.max(gap_s).cast("long").alias("max_gap_s"),
    )


QUERIES["interevent_time_histogram"] = interevent_time_histogram


def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue split between first-day (new) users and returning
    users — the acquisition-vs-retention revenue mix.  First-seen day is
    one min aggregate joined back on the user key; the split is one hash
    agg with exact cents and exact shares."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 86400000000000").alias("day"),
        F.round(F.col("value").cast("decimal(18,6)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    j = ev.join(first, "user_id").withColumn(
        "is_new", (F.col("day") == F.col("d0")).cast("int")
    )
    daily = j.groupBy("day").agg(
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("is_new") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("new_user_cents"),
        F.countDistinct(F.when(F.col("is_new") == 1, F.col("user_id")))
        .cast("long")
        .alias("n_new_users"),
    )
    return daily.select(
        "day",
        "total_cents",
        "new_user_cents",
        (F.col("total_cents") - F.col("new_user_cents")).alias("returning_cents"),
        "n_new_users",
        F.when(F.col("total_cents") == 0, F.lit(None).cast("double"))
        .otherwise(
            exact_ratio_round6_wide(F.col("new_user_cents"), F.col("total_cents"))
        )
        .alias("new_revenue_share"),
    )


QUERIES["new_vs_returning_revenue"] = new_vs_returning_revenue


def media_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL PNG decode: dHash (integer-luma
    horizontal gradient signs, 56 bits) per image, then hash-keyed dup
    groups — the image twin of exact text dedup.  The oracle re-derives
    every luma value arithmetically from the deterministic pixel generator
    (pixel_i = (3*doc_id + i) mod 251), so the decode must invert the real
    zlib+filter encoding bit-exactly before the hash can match."""
    from stellar_etl_spark.operators.multimodal import (
        attach_png_media,
        image_dhash,
    )

    docs = table(spark, sf_dir, "documents")
    h = image_dhash(attach_png_media(docs))
    return h.groupBy("dhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


QUERIES["media_image_phash_dedup"] = media_image_phash_dedup


def media_audio_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity screens over REAL RIFF/PCM16 decode: zero-crossing
    count, silence-sample count (|s| < 100) and peak per clip — the oracle
    re-derives all 64 samples per clip from the generator formula
    sample_i = ((7*doc_id + i) mod 2001) - 1000."""
    from stellar_etl_spark.operators.multimodal import (
        attach_wav_media,
        audio_activity_stats,
    )

    docs = table(spark, sf_dir, "documents")
    return audio_activity_stats(attach_wav_media(docs))


QUERIES["media_audio_activity"] = media_audio_activity


def group_disjoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-disjoint train/val/test split: membership hashes the SOURCE
    (the leakage unit), not the document, so no source ever spans two
    splits — the speaker/site-holdout discipline that row-level splits
    (train_val_test_split) cannot give.  Per split: source count, doc
    count, token count.  Pure hash projection + one aggregate; the split
    assignment is reproducible on any engine/partitioning."""
    from stellar_etl_spark.operators.dedup import tokenize_words

    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            F.col("source"),
            F.size(tokenize_words(F.col("text"))).alias("_nt"),
        )
        .groupBy("split")
        .agg(
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
    )


QUERIES["group_disjoint_split"] = group_disjoint_split


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market segment,
    account-balance thousand-bucket): equivalence-class sizes → how many
    classes/rows sit below k for the standard k ladder.  The
    privacy-screen every dataset release needs; one hash aggregate over
    the QI tuple, then a tiny re-aggregation per k — output is 4 rows
    regardless of scale."""
    cust = table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    ks = spark.range(0, 4).select(
        F.element_at(
            F.array(F.lit(2), F.lit(5), F.lit(10), F.lit(25)),
            F.col("id").cast("int") + 1,
        ).alias("k")
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("int").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("classes_below_k"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.min("sz").cast("long").alias("min_class_size"),
        )
    )


QUERIES["k_anonymity_audit"] = k_anonymity_audit


def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the 3-round LPA partition over the part
    co-purchase graph — the quality gate that tells you whether a
    community run is better than random (Q > 0).  Exact integers to the
    single edge divide; the oracle unrolls the identical LPA rounds and
    the Q formula in HUGEINT."""
    from stellar_etl_spark.operators.graph import (
        label_propagation_labels,
        modularity_summary,
    )

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    # modularity_summary consumes the label frame THREE times (both edge
    # endpoints + the degree join) — cut the 3-round LPA lineage once or
    # every consumer re-derives it (the rfm/pareto plan-explosion lesson).
    # broadcast_labels: parts-catalog node set (see copurchase_communities)
    labels = label_propagation_labels(
        edges, iterations=3, broadcast_labels=True
    ).localCheckpoint(eager=False)
    return modularity_summary(edges, labels)


QUERIES["community_modularity"] = community_modularity


def k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 25-core peel of the part co-purchase graph: 4 rounds of
    drop-degree-<25 nodes (k sits near the median co-purchase degree, so
    the peel actually cascades), reporting the surviving node/edge counts per
    round — the degeneracy screen for dense-subgraph mining.  The round
    count is fixed so the oracle unrolls the identical peel; equal
    consecutive rows show convergence."""
    from stellar_etl_spark.operators.graph import k_core_peel

    edges = _copurchase_edges(spark, sf_dir)
    return k_core_peel(edges.localCheckpoint(eager=False), k=25, rounds=4)


QUERIES["k_core_decomposition"] = k_core_decomposition


def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax/mT5-style temperature-sampled mixture weights: per source,
    w_s = n_s^α / Σ n_t^α with α = 0.5 — upweights small sources relative
    to proportional sampling without flattening to uniform.  α = 0.5 keeps
    the whole pipeline cross-engine-exact: sqrt is IEEE-754
    correctly-rounded in BOTH engines (libm pow is not — the round-3
    negative-sampling lesson), so round(1e6·sqrt(n)) is bit-stable, the
    weight is an exact integer ratio, and the per-source token budget is
    one more exact-ratio round.  One partial aggregate + a 1-row
    broadcast — scale-free."""
    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    budget = 1_000_000  # target total training tokens
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokenize_words(F.col("text")))).cast("long").alias(
            "n_tokens"
        ),
    )
    scaled = per_src.withColumn(
        "_sq",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000).cast(
            "long"
        ),
    )
    tot = scaled.agg(F.sum("_sq").cast("long").alias("_tot"))
    return (
        scaled.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            exact_ratio_round6_wide(F.col("_sq"), F.col("_tot")).alias(
                "mix_weight"
            ),
            # integer token budget: floor of the exact product
            F.expr(
                f"CAST((CAST(_sq AS DECIMAL(38,0)) * {budget}) div "
                "CAST(_tot AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("token_budget"),
        )
    )


QUERIES["temperature_mixture_weights"] = temperature_mixture_weights


def text_tiling_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling-lite topic segmentation: 20-word blocks per document,
    adjacent-block vocabulary Jaccard as the cohesion signal, and a
    boundary wherever 2·|∩| < |∪| — the lexical-cohesion dip detector
    (Hearst '97) as a pure column program.  Per doc: block count, boundary
    count, and the exact mean adjacent-block Jaccard.

    HOF discipline: the word array is PROJECTED first so the block-slicing
    lambda holds an attribute, and cohesion pairs come from a per-doc lag
    window over the exploded blocks (bounded by doc length, never global).
    """
    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide
    from pyspark.sql.window import Window

    B = 20
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", tokenize_words(F.col("text")).alias("_w")
    )
    wcol = F.col("_w")
    nblk = F.ceil(F.size(wcol) / F.lit(B)).cast("int")
    blocks = w.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.array_distinct(F.slice(wcol, i * B + 1, B)),
            )
        ).alias("bi", "bset"),
    )
    lagw = Window.partitionBy("doc_id").orderBy("bi")
    paired = blocks.withColumn("_prev", F.lag("bset").over(lagw)).where(
        F.col("_prev").isNotNull()
    )
    inter = F.size(F.array_intersect("bset", "_prev")).cast("long")
    union = F.size(F.array_union("bset", "_prev")).cast("long")
    scored = paired.select(
        "doc_id",
        inter.alias("_i"),
        union.alias("_u"),
        F.when(inter * 2 < union, 1).otherwise(0).alias("_bnd"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            (F.count(F.lit(1)) + 1).cast("long").alias("n_blocks"),
            F.sum("_bnd").cast("long").alias("n_boundaries"),
            F.sum("_i").cast("long").alias("_si"),
            F.sum("_u").cast("long").alias("_su"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_boundaries",
            exact_ratio_round6_wide(F.col("_si"), F.col("_su")).alias(
                "mean_cohesion"
            ),
        )
    )


QUERIES["text_tiling_segments"] = text_tiling_segments


def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov removal-effect attribution (the Shapley-lite
    standard for multi-touch channel credit): build per-(user, day)
    journeys START → touchpoints → CONV/NULL (conversion = purchase), fit
    the transition matrix, then for each channel ask "how much conversion
    probability disappears if this channel becomes untraversable?" —
    removal = clamp the channel's absorption value to 0, which equals
    redirecting all of its inbound transitions to NULL.

    Determinism: transition probabilities are half-up integer-quantized at
    1e6 (the markov_stationary convention) and the 10 value-iteration
    rounds per scenario are pure integer arithmetic, so the fixed point is
    engine-independent; the 5 scenarios (none + 4 channels) ride as a key
    column through ONE shared iteration loop.  Scale: journeys pack into
    ONE (user, day) aggregate (transitions, terminal state and conversion
    flag all derive in-row from the sorted journey array); the chain
    itself is a ≤7² cell broadcast frame — iteration cost is independent
    of data size."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.expr("ts div 1000").alias("ts_us"),
    )
    # ONE (user, day) aggregate packs each journey sorted in-row (round-9:
    # replaces two windows + a self-join whose shared (user, day) subtree
    # was physically evaluated three times — inner transitions, last-pre,
    # conversion flag).  sort_array over struct(ts_us, event_id, ...) IS
    # the row_number order (ts_us, event_id); transitions, the terminal
    # state and the conversion flag all derive from the packed array, so
    # the (a, b) multiset — and every count downstream — is unchanged.
    seq = (
        ev.groupBy("user_id", "day")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts_us", "event_id", "event_type"))
            ).alias("_seq")
        )
        .select(
            F.transform(F.col("_seq"), lambda s: s["event_type"]).alias("_ts")
        )
    )
    # events strictly before the first purchase (all events when the
    # journey never converts) — purchases can't precede the first purchase,
    # so the slice needs no extra filter
    fp_pos = F.array_position(F.col("_ts"), "purchase")
    journeys = seq.select(
        F.when(fp_pos > 0, F.slice(F.col("_ts"), 1, (fp_pos - 1).cast("int")))
        .otherwise(F.col("_ts"))
        .alias("_pre"),
        (fp_pos > 0).alias("_conv"),
    )
    pre = F.col("_pre")
    pairs = F.concat(
        # inner transitions: (lag-or-START, event)
        F.transform(
            pre,
            lambda x, i: F.struct(
                F.when(i == 0, F.lit("START"))
                .otherwise(F.element_at(pre, i.cast("int")))
                .alias("a"),
                x.alias("b"),
            ),
        ),
        # terminal transition: (last-pre-or-START, CONV/NULL)
        F.array(
            F.struct(
                F.when(F.size(pre) > 0, F.element_at(pre, -1))
                .otherwise(F.lit("START"))
                .alias("a"),
                F.when(F.col("_conv"), F.lit("CONV"))
                .otherwise(F.lit("NULL"))
                .alias("b"),
            )
        ),
    )
    counts = (
        journeys.select(F.explode(pairs).alias("_t"))
        .groupBy(F.col("_t.a").alias("a"), F.col("_t.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    row_tot = counts.groupBy("a").agg(F.sum("c").cast("long").alias("ra"))
    p6 = counts.join(F.broadcast(row_tot), "a").select(
        "a",
        "b",
        F.expr("(c * 2000000 + ra) div (2 * ra)").cast("long").alias("p6"),
    )
    channels = ["view", "click", "signup", "error"]
    scen = spark.createDataFrame(
        [("none",)] + [(ch,) for ch in channels], "removed string"
    )
    # 5 scenarios × ≤7² cells: the 10 value-iteration rounds fold INSIDE
    # one expression per scenario row (the event_markov_stationary packing
    # trick) instead of 10 tiny join+aggregate shuffles.  Arithmetic is
    # bit-identical to the join form; a state's entry is NULL exactly when
    # the join form would carry no row for it (the conv_rows union is the
    # CONV special case in the lookup), so START-row presence matches too.
    scen_pack = (
        p6.crossJoin(F.broadcast(scen))
        .where(
            (F.col("a") != F.col("removed")) & (F.col("b") != F.col("removed"))
        )
        .groupBy("removed")
        .agg(
            F.sort_array(F.collect_list(F.struct("a", "b", "p6"))).alias("_es"),
            F.sort_array(F.collect_set("a")).alias("_ss"),
        )
    )
    wat = (
        "CASE WHEN {x} = 'CONV' THEN cast(1000000 as bigint) "
        "WHEN array_position(_ss, {x}) = 0 THEN cast(null as bigint) "
        "ELSE element_at(w, cast(array_position(_ss, {x}) as int)) END"
    )
    step = (
        "transform(_ss, s -> CASE WHEN exists(_es, e -> e.a = s AND ("
        + wat.format(x="e.b")
        + ") IS NOT NULL) THEN (aggregate(filter(_es, e -> e.a = s AND ("
        + wat.format(x="e.b")
        + ") IS NOT NULL), cast(0 as bigint), (acc, e) -> acc + e.p6 * ("
        + wat.format(x="e.b")
        + ")) + 500000) div 1000000 ELSE cast(null as bigint) END)"
    )
    iter_sql = (
        "aggregate(sequence(1, 10), "
        "transform(_ss, s0 -> cast(null as bigint)), "
        f"(w, it) -> {step})"
    )
    pconv = (
        scen_pack.select("removed", "_ss", F.expr(iter_sql).alias("_w"))
        .select(
            "removed",
            F.expr(
                "CASE WHEN array_position(_ss, 'START') = 0 THEN "
                "cast(null as bigint) ELSE element_at(_w, "
                "cast(array_position(_ss, 'START') as int)) END"
            ).alias("p_scaled"),
        )
        .where(F.col("p_scaled").isNotNull())
    )
    full = pconv.where(F.col("removed") == "none").select(
        F.col("p_scaled").alias("p_full_scaled")
    )
    per_ch = (
        pconv.where(F.col("removed") != "none")
        .crossJoin(F.broadcast(full))
        .select(
            F.col("removed").alias("channel"),
            "p_full_scaled",
            F.col("p_scaled").alias("p_removed_scaled"),
            (F.col("p_full_scaled") - F.col("p_scaled")).alias("_drop"),
        )
    )
    tot_drop = per_ch.agg(F.sum("_drop").cast("long").alias("_td"))
    return per_ch.crossJoin(F.broadcast(tot_drop)).select(
        "channel",
        "p_full_scaled",
        "p_removed_scaled",
        exact_ratio_round6_wide(
            F.col("_drop"), F.greatest(F.col("p_full_scaled"), F.lit(1))
        ).alias("removal_effect"),
        exact_ratio_round6_wide(
            F.col("_drop"), F.greatest(F.col("_td"), F.lit(1))
        ).alias("attribution_share"),
    )


QUERIES["markov_removal_attribution"] = markov_removal_attribution


def orders_nested_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many nested export (the document-store / feature-store
    shape): each order carries its line items as a POSITION-SORTED nested
    array, verified through a deterministic digest — md5 over the sorted
    "linenumber:partkey:quantity" item strings — plus first/last item
    columns.  The digest pins the assembly order exactly, so a regression
    in the sort-before-collect discipline (collect_list is otherwise
    partition-order-dependent!) breaks the hash."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    items = li.select(
        "l_orderkey",
        F.concat_ws(
            ":",
            F.col("l_linenumber"),
            F.col("l_partkey"),
            F.col("l_quantity").cast("long"),
        ).alias("_item"),
        "l_linenumber",
    )
    return (
        items.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("l_linenumber"), F.col("_item"))
                        )
                    ).getField("_item"),
                    "|",
                )
            ).alias("items_digest"),
            # linenumbers can repeat within an order in this synthetic
            # data — the tie-break must be total (min over the full struct)
            F.min(F.struct(F.col("l_linenumber"), F.col("_item")))[
                "_item"
            ].alias("first_item"),
            F.max(F.struct(F.col("l_linenumber"), F.col("_item")))[
                "_item"
            ].alias("last_item"),
        )
    )


QUERIES["orders_nested_export"] = orders_nested_export


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data screen.  One row per digit: observed count, Benford
    expectation, and the chi-square contribution.  The 9 Benford
    probabilities are shared LITERALS (scaled 1e9), so no libm log10
    enters either engine; the per-digit statistic is computed row-local
    (never float-summed across rows), keeping every value bit-stable."""
    # round(1e9 * log10(1 + 1/d)) for d = 1..9 — fixed public constants
    benford9 = [
        301029996, 176091259, 124938737, 96910013, 79181246,
        66946790, 57991947, 51152522, 45757491,
    ]
    orders = table(spark, sf_dir, "orders")
    # Benford is defined on MAGNITUDES: abs() before the digit pull, else a
    # negative total's leading '-' hits the int cast (ANSI crash) — both
    # engines take the same abs
    digits = orders.select(
        F.substring(
            F.abs(F.col("o_totalprice")).cast("decimal(18,2)").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    ).where(F.col("digit").between(1, 9))
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    obs = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    tot = obs.agg(F.sum("observed").cast("long").alias("n"))
    pmap = F.element_at(
        F.array(*[F.lit(p) for p in benford9]), F.col("digit")
    ).cast("long")
    # all chi-square inputs stay EXACT integers at 1e-9 scale:
    # chi2 = drop^2 / (n*p) = drop_s^2 / (1e9 * np_s) with
    # drop_s = 1e9*observed - np_s; the square is formed in DECIMAL(38)
    np_s = (F.col("n") * pmap).alias("_np")
    with_np = obs.crossJoin(F.broadcast(tot)).select(
        "digit", "observed", F.col("n"), np_s
    )
    drop_s = (
        F.col("observed") * F.lit(1_000_000_000) - F.col("_np")
    ).cast("decimal(38,0)")
    return with_np.select(
        "digit",
        "observed",
        F.expr("CAST(_np div 1000000000 AS BIGINT)").alias("expected"),
        exact_ratio_round6_wide(
            drop_s * drop_s,
            F.col("_np").cast("decimal(38,0)") * F.lit(1_000_000_000),
        ).alias("chi2_term"),
    )


QUERIES["benford_digit_audit"] = benford_digit_audit


def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 frequent 3-step behavioral paths (event-type trigrams within
    a user-day journey) — the path-mining staple behind funnel discovery.
    Two lag windows + one hash aggregate + a total-order TakeOrdered."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = W.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("s1"),
        F.lag("event_type", 1).over(w).alias("s2"),
        F.col("event_type").alias("s3"),
    ).where(F.col("s1").isNotNull())
    return (
        tri.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "s1", "s2", "s3")
        .limit(20)
    )


QUERIES["frequent_event_paths"] = frequent_event_paths


def rolling_7day_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling 7-day distinct active users per day — the DAU/WAU
    dashboard metric that naive `COUNT(DISTINCT) OVER (RANGE 6 PRECEDING)`
    cannot compute at scale (distinct doesn't decompose over sliding
    windows).  Shape: dedup to (user, day) grain, fan each user-day out to
    the ≤7 window-end days it supports (a bounded map-side explode), then
    ONE (window_day, user)-keyed distinct + count — two hash aggregates,
    no windows, no per-day re-scan.  At 100 TB the fan-out factor is the
    window length, independent of data volume."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts div 1000) div 86400000000").alias("day")
    )
    user_days = ev.distinct()
    bounds = user_days.agg(
        F.min("day").alias("_dmin"), F.max("day").alias("_dmax")
    )
    fan = user_days.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("wday"),
    )
    per_day = (
        fan.select("user_id", "wday").distinct()
        .groupBy("wday")
        .agg(F.count(F.lit(1)).cast("long").alias("wau_7d"))
    )
    daily = user_days.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    return (
        daily.join(per_day, daily.day == per_day.wday)
        .crossJoin(F.broadcast(bounds))
        # trailing windows are only complete once 7 days exist
        .where(F.col("day") >= F.col("_dmin") + 6)
        .select("day", "dau", "wau_7d")
    )


QUERIES["rolling_7day_distinct_users"] = rolling_7day_distinct_users


def score_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution between
    the first and second half of the time range — the model-monitoring
    drift gate (PSI > 0.2 = investigate).  Bin edges are fixed from the
    REFERENCE population's exact deciles (distributed_ntile — no global
    sort), the comparison population is bucketed by those edges via a
    broadcast range join, and PSI = Σ (p_i − q_i)·ln(p_i/q_i) assembles
    from integer-scaled logs so every aggregate is exact under any
    partitioning.  One row per decile bin plus exact per-bin shares."""
    from stellar_etl_spark.operators.ranking import distributed_ntile
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    mid = ev.agg(
        ((F.min("ts_us") + F.max("ts_us")) / 2).cast("long").alias("_mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).withColumn(
        "_ref", F.col("ts_us") < F.col("_mid")
    )
    ref = tagged.where(F.col("_ref"))
    cur = tagged.where(~F.col("_ref"))
    deciled = distributed_ntile(ref, "v", ["event_id"], 10, out="bin")
    # decile upper edges from the reference half (max value per bin)
    edges = deciled.groupBy("bin").agg(F.max("v").alias("hi")).where(
        F.col("bin") < 10
    )
    ref_counts = deciled.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_ref")
    )
    # bucket the current half by the broadcast edges: bin = 1 + #edges below v
    e = edges.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("bin", "hi"))).alias("_e")
    )
    cur_binned = cur.crossJoin(F.broadcast(e)).select(
        (
            F.lit(1)
            + F.size(F.filter(F.col("_e"), lambda s: s["hi"] < F.col("v")))
        ).alias("bin")
    )
    cur_counts = cur_binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_cur")
    )
    totals_r = ref_counts.agg(F.sum("n_ref").cast("long").alias("tr"))
    totals_c = cur_counts.agg(F.sum("n_cur").cast("long").alias("tc"))
    j = (
        ref_counts.join(cur_counts, "bin", "full")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .crossJoin(F.broadcast(totals_r))
        .crossJoin(F.broadcast(totals_c))
    )
    # integer-scaled shares and log-ratio: round(1e6*ln(p/q)) with p/q as
    # exact count ratios.  The log goes through fixed_ln_micro, NOT libm:
    # java.lang.Math.log and DuckDB's libm may differ by 1 ulp, which can
    # flip the rounded integer at a near-half-way value — the fixed-point
    # quantization is a pure function of the integer counts, so both
    # engines always agree bit-for-bit.
    from stellar_etl_spark.operators.util import fixed_ln_micro

    p_s = F.expr("(n_ref * 2000000 + tr) div (2 * tr)").cast("long")
    q_s = F.expr("(n_cur * 2000000 + tc) div (2 * tc)").cast("long")
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    guard = "CASE WHEN n_ref > 0 AND n_cur > 0 THEN {} ELSE 1 END"
    # sum of single-count logs (overflow-safe at any corpus size)
    ln_s = F.when(
        ok,
        fixed_ln_micro(guard.format("n_ref"), guard.format("n_cur"))
        + fixed_ln_micro(guard.format("tc"), guard.format("tr")),
    ).otherwise(F.lit(0))
    return j.select(
        "bin",
        "n_ref",
        "n_cur",
        exact_ratio_round6_wide(F.col("n_ref"), F.col("tr")).alias("p_ref"),
        exact_ratio_round6_wide(F.col("n_cur"), F.col("tc")).alias("p_cur"),
        exact_ratio_round6_wide(
            (p_s - q_s) * ln_s, F.lit(1_000_000_000_000)
        ).alias("psi_term"),
    )


QUERIES["score_drift_psi"] = score_drift_psi


def harmonic_centrality_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth (≤3) harmonic centrality of hash-chosen seed parts in
    the co-purchase graph — multi-source frontier BFS with integer 1/d
    weights; the oracle unrolls the same three expansion/anti-join rounds
    with MATERIALIZED CTEs.

    Note: harmonic_centrality_bitset runs one Spark job at PLAN-construction
    time (a seeds.count() that sizes the bitset mask width) — building this
    DataFrame triggers cluster work, and the plan goes stale if the input
    path contents change before execution.  Acceptable under the documented
    bounded-seed contract; callers needing a fully-lazy plan should use
    harmonic_centrality_bounded."""
    from stellar_etl_spark.operators.graph import harmonic_centrality_bitset

    edges = _copurchase_edges(spark, sf_dir)
    # bounded seed set (|V|/100 ≤ a few hundred here) → the bitset BFS:
    # per-node seed masks replace the (seed, node) pair frontier, whose
    # depth-3 DISTINCT + anti-join materialized millions of pair rows
    # (bit-identical output, 6x faster at sf0.1; harmonic_centrality_bounded
    # remains the unbounded-seed-set path)
    return harmonic_centrality_bitset(edges, seed_mod=100, max_depth=3)


QUERIES["harmonic_centrality_seeds"] = harmonic_centrality_seeds
