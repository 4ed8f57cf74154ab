"""Text analysis operators for training-data pipelines.

Language-ID (stopword-marker heuristic), quality scoring, token counting and
document fingerprinting — all pure column expressions (no UDFs), each with an
ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.operators.dedup import shingles, tokenize_words
from stellar_etl_spark.operators.util import fixed_ln_micro

# Marker stopwords per language for the n-gram/stopword heuristic.  Order is
# the deterministic tie-break (first wins on equal scores).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to"]),
    ("es", ["el", "la", "de", "que", "y"]),
    ("fr", ["le", "la", "et", "les", "des"]),
    ("de", ["der", "die", "und", "das", "ein"]),
    ("zh", ["de5", "shi4", "le5", "zai4", "he2"]),
]


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("words", tokenize_words(F.col(text_col)))


def _adjacent_bigrams(words: Column) -> Column:
    """Space-joined adjacent word pairs via the self-contained-lambda n-gram
    assembly (see :func:`~stellar_etl_spark.operators.dedup.word_ngrams` for
    why the naive transform-over-sequence spelling is O(len²) per row)."""
    from stellar_etl_spark.operators.dedup import word_ngrams

    return word_ngrams(words, 2)


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics (whitespace tokenization)."""
    words = tokenize_words(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
    )


def _marker_count(words: Column, markers: list[str]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic quality heuristics: length band, lexical diversity,
    stopword ratio.  Integer-ratio arithmetic → engine-portable doubles."""
    from stellar_etl_spark.operators.util import exact_ratio_round6

    words = tokenize_words(F.col(text_col))
    n_tok = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop = _marker_count(words, LANG_MARKERS[0][1])
    diversity = n_distinct.cast("double") / n_tok.cast("double")
    stop_ratio = stop.cast("double") / n_tok.cast("double")
    length_ok = (n_tok >= 10) & (n_tok <= 1000)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        exact_ratio_round6(n_distinct, n_tok).alias("lexical_diversity"),
        exact_ratio_round6(stop, n_tok).alias("stopword_ratio"),
        (
            F.when(length_ok, F.lit(1)).otherwise(F.lit(0))
            + F.when(diversity >= 0.3, F.lit(1)).otherwise(F.lit(0))
            + F.when(stop_ratio >= 0.01, F.lit(1)).otherwise(F.lit(0))
        ).alias("quality_score"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-marker language ID with deterministic tie-break (marker list
    order), 'und' when no marker hits."""
    words = tokenize_words(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        *[
            _marker_count(words, markers).alias(f"score_{lang}")
            for lang, markers in LANG_MARKERS
        ],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang, _ in LANG_MARKERS])
    pred: Column = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)).otherwise(
            pred
        )
    return scored.select(F.col(id_col), pred.alias("lang_pred"), best.alias("lang_score"))


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Content fingerprints: whole-text md5 plus the min-shingle digest
    (the first MinHash permutation — stable under small reorderings)."""
    from stellar_etl_spark.operators.util import fan_out_small

    df = fan_out_small(df)
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.array_min(
            F.transform(shingles(F.col(text_col), n), lambda s: F.md5(s))
        ).alias("min_shingle_md5"),
    )


BPE_PATTERN = r"(\w+|[^\w\s])"


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """BPE-ish subword-boundary tokenization: words and punctuation become
    separate tokens (the GPT-2-style pre-tokenizer regex, simplified to an
    engine-portable class).  ``regexp_extract_all`` is JVM-side; identical
    semantics in DuckDB's RE2."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 1)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe_tokens"),
        F.size(F.filter(toks, lambda t: ~t.rlike("^\\w+$"))).alias("n_punct_tokens"),
    )


ROLLING_MOD = 2147483647  # 2^31-1; keeps the fold overflow-free under ANSI


def rolling_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Polynomial rolling hash h = (h*31 + byte) mod (2^31-1) over the text —
    a deterministic left fold (``aggregate``), the classic Rabin-Karp
    document fingerprint.  Pure column expressions, order-defined on both
    engines."""
    codes = F.transform(F.split(F.col(text_col), ""), lambda c: F.ascii(c))
    fold = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % ROLLING_MOD,
    )
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        fold.alias("rolling_hash"),
    )


URL_PATTERN = r"https?://\S+|www\.\S+"


def clean_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization before dedup/tokenization: strip URLs,
    collapse whitespace, trim, lowercase — all JVM regexp/string builtins,
    identical semantics in the oracle's RE2."""
    cleaned = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), URL_PATTERN, " "),
                r"\s+",
                " ",
            )
        )
    )
    return df.select(
        F.col(id_col),
        F.length(cleaned).alias("clean_len"),
        F.md5(cleaned).alias("clean_md5"),
    )


EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+\d{1,2}-\d{3}-\d{4}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction pass for training corpora: emails → ``<EMAIL>``,
    phone-shaped tokens → ``<PHONE>``.  Pure JVM regexp builtins (replace-all
    semantics on both engines; the oracle twin passes RE2's 'g' flag), so the
    pass runs inside whole-stage codegen with no shuffle — a map-only stage
    at any scale.  Emits the scrubbed text plus per-doc audit counts."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(EMAIL_PATTERN))
    n_phones = F.regexp_count(text, F.lit(PHONE_PATTERN))
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        scrubbed.alias("text_scrubbed"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        (F.length(text) - F.length(scrubbed)).alias("chars_delta"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: the fraction of tokens taken by the
    most frequent unigram and by the most frequent bigram.  Computed entirely
    with array lambdas over the per-row token list (docs are bounded, so the
    O(distinct·len) per-row scan is cheap and the whole operator is a
    shuffle-free map stage — the right trade at 100 TB vs an explode +
    two-level aggregate that would shuffle every token)."""
    from stellar_etl_spark.operators.util import fan_out_small

    df = fan_out_small(df)
    words = tokenize_words(F.col(text_col))
    bigrams = _adjacent_bigrams(words)

    def top_count(arr: Column) -> Column:
        # Max multiplicity = longest equal-run in the sorted array: one
        # array_sort + a single-pass aggregate (O(len·log len) per row),
        # not the O(distinct·len) distinct×filter scan.
        s = F.array_sort(arr)
        init = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc: Column, x: Column) -> Column:
            run = F.when(acc["prev"] == x, acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.coalesce(F.aggregate(s, init, step, lambda acc: acc["best"]), F.lit(0))

    from stellar_etl_spark.operators.util import exact_ratio_round6

    n_tok = F.size(words)
    n_bi = F.size(bigrams)
    top_uni_frac = F.when(
        n_tok > 0, exact_ratio_round6(top_count(words), n_tok)
    ).otherwise(F.lit(0.0))
    top_bi_frac = F.when(
        n_bi > 0, exact_ratio_round6(top_count(bigrams), n_bi)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        top_uni_frac.alias("top_unigram_frac"),
        top_bi_frac.alias("top_bigram_frac"),
        ((top_uni_frac > 0.2) | (top_bi_frac > 0.2)).alias("repetitive"),
    )


def bm25_search(
    df,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
):
    """BM25 keyword search: top ``limit`` documents for a literal term list.

    Scale shape: one explode pass builds doc lengths and per-term tfs; the
    corpus stats (N, avgdl, per-term df) collapse to a single broadcast row
    (no driver collect).  Per-term scores pivot into fixed columns so the
    final score is ONE deterministic expression tree — summation order never
    depends on row order, keeping floats bit-stable across engines and
    partitionings.  Only documents matching ≥1 term are scored; ordering is
    (rounded score desc, id) — a total order, so the top-k cut is exact.
    """
    from pyspark.sql import functions as F

    from stellar_etl_spark.operators.dedup import tokenize_words

    toks = df.select(
        F.col(id_col), F.explode(tokenize_words(F.col(text_col))).alias("t")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("t").isin(terms))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))

    piv = tf.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("t") == w, F.col("tf"))).alias(f"tf_{w}")
            for w in terms
        ]
    )
    dfs = dfq.agg(
        *[
            F.max(F.when(F.col("t") == w, F.col("df"))).alias(f"df_{w}")
            for w in terms
        ]
    )
    # idf per TERM in the 1-row constants frame, not per scored doc-row:
    # (n-df+0.5)/(df+0.5) + 1 == (2n+2)/(2df+1), one integer ratio, so the
    # Robertson-Sparck-Jones idf quantizes engine-deterministically — and
    # the fixed-point fold runs |terms| times total instead of once per
    # (doc, term).  NULL df (term matches nothing) propagates to NULL idf,
    # zeroed by the per-term coalesce below, same as ln() did.
    consts = stats.crossJoin(dfs).select(
        F.col("n"),
        F.col("avgdl"),
        *[F.col(f"df_{w}") for w in terms],
        *[
            (
                fixed_ln_micro("2 * n + 2", f"2 * df_{w} + 1").cast("double")
                / F.lit(1_000_000.0)
            ).alias(f"idf_{w}")
            for w in terms
        ],
    )
    scored = piv.join(dl, id_col).crossJoin(F.broadcast(consts))

    def term_score(w: str):
        tf_c = F.col(f"tf_{w}").cast("double")
        idf = F.col(f"idf_{w}")
        denom = tf_c + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        return F.coalesce(idf * (tf_c * F.lit(k1 + 1.0)) / denom, F.lit(0.0))

    score = term_score(terms[0])
    for w in terms[1:]:
        score = score + term_score(w)
    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(limit)
    )


def ngram_contamination(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.02,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Benchmark decontamination: for each document, the fraction of its
    distinct word n-grams that appear anywhere in the benchmark corpus.

    Scale shape: the benchmark n-gram set is tiny relative to a 100 TB
    training corpus (eval suites are megabytes), so it is distinct-ed and
    **broadcast** — the check is then a map-side hash probe per exploded
    n-gram, and the per-doc re-aggregate shuffles only (doc_id, counts),
    never re-partitioning the corpus by n-gram.  (A per-row
    ``array_intersect`` against one collapsed benchmark array avoids even
    that small shuffle but rebuilds an O(|bench|) hash set per document —
    measured 2× slower; the broadcast hash join builds it once per task.)
    Documents shorter than ``n`` words have no n-grams and are omitted
    (vacuously uncontaminated)."""
    from stellar_etl_spark.operators.util import fan_out_small

    df = fan_out_small(df)
    grams = shingles(F.col(text_col), n)
    # Materialize the shingle array BELOW the generator: ExtractGenerator
    # hoists non-generator expressions in the same select above the Generate,
    # so size(grams) inlined next to explode(grams) would recompute the whole
    # shingle pipeline once per exploded row (~n_grams× slower — measured 3×
    # wall on this query).
    carried = [F.col(c) for c in carry_cols]
    pre = df.select(F.col(id_col), *carried, grams.alias("_grams"))
    docs = pre.select(
        F.col(id_col),
        *carried,
        F.size("_grams").alias("n_grams"),
        F.explode("_grams").alias("g"),
    )
    bench = (
        bench_df.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # carry_cols ride the explode as plain column references (cheap) and
    # come back out via first() — saves the caller a second scan + join to
    # re-attach dimensions like source
    per_doc = (
        docs.join(F.broadcast(bench), "g", "left")
        .groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in carry_cols],
            F.first("n_grams").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
    )
    from stellar_etl_spark.operators.util import exact_ratio_round6

    frac = F.col("n_contaminated").cast("double") / F.col("n_grams")
    return per_doc.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        "n_grams",
        "n_contaminated",
        exact_ratio_round6("n_contaminated", "n_grams").alias("contamination_frac"),
        (frac >= threshold).alias("contaminated"),
    )


def unigram_logprob_score(
    df,
    id_col: str,
    text_col: str,
    scale: int = 1000,
):
    """Corpus-unigram log-probability score per document — the language-model
    quality signal (a KenLM stand-in: docs of improbable tokens score low;
    a real pipeline swaps the unigram table for an n-gram LM).

    Determinism: per-token log-probs are integer-scaled
    (``round(scale·ln(count/total))``), so the per-doc sum aggregates
    exactly under any partitioning; the only floats are the final divides
    (fixed expression tree).  Shape: explode → two hash aggregates →
    token equi-join → doc aggregate; corpus total is one broadcast row.
    """
    from pyspark.sql import functions as F

    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.util import fan_out_small

    toks = fan_out_small(df).select(
        F.col(id_col), F.explode(tokenize_words(F.col(text_col))).alias("t")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    cf = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("total"))
    lp = cf.crossJoin(F.broadcast(tot)).select(
        "t",
        fixed_ln_micro("c", "total", scale).alias("lp"),
    )
    s = (
        tf.join(lp, "t")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("lp")).alias("si"),
            F.sum("tf").alias("n_tokens"),
        )
    )
    # avg = si / (scale·n) rounded to 6 digits — performed in EXACT integer
    # arithmetic (half away from zero), then one integer/1e6 double divide.
    # round(double, 6) here is a cross-engine trap: Spark rounds the double's
    # shortest decimal repr, DuckDB its exact binary value, and they disagree
    # when the true rational sits exactly on a …5 boundary (seen at sf0.1).
    # value×1e6 = si·(1e6/scale)/n; with scale=1000 that is si·1000/n.
    mul = 1_000_000 // scale
    sgn = F.when(F.col("si") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    scaled6 = sgn * F.expr(
        f"(abs(si) * {2 * mul} + n_tokens) div (2 * n_tokens)"
    )
    return s.select(
        F.col(id_col),
        F.col("n_tokens"),
        (scaled6.cast("double") / F.lit(1_000_000.0)).alias("avg_logprob"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 200,
    overlap: int = 40,
) -> DataFrame:
    """Fixed-size character chunking with overlap — the context-window
    preparation step of a training/RAG pipeline (each chunk starts
    ``chunk_size - overlap`` after the previous one; every character is
    covered; the final partial chunk is kept).

    Pure generate-and-explode column work: a shuffle-free map stage whose
    output grain is chunks, so it scales linearly with corpus bytes and
    parallelizes with the input partitioning — no UDF, no state.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    # Last start position s satisfies s <= len - overlap (so a chunk always
    # contributes > overlap new characters), except the degenerate
    # single-chunk case start=1.
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.length(F.col(text_col)) - F.lit(overlap)),
        F.lit(step),
    )
    ex = df.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(starts).alias("chunk_index", "chunk_start"),
    )
    chunk = F.col(text_col).substr(F.col("chunk_start"), F.lit(chunk_size))
    return ex.select(
        F.col(id_col),
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


def dsir_importance(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
    buckets: int = 1024,
    scale: int = 1000,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): importance weights from
    hashed n-gram features — score RAW documents by how much their unigram
    profile resembles a TARGET corpus, the standard pre-training
    data-selection recipe.

    Features are md5-bucketed unigrams (the repo's portable hash-bucket
    idiom).  Per-bucket log importance ln(p_target/p_raw) with add-one
    smoothing is integer-scaled once (``round(scale·ln(·))`` — tiny
    bucket-count table), so every per-document sum is EXACT integer
    arithmetic under any partitioning.  Output: per raw document the token
    count, the summed scaled log-weight, and ``selected`` (importance > 0,
    i.e. closer to the target than to the raw pool).

    Scale shape: explode → two bucket-count aggregates (≤``buckets`` rows
    each, broadcast) → map-side weight join → one per-doc aggregate.  The
    weight table never exceeds ``buckets`` rows no matter the corpus size.
    """
    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.util import fan_out_small

    toks = fan_out_small(df).select(
        F.col(id_col),
        F.col(target_col).alias("_t"),
        F.explode(tokenize_words(F.col(text_col))).alias("w"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % buckets
    ).alias("b")
    bt = toks.select(bucket, "_t", id_col)

    counts = bt.groupBy("b").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("tc"),
        F.sum(F.when(~F.col("_t"), 1).otherwise(0)).alias("rc"),
    )
    totals = counts.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    # ln( ((tc+1)/(tt+B)) / ((rc+1)/(rt+B)) ) = ln of ONE integer ratio
    # ((tc+1)(rt+B)) / ((tt+B)(rc+1)), quantized engine-deterministically
    w = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            fixed_ln_micro("tc + 1", f"tt + {buckets}", scale)
            + fixed_ln_micro(f"rt + {buckets}", "rc + 1", scale)
        ).alias("lw"),
    )
    return (
        bt.where(~F.col("_t"))
        .join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lw").alias("importance_scaled"),
        )
        .select(
            id_col,
            "n_tokens",
            "importance_scaled",
            (F.col("importance_scaled") > 0).alias("selected"),
        )
    )


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    steps: int = 3,
) -> DataFrame:
    """Distributed BPE merge learning (Sennrich et al., ACL 2016) — the
    tokenizer-training primitive: per step, count adjacent symbol pairs
    over the whole corpus (weighted by word frequency), pick the most
    frequent pair, and merge it everywhere; repeat.

    Execution shape per step (all DataFrame ops, no driver-side corpus
    state):

    - pair counting: explode (symbol, next-symbol) per distinct word
      weighted by its count — one partial-agg shuffle over the pair key;
    - argmax: a 1-row TakeOrdered broadcast (count DESC, pair ASC
      tie-break);
    - merge application: symbols ride as a space-delimited string, so the
      merge is one JVM ``replace(' a b ', ' ab ')`` over the distinct-word
      table — no per-token Python.

    SELF-PAIRS (x,x) are excluded from merge candidates, which makes the
    merge set unambiguous: with x != y, a pair site can never start at two
    consecutive token positions, so EVERY " x y " adjacency merges.  The
    space-delimited replace consumes a site's trailing space and thereby
    breaks an immediately following site, so the replace is applied TWICE:
    pass 1 merges the odd sites of any chain, leaving the even sites
    isolated with both delimiters intact, and pass 2 merges those — two
    passes provably reach the fixpoint, identically in every engine with
    left-to-right non-overlapping replace (Spark, DuckDB, Python).
    Classic BPE with self-merges needs a sequential scanner instead.

    Returns one row per learned merge: (step, left, right, merged,
    pair_count, corpus_tokens_after) — the last column re-counts the
    corpus symbol total after applying that step's merge, so the rows
    double as a compression curve.
    """
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # "h e l l o" with sentinel spaces: ' h e l l o ' (global per-char
    # regexp_replace — identical spelling in DuckDB for the oracle)
    seq = F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 "))
    state = words.select("w", "freq", seq.alias("seq"))

    out_rows = []
    for step in range(1, steps + 1):
        toks = F.split(F.trim(F.col("seq")), " ")
        pairs = state.select(
            "freq",
            F.explode(
                F.filter(
                    F.zip_with(
                        toks,
                        F.slice(toks, 2, 1_000_000),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    ),
                    lambda p: p["r"].isNotNull() & (p["l"] != p["r"]),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .select("l", "r", "cnt", F.lit(step).alias("step"))
        )
        pat = F.concat(
            F.lit(" "), F.col("l"), F.lit(" "), F.col("r"), F.lit(" ")
        )
        rep = F.concat(F.lit(" "), F.col("l"), F.col("r"), F.lit(" "))
        merged = state.crossJoin(F.broadcast(best)).select(
            "w",
            "freq",
            # two passes: see docstring (chained sites share a delimiter)
            F.replace(F.replace(F.col("seq"), pat, rep), pat, rep).alias(
                "seq"
            ),
            "l", "r", "cnt", "step",
        )
        stats = merged.agg(
            F.first("step").alias("step"),
            F.first("l").alias("left"),
            F.first("r").alias("right"),
            F.concat(F.first("l"), F.first("r")).alias("merged"),
            F.first("cnt").alias("pair_count"),
            F.sum(
                F.size(F.split(F.trim(F.col("seq")), " ")) * F.col("freq")
            ).alias("corpus_tokens_after"),
        )
        out_rows.append(stats)
        state = merged.select("w", "freq", "seq")

    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out.select(
        F.col("step").cast("long").alias("step"),
        "left", "right", "merged",
        F.col("pair_count").cast("long").alias("pair_count"),
        F.col("corpus_tokens_after").cast("long").alias("corpus_tokens_after"),
    )


def bpe_encode_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    steps: int = 3,
) -> DataFrame:
    """Apply BPE merges learned by :func:`bpe_learn` back to the corpus —
    the tokenizer-application half: per document, the word/char token
    counts before and after the learned merges (the numbers a training
    pipeline budgets sequences with).

    Shape: the merge table (``steps`` rows) pivots to ONE broadcast row of
    (l_k, r_k) pairs; the distinct-word table replays the same
    double-replace chain once per word; documents then explode to words
    and join the per-word token counts — the merge learning cost is paid
    on distinct words, the application on the corpus is one join + sum.
    """
    merges = bpe_learn(docs, text_col=text_col, steps=steps)
    pivot = merges.agg(
        *[
            F.max(F.when(F.col("step") == k, F.col(c))).alias(f"{c}{k}")
            for k in range(1, steps + 1)
            for c in ("left", "right")
        ]
    )

    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .distinct()
    )
    seq = F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 "))
    encoded = words.crossJoin(F.broadcast(pivot)).select(
        "w", seq.alias("seq"), *[F.col(f"{c}{k}") for k in range(1, steps + 1) for c in ("left", "right")]
    )
    col = F.col("seq")
    for k in range(1, steps + 1):
        pat = F.concat(
            F.lit(" "), F.col(f"left{k}"), F.lit(" "), F.col(f"right{k}"),
            F.lit(" "),
        )
        rep = F.concat(
            F.lit(" "), F.col(f"left{k}"), F.col(f"right{k}"), F.lit(" ")
        )
        col = F.replace(F.replace(col, pat, rep), pat, rep)
    word_tokens = encoded.select(
        "w",
        F.length(F.col("w")).alias("n_chars"),
        F.size(F.split(F.trim(col), " ")).alias("n_tokens"),
    )

    doc_words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).where(F.col("w") != "")
    return (
        doc_words.join(word_tokens, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def char_entropy_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1000,
) -> DataFrame:
    """Per-document character-distribution entropy (nats) — the classic
    gibberish / low-diversity quality gate (boilerplate, base64 blobs and
    keyboard-mash all sit far below natural text's ~4 nats).

    Shape: a pure per-row column program — NO shuffle, no UDF; at 100 TB
    this is a map-only stage that pipelines into the scan.  Char counts
    come from ONE ``aggregate`` fold over the sorted char array (run-length
    state machine: prev char, current run, accumulated sum), so per-row
    cost is O(len·log len) for the sort plus O(len) for the fold.  The
    naive distinct×filter HOF spelling is O(|alphabet|·len) at best — and
    because Spark inlines outer-scope expressions into HOF lambdas rather
    than CSE-ing them, a lambda that references the array rebuilds it per
    element, degrading to O(len²) (measured: hung at sf0.1).  Keep lambdas
    self-contained: they may touch only their own arguments.

    Determinism: H = ln(N) − (1/N)·Σ c·ln(c) is assembled from
    integer-scaled logs (``round(scale·ln(x))`` — the repo-wide idiom), so
    the per-row fold is exact integer arithmetic and the single edge divide
    is the shared exact-ratio helper.  Cross-engine bit-equality holds
    because every ln argument is a small positive integer (run lengths),
    independent of the oracle's own counting strategy.
    """
    from stellar_etl_spark.operators.util import exact_ratio_round6

    cs = F.split(F.col(text_col), "")
    n = F.size(cs)

    # closed run contributes run·round(scale·ln run); ln(0) is guarded.
    # Deliberately libm, NOT fixed_ln_micro: the argument is a SINGLE small
    # integer (a run length), and for all n ≤ 2e7 the value 1000·ln(n) sits
    # ≥ ~30000 ulps away from every rounding half-boundary (exhaustively
    # verified; pinned by TestFixedLnMicro::test_single_integer_libm_margin),
    # so a 1-ulp libm disagreement can never flip the round — and keeping
    # libm avoids nesting the 25-step fixed-point fold inside this per-char
    # aggregate lambda.
    def run_term(run):
        return F.when(run == 0, F.lit(0).cast("long")).otherwise(
            run * F.round(F.log(run.cast("double")) * scale).cast("long")
        )

    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("si"),
    )
    # Σ c·round(scale·ln c) — exact integer, one pass over the sorted chars.
    si = F.aggregate(
        F.array_sort(cs),
        zero,
        lambda acc, c: F.when(
            c == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["si"].alias("si"),
            ),
        ).otherwise(
            F.struct(
                c.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (acc["si"] + run_term(acc["run"])).alias("si"),
            )
        ),
        lambda acc: acc["si"] + run_term(acc["run"]),
    )
    h_num = (
        F.round(F.log(n.cast("double")) * scale).cast("long") * n.cast("long")
        - si
    )
    # Gate on the RAW string length: split('', '') yields [''] (size 1), so a
    # post-split gate would admit empty docs with a sentinel run of '' and
    # report entropy 0 instead of excluding them.
    out = (
        df.where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            n.cast("long").alias("n_chars"),
            h_num.alias("_hn"),
        )
    )
    entropy = exact_ratio_round6(
        F.col("_hn"), F.col("n_chars") * F.lit(scale)
    )
    return out.select(
        id_col,
        "n_chars",
        entropy.alias("entropy"),
        (entropy < F.lit(2.5)).alias("low_entropy"),
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct word
    n-grams that appear in NO other document — high novelty marks original
    content, near-zero novelty marks templated/mirrored text (the dedup
    family's soft sibling: a score, not a drop decision).

    Shape: distinct-shingle explode → one hash aggregate keyed by gram
    (doc-frequency) → gram-keyed equi-join back → per-doc integer sums.
    Linear in shingle volume, no self-join, no window — scales like
    exact dedup.  Novelty is an exact integer ratio (bit-identical across
    engines).
    """
    from stellar_etl_spark.operators.util import (
        exact_ratio_round6,
        fan_out_small,
    )

    ex = (
        fan_out_small(df)
        .select(
            F.col(id_col),
            F.explode(shingles(F.col(text_col), n)).alias("_g"),
        )
    )
    dfreq = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        ex.join(dfreq, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_novel",
        exact_ratio_round6("n_novel", "n_grams").alias("novelty"),
    )


def source_token_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    scale: int = 1000,
) -> DataFrame:
    """KL divergence of each group's unigram distribution from the corpus
    distribution — the standard domain-shift / mixture-audit signal (a
    source whose KL spikes is drifting away from the training mixture).

    KL(p_s ‖ q) = Σ_t (c_st/T_s)·ln(c_st·T / (T_s·c_t)), all counts exact
    integers.  Per-term logs are integer-scaled once (round(scale·ln·)), so
    the per-group sum is exact; corpus totals ride in as one broadcast row.
    Bound: |Σ c_st·lw| ≤ T_s·scale·max|ln ratio| — with scale=1000 the
    exact-ratio helper's 2^53 headroom holds to ~10^9 tokens per group;
    beyond that, lower the scale (it is a determinism knob, not accuracy).

    Shape: explode → two hash aggregates (group×token, token) → token
    equi-join → group aggregate.  One shuffle keyed by token; never by row.
    """
    from stellar_etl_spark.operators.util import (
        exact_ratio_round6,
        fan_out_small,
    )

    toks = fan_out_small(df).select(
        F.col(group_col).alias("_grp"),
        F.explode(tokenize_words(F.col(text_col))).alias("_t"),
    )
    gt = toks.groupBy("_grp", "_t").agg(F.count(F.lit(1)).alias("_cst"))
    ct = gt.groupBy("_t").agg(F.sum("_cst").alias("_ct"))
    gtot = gt.groupBy("_grp").agg(F.sum("_cst").alias("_ts"))
    tot = ct.agg(F.sum("_ct").alias("_tt"))
    terms = (
        gt.join(ct, "_t")
        .join(F.broadcast(gtot), "_grp")
        .crossJoin(F.broadcast(tot))
        .select(
            "_grp",
            "_cst",
            "_ts",
            (
                fixed_ln_micro("_cst", "_ts", scale)
                + fixed_ln_micro("_tt", "_ct", scale)
            ).alias("_lw"),
        )
    )
    agg = terms.groupBy(F.col("_grp").alias(group_col)).agg(
        F.max("_ts").alias("n_tokens"),
        F.sum(F.col("_cst") * F.col("_lw")).alias("_kl_num"),
    )
    return agg.select(
        group_col,
        "n_tokens",
        exact_ratio_round6(
            F.col("_kl_num"), F.col("n_tokens") * F.lit(scale)
        ).alias("kl_from_corpus"),
    )


def hashed_ngram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """FastText-style hashed bag-of-ngrams linear classifier inference —
    the model-based quality-filter stage (CCNet/GPT-3 style): each word
    unigram and bigram hashes into one of ``buckets`` feature slots, the
    doc's score is the mean slot weight, and docs with score ≤ 0 drop.

    The weight table is a deterministic integer function of the slot
    (Knuth multiplicative scramble, scaled ×10⁶) standing in for trained
    parameters — a real pipeline broadcasts its learned vector; the plan
    shape (explode → per-feature weight lookup as a pure column expression
    → per-doc integer sum) is identical, and at 100 TB it is one map-side
    projection plus a doc-keyed hash aggregate.  No UDF: the feature hash
    is the first 8 hex chars of md5 (both engines agree byte-for-byte),
    and all arithmetic before the single edge divide is exact integer.
    """
    from stellar_etl_spark.operators.util import (
        exact_ratio_round6,
        fan_out_small,
    )

    toks = fan_out_small(df).select(
        F.col(id_col), tokenize_words(F.col(text_col)).alias("_words")
    )
    feats = toks.select(
        F.col(id_col),
        F.explode(
            F.concat(F.col("_words"), _adjacent_bigrams(F.col("_words")))
        ).alias("_g"),
    )
    slot = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("long")
        % buckets
    )
    wt = (slot * F.lit(2654435761) + F.lit(12345)) % F.lit(2000001) - F.lit(
        1000000
    )
    agg = feats.select(F.col(id_col), wt.alias("_w")).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_features"),
        F.sum("_w").alias("_s"),
    )
    score = exact_ratio_round6(
        F.col("_s"), F.col("n_features") * F.lit(1_000_000)
    )
    return agg.select(
        id_col,
        "n_features",
        score.alias("score"),
        (score > 0).alias("keep"),
    )


def bigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1000,
) -> DataFrame:
    """Bigram language-model score per document (add-one smoothing) — the
    KenLM-style upgrade of :func:`unigram_logprob_score`: train bigram
    conditionals on the corpus itself, then score each doc by its mean
    log P(w₂|w₁).  Gibberish and shuffled text score far below natural
    prose even when their unigram profile is normal.

    Shape: bigram explode → two hash aggregates (bigram, unigram counts)
    → bigram-keyed equi-join back → doc aggregate; the vocabulary size
    rides in as one broadcast row.  Per-pair logs are integer-scaled once
    (the repo-wide determinism idiom), so every aggregate is exact integer
    under any partitioning.
    """
    from stellar_etl_spark.operators.util import (
        exact_ratio_round6,
        fan_out_small,
    )

    toks = fan_out_small(df).select(
        F.col(id_col), tokenize_words(F.col(text_col)).alias("_words")
    )
    uni = toks.select(F.col(id_col), F.explode("_words").alias("_t"))
    bi = toks.select(
        F.col(id_col),
        F.explode(_adjacent_bigrams(F.col("_words"))).alias("_b"),
    )
    c1 = uni.groupBy("_t").agg(F.count(F.lit(1)).alias("_c1"))
    c12 = bi.groupBy("_b").agg(F.count(F.lit(1)).alias("_c12"))
    v = c1.agg(F.count(F.lit(1)).alias("_v"))
    lp = (
        c12.withColumn("_t", F.split(F.col("_b"), " ").getItem(0))
        .join(c1, "_t")
        .crossJoin(F.broadcast(v))
        .select(
            "_b",
            fixed_ln_micro("_c12 + 1", "_c1 + _v", scale).alias("_lp"),
        )
    )
    agg = (
        bi.join(lp, "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("_lp").alias("_si"),
        )
    )
    return agg.select(
        id_col,
        "n_bigrams",
        exact_ratio_round6(
            F.col("_si"), F.col("n_bigrams") * F.lit(scale)
        ).alias("avg_logprob"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual information,
    the classic phrase-detection signal (word2vec phrase pass): PMI =
    ln(c_ab·N / (c_a·c_b)) over the corpus bigram stream, with first/second
    marginals taken FROM the same stream so the probabilities are a proper
    joint.  ``min_count`` suppresses the low-frequency PMI explosion.

    Shape: one bigram explode + one hash agg over the corpus; both
    marginals are re-aggregations of the (already vocabulary-sized)
    bigram-count table, not of the corpus; scoring is a pure column
    program; the final cut is a total-order TakeOrdered (no global sort).
    Determinism: one ln of an exact-long ratio, integer-scaled (repo
    idiom).  Products stay < 2^53 while c_ab·N < 9e15 — beyond that,
    pre-divide to per-million rates before the log.
    """
    from stellar_etl_spark.operators.util import fan_out_small

    toks = fan_out_small(df).select(
        tokenize_words(F.col(text_col)).alias("_words")
    )
    bi = toks.select(
        F.explode(_adjacent_bigrams(F.col("_words"))).alias("_b")
    )
    c12 = (
        bi.groupBy("_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .select(
            F.split(F.col("_b"), " ").getItem(0).alias("w1"),
            F.split(F.col("_b"), " ").getItem(1).alias("w2"),
            "c_ab",
        )
    )
    n = c12.agg(F.sum("c_ab").cast("long").alias("_n"))
    c1 = c12.groupBy("w1").agg(F.sum("c_ab").cast("long").alias("c_w1"))
    c2 = c12.groupBy("w2").agg(F.sum("c_ab").cast("long").alias("c_w2"))
    scored = (
        c12.where(F.col("c_ab") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_w1",
            "c_w2",
            (
                fixed_ln_micro("c_ab", "c_w1", scale)
                + fixed_ln_micro("_n", "c_w2", scale)
            ).alias("pmi_scaled"),
        )
    )
    return scored.orderBy(
        F.col("pmi_scaled").desc(), "w1", "w2"
    ).limit(k)


def winnowing_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """MOSS-style winnowing (Schleimer et al., SIGMOD'03): hash every word
    ``k``-gram, then keep the minimum hash of each sliding window of ``w``
    consecutive k-gram hashes — the guaranteed-overlap fingerprint set used
    for plagiarism / near-copy detection at corpus scale.

    Shape: ONE shuffle (posexplode on the doc key), then two window passes
    over the same (doc, pos) sort — k-gram assembly via ``lead`` and the
    sliding min via ``rowsBetween(0, w-1)`` — so Spark sorts each doc
    partition once and reuses it.  No higher-order-function lambdas touch an
    outer array (the HOF-inlining pitfall documented on char_entropy_stats),
    and every per-doc window is bounded by that doc's token count.  Docs
    shorter than ``k`` words keep a row with an empty fingerprint set."""
    from pyspark.sql.window import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col), F.posexplode(words).alias("pos", "_w")
    )
    order = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.col("_w"),
        *[F.lead("_w", i).over(order) for i in range(1, k)],
    )
    grams = (
        base.withColumn("_nw", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        .withColumn("_g", gram)
        .where(F.col("pos") <= F.col("_nw") - k)
        .withColumn(
            "_h",
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("long"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        grams.withColumn("_m", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        .withColumn("_wmin", F.min("_h").over(win))
        .where(F.col("pos") <= F.greatest(F.col("_m") - w, F.lit(0)))
        .groupBy(id_col)
        .agg(
            F.max("_m").cast("int").alias("n_kgrams"),
            F.size(F.array_distinct(F.collect_list("_wmin"))).alias("n_selected"),
            F.min("_wmin").alias("min_fp"),
            F.max("_wmin").alias("max_fp"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(sel, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_kgrams", F.lit(0)).alias("n_kgrams"),
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
            "min_fp",
            "max_fp",
        )
    )
