"""Stage-level time breakdown for the two 10x super-linear movers
(round-9 verdict item 7): minhash_near_dup and pq_ann_search.

Both are within budget and bucketed, but their 10x cost had no stage
attribution on record.  This probe times nested PREFIXES of each pipeline
against the 10x probe dir (the same replica bench.py uses) so stage cost
falls out by subtraction, and records the candidate-volume counters that
would expose a band-key-level blow-up:

minhash_near_dup (operators/dedup.py near_dup_pairs):
  sig     = shingle + 8-perm MinHash signature build (incl. the eager
            lineage_cut — charged at plan time in the real operator)
  cand    = LSH band explode + self-equi-join on (band_id, band_key) with
            in-join size pruning, pair-distinct
  verify  = exact shingle-set Jaccard on survivors (two id joins)
Counters: banded rows, max band-bucket size, candidate pairs, final pairs.
A blow-up would show as max-bucket or candidate-pair counts growing
super-linearly vs the corpus.

pq_ann_search (operators/similarity.py pq_ann): the ADC path has NO
candidate set (the codebook scores the whole corpus — that is the point of
PQ), so the only possible blow-up is iteration cost.  The probe times
iterations=1 vs 2 vs 3: the delta per extra Lloyd iteration is the training
cost; the remainder is explode/quantize + encode + ADC.

Usage: python tools/profile_10x.py [sf_dir] [probe_dir]
Prints one JSON line per probe; paste the summary into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def profile_minhash(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from stellar_etl_spark.catalog import table
    from stellar_etl_spark.operators.dedup import (
        MINHASH_PRIME,
        _hex15_to_long,
        minhash_from_hashes,
        minhash_lsh_candidates,
        near_dup_pairs,
        shingles,
    )
    from stellar_etl_spark.operators.util import fan_out_small, lineage_cut

    docs = table(spark, sf_dir, "documents")

    def build_sigs():
        with_sh = (
            fan_out_small(docs)
            .select("doc_id", shingles(F.col("text"), 3).alias("shingle_set"))
            .where(F.size("shingle_set") > 0)
            .withColumn(
                "_base_hashes",
                F.transform(
                    F.col("shingle_set"),
                    lambda s: _hex15_to_long(F.md5(s)) % MINHASH_PRIME,
                ),
            )
            .withColumn(
                "minhash_sig", minhash_from_hashes(F.col("_base_hashes"), 8)
            )
            .withColumn("_n_sh", F.size("shingle_set"))
            .drop("_base_hashes")
        )
        return lineage_cut(with_sh, eager=True, reliable=False)

    # stage prefixes (each timed fresh; earlier stages re-run inside later
    # prefixes, so stage cost = prefix delta)
    t0 = time.time()
    with_sh = build_sigs()  # eager cut: the build cost IS this call
    t_sig = round(time.time() - t0, 2)

    cands = minhash_lsh_candidates(
        with_sh, "doc_id", "minhash_sig", 4, 2, size_col="_n_sh", threshold=0.5
    )
    t_cand = _noop(cands)

    t_full_total = _noop(near_dup_pairs(docs, "doc_id", "text", n=3,
                                        num_perm=8, bands=4, rows_per_band=2,
                                        threshold=0.5))

    # candidate-volume counters (band-key blow-up audit)
    banded = with_sh.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws("|", F.lit(b),
                                  *[F.element_at("minhash_sig", b * 2 + r + 1)
                                    for r in range(2)]))
                for b in range(4)
            ])
        ).alias("band_id", "band_key"),
    )
    bucket_stats = (
        banded.groupBy("band_id", "band_key").count()
        .agg(F.count("*").alias("n_buckets"),
             F.max("count").alias("max_bucket"),
             F.sum(F.col("count") * (F.col("count") - 1) / 2)
             .cast("long").alias("raw_pair_budget"))
        .collect()[0]
    )
    n_cands = cands.count()

    return {
        "probe": "minhash_near_dup_10x_stages",
        "sig_build_s": t_sig,
        # t_cand rides on the ALREADY-built eager cut, so it is the LSH
        # band-join stage alone; the full run pays sig + cand + verify
        "candidates_s": t_cand,
        "full_s": t_full_total,
        "verify_s_est": round(max(t_full_total - t_sig - t_cand, 0.0), 2),
        "n_band_buckets": bucket_stats["n_buckets"],
        "max_band_bucket": bucket_stats["max_bucket"],
        "raw_pair_budget": bucket_stats["raw_pair_budget"],
        "candidate_pairs": n_cands,
    }


def profile_pq(spark, sf_dir: str) -> dict:
    from stellar_etl_spark.operators.similarity import pq_ann
    from stellar_etl_spark.queries import emb_table

    emb = emb_table(spark, sf_dir)
    out = {"probe": "pq_ann_10x_stages"}
    for iters in (1, 2, 3):
        # plan-build includes the pts lineage_cut (explode+quantize) —
        # charge it inside the timing like the bench does
        t0 = time.time()
        df = pq_ann(emb, d=64, m=8, k=16, iterations=iters, query_id=0,
                    top=20)
        df.write.format("noop").mode("overwrite").save()
        out[f"iters_{iters}_s"] = round(time.time() - t0, 2)
    out["per_lloyd_iteration_s"] = round(
        out["iters_3_s"] - out["iters_2_s"], 2
    )
    out["explode_encode_adc_s_est"] = round(
        out["iters_2_s"] - 2 * max(out["per_lloyd_iteration_s"], 0.0), 2
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    probe_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_probe_10x"
    from tools.make_scale_probe import build as build_probe

    build_probe(sf_dir, probe_dir, 10)
    os.environ.setdefault("SPARK_GRAFT_CACHE_DERIVED", "1")
    from stellar_etl_spark.session import get_spark

    spark = get_spark("profile-10x", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen once so stage deltas are steady-state
    spark.read.parquet(f"{probe_dir}/documents.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    for fn in (profile_minhash, profile_pq):
        for attempt in range(2):  # first run pays Janino; keep the second
            res = fn(spark, probe_dir)
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
