"""Production entry point: web-corpus curation over a pages table —
quality filters -> corpus line dedup -> exact dedup -> per-domain budget.

    python -m zipfile -c /tmp/gos2_spark.zip gos2_spark
    spark-submit --master <cluster> --py-files /tmp/gos2_spark.zip \
        jobs/curation_job.py \
        --pages /data/pages_parquet --output /data/curated \
        --buckets 64 [--min-tokens 20] [--domain-cap 100000]

Two stages, because the ops have two different parallelism shapes:

* **Stage 1 — filter (per-bucket, resumable)**: URL parsing, token/quality
  gates, and Gopher repetition thresholds are all per-row, so pages are
  split into ``--buckets`` deterministic url-hash buckets (the Iceberg-
  partition stand-in) and each bucket is its own checkpointed job with a
  ``(partition_id, rows_in, rows_out, lineage)`` manifest, exactly like
  jobs/pip_tiling_job.py. Re-running skips validated buckets.

* **Stage 2 — dedup (corpus-wide, one job)**: line-level dedup, exact-text
  dedup and the per-domain cap need corpus-wide shuffles (line-hash /
  text-hash / domain keyed), so bucket checkpoints cannot express them;
  stage 2 runs over all stage-1 survivors at once and writes a single
  manifest with stage-level counts. On failure it restarts from the
  stage-1 output (which is durable), never from the raw scan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="input pages parquet dir")
    p.add_argument("--output", required=True,
                   help="output dir (stage1/ + data/ + _manifests/)")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-dup-line-frac", type=float, default=0.3)
    p.add_argument("--max-top-bigram-frac", type=float, default=0.2)
    p.add_argument("--line-occurrence-cap", type=int, default=4,
                   help="drop lines appearing in more docs than this")
    p.add_argument("--domain-cap", type=int, default=100_000,
                   help="max pages kept per registrable domain")
    p.add_argument("--code-version", default="r2")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gos2_spark.pipeline.dedup import exact_dedup, line_dedup
    from gos2_spark.pipeline.text import repetition_features, token_count
    from gos2_spark.pipeline.web import with_url_parts
    from gos2_spark.spark.aggregates import capped_sample_per_key
    from gos2_spark.spark.checkpoint import CheckpointedRunner, lineage_hash
    from gos2_spark.spark.source import input_fingerprint, read_pages

    spark = SparkSession.builder.appName("gos2_curation").config(
        "spark.sql.execution.arrow.pyspark.enabled", "true"
    ).getOrCreate()

    pages = read_pages(spark, args.pages)
    params = {
        "buckets": args.buckets,
        "min_tokens": args.min_tokens,
        "max_dup_line_frac": args.max_dup_line_frac,
        "max_top_bigram_frac": args.max_top_bigram_frac,
    }
    try:
        fp = input_fingerprint(spark, args.pages)
    except OSError:
        fp = f"path:{args.pages}"
    lineage = lineage_hash(args.code_version, params, fp)

    stage1_dir = os.path.join(args.output, "stage1")
    runner = CheckpointedRunner(stage1_dir, lineage)
    bucket_expr = F.pmod(F.xxhash64(F.col("url")), F.lit(args.buckets))

    def load(pid: str):
        return pages.where(bucket_expr == int(pid))

    def transform(df):
        # per-row gates only — stays in the scan stage, no shuffle
        feats = repetition_features(with_url_parts(df))
        return feats.where(
            (token_count(F.col("text")) >= args.min_tokens)
            & (F.col("dup_line_frac") <= args.max_dup_line_frac)
            & (F.col("top_bigram_frac") <= args.max_top_bigram_frac)
        ).select("url", "domain", "text", "lang")

    t0 = time.time()
    results = runner.run_all([str(b) for b in range(args.buckets)], load, transform)
    s1_done = [r for r in results if not r.skipped]
    s1_wall = time.time() - t0

    # ---- stage 2: corpus-wide dedup + domain budget (one job) ----
    t1 = time.time()
    survivors = spark.read.parquet(os.path.join(stage1_dir, "data"))
    n_in = survivors.count()
    deduped_lines = line_dedup(
        survivors.withColumn("key", F.col("url")),
        key_col="key",
        max_occurrences=args.line_occurrence_cap,
    ).withColumnRenamed("key", "url")
    rejoined = deduped_lines.where(F.length("text") > 0).join(
        survivors.select("url", "domain", "lang"), "url"
    )
    keep_keys = exact_dedup(rejoined, text_col="text", key_col="url").select(
        F.col("keep_id").alias("url")
    )
    unique = rejoined.join(keep_keys, "url")
    capped = capped_sample_per_key(
        unique, ["domain"], args.domain_cap, F.xxhash64(F.col("url")),
        tiebreak_cols=[F.col("url")],
    )
    final_dir = os.path.join(args.output, "data")
    capped.write.mode("overwrite").parquet(final_dir)
    n_out = spark.read.parquet(final_dir).count()
    s2_wall = time.time() - t1

    manifest = {
        "job": "curation",
        "lineage": lineage,
        "buckets": args.buckets,
        "stage1_processed": len(s1_done),
        "stage1_resumed_skips": len(results) - len(s1_done),
        "stage1_rows_in": sum(r.rows_in for r in results),
        "stage1_rows_out": sum(r.rows_out for r in results),
        "stage2_rows_in": n_in,
        "stage2_rows_out": n_out,
        "stage1_wall_sec": round(s1_wall, 3),
        "stage2_wall_sec": round(s2_wall, 3),
        "output": final_dir,
    }
    os.makedirs(os.path.join(args.output, "_manifests"), exist_ok=True)
    with open(os.path.join(args.output, "_manifests", "stage2.json"), "w") as f:
        json.dump(manifest, f)
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
