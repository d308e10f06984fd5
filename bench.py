#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a cheap count-style action (the driver's
correctness gate collects full results; here we time plan+execution).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_modular_encryption_spark.registry import load_all
from parquet_modular_encryption_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "q06_forecast_revenue",
    "q11_customer_order_histogram",
    "q20_running_total",
    "q22_topk_per_group",
    "q30_tumbling_window",
    "q32_sessionize",
    "q34_asof_join",
    "q37_derived_stats",
    "q45_fingerprint",
    "q47_minhash_neardup",
    "q48_simhash",
    "q50_knn_bruteforce",
    "q54_ann_lsh_search",
    "q60_encrypted_roundtrip",
    "q62_partition_pruning",
    "q64_pandas_percentile_rank",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pme-bench", cores=cpus)
    registry = load_all()

    # Warm the JVM (whole-stage codegen, parquet reader, shuffle machinery)
    # with a small aggregate so per-query times measure the query, not
    # first-use JIT compilation.
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .limit(50_000)
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)")), F.count(F.lit(1)))
        .write.format("noop").mode("overwrite").save()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry.get(name)
        if q is None:
            continue
        start = time.perf_counter()
        df = q.builder(spark, sf_dir)
        # noop sink materializes every output column (count() would let
        # Catalyst prune the projections and under-report work).
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
