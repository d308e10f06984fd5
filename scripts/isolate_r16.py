#!/usr/bin/env python
"""Isolated min-of-N timing for named queries (guide §1.4: noop sink),
one session, job-description labelled. Usage:
  python scripts/isolate_r16.py q55d_allpairs_sparse_grouped q49e_... [...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ISO_REPEATS (3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_modular_encryption_spark.registry import load_all  # noqa: E402
from parquet_modular_encryption_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_ISO_REPEATS", "3"))
    extra_conf = {}
    try:
        from parquet_modular_encryption_spark.sources.encrypted_native import (
            build_jar,
            native_session_conf,
        )

        build_jar()
        extra_conf = native_session_conf()
    except Exception as exc:  # noqa: BLE001
        print(f"# native PME jar unavailable: {exc}", file=sys.stderr)
    spark = get_spark("pme-isolate-r16", cores=cpus, extra_conf=extra_conf)
    registry = load_all()
    # Warm the JVM like bench.py does, plus one throwaway run of the
    # FIRST named query: isolated min-of-3 otherwise charges the first
    # query the whole codegen/parquet/shuffle warm-up (measured: q55d
    # rep1 20.6 s vs warm 7.4 s in one session).
    from pyspark.sql import functions as F

    try:
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .limit(50_000)
            .groupBy("l_returnflag")
            .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)")), F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        if names:
            registry[names[0]].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    except Exception as exc:  # noqa: BLE001
        print(f"# warm-up failed (continuing): {exc}", file=sys.stderr)
    out = {}
    for name in names:
        q = registry[name]
        times = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"iso {name} rep{i}")
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"raw": times, "min": min(times)}
        print(f"# {name}: min {min(times)} raw {times}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
