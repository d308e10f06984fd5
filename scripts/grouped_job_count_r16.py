#!/usr/bin/env python
"""Count Spark jobs launched by one end-to-end run of the grouped twins
(VERDICT r15 #1 done-bar: job count for a grouped run cut >= 2x).

Runs each named query inside its own job group and reports
len(getJobIdsForGroup) for build + one full materializing action.
Usage: python scripts/grouped_job_count_r16.py [--out plans/r16/grouped_job_count.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parquet_modular_encryption_spark.registry import load_all  # noqa: E402
from parquet_modular_encryption_spark.session import get_spark  # noqa: E402

NAMES = [
    "q55c_allpairs_sparse",
    "q55d_allpairs_sparse_grouped",
    "q49c_jaccard_ppjoin",
    "q49e_jaccard_ppjoin_grouped",
    "q49f_jaccard_grouped_encrypted",
]


def main() -> None:
    out_path = os.path.join(REPO, "plans", "r16", "grouped_job_count.json")
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark = get_spark(
        "pme-grouped-jobs", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf=extra_conf,
    )
    sc = spark.sparkContext
    registry = load_all()
    out = {"sf_dir": sf_dir}
    for name in NAMES:
        group = f"jobs-{name}"
        sc.setJobGroup(group, name)
        try:
            df = registry[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
        out[name] = len(sc.statusTracker().getJobIdsForGroup(group))
        print(f"# {name}: {out[name]} jobs", file=sys.stderr)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
