#!/usr/bin/env python
"""Price the verify-salt HOT branch at true mega-fanout (VERDICT r14 #5,
carried through r15 #7): the dormant salting in salted_verify_fanout has
only ever been exercised with VERIFY_SALT_PAIR_TARGET monkeypatched down
in a unit test. This experiment builds a candidate frame whose hottest
doc_a carries MULTIPLE x the REAL 50k-pair target, runs the verify
fan-out both ways (plain pinned join vs salted), and records wall
clock, the engaged salt width, straggler ratio, and row-set equality.

Usage: python scripts/verify_salt_scale_r16.py [--out SCALE_r16.json]

Shape: one hot doc_a (0) with HOT_PAIRS partners, COLD_DOCS cold doc_a's
with a handful of partners each; every doc carries M_POSTINGS posting
rows — so the plain join's output is (HOT_PAIRS + cold pairs) x
M_POSTINGS pair-token rows with the hot doc's share on ONE reducer
unless the salt spreads it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.session import get_spark  # noqa: E402

HOT_PAIRS = 400_000  # 8x the 50k target -> s = 8 salt cells
COLD_DOCS = 20_000
COLD_PAIRS_PER_DOC = 10
M_POSTINGS = 60
REPEATS = 3


def main() -> int:
    out_path = os.path.join(REPO, "SCALE_r16.json")
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark(
        "pme-verify-salt-scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    from parquet_modular_encryption_spark.pipeline import dedup as D
    from parquet_modular_encryption_spark.pipeline.partitioning import pinned

    sc = spark.sparkContext

    # hot doc 0: HOT_PAIRS partners; cold docs 1..COLD_DOCS with
    # COLD_PAIRS_PER_DOC partners each (deterministic ids)
    hot = spark.range(1, HOT_PAIRS + 1).select(
        F.lit(0).cast("bigint").alias("doc_a"), F.col("id").alias("doc_b")
    )
    cold = (
        spark.range(1, COLD_DOCS + 1)
        .select(F.col("id").alias("doc_a"))
        .join(
            spark.range(COLD_PAIRS_PER_DOC).select(F.col("id").alias("j")),
        )
        .select("doc_a", (F.col("doc_a") * 1000 + F.col("j")).alias("doc_b"))
    )
    cand = hot.unionByName(cold).localCheckpoint(eager=True)
    post = (
        spark.range(COLD_DOCS + 1)
        .select(F.col("id").alias("doc_a"))
        .join(spark.range(M_POSTINGS).select(F.col("id").alias("j")))
        .select("doc_a", F.concat(F.lit("t"), F.col("j")).alias("tok"))
        .localCheckpoint(eager=True)
    )

    def fingerprint(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_a, doc_b, tok))").alias("fp"),
        ).first()
        return int(row["n"]), int(row["fp"] or 0)

    def timed(label, df):
        sc.setJobDescription(label)
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        return times

    plain = pinned(cand, "doc_a").join(post, "doc_a")
    salted = D.salted_verify_fanout(cand, post)

    n_plain, fp_plain = fingerprint(plain)
    n_salted, fp_salted = fingerprint(salted)

    t_plain = timed("verify-salt plain", plain)
    t_salted = timed("verify-salt salted", salted)

    report = {
        "hot_pairs": HOT_PAIRS,
        "cold_docs": COLD_DOCS,
        "cold_pairs_per_doc": COLD_PAIRS_PER_DOC,
        "m_postings": M_POSTINGS,
        "verify_salt_pair_target": D.VERIFY_SALT_PAIR_TARGET,
        "expected_salt_cells": -(-HOT_PAIRS // D.VERIFY_SALT_PAIR_TARGET),
        "pair_token_rows": n_plain,
        "rows_equal": n_plain == n_salted,
        "fingerprint_equal": fp_plain == fp_salted,
        "plain_sec": t_plain,
        "salted_sec": t_salted,
        "plain_min": min(t_plain),
        "salted_min": min(t_salted),
        "cpus": sc.defaultParallelism,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
