#!/usr/bin/env python
"""Scale-up experiment: measure headline + heavy similarity-join queries
at sf0.1 and at the locally generated sf1 (10x) and record, for each
similarity join, the size of its candidate frame at both scales.

This converts the repo's scale-safety *argument* (bounded/banded/
prefix-filtered candidate generation, no hot reducers) into a
*measurement*: candidate counts should grow ~linearly in corpus size and
no query should scale worse than ~O(n log n) in wall-clock.

Usage: python scripts/scale_experiment.py [--out SCALE_r09.json]
       [--sfs /root/testdata/sf0.1,/root/repo/build/testdata/sf1]
Writes one JSON document with per-sf wall-times, candidate counts, and
scale ratios. Generate sf1 first: python scripts/gen_scaled_testdata.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.registry import load_all  # noqa: E402
from parquet_modular_encryption_spark.session import get_spark, prep  # noqa: E402
from parquet_modular_encryption_spark.sources.datasets import load  # noqa: E402

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

HEAVY = [
    "q55c_allpairs_sparse",
    "q49c_jaccard_ppjoin",
    "q45c_dup_substring_spans",
    "q47b_minhash_neardup_salted",
]


def _time(fn, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def candidate_counts(spark, sf_dir: str) -> dict:
    """Candidate-frame sizes for the four heavy joins, computed from the
    SAME internal stages the registered operators use (minhash_bands /
    ppjoin_candidates / allpairs_candidates / dup_gram_hits), plus the
    corpus denominators needed to judge linearity."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        allpairs_candidates,
        banded_pairs_salted,
        minhash_bands,
        ppjoin_candidates,
        shingle_tf,
    )
    from parquet_modular_encryption_spark.pipeline.textops import (
        dup_gram_hits,
        dup_grams,
    )

    prep(spark)
    docs = load(spark, sf_dir, "documents")
    out: dict[str, int] = {"n_docs": docs.count()}

    # q47b: LSH band-bucket candidates (pre- and post-distinct)
    _, bands = minhash_bands(docs)
    raw = banded_pairs_salted(bands)
    out["q47b_band_candidates_raw"] = raw.count()
    out["q47b_band_candidates_distinct"] = raw.distinct().count()

    # q49c: PPJoin prefix+length filtered candidates
    toks, cand = ppjoin_candidates(docs)
    out["q49c_shingle_postings"] = toks.count()
    out["q49c_prefix_candidates"] = cand.count()

    # q55c: Bayardo prefix-filtered candidates
    tf = shingle_tf(docs)
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    out["q55c_tf_rows"] = tf.count()
    out["q55c_prefix_candidates"] = allpairs_candidates(tf, nrm).count()

    # q45c: duplicated-gram positions (the operator's linear frame)
    grams = dup_grams(docs)
    out["q45c_gram_rows"] = grams.count()
    out["q45c_dup_gram_hits"] = dup_gram_hits(grams).count()
    return out


def main() -> int:
    args = sys.argv[1:]
    out_path = os.path.join(REPO, "SCALE_r09.json")
    sfs = ["/root/testdata/sf0.1", os.path.join(REPO, "build", "testdata", "sf1")]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
    if "--sfs" in args:
        i = args.index("--sfs")
        sfs = args[i + 1].split(",")
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))

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
    spark = get_spark("pme-scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf=extra_conf)
    registry = load_all()

    # warm-up (JIT, parquet reader, shuffle machinery)
    spark.read.parquet(f"{sfs[0]}/lineitem.parquet").limit(10_000).groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    report: dict = {"repeats": repeats, "scales": {}}
    for sf_dir in sfs:
        label = os.path.basename(sf_dir.rstrip("/"))
        entry: dict = {"dir": sf_dir, "lineitem_rows": spark.read.parquet(
            f"{sf_dir}/lineitem.parquet").count()}
        times: dict[str, float] = {}
        for name in HEADLINE + HEAVY:
            q = registry[name]
            times[name] = _time(
                lambda q=q: q.builder(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save(),
                repeats,
            )
            print(f"# {label} {name}: {times[name]:.3f}s", file=sys.stderr)
        entry["times"] = times
        entry["headline_total"] = round(sum(times[n] for n in HEADLINE), 3)
        entry["heavy_total"] = round(sum(times[n] for n in HEAVY), 3)
        t0 = time.perf_counter()
        entry["candidates"] = candidate_counts(spark, sf_dir)
        entry["candidate_count_sec"] = round(time.perf_counter() - t0, 3)
        print(f"# {label} candidates: {entry['candidates']}", file=sys.stderr)
        report["scales"][label] = entry

    labels = list(report["scales"])
    if len(labels) >= 2:
        # ratios of every later point vs the FIRST (baseline) point —
        # with >= 3 points the per-step ratios distinguish O(n) from
        # O(n log n) where a single 10x step cannot
        a = report["scales"][labels[0]]
        report["scale_ratios"] = {}
        for lbl in labels[1:]:
            b = report["scales"][lbl]
            report["scale_ratios"][f"{labels[0]}->{lbl}"] = {
                "data_growth": round(
                    b["candidates"]["n_docs"] / a["candidates"]["n_docs"], 2
                ),
                "headline_total": round(
                    b["headline_total"] / a["headline_total"], 2
                ),
                "heavy_total": round(b["heavy_total"] / a["heavy_total"], 2),
                "times": {
                    n: round(b["times"][n] / max(a["times"][n], 1e-3), 2)
                    for n in HEADLINE + HEAVY
                },
                "candidates": {
                    k: round(b["candidates"][k] / max(a["candidates"][k], 1), 2)
                    for k in a["candidates"]
                },
            }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"out": out_path, **report.get("scale_ratios", {})}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
