#!/usr/bin/env python
"""100x-span scale point: the two flagship EXACT similarity joins (q55c
Bayardo all-pairs cosine, q49c PPJoin Jaccard) plus the production
MinHash+LSH path (q47b) at sf10 = 100x the bench corpus, with candidate
counts from the operators' own factored-out stages.

Complements SCALE_r09.json's four-point sf0.1..sf3 curve with a fifth
point one decade further out, for the three operators whose linearity is
the repo's core scale claim. Single run per phase (no min-of-N: at this
size plan-compile noise is <1%), candidate counts exact.

Each phase runs in its OWN process/JVM (`--phase NAME`), merging into the
output JSON: a single long-lived session accumulates every phase's
shuffle files on local disk (they are only reclaimed at session end), and
at sf10 the cumulative spill filled a 250 GB disk — the local[32] analogue
of a cluster's external-shuffle-service retention. Run with no arguments
to drive all phases sequentially via subprocesses.

Usage: python scripts/sf10_experiment.py [--out SF10_r09.json]
Generate the corpus first: python scripts/gen_scaled_testdata.py 100
build/testdata/sf10.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF10 = os.path.join(REPO, "build", "testdata", "sf10")
PHASES = (
    "q47b_candidates",
    "q49c_candidates",
    "q55c_candidates",
    "q55c_allpairs_sparse",
    "q49c_jaccard_ppjoin",
    "q47b_minhash_neardup_salted",
)


def run_phase(phase: str, out_path: str) -> None:
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.registry import load_all
    from parquet_modular_encryption_spark.session import get_spark, prep
    from parquet_modular_encryption_spark.sources.datasets import load

    spark = get_spark(
        "sf10",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        # The exact-join verify stages shuffle the full pair-token
        # incidence (~10^9 rows at sf10); on one node the spill for that
        # lands on a single local disk, where lz4's ratio is the binding
        # constraint (measured ~70 GB, overflowing a 250 GB VM). zstd
        # shuffle compression is the setting a disk-tight deployment
        # runs with — on a cluster the same bytes spread across every
        # executor's disks and either codec is fine.
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    prep(spark)
    res: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            res = json.load(f)
    res["sf_dir"] = SF10

    t0 = time.time()
    if phase.endswith("_candidates"):
        from parquet_modular_encryption_spark.pipeline.dedup import (
            allpairs_candidates,
            banded_pairs_salted,
            minhash_bands,
            ppjoin_candidates,
            shingle_tf,
        )

        docs = load(spark, SF10, "documents")
        res["n_docs"] = docs.count()
        t0 = time.time()
        if phase == "q47b_candidates":
            _, bands = minhash_bands(docs)
            res["q47b_band_candidates_distinct"] = (
                banded_pairs_salted(bands).distinct().count()
            )
        elif phase == "q49c_candidates":
            _toks, cand = ppjoin_candidates(docs)
            res["q49c_prefix_candidates"] = cand.count()
        else:
            tf = shingle_tf(docs)
            nrm = tf.groupBy("doc_id").agg(
                F.sum(F.col("w") * F.col("w")).alias("n2")
            )
            res["q55c_prefix_candidates"] = allpairs_candidates(tf, nrm).count()
    else:
        # resolve the builder BEFORE resetting t0 so every phase times only
        # the Spark job, never registry import/registration (ADVICE r9 —
        # the candidate phases already reset after docs.count())
        builder = load_all()[phase].builder
        t0 = time.time()
        builder(spark, SF10).write.format("noop").mode("overwrite").save()
    res[f"{phase}_sec"] = round(time.time() - t0, 1)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"{phase}: {res[f'{phase}_sec']}s", flush=True)
    spark.stop()


def main() -> int:
    out_path = "SF10_r09.json"
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            print("usage: sf10_experiment.py [--out FILE] [--phase NAME]", file=sys.stderr)
            return 2
        out_path = sys.argv[i + 1]
    if not os.path.isdir(SF10):
        print(f"{SF10} missing — generate it first", file=sys.stderr)
        return 1

    if "--phase" in sys.argv:
        run_phase(sys.argv[sys.argv.index("--phase") + 1], out_path)
        return 0

    for phase in PHASES:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase,
             "--out", out_path],
        ).returncode
        if rc != 0:
            print(f"phase {phase} failed rc={rc}", file=sys.stderr)
            return rc
    with open(out_path) as f:
        print(f"wrote {out_path}: {json.load(f)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
