#!/usr/bin/env python
"""Boiler3 grouped-twin re-measurement (r14, VERDICT r13 #2).

r13 measured q55d's verify chunks straggling at 3.15 (23.9 s max task
vs 7.6 s median) on boiler3 — the giant template groups concentrate one
doc_a's pair fan-out on single reducers inside each chunk. r14 salts
the verify stage's doc_a fan-out (dedup.salted_verify_fanout, applied
on the grouped path). This probe re-runs ONLY the grouped twins
(q49e/q55d) at boiler3 with >= 2 repeats and checks their fingerprints
against the r13 monolith anchors (SCALE_r13_boiler_grouped.json) — the
monoliths themselves are unchanged code and cost 768 s to re-anchor.

Usage: python scripts/boiler_grouped_r14.py [--out SCALE_r14_boiler_grouped.json]
         [--sf build/testdata/boiler3] [--repeats 2]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_path = os.path.join(REPO, "SCALE_r14_boiler_grouped.json")
    sf_rel, repeats = "build/testdata/boiler3", 2
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--sf" in args:
        sf_rel = args[args.index("--sf") + 1]
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    sf_dir = sf_rel if os.path.isabs(sf_rel) else os.path.join(REPO, sf_rel)

    from scale_experiment import _time_with_straggler  # noqa: E402

    from parquet_modular_encryption_spark.pipeline import dedup as D  # noqa: E402
    from parquet_modular_encryption_spark.registry import load_all  # noqa: E402

    anchors = json.load(open(os.path.join(REPO, "SCALE_r13_boiler_grouped.json")))
    scale_key = os.path.basename(sf_dir)
    anchor = anchors["scales"].get(scale_key, {})

    spark = get_spark(
        "pme-boiler-grouped-r14", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    qs = load_all()
    report: dict = {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "r13_anchor_file": "SCALE_r13_boiler_grouped.json",
        "runs": {},
    }
    for name, mono in (
        ("q49e_jaccard_ppjoin_grouped", "q49c"),
        ("q55d_allpairs_sparse_grouped", "q55c"),
    ):
        holder: dict = {}

        def run(name=name, holder=holder):
            agg = (
                qs[name]
                .builder(spark, sf_dir)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("fp"),
                )
                .collect()[0]
            )
            holder["n"], holder["fp"] = int(agg["n"]), int(agg["fp"])

        sec, worst = _time_with_straggler(spark, run, repeats)
        a_fp = anchor.get(f"{mono}_fingerprint")
        a_rows = anchor.get(f"{mono}_rows")
        row = {
            "sec": sec,
            "rows": holder["n"],
            "fingerprint": holder["fp"],
            "straggler": worst,
            "sizing": dict(D.LAST_GROUPED_SIZING),
            "anchor_fingerprint": a_fp,
            "anchor_rows": a_rows,
            "fingerprint_equal": holder["fp"] == a_fp and holder["n"] == a_rows,
            "r13_grouped_sec": anchor.get(f"{name.split('_')[0]}_grouped_sec"),
            "r13_straggler_ratio": (anchor.get(f"{name.split('_')[0]}_straggler") or {}).get(
                "ratio"
            ),
        }
        report["runs"][name] = row
        print(
            f"# {name}: {sec}s rows={holder['n']} equal={row['fingerprint_equal']} "
            f"straggler={worst and worst.get('ratio')} "
            f"(r13: {row['r13_grouped_sec']}s @ {row['r13_straggler_ratio']})",
            flush=True,
        )
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
    print(f"# wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
