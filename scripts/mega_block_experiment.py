#!/usr/bin/env python
"""Mega-block probe for the per-block adaptive salted grid (r13,
VERDICT r12 #5).

The r12 grid was capped at 16: a planted >=50k-member block — the
empty/boilerplate-document regime a 100 TB corpus WILL contain — parks
(50k/16)^2 ~ 9.8M pairs on single cells. r13 raises the ceiling to 256
and makes the grid PER-BLOCK (each hot block takes the smallest
power-of-two grid its own census count needs), so the probe here plants
exactly the adversarial frame:

  - one MEGA block of 50,000 rows   (rule -> grid 128),
  - one mid hot block of 3,000 rows (rule -> grid 8: per-block sizing
    must NOT inflate it to the mega block's 128),
  - 500 cold blocks of 10 rows      (plain path).

and measures, for the adaptive grid vs the old uniform cap (grid=16):
wall seconds (min of --repeats), the worst MATERIAL per-stage straggler
ratio, and the pair fingerprint — which must equal the CLOSED FORM
C(50000,2) + C(3000,2) + 500*C(10,2) in count and match bit-for-bit
across grid settings (the grid is physical only).

Usage: python scripts/mega_block_experiment.py [--out SCALE_r13_mega.json]
         [--repeats 2] [--mega 50000]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_path = os.path.join(REPO, "SCALE_r13_mega.json")
    repeats = 2
    mega = 50_000
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    if "--mega" in args:
        mega = int(args[args.index("--mega") + 1])

    from scale_experiment import _time_with_straggler  # noqa: E402

    from parquet_modular_encryption_spark.pipeline import dedup as D  # noqa: E402

    spark = get_spark(
        "pme-mega-block", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )

    mid, cold_blocks, cold_sz = 3_000, 500, 10
    n_cold = cold_blocks * cold_sz
    bands = (
        spark.range(mega).select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("band_id"),
            F.lit("MEGA").alias("band_key"),
        )
        .unionByName(
            spark.range(10_000_000, 10_000_000 + mid).select(
                F.col("id").alias("doc_id"),
                F.lit(0).alias("band_id"),
                F.lit("MID").alias("band_key"),
            )
        )
        .unionByName(
            spark.range(20_000_000, 20_000_000 + n_cold).select(
                F.col("id").alias("doc_id"),
                F.lit(0).alias("band_id"),
                F.concat(F.lit("c"), ((F.col("id") - 20_000_000) % cold_blocks))
                .alias("band_key"),
            )
        )
        .localCheckpoint(eager=True)  # freeze the fixture: both runs read one frame
    )
    expected = (
        mega * (mega - 1) // 2
        + mid * (mid - 1) // 2
        + cold_blocks * (cold_sz * (cold_sz - 1) // 2)
    )

    report: dict = {
        "mega_block": mega,
        "mid_block": mid,
        "cold_blocks": [cold_blocks, cold_sz],
        "expected_pairs": expected,
        "pair_grid_max": D.PAIR_GRID_MAX,
        "repeats": repeats,
        "runs": {},
    }

    def fingerprint(df) -> tuple[int, int]:
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("fp"),
        ).collect()[0]
        return int(agg["n"]), int(agg["fp"] if agg["fp"] is not None else 0)

    for name, grid in (("adaptive_per_block", None), ("uniform_old_cap_16", 16)):
        holder: dict = {}

        def run(grid=grid, holder=holder):
            holder["fp"] = fingerprint(
                D.salted_block_self_join(bands, ("band_id", "band_key"), grid=grid)
            )

        sec, worst = _time_with_straggler(spark, run, repeats)
        row = {
            "sec": sec,
            "rows": holder["fp"][0],
            "fingerprint": holder["fp"][1],
            "straggler": worst,
        }
        if grid is None:
            row["decision"] = dict(D.LAST_SALTED_GRID)
        report["runs"][name] = row
        print(f"# {name}: {sec}s rows={row['rows']} "
              f"straggler={worst and worst.get('ratio')} "
              f"{row.get('decision', '')}", flush=True)

    a, b = report["runs"]["adaptive_per_block"], report["runs"]["uniform_old_cap_16"]
    report["fingerprints_equal"] = (
        a["fingerprint"] == b["fingerprint"] and a["rows"] == b["rows"]
    )
    report["count_matches_closed_form"] = a["rows"] == expected
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"# wrote {out_path}: equal={report['fingerprints_equal']} "
          f"closed_form={report['count_matches_closed_form']}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
