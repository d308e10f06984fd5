#!/usr/bin/env python
"""Degenerate-block remedy probe (r14, VERDICT r13 #3).

Plants the block a 100 TB boilerplate corpus WILL contain — 500k rows
sharing one band key (C(k,2) = 1.25e11 pairs, intractable by gridding:
per-row replication to hold any per-cell pair target scales as
k/sqrt(target) no matter how the block is cut) — next to a normal hot
block and cold blocks, and measures the REGISTERED remedy end to end:

  1. warning path retained: the salted join's census decision on the
     unfiltered frame must warn with the per-cell estimate and record
     the clamp (decision only — the 1.25e11-pair join is exactly what
     production must NOT run).
  2. census report: degenerate_block_filter flags the planted block
     with its exact member count; the kept frame drops exactly its
     rows.
  3. capped join: the skew-hardened self-join over the kept frame
     completes with straggler <= 1.5 and the EXACT closed-form pair
     count C(mid,2) + 500*C(10,2) — the q63g execution shape.

Usage: python scripts/degenerate_block_experiment.py
         [--out SCALE_r14_degenerate.json] [--mega 500000] [--mid 20000]
         [--repeats 2]

The kept hot block (--mid, default 20k members = 2e8 pairs) is sized so
the capped join has MATERIAL stages (max task >= 1 s) — a smaller block
finishes in sub-second stages where the dispersion meter only reports
the empty-partition artifact it exists to filter.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_path = os.path.join(REPO, "SCALE_r14_degenerate.json")
    mega, mid, repeats = 500_000, 20_000, 2
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--mega" in args:
        mega = int(args[args.index("--mega") + 1])
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    if "--mid" in args:
        mid = int(args[args.index("--mid") + 1])

    from scale_experiment import _time_with_straggler  # noqa: E402

    from parquet_modular_encryption_spark.pipeline import dedup as D  # noqa: E402

    spark = get_spark(
        "pme-degenerate-block", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )

    cold_blocks, cold_sz = 500, 10
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
            spark.range(20_000_000, 20_000_000 + cold_blocks * cold_sz).select(
                F.col("id").alias("doc_id"),
                F.lit(0).alias("band_id"),
                F.concat(F.lit("c"), ((F.col("id") - 20_000_000) % cold_blocks))
                .alias("band_key"),
            )
        )
        .localCheckpoint(eager=True)
    )
    expected_kept = mid * (mid - 1) // 2 + cold_blocks * (cold_sz * (cold_sz - 1) // 2)
    report: dict = {
        "mega_block": mega,
        "mega_pairs_excluded": mega * (mega - 1) // 2,
        "degenerate_cap": D.DEGENERATE_BLOCK_CAP,
        "expected_kept_pairs": expected_kept,
        "repeats": repeats,
    }

    # 1. warning path retained (decision-time only, join never executed)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        D.banded_pairs_salted(bands)  # lazy: only the census jobs run
    msgs = [str(w.message) for w in caught if "grid ceiling" in str(w.message)]
    report["warning_fired"] = bool(msgs)
    report["warning_excerpt"] = msgs[0][:200] if msgs else None
    report["unfiltered_decision"] = dict(D.LAST_SALTED_GRID)
    print(f"# warning fired: {report['warning_fired']}", flush=True)

    # 2. census + filter
    t0 = time.monotonic()
    kept, dropped = D.degenerate_block_filter(bands)
    drows = [(r.band_id, r.band_key, r.n_members) for r in dropped.collect()]
    report["census_sec"] = round(time.monotonic() - t0, 2)
    report["dropped_blocks"] = drows
    report["filter_exact"] = drows == [(0, "MEGA", mega)]
    print(f"# dropped: {drows} in {report['census_sec']}s", flush=True)

    # 3. capped join over the kept frame
    kept = kept.localCheckpoint(eager=True)
    holder: dict = {}

    def run():
        agg = (
            D.salted_block_self_join(kept, ("band_id", "band_key"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("fp"),
            )
            .collect()[0]
        )
        holder["n"], holder["fp"] = int(agg["n"]), int(agg["fp"])

    sec, worst = _time_with_straggler(spark, run, repeats)
    report["capped_join"] = {
        "sec": sec,
        "rows": holder["n"],
        "fingerprint": holder["fp"],
        "straggler": worst,
        "decision": dict(D.LAST_SALTED_GRID),
    }
    report["count_matches_closed_form"] = holder["n"] == expected_kept
    print(
        f"# capped join: {sec}s rows={holder['n']} (expect {expected_kept}) "
        f"straggler={worst and worst.get('ratio')}",
        flush=True,
    )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"# wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
