#!/usr/bin/env python
"""Hot-bucket census ACTIVATION experiment (VERDICT r11 #6).

The duph corpora never crossed HOT_BUCKET_THRESHOLD at real pair mass
(dup-heavy group sizes are scale-constant), so q47b's salt grid always
ran as insurance and the census-on path was only exercised on a planted
synthetic bucket. The --boiler-heavy corpora
(gen_scaled_testdata.py MULT DST --zipf --boiler-heavy) plant the
opposite regime — a few GIANT near-identical template groups whose
membership grows linearly with the corpus — which floods the MinHash
band buckets with thousand-member keys. This script measures, per
corpus:

  - the band-bucket census on q47's DEFAULT banding (16 perm / 8x2):
    buckets over HOT_BUCKET_THRESHOLD, max bucket size, and the share of
    total bucket pair mass (sum C(k,2)) the hot set carries — "census
    active" means that share is material, not zero;
  - q47 (plain banded join) vs q47b (salted grid) wall clock, worst
    MATERIAL straggler ratio, rows, and pair-fingerprint EQUALITY — the
    grid must change the schedule, never the answer;
  - planted-group recall: boiler group assignment is md5-seeded from
    doc_id alone, so the within-group truth is recomputed closed-form
    here and decomposed exactly as the duph harness does.

Usage: python scripts/boiler_census_experiment.py \
         [--sfs build/testdata/boiler1,...] [--out SCALE_r12_boiler.json]
         [--repeats 2]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.session import get_spark, prep  # noqa: E402
from parquet_modular_encryption_spark.sources.datasets import load  # noqa: E402


def fingerprint(df) -> tuple[int, int]:
    """Same convention as grouped_registered_experiment / the sf10 reduce."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("fp"),
    ).collect()[0]
    return int(agg["n"]), int(agg["fp"] if agg["fp"] is not None else 0)


def _boiler_group_rows(spark, sf_dir: str) -> list[tuple[int, int]]:
    """(doc_id, group) for every boiler-template document — the exact
    seeded assignment gen_scaled_testdata._boiler_heavy_documents makes,
    recomputed from doc ids alone (same md5 device as _dup_group_rows)."""
    import numpy as np

    from gen_scaled_testdata import BOILER_PCT, N_BOILER_GROUPS

    weights = 1.0 / np.arange(1, N_BOILER_GROUPS + 1)
    wcum = np.cumsum(weights / weights.sum())

    def frac(tag: str) -> float:
        return int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big") / 2**64

    ids = [
        r.doc_id
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    out = []
    for gid in ids:
        if frac(f"boilh:{gid}") * 100 >= BOILER_PCT:
            continue
        out.append((gid, int(np.searchsorted(wcum, frac(f"boilg:{gid}")))))
    return out


def main() -> int:
    args = sys.argv[1:]
    out_path = os.path.join(REPO, "SCALE_r12_boiler.json")
    sfs = [os.path.join(REPO, "build", "testdata", "boiler1")]
    repeats = 2
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--sfs" in args:
        sfs = args[args.index("--sfs") + 1].split(",")
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])

    from scale_experiment import _time_with_straggler  # noqa: E402

    from parquet_modular_encryption_spark.pipeline import dedup as D  # noqa: E402

    spark = get_spark(
        "pme-boiler-census", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    prep(spark)

    report: dict = {
        "hot_bucket_threshold": D.HOT_BUCKET_THRESHOLD,
        "pair_grid": D.PAIR_GRID,
        "banding": f"{len(D.MINHASH_PERMS)} perms / {D.N_BANDS}x{D.ROWS_PER_BAND}",
        "scales": {},
    }
    if "--merge" in args and os.path.exists(out_path):
        with open(out_path) as fh:
            report = json.load(fh)

    for sf_dir in sfs:
        key = os.path.basename(sf_dir.rstrip("/"))
        out = report["scales"].setdefault(key, {"sf_dir": sf_dir})
        docs = load(spark, sf_dir, "documents")
        out["n_docs"] = docs.count()

        # --- band-bucket census on the DEFAULT banding ---
        if "census" not in out:
            _, bands = D.minhash_bands(docs)
            sizes = bands.groupBy("band_id", "band_key").agg(
                F.count(F.lit(1)).alias("k")
            )
            pair_mass = F.sum(F.expr("k * (k - 1) DIV 2"))
            total = sizes.agg(
                F.count(F.lit(1)).alias("buckets"), pair_mass.alias("mass")
            ).collect()[0]
            hot = (
                sizes.filter(F.col("k") > D.HOT_BUCKET_THRESHOLD)
                .agg(
                    F.count(F.lit(1)).alias("buckets"),
                    F.max("k").alias("max_k"),
                    pair_mass.alias("mass"),
                )
                .collect()[0]
            )
            out["census"] = {
                "buckets_total": int(total["buckets"]),
                "pair_mass_total": int(total["mass"] or 0),
                "hot_buckets": int(hot["buckets"]),
                "hot_max_bucket": int(hot["max_k"] or 0),
                "hot_pair_mass": int(hot["mass"] or 0),
                "hot_mass_share": round(
                    (hot["mass"] or 0) / max(total["mass"] or 0, 1), 4
                ),
                "census_active": bool(
                    hot["buckets"] and (hot["mass"] or 0) > 0.5 * (total["mass"] or 1)
                ),
            }
            print(f"# {key} census: {out['census']}", flush=True)

        # --- plain vs salted: wall, straggler, fingerprint equality ---
        for name, fn in (
            ("q47_plain", D.q47_minhash_neardup),
            ("q47b_salted", D.q47b_minhash_neardup_salted),
        ):
            if f"{name}_sec" in out:
                continue
            holder: dict = {}

            def run(fn=fn, holder=holder):
                holder["fp"] = fingerprint(fn(spark, sf_dir))

            sec, worst = _time_with_straggler(spark, run, repeats)
            out[f"{name}_sec"] = sec
            out[f"{name}_rows"], out[f"{name}_fingerprint"] = holder["fp"]
            out[f"{name}_straggler"] = worst
            print(f"# {key} {name}: {sec}s rows={holder['fp'][0]} "
                  f"straggler={worst and worst.get('ratio')}", flush=True)
        out["fingerprints_equal"] = (
            out["q47_plain_fingerprint"] == out["q47b_salted_fingerprint"]
            and out["q47_plain_rows"] == out["q47b_salted_rows"]
        )

        # --- planted decomposition: within-group truth vs recovered ---
        if "planted_true_pairs" not in out:
            gm = spark.createDataFrame(
                _boiler_group_rows(spark, sf_dir), "doc_id bigint, grp bigint"
            )
            truth = (
                gm.groupBy("grp")
                .count()
                .agg(F.sum(F.expr("count * (count - 1) DIV 2")).alias("t"),
                     F.max("count").alias("mx"),
                     F.count(F.lit(1)).alias("groups"))
                .collect()[0]
            )
            out["planted_true_pairs"] = int(truth["t"])
            out["planted_groups"] = int(truth["groups"])
            out["planted_max_group"] = int(truth["mx"])
            ga = F.broadcast(gm.selectExpr("doc_id AS doc_a", "grp AS ga"))
            gb = F.broadcast(gm.selectExpr("doc_id AS doc_b", "grp AS gb"))
            planted = (
                D.q47_minhash_neardup(spark, sf_dir)
                .select("doc_a", "doc_b")
                .join(ga, "doc_a")
                .join(gb, "doc_b")
                .filter(F.col("ga") == F.col("gb"))
                .count()
            )
            out["q47_planted_pairs"] = int(planted)
            out["q47_planted_recall"] = round(
                planted / max(out["planted_true_pairs"], 1), 4
            )
            print(f"# {key} planted: true={out['planted_true_pairs']} "
                  f"max_group={out['planted_max_group']} "
                  f"q47_recall={out['q47_planted_recall']}", flush=True)

        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"# wrote {out_path} through {key}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
