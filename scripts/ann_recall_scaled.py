#!/usr/bin/env python
"""ANN recall at scaled embedding corpora (VERDICT r11 #7, optional).

q54g's recall report existed only at sf0.1; this gives the IVF/PQ
operating points the measured-recall treatment q47/q55 have: for each
scale, recall@K of every registered ANN variant against the exact kNN,
with the IVF probe knob swept (recall-vs-nprobe curve), plus wall
seconds per variant. Embeddings in the duph corpora are identical to
the tiled sf1/sf3 corpora (the per-copy vector roll is independent of
the document modes), so they serve as the 10x/30x scales.

Usage: python scripts/ann_recall_scaled.py [--out Q54_RECALL_r12.json]
         [--sfs name=dir,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from parquet_modular_encryption_spark.session import get_spark, prep  # noqa: E402

NPROBES = (1, 2, 3, 5, 8)


def main() -> int:
    import parquet_modular_encryption_spark.pipeline.similarity as S

    args = sys.argv[1:]
    out_path = os.path.join(REPO, "Q54_RECALL_r13.json")
    bt = os.path.join(REPO, "build", "testdata")
    sfs = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", f"{bt}/duph1"),
        ("sf3", f"{bt}/duph3"),
    ]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--sfs" in args:
        sfs = [tuple(x.split("=", 1)) for x in args[args.index("--sfs") + 1].split(",")]

    spark = get_spark(
        "pme-ann-recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    prep(spark)

    report: dict = {
        "k": S.ANN_EVAL_K,
        "n_queries": S.N_QUERIES,
        "nprobe_sweep": list(NPROBES),
        "registered_nprobe": S.IVF_NPROBE,
        "scales": {},
    }

    for name, sf_dir in sfs:
        if not os.path.isdir(sf_dir):
            print(f"# {name}: {sf_dir} missing, skipping", flush=True)
            continue
        out: dict = {"sf_dir": sf_dir}
        from parquet_modular_encryption_spark.sources.datasets import load

        out["n_vectors"] = load(spark, sf_dir, "embeddings").count()

        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.q50_knn_bruteforce(spark, sf_dir)
            .filter(F.col("rank") <= S.ANN_EVAL_K)
            .select("query_id", "neighbor_id")
            .collect()
        }
        out["n_exact"] = len(exact)

        def recall(df, cols=("query_id", "neighbor_id")) -> float:
            got = {(r[0], r[1]) for r in df.select(*cols).collect()}
            return round(len(exact & got) / len(exact), 4)

        variants: list[tuple[str, object]] = [
            # r13: q54's registered default IS the multiprobe point now;
            # the old single-bucket point is the q54h budget sibling.
            ("lsh_q54_default", lambda: S.q54_ann_lsh_search(spark, sf_dir)),
            ("multiprobe_q54b", lambda: S.q54b_ann_multiprobe(spark, sf_dir)),
            ("lsh_budget_q54h", lambda: S.q54h_ann_lsh_budget(spark, sf_dir)),
            ("pq_rerank_q54c", lambda: S.q54c_ann_quantized(spark, sf_dir)),
            ("ivfpq_q54f", lambda: S.q54f_ann_ivfpq(spark, sf_dir)),
            ("ivf_budget_q54i", lambda: S.q54i_ann_ivf_budget(spark, sf_dir)),
        ] + [
            (f"ivf_nprobe{p}", lambda p=p: S._ivf_search(spark, sf_dir, p))
            for p in NPROBES
        ]
        for vname, fn in variants:
            t0 = time.monotonic()
            try:
                r = recall(fn())
            except Exception as exc:  # record, don't abort the sweep
                out[vname] = {"error": str(exc)[:200]}
                print(f"# {name} {vname}: ERROR {exc}", flush=True)
                continue
            out[vname] = {"recall": r, "sec": round(time.monotonic() - t0, 1)}
            print(f"# {name} {vname}: recall={r} ({out[vname]['sec']}s)", flush=True)

        out["ivf_recall_vs_nprobe"] = {
            str(p): out.get(f"ivf_nprobe{p}", {}).get("recall") for p in NPROBES
        }
        report["scales"][name] = out
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"# wrote {out_path} through {name}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
