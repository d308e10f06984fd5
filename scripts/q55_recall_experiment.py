#!/usr/bin/env python
"""Measure the q55 band-widening linearity knob: candidate growth vs
qualifying-pair recall, per corpus scale and per knob setting.

The r9 scale experiment showed q55's widened-band candidate frame grows
~n^1.36 (the measured per-extra-bit pruning on this corpus is ~0.64, not
the idealized 1/2), and the constant block documents the remedy — ~1.6
extra bits per corpus doubling buys strict linearity at the cost of
mid-cosine recall. This script converts that documented trade into a
measurement: for each scale (sf0.1, sf1 = 10x, sf3 = 30x) and each knob
setting (per_doubling = 1.0, the registered operator; 1.6, the strict-
linearity target), it records

  - x: the extra band bits the ladder picks,
  - candidates: the size of the band-bucket self-join frame (the EXACT
    frame the registered operator joins — q55_corpus_bands /
    q55_corpus_candidates are the operator's own factored-out stages),
  - exact qualifying pairs (cosine >= NEARDUP_COSINE), computed by
    blocked numpy brute force — the ground truth no banded method sees,
  - recall: fraction of exact qualifying pairs that share >= 1 band
    bucket (checked driver-side from the collected per-vector band keys,
    so the measurement uses precisely the product's keys), overall and
    stratified by cosine bucket ([t, t+0.05), ...).

Usage: python scripts/q55_recall_experiment.py [--out Q55_RECALL_r09.json]
Generate the scaled corpora first (scripts/gen_scaled_testdata.py 10/30).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from parquet_modular_encryption_spark.pipeline.similarity import (  # noqa: E402
    NEARDUP_COSINE,
    q55_corpus_bands,
    q55_corpus_candidates,
    q55_extra_band_bits,
)
from parquet_modular_encryption_spark.session import get_spark, prep  # noqa: E402
from parquet_modular_encryption_spark.sources.datasets import load  # noqa: E402

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, "build", "testdata", "sf1")),
    ("sf3", os.path.join(REPO, "build", "testdata", "sf3")),
]
KNOBS = (1.0, 1.6)
BLOCK = 4096
COS_STRATA = [0.35, 0.40, 0.45, 0.50, 1.01]


def exact_pairs(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(pairs[N,2] vec_ids with a < b, cosine[N]) for all pairs with
    cosine >= NEARDUP_COSINE — blocked brute force, float64."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    out_pairs, out_cos = [], []
    n = m.shape[0]
    for s in range(0, n, BLOCK):
        # Columns j < s can only form lower-triangle pairs with this
        # block's rows — skip them up front (halves the dominant
        # O(n^2 d) cost) and keep only the strict upper triangle.
        g = m[s : s + BLOCK] @ m[s:].T  # (block, n - s); col j = s + bj
        bi, bj = np.nonzero(g >= NEARDUP_COSINE)
        keep = bi < bj  # global (s + bi) < (s + bj)
        bi, bj = bi[keep], bj[keep]
        out_pairs.append(np.stack([ids[s + bi], ids[s + bj]], axis=1))
        out_cos.append(g[bi, bj])
    return np.concatenate(out_pairs), np.concatenate(out_cos)


def main() -> int:
    out_path = "Q55_RECALL_r09.json"
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            print("usage: q55_recall_experiment.py [--out FILE]", file=sys.stderr)
            return 2
        out_path = sys.argv[i + 1]

    spark = get_spark("q55-recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    prep(spark)
    result: dict = {"threshold": NEARDUP_COSINE, "knobs": list(KNOBS), "sfs": {}}

    for sf_name, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"{sf_name}: {sf_dir} missing, skipping", flush=True)
            continue
        pairs, cos = exact_pairs(sf_dir)
        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        row: dict = {"n_vectors": n, "exact_qualifying_pairs": int(len(pairs))}
        for knob in KNOBS:
            x = q55_extra_band_bits(n, per_doubling=knob)
            _, bands = q55_corpus_bands(emb, per_doubling=knob)
            n_cand = q55_corpus_candidates(bands).count()
            keys: dict[int, dict[int, int]] = {}
            for r in bands.collect():
                keys.setdefault(r.vec_id, {})[r.band_id] = r.band_key
            # A vec_id missing from the bands frame (filtered/null
            # embedding) counts as a MISS rather than aborting the whole
            # multi-scale run with a KeyError (ADVICE r9).
            hits = []
            n_missing = 0
            for a, b in pairs:
                ka, kb = keys.get(int(a)), keys.get(int(b))
                if ka is None or kb is None:
                    n_missing += 1
                    hits.append(False)
                    continue
                hits.append(any(ka[band] == kb.get(band) for band in ka))
            hit = np.array(hits, dtype=bool)
            if n_missing:
                print(f"# {sf_name}: {n_missing} exact-pair vec_ids missing "
                      "from the bands frame (counted as misses)", flush=True)
            strata = {}
            for lo, hi in zip(COS_STRATA, COS_STRATA[1:]):
                mask = (cos >= lo) & (cos < hi)
                strata[f"[{lo:.2f},{hi:.2f})"] = {
                    "pairs": int(mask.sum()),
                    "recall": (float(hit[mask].mean()) if mask.any() else None),
                }
            row[f"knob_{knob}"] = {
                "extra_bits": x,
                "candidates": int(n_cand),
                "recall": float(hit.mean()) if len(pairs) else None,
                "recall_by_cosine": strata,
                **({"missing_band_ids": n_missing} if n_missing else {}),
            }
            print(
                f"{sf_name} knob={knob}: n={n} x={x} cand={n_cand} "
                f"exact={len(pairs)} recall={row[f'knob_{knob}']['recall']}",
                flush=True,
            )
        result["sfs"][sf_name] = row

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
