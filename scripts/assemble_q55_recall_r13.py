#!/usr/bin/env python
"""Assemble Q55_RECALL_r13.json (VERDICT r12 #2).

Merges three measurement sources into one artifact:
  - Q55_RECALL_r12.json          — the committed knob_1.0/knob_1.6 planted
                                   series through sf6 (unchanged code paths;
                                   re-counting them would burn ~30 min of
                                   candidate jobs for pinned numbers),
  - build/q55_wide_r13.json      — the NEW wide-config (q55f) rows at
                                   sf0.1/sf1/sf3/sf6/sf12,
  - build/q55_knob10_sf12_r13.json — the q55 DEFAULT (knob 1.0) extended to
                                   sf12 for the same-transition comparison.

Recomputes the candidate-growth exponent series over the merged rows and
stamps per-row provenance so carried-forward numbers are visibly r12's.
"""

from __future__ import annotations

import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORDER = ["sf0.1", "sf1", "sf3", "sf6", "sf12"]


def main() -> int:
    with open(os.path.join(REPO, "Q55_RECALL_r12.json")) as fh:
        r12 = json.load(fh)
    with open(os.path.join(REPO, "build", "q55_wide_r13.json")) as fh:
        wide = json.load(fh)
    with open(os.path.join(REPO, "build", "q55_knob10_sf12_r13.json")) as fh:
        knob12 = json.load(fh)

    out = {
        "threshold": r12["threshold"],
        "provenance": {
            "knob_1.0/knob_1.6 through sf6": "carried from Q55_RECALL_r12.json "
            "(code paths unchanged in r13)",
            "knob_wide_q55f all scales": "measured r13 (build/q55_wide_r13.json)",
            "knob_1.0 sf12": "measured r13 (build/q55_knob10_sf12_r13.json)",
        },
        "planted": {
            "cosines": r12["planted"]["cosines"],
            "per_stratum": r12["planted"]["per_stratum"],
            "sfs": {},
        },
    }
    sfs = out["planted"]["sfs"]
    for sf, row in r12["planted"]["sfs"].items():
        sfs[sf] = dict(row)
    for sf, row in wide["planted"]["sfs"].items():
        base = sfs.setdefault(sf, {"n_vectors": row["n_vectors"]})
        assert base["n_vectors"] == row["n_vectors"], (sf, "corpus drift")
        base["knob_wide_q55f"] = row["knob_wide_q55f"]
    for sf, row in knob12["planted"]["sfs"].items():
        base = sfs.setdefault(sf, {"n_vectors": row["n_vectors"]})
        assert base["n_vectors"] == row["n_vectors"], (sf, "corpus drift")
        base["knob_1.0"] = row["knob_1.0"]

    growth: dict = {}
    ordered = [s for s in ORDER if s in sfs]
    tags = {k for r in sfs.values() for k in r if k.startswith("knob_")}
    for tag in sorted(tags):
        series = [
            (s, sfs[s]["n_vectors"], sfs[s][tag]["candidates"])
            for s in ordered
            if tag in sfs[s]
        ]
        if len(series) < 2:
            continue
        growth[tag] = {
            "scales": [s for s, _, _ in series],
            "n": [n for _, n, _ in series],
            "candidates": [c for _, _, c in series],
            "cand_per_n": [round(c / n, 1) for _, n, c in series],
            "exponents": [
                {
                    "from": a[0],
                    "to": b[0],
                    "exponent": round(math.log(b[2] / a[2]) / math.log(b[1] / a[1]), 3),
                }
                for a, b in zip(series, series[1:])
                if a[2] and b[2]
            ],
        }
    out["planted"]["cand_growth"] = growth

    dst = os.path.join(REPO, "Q55_RECALL_r13.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    for tag, g in growth.items():
        print(tag, g["exponents"])
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
