#!/usr/bin/env python
"""Spot-check one (or more) registered queries against their DuckDB oracle.

Usage: python scripts/check_one.py q63d_incremental_dedup [more...] [--sf DIR]
Same canonicalization as the full sweep (test_oracle_parity._rows_canon);
prints PASS/FAIL per query and a small diff sample on mismatch.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

from parquet_modular_encryption_spark.registry import load_all  # noqa: E402
from parquet_modular_encryption_spark.session import get_spark  # noqa: E402
from parquet_modular_encryption_spark.sources.datasets import TABLES  # noqa: E402
from test_oracle_parity import _rows_canon  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    registry = load_all()
    spark = get_spark()
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rc = 0
    for name in args:
        q = registry[name]
        t0 = time.time()
        df = q.builder(spark, sf_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        t1 = time.time()
        if q.oracle is None:
            print(f"{name}: rows-only, {len(srows)} rows, {t1 - t0:.2f}s")
            continue
        res = duck.execute(q.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t2 = time.time()
        s = _rows_canon(scols, srows)
        o = _rows_canon(ocols, orows)
        ok = sorted(scols) == sorted(ocols) and s == o
        print(
            f"{name}: {'PASS' if ok else 'FAIL'} "
            f"(spark {len(srows)} rows {t1 - t0:.2f}s, duck {len(orows)} rows {t2 - t1:.2f}s)"
        )
        if not ok:
            rc = 1
            print(f"  spark cols: {sorted(scols)}")
            print(f"  duck  cols: {sorted(ocols)}")
            only_s = [r for r in s if r not in o][:5]
            only_o = [r for r in o if r not in s][:5]
            print(f"  only in spark: {only_s}")
            print(f"  only in duck : {only_o}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
