#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/r16/.

Usage: python scripts/dump_plans_r16.py <before|after> <query> [<query>...]

Captures the plan of the frame each builder RETURNS. For multi-job
operators (the grouped twins) the returned frame's plan now carries the
whole lineage on the bound-prescreen path (r16) — the r15 stub problem
(VERDICT r15 #5) only remains on the forced-chunk path, where the heavy
work happens in builder-time jobs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_modular_encryption_spark.registry import load_all  # noqa: E402
from parquet_modular_encryption_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    assert suffix in ("before", "after"), suffix
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
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump-r16", cores=cpus, extra_conf=extra_conf)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"plan-dump {name}")
        df = q.builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"# wrote {path} ({len(buf.getvalue())} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
