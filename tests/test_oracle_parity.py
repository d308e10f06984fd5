"""Driver emulator: every registered query's Spark result must EXACTLY match
its DuckDB oracle (row count + column names + order-insensitive values).

This is stricter than a tolerance comparison on purpose — the driver
hash-compares values, so any float nondeterminism must be engineered away
(see functions/numeric.py), not waved through with approx asserts.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from parquet_modular_encryption_spark.registry import load_all

QUERIES = load_all()
WITH_ORACLE = [q for q in QUERIES.values() if q.oracle is not None]
ROWS_ONLY = [q for q in QUERIES.values() if q.oracle is None]


def _canon(v):
    """Canonicalize a cell for cross-engine comparison (mirrors the
    driver's value hashing: exact values, no tolerance)."""
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        # Round-1 lesson: the driver hashes TYPED values, so a Decimal cell
        # never matches a float cell even when numerically identical. Do NOT
        # coerce — let the comparison fail loudly so the local suite predicts
        # the driver. (Queries must emit DOUBLE/BIGINT, see numeric.dsum.)
        return ("decimal", str(v))
    return v


def _rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-keyed sort: total order even with NULL cells (None is not
    # comparable to int); identical rows get identical keys on both sides
    return sorted((tuple(_canon(r[i]) for i in idx) for r in rows), key=repr)


@pytest.mark.parametrize("query", WITH_ORACLE, ids=[q.name for q in WITH_ORACLE])
def test_oracle_parity(query, spark, duck, sf_dir):
    sdf = query.builder(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    rel = duck.sql(query.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{query.name}: column names differ\n spark={sorted(spark_cols)}\n duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{query.name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duck)"
    )
    s_rows = _rows_canon(spark_cols, spark_rows)
    d_rows = _rows_canon(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{query.name}: {len(mismatches)}/{len(s_rows)} rows differ; first 3:\n"
        + "\n".join(f"  spark={a}\n  duck ={b}" for _, a, b in mismatches[:3])
    )


@pytest.mark.parametrize("query", ROWS_ONLY, ids=[q.name for q in ROWS_ONLY])
def test_rows_only_queries_run(query, spark, sf_dir):
    df = query.builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# ---------------------------------------------------------------------------
# Schema lint: no driver-unhashable output types, ever.
#
# The driver's value-hash is typed: Spark DecimalType vs DuckDB
# DECIMAL/HUGEINT never hashes equal to DOUBLE/BIGINT even when the values
# are bit-identical (the entire round-1 failure mode — 20/50 queries). Ban
# the types at the schema level so no future query can reintroduce it.
# ---------------------------------------------------------------------------

_BANNED_DUCK = ("DECIMAL", "HUGEINT", "UHUGEINT")


@pytest.mark.parametrize("query", QUERIES.values(), ids=list(QUERIES))
def test_no_decimal_in_spark_output(query, spark, sf_dir):
    from pyspark.sql.types import DecimalType

    schema = query.builder(spark, sf_dir).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, (
        f"{query.name}: Spark output has DecimalType columns {bad} — the driver "
        f"hash cannot match these; finalize with dsum/dsum_floor (numeric.py)"
    )


@pytest.mark.parametrize("query", WITH_ORACLE, ids=[q.name for q in WITH_ORACLE])
def test_no_decimal_in_oracle_output(query, duck):
    rel = duck.sql(query.oracle)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in _BANNED_DUCK)
    ]
    assert not bad, (
        f"{query.name}: oracle output has driver-unhashable types {bad} — "
        f"CAST(SUM(intcol) AS BIGINT) / sql_dsum_floor the expression"
    )
