"""Testdata schema contract: every column this engine's operators read
must exist in the driver-generated parquet. The driver regenerates
testdata between rounds and has already changed the events.ts encoding
twice (rounds 4→5); this test turns the next regeneration into ONE
obvious failure naming the missing column, instead of dozens of
AnalysisExceptions scattered across the registry.

Additive changes (new columns) are deliberately allowed — only removals
or renames of columns we depend on fail."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

REQUIRED = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "source", "lang"},
    "embeddings": {"vec_id", "embedding"},
}


@pytest.mark.parametrize("table", sorted(REQUIRED))
def test_required_columns_present(sf_dir, table):
    names = set(pq.ParquetFile(f"{sf_dir}/{table}.parquet").schema_arrow.names)
    missing = REQUIRED[table] - names
    assert not missing, (
        f"testdata regeneration dropped column(s) {sorted(missing)} from "
        f"{table}.parquet — operators reading them will fail; present: {sorted(names)}"
    )
