"""Queries that exercise the encrypted-parquet path (the reference's actual
surface) inside a real relational pipeline.

The builder writes a policy-encrypted copy of a table (crypto/policy.py
lattice, per-column keys) to a scratch dir, reads it back with a privileged
token, and runs an aggregate. The DuckDB oracle runs the same aggregate on
the PLAINTEXT table — so the check proves encrypted write → decrypt read is
lossless, which is exactly the reference's round-trip guarantee
(write_encrypted_parquet.py → read_encrypted_parquet.py).

Queries are registered by crypto/... once the KMS/PME layer lands; this
module is imported by the registry unconditionally, so keep imports cheap.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import davg, sql_davg
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load


def _native_pme_available(spark: SparkSession) -> bool:
    """True when the compiled pmespark.RestKmsClient is on the JVM
    classpath (bench/our sessions add it at launch; the driver's vanilla
    session won't have it and falls back to the Arrow path)."""
    try:
        spark._jvm.java.lang.Class.forName("pmespark.RestKmsClient")
        return True
    except Exception:  # noqa: BLE001
        return False


@register(
    "q60_encrypted_roundtrip",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_davg('c_acctbal')} AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("encryption", "roundtrip"),
)
def q60_encrypted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypt customer under the privilege-lattice policy, read it back
    with a RESTRICTED token, aggregate. Oracle aggregates the plaintext
    table — equality proves the encrypted round-trip is lossless.

    Backend-swapped: the JVM-native PME path (Spark's own parquet sink and
    vectorized reader, ~zero overhead) when the kms jar is on the
    classpath, else the Arrow per-partition path — same API, same result."""
    prep(spark)
    from parquet_modular_encryption_spark.crypto.policy import CUSTOMER_POLICY

    # coalesce: the customer table is small relative to executor count, and
    # each output file costs one KMS wrap round-trip per key-id (double
    # wrapping) — fewer, larger encrypted files is the right shape.
    plain = load(spark, sf_dir, "customer").coalesce(8)
    scratch = tempfile.mkdtemp(prefix="pme_q60_")
    path = f"{scratch}/customer_enc"

    def _agg(frame: DataFrame) -> DataFrame:
        return frame.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal").alias("avg_acctbal"),
        )

    if _native_pme_available(spark):
        from parquet_modular_encryption_spark.crypto.kms_server import shared_kms_url
        from parquet_modular_encryption_spark.sources.encrypted_native import (
            decrypting_scan,
            write_encrypted_native,
        )

        kms_url = shared_kms_url()
        write_encrypted_native(plain, path, CUSTOMER_POLICY, kms_url)
        # Lazy scoped scan — nothing is persisted, so no decrypted copy is
        # registered in the session CacheManager (a q60 run used to pin one
        # permanently). The aggregate is materialized INSIDE the conf
        # scope; its output is bounded (one row per market segment at any
        # scale — the scan itself stays fully distributed), so re-creating
        # it as a local frame is the conf-independent result the driver
        # can collect later.
        with decrypting_scan(spark, path, kms_url, "RESTRICTED") as enc:
            agg = _agg(enc)
            rows, schema = agg.collect(), agg.schema
        return spark.createDataFrame(rows, schema)
    from parquet_modular_encryption_spark.sources.encrypted import (
        read_encrypted,
        write_encrypted,
    )

    write_encrypted(plain, path, CUSTOMER_POLICY)
    return _agg(read_encrypted(spark, path, token="RESTRICTED"))
