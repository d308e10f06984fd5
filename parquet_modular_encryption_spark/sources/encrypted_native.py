"""JVM-native Parquet Modular Encryption: Spark's own parquet reader/writer
encrypts and decrypts via parquet-mr's PropertiesDrivenCryptoFactory and the
compiled ``pmespark.RestKmsClient`` (java/pmespark/RestKmsClient.java), which
speaks the same REST wrap/unwrap protocol as the Python KMS client.

This is SURVEY.md §7 "Plan A": fully distributed encrypted scans through the
normal `spark.read.parquet` path — vectorized reader, predicate pushdown,
column pruning, no Python in the data path. The Arrow-based path in
sources/encrypted.py remains as the no-JVM fallback and for interop tests
(both implement the parquet-format PME spec, so files are interchangeable).

Requirements: build/pme-kms.jar on the driver classpath at JVM launch —
``native_session_conf()`` returns the confs; scripts/build_kms_jar.sh
builds the jar against pyspark's bundled parquet jars.

Hadoop conf mapping mirrors the reference's EncryptionConfiguration
(write_encrypted_parquet.py:73-87 → SURVEY.md §2A rows 9-16).
"""

from __future__ import annotations

import os
import subprocess
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from parquet_modular_encryption_spark.crypto.policy import EncryptionPolicy

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
JAR_PATH = os.path.join(REPO_ROOT, "build", "pme-kms.jar")

FACTORY = "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"
KMS_CLIENT = "pmespark.RestKmsClient"


def build_jar() -> str:
    """Compile the JVM KmsClient if needed; returns the jar path."""
    script = os.path.join(REPO_ROOT, "scripts", "build_kms_jar.sh")
    out = subprocess.run(
        ["bash", script], capture_output=True, text=True, check=True
    ).stdout.strip()
    return out.splitlines()[-1]


def native_session_conf() -> dict[str, str]:
    """Extra SparkSession confs for the native PME path (must be applied
    at JVM launch — extraClassPath cannot be set on a running session)."""
    return {
        "spark.jars": JAR_PATH,
        "spark.driver.extraClassPath": JAR_PATH,
        "spark.executor.extraClassPath": JAR_PATH,
    }


@contextmanager
def _pme_hadoop_conf(spark: SparkSession, entries: dict[str, str]):
    """Temporarily set PME keys on the (session-global) hadoop conf.

    The hadoop Configuration is shared by every read/write in the session,
    so encryption settings are scoped tightly: set → operate → unset, or a
    later unrelated `df.write.parquet` would silently encrypt too.
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    previous = {k: conf.get(k) for k in entries}
    for k, v in entries.items():
        conf.set(k, v)
    try:
        yield
    finally:
        for k, old in previous.items():
            if old is None:
                conf.unset(k)
            else:
                conf.set(k, old)


def _common_conf(kms_url: str, token: str | None) -> dict[str, str]:
    return {
        "parquet.crypto.factory.class": FACTORY,
        "parquet.encryption.kms.client.class": KMS_CLIENT,
        "parquet.encryption.kms.instance.url": kms_url,
        "parquet.encryption.key.access.token": token or "DEFAULT",
        "parquet.encryption.cache.lifetime.seconds": "60",
    }


def write_encrypted_native(
    df: DataFrame,
    path: str,
    policy: EncryptionPolicy,
    kms_url: str,
    mode: str = "overwrite",
) -> None:
    """Distributed encrypted write through Spark's own parquet sink."""
    spark = df.sparkSession
    entries = _common_conf(kms_url, None) | {
        "parquet.encryption.column.keys": policy.spark_column_keys(),
        "parquet.encryption.footer.key": policy.footer_key,
        "parquet.encryption.plaintext.footer": str(policy.plaintext_footer).lower(),
        "parquet.encryption.double.wrapping": "true",
        "parquet.encryption.key.material.store.internally": "true",
    }
    with _pme_hadoop_conf(spark, entries):
        df.write.mode(mode).parquet(path)


def read_encrypted_native(
    spark: SparkSession, path: str, kms_url: str, token: str | None = None
) -> DataFrame:
    """Distributed decrypting scan through Spark's own parquet source.

    NOTE: the hadoop conf (including the access token) is captured when the
    scan EXECUTES, not when the DataFrame is defined — so the returned
    frame must be consumed inside the conf scope. We therefore eagerly
    localCheckpoint-free: callers get a DataFrame whose first action should
    happen before another PME conf change in the same session; tests
    collect immediately.
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in _common_conf(kms_url, token).items():
        conf.set(k, v)
    return spark.read.parquet(path)
