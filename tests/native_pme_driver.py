"""Subprocess driver for JVM-native PME tests (tests/test_encrypted_native.py).

Runs in its own process because the kms jar must be on the driver classpath
at JVM launch. Prints one `OK <check>` line per passed check; any exception
fails the calling pytest via returncode.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, sys.argv[1])

from parquet_modular_encryption_spark.crypto.kms_server import KmsServer
from parquet_modular_encryption_spark.crypto.policy import CUSTOMER_POLICY
from parquet_modular_encryption_spark.session import get_spark
from parquet_modular_encryption_spark.sources.encrypted import (
    read_encrypted_arrow,
    write_encrypted,
)
from parquet_modular_encryption_spark.sources.encrypted_native import (
    build_jar,
    native_session_conf,
    read_encrypted_native,
    write_encrypted_native,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    build_jar()
    with KmsServer() as kms_url:
        spark = get_spark("native-pme", cores=4, extra_conf=native_session_conf())
        plain = spark.read.parquet(f"{SF}/customer.parquet").coalesce(2)
        expected = sorted(map(tuple, plain.collect()))
        scratch = tempfile.mkdtemp(prefix="pme_native_")

        # 1. native write → native read round-trip
        write_encrypted_native(plain, f"{scratch}/native", CUSTOMER_POLICY, kms_url)
        back = read_encrypted_native(spark, f"{scratch}/native", kms_url, "RESTRICTED")
        assert sorted(map(tuple, back.collect())) == expected
        print("OK native_roundtrip")

        # 2. ciphertext opacity: protected values absent from raw bytes
        import glob

        raw = b"".join(
            open(f, "rb").read() for f in glob.glob(f"{scratch}/native/*.parquet")
        )
        sample_names = [t[1].encode() for t in expected[:5]]  # c_name is INTERNAL
        assert all(name not in raw for name in sample_names)
        print("OK ciphertext_opaque")

        # 3. unauthorized token → query fails with access denied
        denied = read_encrypted_native(spark, f"{scratch}/native", kms_url, "PUBLIC")
        try:
            denied.select("c_acctbal").collect()
            raise AssertionError("PUBLIC token read a CONFIDENTIAL column")
        except Exception as exc:  # noqa: BLE001
            assert "KeyAccessDenied" in str(exc) or "not authorized" in str(exc), exc
        print("OK authz_denied")

        # 4. interop: Arrow-PME-written dataset read natively by Spark
        write_encrypted(plain, f"{scratch}/arrow", CUSTOMER_POLICY, kms_url=kms_url)
        via_native = read_encrypted_native(spark, f"{scratch}/arrow", kms_url, "RESTRICTED")
        assert sorted(map(tuple, via_native.collect())) == expected
        print("OK interop_arrow_to_jvm")

        # 5. interop: natively-written dataset read by the Arrow reader
        table = read_encrypted_arrow(f"{scratch}/native", token="RESTRICTED", kms_url=kms_url)
        got = sorted(tuple(r.values()) for r in table.to_pylist())
        assert got == expected
        print("OK interop_jvm_to_arrow")

        spark.stop()


if __name__ == "__main__":
    main()
