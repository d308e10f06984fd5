"""Property-based tests (hypothesis) for the pure-Python cores: key
wrapping, the privilege lattice, and the portable hash/shingle helpers."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_modular_encryption_spark.crypto import kms_core
from parquet_modular_encryption_spark.crypto.policy import (
    Privilege,
    can_unwrap,
)

keys8 = st.binary(min_size=16, max_size=64).filter(lambda b: len(b) % 8 == 0)
keks = st.sampled_from(list(kms_core.WRAPPING_KEYS.values()))


@given(kek=keks, key=keys8)
@settings(max_examples=200)
def test_wrap_unwrap_identity(kek, key):
    assert kms_core.unwrap(kek, kms_core.wrap(kek, key)) == key


@given(kek=keks, key=keys8, flip=st.integers(min_value=0))
@settings(max_examples=100)
def test_tampered_blob_always_rejected(kek, key, flip):
    blob = kms_core.wrap(kek, key)
    i = flip % len(blob)
    tampered = blob[:i] + bytes([blob[i] ^ 1]) + blob[i + 1 :]
    try:
        result = kms_core.unwrap(kek, tampered)
    except kms_core.KeyValidationError:
        return
    # AES-KW (RFC 3394) authenticates via its integrity check value: any
    # single-bit flip anywhere in the wrapped blob must fail the unwrap ICV
    raise AssertionError(f"tampered blob accepted: {result!r}")


@given(kek=keks, other=keks, key=keys8)
@settings(max_examples=100)
def test_wrong_kek_rejected(kek, other, key):
    if kek == other:
        return
    blob = kms_core.wrap(kek, key)
    try:
        kms_core.unwrap(other, blob)
    except kms_core.KeyValidationError:
        return
    raise AssertionError("unwrap succeeded with the wrong KEK")


@given(
    token=st.sampled_from([None, "PUBLIC", "INTERNAL", "CONFIDENTIAL", "RESTRICTED", "garbage"]),
    level=st.sampled_from(list(Privilege)),
)
def test_lattice_monotone(token, level):
    """If a token can unwrap a level, every stronger token can too."""
    if can_unwrap(token, level.name):
        for stronger in Privilege:
            if token in Privilege.__members__ and stronger >= Privilege[token]:
                assert can_unwrap(stronger.name, level.name)
    # PUBLIC keys unwrap for everyone, including no token
    assert can_unwrap(token, "PUBLIC")


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=100)
def test_python_hash60_range(s):
    """The portable 60-bit hash stays in [0, 2^60) — headroom for MinHash
    modular arithmetic in a signed 64-bit lane (python reference of the
    SQL/Spark construction)."""
    import hashlib

    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert 0 <= h < 1 << 60


def test_approx_percentiles_within_tolerance(spark):
    """q87's sketch values must bracket the exact rank within ε·n ranks."""
    from parquet_modular_encryption_spark.operators.grouping import (
        q87_approx_percentiles,
    )

    sf = "/root/testdata/sf0.01"
    approx = {r.l_returnflag: r for r in q87_approx_percentiles(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    for flag, row in approx.items():
        vals = sorted(
            v.l_extendedprice
            for v in li.filter(li.l_returnflag == flag).select("l_extendedprice").collect()
        )
        n = len(vals)
        for q, got in ((0.25, row.p25), (0.5, row.p50), (0.75, row.p75), (0.95, row.p95)):
            # rank of the sketch answer must be within ε·n of the target rank
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * n
            eps_ranks = max(2.0, 1e-4 * n * 2)
            assert lo - eps_ranks <= target <= hi + eps_ranks, (
                f"{flag} p{int(q*100)}: value {got} at ranks [{lo},{hi}], "
                f"target {target}"
            )
