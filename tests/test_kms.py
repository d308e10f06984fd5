"""KMS protocol unit tests: wrap/unwrap round-trip, the authorization
lattice matrix, and the payload validation rules the reference enforces
(kms_server.py:52-101, :104-127)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from parquet_modular_encryption_spark.crypto import kms_core
from parquet_modular_encryption_spark.crypto.kms_client import (
    KmsAuthorizationError,
    RestKmsClient,
)
from parquet_modular_encryption_spark.crypto.kms_server import KmsServer
from parquet_modular_encryption_spark.crypto.policy import Privilege, can_unwrap

LEVELS = ["PUBLIC", "INTERNAL", "CONFIDENTIAL", "RESTRICTED"]
TOKENS = [None, *LEVELS]


@pytest.fixture(scope="module")
def kms_url():
    server = KmsServer().start()
    yield server.url
    server.stop()


def test_wrap_unwrap_roundtrip_core():
    kek = kms_core.WRAPPING_KEYS["INTERNAL"]
    key = bytes(range(32))
    blob = kms_core.wrap(kek, key)
    assert kms_core.unwrap(kek, blob) == key
    # tamper detection
    bad = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(kms_core.KeyValidationError):
        kms_core.unwrap(kek, bad)


def test_key_validation_rules():
    kek = kms_core.WRAPPING_KEYS["PUBLIC"]
    with pytest.raises(kms_core.KeyValidationError):  # not multiple of 8
        kms_core.wrap(kek, b"x" * 17)
    with pytest.raises(kms_core.KeyValidationError):  # < 16 bytes
        kms_core.wrap(kek, b"x" * 8)
    with pytest.raises(kms_core.KeyValidationError):  # unwrap too short
        kms_core.unwrap(kek, b"x" * 16)


def test_rest_roundtrip_all_levels(kms_url):
    key = bytes(range(24))
    for level in LEVELS:
        client = RestKmsClient(kms_url, access_token="RESTRICTED")
        wrapped = client.wrap_key(key, level)
        assert client.unwrap_key(wrapped, level) == key


@pytest.mark.parametrize("token", TOKENS, ids=[str(t) for t in TOKENS])
@pytest.mark.parametrize("level", LEVELS)
def test_authz_matrix(kms_url, token, level):
    """The reference's 5-token × 4-level unwrap matrix (README.md:93-94):
    success iff token privilege dominates the key level; PUBLIC is free."""
    writer = RestKmsClient(kms_url)  # wrap needs no token by design
    wrapped = writer.wrap_key(bytes(range(16)), level)
    reader = RestKmsClient(kms_url, access_token=token)
    expected = can_unwrap(token, level)
    # independent truth: lattice order, not the can_unwrap implementation
    order = {None: 0, "PUBLIC": 1, "INTERNAL": 2, "CONFIDENTIAL": 3, "RESTRICTED": 4}
    assert expected == (level == "PUBLIC" or order[token] >= order[level])
    if expected:
        assert reader.unwrap_key(wrapped, level) == bytes(range(16))
    else:
        with pytest.raises(KmsAuthorizationError):
            reader.unwrap_key(wrapped, level)


def test_unknown_key_id_404(kms_url):
    client = RestKmsClient(kms_url, access_token="RESTRICTED")
    with pytest.raises(RuntimeError, match="404"):
        client.wrap_key(bytes(range(16)), "NOT_A_LEVEL")


def test_invalid_payload_422(kms_url):
    req = urllib.request.Request(
        f"{kms_url}/api/v1/wrap/PUBLIC",
        data=json.dumps({"key": "!!! not base64 !!!"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 422


def test_lattice_total_order():
    assert Privilege.PUBLIC < Privilege.INTERNAL < Privilege.CONFIDENTIAL < Privilege.RESTRICTED
