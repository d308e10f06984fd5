"""Key-wrapping primitives and the demo key registry.

Keys are wrapped with AES Key Wrap, RFC 3394, exactly as the reference KMS
does (reference kms_server.py:12,138,151 — ``cryptography``'s
``aes_key_wrap`` / ``aes_key_unwrap``; same ``cryptography`` 48.0.0 the
reference pins). AES-KW is deterministic (no IV), so a blob wrapped here
under a given KEK is byte-identical to one the reference server would
produce under the same KEK, and either side can unwrap the other's blobs.

The reference's payload validation rules are preserved (reference
kms_server.py:52-101): keys must be ≥16 B to wrap, wrapped blobs must be
≥24 B to unwrap (plaintext + the 8-byte AES-KW integrity block), both must
be a multiple of 8 bytes (an RFC 3394 requirement), and every violation —
including a failed integrity check on unwrap — maps to HTTP 422.
"""

from __future__ import annotations

import base64
import hashlib

from cryptography.hazmat.primitives.keywrap import (
    InvalidUnwrap,
    aes_key_unwrap,
    aes_key_wrap,
)

# Demo-only hardcoded 256-bit wrapping keys, one per lattice level —
# mirrors reference kms_server.py:28-32 ("Hardcoded for demo purposes
# only"); production resolves these from Vault/cloud KMS. Derived, not
# copied: the reference's literal hex KEKs stay out of this repo.
WRAPPING_KEYS: dict[str, bytes] = {
    "PUBLIC": hashlib.sha256(b"demo-wrapping-key-PUBLIC").digest(),
    "INTERNAL": hashlib.sha256(b"demo-wrapping-key-INTERNAL").digest(),
    "CONFIDENTIAL": hashlib.sha256(b"demo-wrapping-key-CONFIDENTIAL").digest(),
    "RESTRICTED": hashlib.sha256(b"demo-wrapping-key-RESTRICTED").digest(),
}


class KeyValidationError(ValueError):
    """Invalid key payload (maps to HTTP 422, reference kms_server.py:98-101)."""


def validate_key(key: bytes, *, min_len: int) -> None:
    if len(key) % 8 != 0:
        raise KeyValidationError("key length must be a multiple of 8 bytes")
    if len(key) < min_len:
        raise KeyValidationError(f"key must be at least {min_len} bytes")


def wrap(kek: bytes, key: bytes) -> bytes:
    """RFC 3394 AES-KW: wraps ``key`` under ``kek``; output is 8 B longer."""
    validate_key(key, min_len=16)
    return aes_key_wrap(kek, key)


def unwrap(kek: bytes, blob: bytes) -> bytes:
    """RFC 3394 AES-KW unwrap; integrity failure raises KeyValidationError."""
    validate_key(blob, min_len=24)
    try:
        return aes_key_unwrap(kek, blob)
    except InvalidUnwrap as exc:
        raise KeyValidationError("key unwrap failed integrity check") from exc


def b64e(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


def b64d(s: str) -> bytes:
    if not isinstance(s, str):
        raise KeyValidationError("key must be a base64 string")
    try:
        return base64.b64decode(s, validate=True)
    except Exception as exc:  # noqa: BLE001
        raise KeyValidationError(f"invalid base64: {exc}") from exc
