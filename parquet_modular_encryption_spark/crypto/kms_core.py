"""Key-wrapping primitives and the demo key registry.

The reference KMS wraps keys with AES Key Wrap, RFC 3394
(kms_server.py via ``cryptography``'s aes_key_wrap). The ``cryptography``
package is not available in this environment, so the wrap here is an
equivalent authenticated construction from the stdlib:

    wrap(kek, key)   = nonce ‖ ct ‖ tag
      stream          = HMAC-SHA256(kek, "enc" ‖ nonce ‖ counter) blocks
      ct              = key ⊕ stream
      tag             = HMAC-SHA256(kek, "mac" ‖ nonce ‖ ct)[:16]

The wrapped blob is opaque to every consumer (pyarrow and parquet-mr both
treat KMS-wrapped keys as opaque strings), so the construction is a drop-in
for AES-KW at the protocol level; swap in real AES-KW in production. The
reference's payload validation rules are preserved: keys must be a multiple
of 8 bytes, ≥16 B to wrap, and wrapped blobs carry ≥24 B (reference
kms_server.py:52-101; our +24 = 16 B nonce + 16 B tag − 8).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os

NONCE_LEN = 16
TAG_LEN = 16

# Demo-only hardcoded 256-bit wrapping keys, one per lattice level —
# mirrors reference kms_server.py:28-32 ("Hardcoded for demo purposes
# only"); production resolves these from Vault/cloud KMS.
WRAPPING_KEYS: dict[str, bytes] = {
    "PUBLIC": hashlib.sha256(b"demo-wrapping-key-PUBLIC").digest(),
    "INTERNAL": hashlib.sha256(b"demo-wrapping-key-INTERNAL").digest(),
    "CONFIDENTIAL": hashlib.sha256(b"demo-wrapping-key-CONFIDENTIAL").digest(),
    "RESTRICTED": hashlib.sha256(b"demo-wrapping-key-RESTRICTED").digest(),
}


class KeyValidationError(ValueError):
    """Invalid key payload (maps to HTTP 422, reference kms_server.py:98-101)."""


def _keystream(kek: bytes, nonce: bytes, n: int) -> bytes:
    out = b""
    counter = 0
    while len(out) < n:
        out += hmac.new(kek, b"enc" + nonce + counter.to_bytes(4, "big"), hashlib.sha256).digest()
        counter += 1
    return out[:n]


def validate_key(key: bytes, *, min_len: int) -> None:
    if len(key) % 8 != 0:
        raise KeyValidationError("key length must be a multiple of 8 bytes")
    if len(key) < min_len:
        raise KeyValidationError(f"key must be at least {min_len} bytes")


def wrap(kek: bytes, key: bytes) -> bytes:
    validate_key(key, min_len=16)
    nonce = os.urandom(NONCE_LEN)
    ct = bytes(a ^ b for a, b in zip(key, _keystream(kek, nonce, len(key))))
    tag = hmac.new(kek, b"mac" + nonce + ct, hashlib.sha256).digest()[:TAG_LEN]
    return nonce + ct + tag


def unwrap(kek: bytes, blob: bytes) -> bytes:
    if len(blob) < NONCE_LEN + 8 + TAG_LEN:
        raise KeyValidationError("wrapped key too short")
    nonce, ct, tag = blob[:NONCE_LEN], blob[NONCE_LEN:-TAG_LEN], blob[-TAG_LEN:]
    expect = hmac.new(kek, b"mac" + nonce + ct, hashlib.sha256).digest()[:TAG_LEN]
    if not hmac.compare_digest(tag, expect):
        raise KeyValidationError("authentication tag mismatch")
    return bytes(a ^ b for a, b in zip(ct, _keystream(kek, nonce, len(ct))))


def b64e(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


def b64d(s: str) -> bytes:
    try:
        return base64.b64decode(s, validate=True)
    except Exception as exc:  # noqa: BLE001
        raise KeyValidationError(f"invalid base64: {exc}") from exc
