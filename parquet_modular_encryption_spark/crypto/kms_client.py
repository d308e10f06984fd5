"""KMS clients: a plain REST client and the pyarrow ``KmsClient`` adapter.

Twin of the reference's kms_client.py (httpx → stdlib urllib): POST
base64-encoded keys to ``/api/v1/{wrap|unwrap}/{key_id}`` with the caller's
token in the ``x-api-key`` header, 5 s timeout, errors surfaced as
exceptions inside the scan — an unauthorized projection fails the whole
query, the reference's failure semantics (SURVEY.md §3).
"""

from __future__ import annotations

import json
import os
import ssl
import urllib.error
import urllib.request

import pyarrow.parquet.encryption as pe

from parquet_modular_encryption_spark.crypto.kms_core import b64d, b64e

TIMEOUT_S = 5.0  # reference kms_client.py:35


def _ssl_context() -> ssl.SSLContext:
    """Default TLS verification, trusting ``SSL_CERT_FILE`` when set —
    the reference's channel security (reference kms_client.py:36-37)."""
    return ssl.create_default_context(cafile=os.environ.get("SSL_CERT_FILE"))


class KmsAuthorizationError(PermissionError):
    """HTTP 403 from the unwrap endpoint: token privilege insufficient."""


class KmsKeyShreddedError(RuntimeError):
    """HTTP 410 from wrap/unwrap: the wrapping key's material was
    deliberately destroyed (crypto-shredding) — data encrypted under it is
    permanently unrecoverable, at ANY privilege level."""


class KmsUnavailableError(ConnectionError):
    """The KMS endpoint could not be reached (connection refused, DNS
    failure, or no response within the 5 s timeout — reference
    kms_client.py:35). Raised with the endpoint, action, and key id so a
    scan task's failure is attributable to the outage, not to the data:
    the engine-side twin of the reference's errors-surface-inside-the-
    scan semantic (SURVEY.md §3)."""


class RestKmsClient:
    """Minimal REST client for the wrap/unwrap protocol."""

    def __init__(self, base_url: str, access_token: str | None = None) -> None:
        self.base_url = base_url.rstrip("/")
        self.access_token = access_token
        self._ctx = _ssl_context() if self.base_url.startswith("https") else None

    def _post(self, action: str, key_id: str, key_b64: str) -> str:
        req = urllib.request.Request(
            f"{self.base_url}/api/v1/{action}/{key_id}",
            data=json.dumps({"key": key_b64}).encode(),
            headers={
                "Content-Type": "application/json",
                **({"x-api-key": self.access_token} if self.access_token else {}),
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=TIMEOUT_S, context=self._ctx) as resp:
                return json.loads(resp.read())["key"]
        except urllib.error.HTTPError as exc:
            detail = exc.read().decode(errors="replace")
            if exc.code == 403:
                raise KmsAuthorizationError(
                    f"unwrap denied for key {key_id!r}: {detail}"
                ) from exc
            if exc.code == 410:
                raise KmsKeyShreddedError(
                    f"key {key_id!r} crypto-shredded: {detail}"
                ) from exc
            raise RuntimeError(f"KMS {action} failed ({exc.code}): {detail}") from exc
        except urllib.error.URLError as exc:
            if isinstance(exc.reason, ssl.SSLError):
                # TLS trust rejection is a SECURITY refusal (the server
                # is up but unverifiable) — do not reclassify it as an
                # availability problem.
                raise
            raise KmsUnavailableError(
                f"KMS {action} for key {key_id!r} at {self.base_url} "
                f"unreachable: {exc.reason}"
            ) from exc
        except TimeoutError as exc:
            raise KmsUnavailableError(
                f"KMS {action} for key {key_id!r} at {self.base_url} "
                f"timed out after {TIMEOUT_S:.0f}s"
            ) from exc

    def wrap_key(self, key_bytes: bytes, master_key_identifier: str) -> str:
        return self._post("wrap", master_key_identifier, b64e(key_bytes))

    def unwrap_key(self, wrapped_key: str, master_key_identifier: str) -> bytes:
        return b64d(self._post("unwrap", master_key_identifier, wrapped_key))


class ArrowRestKmsClient(pe.KmsClient):
    """pyarrow adapter (reference kms_client.py:20-54): pyarrow's
    CryptoFactory calls wrap/unwrap during encrypted write/read."""

    def __init__(self, kms_connection_config: pe.KmsConnectionConfig) -> None:
        super().__init__()
        self._rest = RestKmsClient(
            kms_connection_config.kms_instance_url,
            kms_connection_config.key_access_token,
        )

    def wrap_key(self, key_bytes: bytes, master_key_identifier: str) -> str:
        return self._rest.wrap_key(key_bytes, master_key_identifier)

    def unwrap_key(self, wrapped_key: str | bytes, master_key_identifier: str) -> bytes:
        if isinstance(wrapped_key, bytes):
            wrapped_key = wrapped_key.decode("ascii")
        return self._rest.unwrap_key(wrapped_key, master_key_identifier)


def crypto_factory() -> pe.CryptoFactory:
    return pe.CryptoFactory(ArrowRestKmsClient)


def connection_config(kms_url: str, token: str | None) -> pe.KmsConnectionConfig:
    # pyarrow requires a non-empty token string; the server treats an
    # unknown/placeholder token as unprivileged (reference behavior for
    # token=None: only PUBLIC unwraps succeed).
    return pe.KmsConnectionConfig(
        kms_instance_url=kms_url, key_access_token=token or "ANONYMOUS"
    )
