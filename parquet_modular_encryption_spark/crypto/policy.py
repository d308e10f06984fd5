"""Privilege lattice + column→key-id encryption policy.

Mirrors the reference's security data model (SURVEY.md §1.4): a totally
ordered lattice ``plaintext < PUBLIC < INTERNAL < CONFIDENTIAL <
RESTRICTED`` (reference README.md:93-94, kms_client.py:13-17), a
column→level map (write_encrypted_parquet.py:75-79), and a PUBLIC-signed
plaintext footer (write_encrypted_parquet.py:83,85). The policy is data,
not code: the KMS server is the sole enforcement point (kms_server.py:104-127),
exactly as in the reference — the engine never checks privileges itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class Privilege(IntEnum):
    """Totally ordered privilege lattice. Higher value = more privileged."""

    PUBLIC = 1
    INTERNAL = 2
    CONFIDENTIAL = 3
    RESTRICTED = 4


WRAPPING_KEY_IDS = tuple(p.name for p in Privilege)


def can_unwrap(token: str | None, key_id: str) -> bool:
    """Authorization predicate of the KMS unwrap endpoint (reference
    kms_server.py:104-127): PUBLIC unwraps freely; otherwise the caller's
    token privilege must dominate the key's level."""
    level = Privilege[key_id]
    if level is Privilege.PUBLIC:
        return True
    if token is None or token not in Privilege.__members__:
        return False
    return Privilege[token] >= level


@dataclass(frozen=True)
class EncryptionPolicy:
    """Column→privilege map. Columns absent from ``column_levels`` stay
    plaintext (reference: `id` has no entry, README.md:126-127)."""

    column_levels: dict[str, Privilege]
    footer_key: str = Privilege.PUBLIC.name
    plaintext_footer: bool = True
    name: str = "policy"

    def column_keys(self) -> dict[str, list[str]]:
        """Key-id → column list, the shape pyarrow's EncryptionConfiguration
        takes (reference write_encrypted_parquet.py:75-79)."""
        out: dict[str, list[str]] = {}
        for col, level in self.column_levels.items():
            out.setdefault(level.name, []).append(col)
        return {k: sorted(v) for k, v in sorted(out.items())}

    def spark_column_keys(self) -> str:
        """parquet-mr hadoop-conf form: ``keyid:col1,col2;keyid2:col3``."""
        return ";".join(f"{k}:{','.join(cols)}" for k, cols in self.column_keys().items())

    def required_privilege(self, columns: list[str]) -> Privilege | None:
        """Minimum token privilege needed to read ``columns``."""
        levels = [self.column_levels[c] for c in columns if c in self.column_levels]
        return max(levels) if levels else None


# The reference's own fixture policy (write_encrypted_parquet.py:75-79).
PEOPLE_POLICY = EncryptionPolicy(
    column_levels={
        "date_of_birth": Privilege.INTERNAL,
        "first_name": Privilege.CONFIDENTIAL,
        "last_name": Privilege.CONFIDENTIAL,
        "social_security_number": Privilege.RESTRICTED,
    },
    name="people_pii",
)

# Encryption-over-relational fixture (FIXTURES.md §B): protect customer
# PII/financials, leave join keys plaintext so encrypted scans still feed
# joins and aggregations with full pushdown.
CUSTOMER_POLICY = EncryptionPolicy(
    column_levels={
        "c_name": Privilege.INTERNAL,
        "c_acctbal": Privilege.CONFIDENTIAL,
        "c_mktsegment": Privilege.INTERNAL,
    },
    name="customer_pii",
)

# Training-corpus fixture: document text is the sensitive payload
# (scraped content under licensing/PII constraints), provenance is
# internal metadata, numeric stats and ids stay plaintext so curation
# queries (counts, length histograms, source mixes) run keyless.
DOCUMENTS_POLICY = EncryptionPolicy(
    column_levels={
        "text": Privilege.CONFIDENTIAL,
        "source": Privilege.INTERNAL,
    },
    name="documents_corpus",
)
