"""Order-insensitive row-digest primitives shared by the checksum /
manifest surfaces (surface49's ``audit_table_checksum``, surface89's
manifest write).

The idiom: hash each row to a 60-bit integer (first 15 hex chars of its
md5 — 15·4 = 60 bits, safely inside int64), then fold per group with two
commutative aggregates (``bit_xor`` and a modular sum).  Both commute
with any row order and keep O(1) aggregation state per group — no
``sort_array(collect_list(...))`` array buffer at any scale (VERDICT r7
ask #5).  One shared definition so the hash term can never silently
diverge between the surfaces that replay each other's digests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for the additive signature — any prime below 2^31 keeps the
# int64 sum safe to ~2^32 rows per group
DIGEST_MOD = 1_000_000_007


def md5_hash60(col: Column) -> Column:
    """60-bit integer hash of a string column: first 15 hex chars of its
    md5, base-16 → base-10, as LONG."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fold_xor(h: Column) -> Column:
    """Commutative XOR signature over per-row hashes."""
    return F.bit_xor(h).cast("long")


def fold_modsum(h: Column) -> Column:
    """Commutative additive signature: Σ(h mod p), bounded by rows·p."""
    return F.sum(h % F.lit(DIGEST_MOD)).cast("long")
