"""Hashing / shingling primitives shared by dedup and fingerprinting.

Re-exported from the query layer's parity helpers so library users and
oracle-gated queries run the exact same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wire_spark.queries._util import md5_long, word_shingles  # noqa: F401

MINHASH_PRIME = 1073741789


def minhash_hashes(shingle: Column, n_perms: int = 24) -> Column:
    """Array of ``n_perms`` permutation hashes for one shingle:
    Carter-Wegman (h1 + p*h2) mod prime over md5-derived 48-bit
    halves (53-bit-safe integer math, portable across engines).

    The md5 halves are bound through a one-element struct array so
    the inner lambda reads them as lambda-variable FIELDS: a lambda
    that captures an outer EXPRESSION re-evaluates it per element
    (the word_shingles O(n²) lesson, r11) — the naive form here
    recomputed the md5 ``n_perms`` times per shingle."""
    md5c = F.md5(shingle)
    h1 = F.conv(F.substring(md5c, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5c, 13, 12), 16, 10).cast("long")
    return F.flatten(F.transform(
        F.array(F.struct(h1.alias("h1"), h2.alias("h2"))),
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(n_perms - 1)),
            lambda p: (s["h1"] + p.cast("long") * s["h2"])
            % F.lit(MINHASH_PRIME),
        ),
    ))
