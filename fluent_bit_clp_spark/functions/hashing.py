"""Cross-engine 60-bit hashing — the primitive that makes every
hash-dependent operator (MinHash, SimHash, LSH banding, hyperplane LSH)
DuckDB-oracle-checkable.

``xxhash64`` is Spark-only, which left the round-1 dedup/ANN family
rows-only checked (VERDICT r1 §next-round #4).  The portable hash is the
first 15 hex chars (60 bits) of md5 over a seed-prefixed UTF-8 string:

- Spark : ``cast(conv(substring(md5(concat('s<seed>:', x)), 1, 15), 16, 10)
  as bigint)`` — JVM-native, whole-stage codegen;
- DuckDB: ``('0x' || substring(md5('s<seed>:' || x), 1, 15))::bigint``;
- Python: ``int(hashlib.md5(...).hexdigest()[:15], 16)`` (drives the
  precomputed hyperplane constants and the equality test).

60 bits (not 64) so the value is always a non-negative BIGINT in every
engine — no signed-overflow edge cases, and bit extraction needs no
arithmetic-shift care (the round-1 SimHash ``div``-on-negative defect
cannot recur).  Verified byte-equal across all three implementations in
tests/test_extras.py::test_portable_hash_matches_python.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

H_BITS = 60


def _seeded(col, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(f"s{seed}:"), c)


def portable_hash64(col, seed: int = 0) -> Column:
    """60-bit non-negative hash of a string column (null → null)."""
    return F.conv(F.substring(F.md5(_seeded(col, seed)), 1, 15), 16, 10).cast(
        "bigint"
    )


def portable_hash_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`portable_hash64` for oracle queries."""
    return f"('0x' || substring(md5('s{seed}:' || {expr}), 1, 15))::bigint"


def portable_hash_spark_sql(expr: str, seed: int = 0) -> str:
    """Spark-SQL-string twin (for use inside ``F.expr`` lambdas where a
    Column can't be composed, e.g. transform() over array elements)."""
    return (
        f"cast(conv(substring(md5(concat('s{seed}:', {expr})), 1, 15), 16, 10) "
        f"as bigint)"
    )


def py_portable_hash64(s: str, seed: int = 0) -> int:
    """Driver-side twin — constants baked into plans (LSH hyperplanes)."""
    h = hashlib.md5(f"s{seed}:{s}".encode("utf-8")).hexdigest()
    return int(h[:15], 16)


def hyperplane_coeffs(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim — no RNG, no
    per-row hashing: coefficients are computed once on the driver from the
    portable hash and inlined as literals in BOTH the Spark plan and the
    DuckDB oracle SQL, so the two engines agree by construction."""
    return [
        (py_portable_hash64(f"plane:{i}", seed) % 2000 - 1000) / 1000.0
        for i in range(dim)
    ]


def hyperplane_sql_literal(dim: int, seed: int) -> str:
    """DuckDB double[] literal for :func:`hyperplane_coeffs`."""
    vals = ", ".join(repr(v) for v in hyperplane_coeffs(dim, seed))
    return f"[{vals}]::double[]"
