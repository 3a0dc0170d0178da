"""Engine-portable deterministic hashing.

Spark's native ``xxhash64``/``hash`` are fast but engine-specific: an
external oracle (DuckDB, Trino, pandas) cannot reproduce them. For anything
whose output must be verifiable outside Spark — dedup fingerprints, MinHash
signatures, LSH band keys — we derive hashes from ``md5`` (identical hex in
every engine) and fold the first 15 hex chars into a non-negative int63.

For purely internal partitioning (salt buckets, partition ids) keep
``xxhash64`` — it is ~10× cheaper and never leaves the engine
(checks/constraints.py:with_partition_id).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str, seed: str = "") -> Column:
    """Non-negative int63 hash reproducible as
    ``('0x' || substr(md5(seed || '|' || x), 1, 15))::bigint`` in DuckDB.

    15 hex chars = 60 bits, so the bigint conversion can never overflow and
    the value is always >= 0 in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    payload = F.concat(F.lit(f"{seed}|"), c.cast("string")) if seed != "" else c.cast("string")
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def portable_min_shingle_hash(shingle_col: Column | str, seed: int) -> Column:
    """MinHash component: ``md5(seed || '|' || shingle)`` kept as the hex
    string. Taking ``min`` over the lexicographic order of md5 hex digests is
    a valid random-permutation MinHash (the digest is uniform), and the hex
    string is bit-identical across engines, unlike any numeric fold.
    """
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    return F.md5(F.concat(F.lit(f"{seed}|"), c))
