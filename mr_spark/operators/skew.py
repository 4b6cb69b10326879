"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in the session) handles most skew at
runtime; explicit salting remains the tool when one build-side key is so
hot that even split shuffle partitions overload (the classic power-law
user_id / null-key case at 100 TB).

``salted_join``: replicate the build side R ways, scatter the probe side
uniformly across the R replicas — same rows as a plain inner equi-join,
but the hot key's probe rows spread over R tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    salt: int = 8,
) -> DataFrame:
    """Inner equi-join with R-way salting (result == probe ⋈ build).

    probe gets a uniform salt in [0, R); build is exploded ×R with every
    salt value; the join key becomes (key, salt). Use when a specific key's
    row count per task exceeds memory even after AQE splitting; cost is an
    R× blow-up of the (small) build side."""
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    salted_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_probe.join(
        salted_build,
        (salted_probe[probe_key] == salted_build[build_key])
        & (salted_probe["__salt"] == salted_build["__salt"]),
    )
    return out.drop("__salt")
