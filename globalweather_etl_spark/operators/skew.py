"""Skew-handling join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the complementary
PLAN-time tool for the pathological case AQE can't fix: one join key so
hot that even a split partition's build side is a bottleneck, on a join
whose small side can't broadcast.

Mechanics: the probe side adds a uniform random-ish salt in [0, S);
the build side is replicated S times (explode over the salt range);
the join key becomes (key, salt), spreading one hot key over S tasks.
Replication cost is S x |build|, so keep S small and the build side
narrow. Results are identical to the unsalted join (verified in
tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    keep_salt: bool = False,
) -> DataFrame:
    """Equi-join probe⋈build on `on` with an S-way salted key.

    The probe salt derives from xxhash64 of the whole probe row
    (deterministic, uniform); the build side explodes over all S salt
    values. Output columns = probe columns + build columns minus the
    duplicate key, like a plain `join(..., on, how)`.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    probe_salted = probe.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    # explode must be a top-level generator (not nested in a cast);
    # sequence of int literals already yields IntegerType elements.
    build_salted = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = probe_salted.join(build_salted, [on, _SALT], how)
    # keep_salt exposes the actual bucket assignment (diagnostics /
    # tests asserting the spread property on the operator itself).
    return joined if keep_salt else joined.drop(_SALT)
