"""Skew-resilient join: explicit key salting.

Spark's AQE splits skewed *sort-merge* shuffle partitions automatically
(spark.sql.adaptive.skewJoin), which covers most skew. Explicit salting
remains the tool for the cases AQE can't fix: a single key so hot that
even one split of it exceeds an executor (AQE splits by partition, and
one key hashes to one partition), or skew under a join strategy AQE's
skew rule doesn't rewrite. The reference has no joins at all (SURVEY
§2.3) — this is part of the generalized engine surface.

Mechanics: the big side gets a per-row salt in [0, nsalt); the small
side is replicated nsalt times; the join key becomes (key, salt), so a
hot key's rows spread over nsalt reducers. Cost: small side ×nsalt —
use only when small is actually small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    nsalt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join of ``big`` ⨝ ``small`` on column(s) ``on`` with the big
    side salted nsalt ways. Only inner/left are sound: replicating the
    small side would duplicate ITS unmatched rows under right/full.

    The salt is arbitrary but per-row stable within the job (partition
    id + intra-partition id); results never depend on salt values."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(nsalt),
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(nsalt)]))
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
