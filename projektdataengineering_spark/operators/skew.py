"""Skew-mitigated equi-join (key salting) — the manual fallback for
joins AQE's skew handling can't split.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py) already
splits skewed SORT-MERGE join partitions at runtime, and that is the
first-choice answer. Salting is for the cases AQE doesn't cover:
shuffled-hash joins, skew that only materializes after several chained
joins, or a build side too large per-key for one task's memory. The
pattern is the classic one:

* the PROBE side (large, skewed) gets a deterministic salt in
  [0, n_salts) — here `pmod(xxhash64(<whole row>), n)` so replays and
  retries land identically (no rand(): a task retry re-salting rows
  differently would double/drop rows);
* the BUILD side is replicated n_salts× with an exploded salt column;
* the join adds `salt` to the key equality, spreading each hot key
  over n_salts reducers at the cost of an n×-larger build shuffle —
  choose n ≈ (hot-key rows / target-task rows), keep the build side
  the small one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe ⋈ build` on `on`, with probe-side salting and
    build-side replication. Semantics identical to `probe.join(build,
    on, how)` for how in {inner, left}; result drops the salt column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")

    probe_s = probe.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    build_s = build.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return probe_s.join(build_s, on=[*keys, SALT], how=how).drop(SALT)
