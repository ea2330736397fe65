"""Skew-mitigation join strategies.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; explicit salting remains the tool when one join key dominates
so badly that even split shuffle partitions overwhelm a task, or when
the engine can't see the skew (e.g. a first-shuffle aggregation). The
transformation is semantics-preserving, so its oracle is the PLAIN join:
salting must change the physical distribution and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, n_salts: int = 8, how: str = "inner"
                ) -> DataFrame:
    """Equi-join with key salting: the big side gets a deterministic salt
    in [0, n_salts) (hash of the whole row's key column value would
    collapse to one salt per key — the point is to SPLIT a hot key, so
    the salt must vary WITHIN a key: derive it from a content hash of
    the big row), and the small side is replicated n_salts times. The
    join key becomes (key, salt), spreading each hot key over n_salts
    shuffle partitions.

    Cost model: small side inflates n_salts x (only acceptable for dim
    tables); big side's shuffle is unchanged in volume but uniform in
    distribution. Result is row-identical to the plain join."""
    # Salt from a hash over all big-side columns: varies within a key,
    # deterministic across runs (no rand() — keeps retries/oracle stable).
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salts)).cast("int")
    b = big.withColumn("_salt", salt)
    s = (small.withColumn("_salt", F.explode(
            F.array(*[F.lit(i) for i in range(n_salts)]))))
    out = b.join(s, (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
                 how)
    return out.drop("_salt")
