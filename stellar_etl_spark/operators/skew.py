"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions.  For *pathological* hot keys —
one key holding a double-digit share of a 100 TB fact table — explicit
salting is still the reliable tool: the fact side spreads each key across
``n_salt`` sub-keys, the (non-broadcastable) dimension side replicates
``n_salt``×, and the join runs on (key, salt) with uniform partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⨝ dims`` on ``on`` with ``n_salt``-way salting.

    The fact side gets a per-row salt (monotonic id — uniform and cheap;
    row-nondeterministic but join results are salt-invariant), the dim side
    is exploded once per salt value.  Output equals the plain join, with the
    hot key's work spread over ``n_salt`` reducers.
    """
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    salted_dims = dims.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return (
        salted_facts.join(salted_dims, [on, "_salt"], how)
        .drop("_salt")
    )
