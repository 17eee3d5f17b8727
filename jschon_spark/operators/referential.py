"""Referential checks — ``enum`` against a dimension table.

jschon analogue: ``enum`` tests one value against a literal list
(/root/reference/jschon/vocabulary/validation.py:49-55). At table scale
the allowed set is itself a table (e.g. a lang-code dimension) and the
check is an anti-join.

Scale notes
-----------
A dimension of a few hundred codes is broadcast (one hash table per
executor, zero shuffle of the 10^12-row fact side). If the dimension
outgrows the broadcast threshold the same call with
``broadcast_dim=False`` lets Catalyst/AQE pick a sort-merge or shuffled
hash anti-join. NULL foreign keys never match the join key, so they
surface as violations — matching SQL ``NOT EXISTS`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str,
    broadcast_dim: bool = True,
    select: list[str] | None = None,
) -> DataFrame:
    """Rows of ``fact`` whose ``fk`` has no match in ``dim.pk``."""
    d = dim.select(F.col(pk).alias("__pk")).dropDuplicates(["__pk"])
    if broadcast_dim:
        d = F.broadcast(d)
    out = fact.join(d, fact[fk] == d["__pk"], "left_anti")
    if select is not None:
        out = out.select(*select)
    return out


def enum_violations(
    df: DataFrame, column: str, allowed: list, select: list[str] | None = None
) -> DataFrame:
    """Literal-list form (exactly jschon's ``enum``): rows whose value is
    not deep-equal to any allowed literal. NULL counts as a violation
    unless None is in ``allowed``."""
    col = F.col(column)
    pred = col.isin(*[a for a in allowed if a is not None])
    if None in allowed:
        pred = pred | col.isNull()
    else:
        pred = pred & col.isNotNull()
    out = df.filter(~F.coalesce(pred, F.lit(False)))
    if select is not None:
        out = out.select(*select)
    return out
