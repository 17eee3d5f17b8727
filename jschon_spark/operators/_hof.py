"""Evaluate-once fencing for higher-order-function pipelines.

Spark's higher-order functions (transform/filter/aggregate/zip_with)
are interpreted — no whole-stage codegen and no common-subexpression
elimination. Two consequences for expression-built array pipelines:

1. A lambda that mentions an OUTER expression subtree (e.g.
   ``F.slice(toks, i, n)`` where ``toks`` is itself ``split(...)``)
   re-evaluates that subtree PER ELEMENT — an O(k) array build turns
   into O(k^2) work per row.
2. ``CollapseProject`` merges ``withColumn`` chains, inlining an
   aliased array into every consumer, so ``size(a)``, ``explode(a)``
   and each of N signature hashes all recompute the array.

``fence(col)`` wraps the expression in a condition that is always true
but that the optimizer must treat as non-deterministic, so
CollapseProject cannot re-inline the aliased column into its
consumers, and inferred filters (``InferFiltersFromGenerate``'s
``size(g) > 0`` below an explode) cannot be pushed below the
projection with the full expression substituted — without the fence
that pushdown lands the O(k^2) build on the pre-``repartition`` scan
stage, single-partition AND evaluated twice. The classic
``rand() >= -1`` guard no longer works: Spark 4 knows rand's [0,1)
range and folds the comparison away, so the fence uses
``monotonically_increasing_id() >= -1`` (always true — ids are
non-negative — but opaque to constant folding). Measured 16x on the
Gopher repetition signals and 5x on decontamination at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fence(col: Column) -> Column:
    """Pin ``col`` to a single evaluation per row (see module doc)."""
    return F.when(F.monotonically_increasing_id() >= -1, col)
