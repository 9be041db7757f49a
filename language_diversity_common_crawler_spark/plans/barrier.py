"""Selective predicate-pushdown barrier for expensive derived columns.

The pathology (observed, not hypothetical): Catalyst's
``InferFiltersFromConstraints`` adds ``isnotnull(url_canon)`` under any
equi-join on a derived key, and ``PushDownPredicates`` then pushes that
filter through every staged ``Project`` below it, textually substituting
each alias with its defining expression. Substitution is recursive and
multiplies along the stage chain: the six-regex staged canonicalize
(``frontier/urlgen.with_canonical``) re-inlines ~16 copies of the
fragment-strip regex plus ~8 copies of the validator RLIKE inside ONE
``Filter`` node, the fused WholeStageCodegen ``processNext()`` exceeds
janino's 64 KB method limit ("Code grows beyond 64 KB",
``filter_mutableStateArray_1[76]`` — 77 compiled Pattern slots), and
Spark silently falls back to interpreted evaluation on the frontier's
hottest path.  At 10^10 URLs that silent fallback erases the whole-stage-
codegen win the scaling gate is built on.

The fix is a no-op ``Generate`` node: ``explode(array(struct(<cols>)))``
emits exactly one row per input row (the array literal is never NULL or
empty), so values are untouched, but ``PushPredicateThroughNonJoin``
only pushes predicates through a ``Generate`` when they reference the
generator's *input* — predicates over the generated columns stop above
it and evaluate against materialized attributes.  The barrier is
*selective*: filters on pass-through columns (``seed_id % 3 = 0``) still
reach the parquet scan, only filters on the expensive derived columns are
pinned above the single evaluation point.  ``GenerateExec`` participates
in whole-stage codegen, so the stage stays compiled; the per-row cost is
one 1-element array allocation — noise next to one regex.

Alternatives rejected:
- ``spark.sql.constraintPropagation.enabled=false`` — session-wide
  sledgehammer; drops useful join-key null pruning everywhere, and an
  EXPLICIT ``filter(url_canon.isNotNull())`` would still blow up.
- marking the projection non-deterministic (the ``decode_udf`` fence in
  ``plans/pipeline.py``) — blocks pushdown of *all* predicates through
  the stage, including the cheap pass-through ones that belong in the
  scan.
- ``localCheckpoint()`` — cuts lineage and costs a materialization; far
  too heavy for a map-stage fence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_barrier_columns(
    df: DataFrame, cols: dict[str, Column], struct_alias: str = "__barrier"
) -> DataFrame:
    """Append ``cols`` (name -> Column) behind a no-op Generate barrier.

    Output schema = ``df`` columns (unchanged order) + ``cols`` keys in
    dict order.  Each expression in ``cols`` is evaluated exactly once
    per row; downstream predicates on the new columns resolve to
    attributes above the Generate instead of re-inlining the defining
    expressions (see module docstring).  NULL values in ``cols`` pass
    through: the exploded array itself is a 1-element constructor, never
    NULL, so no row is dropped.
    """
    if not cols:
        return df
    if struct_alias in df.columns:
        raise ValueError(
            f"with_barrier_columns: {struct_alias!r} collides with an "
            "input column"
        )
    for name in cols:
        if name in df.columns:
            raise ValueError(
                f"with_barrier_columns: output column {name!r} already "
                "exists on the input — the barrier appends, it does not "
                "replace"
            )
    base = list(df.columns)
    packed = F.explode(
        F.array(F.struct(*[c.alias(n) for n, c in cols.items()]))
    ).alias(struct_alias)
    out = df.select(*base, packed)
    return out.select(
        *base,
        *[F.col(f"{struct_alias}.{n}").alias(n) for n in cols],
    )
