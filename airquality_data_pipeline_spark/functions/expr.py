"""Expression-level helpers for building efficient Catalyst trees.

The one non-obvious hazard with pyspark higher-order functions
(transform / filter / aggregate / zip_with): an outer COMPUTED
expression referenced inside the lambda body is inlined by Catalyst and
re-evaluated on EVERY lambda invocation. For a per-token lambda over a
tokenized document, capturing the `split(...)` expression itself turns
an O(k) pass into O(k^2) regex splits per row (measured: 4.2 s for a
5000-doc shingle build at sf0.1 that runs in ~0.3 s once bound).

`let()` is the fix: a let-expression built from `transform` over a
single-element array. The bound value becomes a real lambda variable,
evaluated once per row, and every reference inside the body reads the
variable instead of re-running the expression tree.

The second hazard is multi-column reuse: ProjectCollapsing merges
adjacent projections, so SEPARATE output columns that reference the
same expensive expression each get their own inlined copy (physical
subexpression elimination does not reach interpreted higher-order
subtrees). When several output columns need the same expensive value,
route it through a Generate boundary — `materialize()` explodes a
single-element array of a struct, which ProjectCollapsing cannot cross,
so downstream projections read plain attributes.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind `value` once per row and use it via the lambda variable.

    ``let(expensive, lambda v: f(v))`` evaluates `expensive` exactly
    once even if `v` appears many times (or inside nested lambdas) in
    the body. Nest calls to bind several values.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def materialize(
    df: DataFrame, keep: list[str], col: Column, alias: str
) -> DataFrame:
    """Project `col` through a Generate boundary so later selects read
    it as an attribute instead of re-inlining its expression tree.

    Explodes a one-element array — row count is unchanged (explode of a
    non-empty array never drops rows) and GenerateExec stays inside
    whole-stage codegen. Use for a struct of values that several output
    columns will consume.
    """
    return df.select(*keep, F.explode(F.array(col)).alias(alias))
