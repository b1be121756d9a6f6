"""Declarative data-quality expectations (constraint audit).

The Delta-Live-Tables-expectations / AWS-deequ capability class: a
pipeline states constraints on a table and gets one (rule,
n_violations, n_checked) row per rule, computed as AGGREGATES over the
fact scan — never a row loop, never a collect.

Cost model at 100 TB:
- every row-predicate rule folds into ONE shared scan+agg pass
  (conditional sums — Catalyst collapses them into a single partial/
  final aggregation);
- a uniqueness rule is one groupBy(keys) on top of the same scan
  (rows in over-represented keys count as violations, the whole
  duplicate group minus one survivor);
- a foreign-key rule is one anti-join against the dimension (the
  dimension side broadcasts when small, the normal FK case).

The audit result is a handful of rows regardless of input size, so it
can gate a pipeline run (C3-style) or land on the lake as a run
artifact.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class RowCheck:
    """violation_cond TRUE (or NULL-handled as specified) → violation."""

    name: str
    violation_cond: Column


@dataclass(frozen=True)
class UniqueCheck:
    """Every row beyond the first per key group is a violation; NULL
    keys form their own group (a NULL-keyed 'duplicate' is still a
    duplicate for audit purposes)."""

    name: str
    cols: Sequence[str]


@dataclass(frozen=True)
class ForeignKeyCheck:
    """Rows whose key tuple has no match in ``dim`` are violations;
    NULL fact keys never match (SQL semi-join semantics)."""

    name: str
    cols: Sequence[str]
    dim: DataFrame = field(compare=False)
    dim_cols: Sequence[str] = ()
    broadcast_dim: bool = True


def constraint_audit(
    df: DataFrame,
    checks: Sequence[RowCheck | UniqueCheck | ForeignKeyCheck],
) -> DataFrame:
    """(rule, n_violations, n_checked) per check — see module
    docstring for the per-rule plan shapes."""
    if not checks:
        raise ValueError("constraint_audit: no checks given")
    # check names become agg aliases and are interpolated into the
    # stack() SQL below — an unvalidated name with a quote/space would
    # break parsing, and '_n' would shadow the shared row counter
    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    for c in checks:
        if not ident.match(c.name) or c.name == "_n":
            raise ValueError(
                "constraint_audit: check names must be identifiers "
                f"([A-Za-z_][A-Za-z0-9_]*, not '_n'); got {c.name!r}"
            )
    if len({c.name for c in checks}) != len(checks):
        raise ValueError("constraint_audit: duplicate check names")
    pieces: list[DataFrame] = []

    row_checks = [c for c in checks if isinstance(c, RowCheck)]
    if row_checks:
        aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
        for c in row_checks:
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.coalesce(c.violation_cond, F.lit(False)), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),  # empty input: 0 violations, not NULL
                )
                .cast("bigint")
                .alias(c.name)
            )
        one = df.agg(*aggs)
        stack = ", ".join(f"'{c.name}', {c.name}" for c in row_checks)
        pieces.append(
            one.selectExpr(
                f"stack({len(row_checks)}, {stack}) AS (rule, n_violations)",
                "_n AS n_checked",
            ).select("rule", "n_violations", "n_checked")
        )

    for c in checks:
        if isinstance(c, UniqueCheck):
            grp = df.groupBy(*c.cols).agg(F.count(F.lit(1)).alias("_cnt"))
            pieces.append(
                grp.agg(
                    F.lit(c.name).alias("rule"),
                    F.coalesce(F.sum(F.col("_cnt") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations"),
                    F.coalesce(F.sum("_cnt"), F.lit(0))
                    .cast("bigint")
                    .alias("n_checked"),
                ).select("rule", "n_violations", "n_checked")
            )
        elif isinstance(c, ForeignKeyCheck):
            dim_cols = list(c.dim_cols or c.cols)
            dim = c.dim.select(
                *[F.col(d).alias(f) for d, f in zip(dim_cols, c.cols)]
            ).dropDuplicates(list(c.cols))
            if c.broadcast_dim:
                dim = F.broadcast(dim)
            orphans = df.join(dim, on=list(c.cols), how="left_anti")
            n_bad = orphans.agg(
                F.count(F.lit(1)).cast("bigint").alias("n")
            ).select(
                F.lit(c.name).alias("rule"),
                F.col("n").alias("n_violations"),
            )
            n_all = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_checked"))
            pieces.append(n_bad.crossJoin(F.broadcast(n_all)))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
