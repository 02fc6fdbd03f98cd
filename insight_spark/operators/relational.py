"""Relational composites with deterministic semantics (SURVEY.md §2.C/D/F).

Determinism discipline (§7.4.3): every operator that leaks physical order
into values (top-k, keep-one-per-key, first/last) takes an explicit total
order including a unique tie-break key.  Plain Spark ``dropDuplicates`` /
``limit`` without order are nondeterministic under retries and AQE —
fine for exploration, wrong for a reproducible engine.

Scale notes (100 TB posture):
- ``topk`` compiles to a single ``TakeOrderedAndProject`` physical op —
  per-partition heap + driver merge of k rows; no global sort.
- ``keep_one_per_key`` is one hash-shuffle by key + ``min_by`` — map-side
  partial aggregation applies, state per key is one row.
- ``top_k_per_group`` (windows.py) benefits from Spark ≥3.5's
  ``InferWindowGroupLimit``: rank-filter is pushed to a per-group limit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Exact money/measure arithmetic type — the float-determinism escape
#: hatch (SURVEY.md §7.4.1): sums over DECIMAL are order-independent.
MONEY = "decimal(38,6)"


def money(c: Column | str) -> Column:
    """Cast a measure to exact decimal before aggregation."""
    return F.col(c).cast(MONEY) if isinstance(c, str) else c.cast(MONEY)


def money_out(c: Column | str, digits: int = 6) -> Column:
    """Final projection for DECIMAL accumulators: rounded double.

    Accumulate in DECIMAL(38,6) (exact, order-independent), but never
    ship DecimalType in a query's output schema — the external driver's
    value hash renders Spark vs DuckDB decimals differently and fails
    ``hash_match`` on byte-identical values (VERDICT.md r1).  The
    ``round(cast(double), 6)`` formula is the proven hash-stable pattern;
    mirror ``ROUND(CAST(x AS DOUBLE), 6)`` in the oracle SQL.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col.cast("double"), digits)


def decimal_avg(sum_col: Column, count_col: Column, digits: int = 6) -> Column:
    """Deterministic mean: exact decimal sum / count, rounded as double.

    Both the Spark and the DuckDB oracle sides compute the identical
    formula, so the resulting doubles are bit-equal (SURVEY.md §7.4.1).
    """
    return F.round(sum_col.cast("double") / count_col, digits)


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k with a caller-supplied *total* order (F5).

    ``order`` must end in a unique key so results are deterministic.
    Physical plan: TakeOrderedAndProject (no full sort, no extra shuffle).
    """
    return df.orderBy(*order).limit(k)


def keep_one_per_key(
    df: DataFrame, keys: Sequence[str], tie: str
) -> DataFrame:
    """Deterministic keyed dedup (D17): keep the row minimizing ``tie``.

    Expressed as ``min_by(struct(*), tie)`` so it is a single hash
    aggregate (partial+final), not a window over a global sort.
    """
    others = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.min_by(F.struct(*[F.col(c) for c in others]), F.col(tie)).alias("_row")
    )
    return agg.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in others])
