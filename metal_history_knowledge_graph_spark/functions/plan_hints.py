"""Physical-plan hints expressible inside a DataFrame expression.

Spark picks the aggregation strategy from the aggregate-buffer types:
fixed-width mutable buffers → HashAggregate (whole-stage codegen);
any TypedImperativeAggregate present → ObjectHashAggregate (hash map of
object buffers, partial-agg capable); otherwise → SortAggregate, which
SORTS every input partition by the grouping keys. min/max over strings
or structs carry immutable buffers, so a first-occurrence-wins dedup
(``min(struct(order_key, ...))``) silently lands on SortAggregate — on
a mention-scale stream that is a per-partition sort of billions of
wide rows where a hash map lookup would do (measured ~3× slower at
10⁷ rows than the ObjectHashAggregate path, and the gap grows with
row width).

``hash_agg_pin()`` is a constant-set typed-imperative aggregate whose
per-key state is the single-element set {1}: adding it to an
aggregation flips the whole plan onto ObjectHashAggregate while
changing no results. Pair it with
``spark.sql.objectHashAggregate.sortBased.fallbackThreshold`` sized
above the vocabulary (session.ENGINE_CONFS) so the hash map never
falls back to sorting. Plan shape is pinned by
tests/test_plans.py::test_mention_scale_aggs_stay_hash_based.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_agg_pin() -> Column:
    """Constant-state aggregate that pins ObjectHashAggregate; alias it
    to ``_h`` and remove it with :func:`drop_pin` — a bare ``.drop``
    would let the optimizer prune the unused aggregate and silently
    fall back to SortAggregate."""
    return F.collect_set(F.lit(1))


def drop_pin(df, col: str = "_h"):
    """Remove the pin column while keeping the aggregate alive: the
    size() predicate (always true, but not foldable — Catalyst cannot
    prove a collect_set non-empty) references the column, so column
    pruning cannot eliminate the typed-imperative aggregate that keeps
    the plan hash-based."""
    return df.filter(F.size(F.col(col)) >= 0).drop(col)
