"""Two-pass distributed prefix aggregation over a quantized bucket key.

The pattern that replaces the single-partition global window
(``Window.orderBy(...)`` with no ``partitionBy`` — Spark moves the WHOLE
relation into one task): quantize the sort key into an integer bucket
that is monotone in the sort order, aggregate per bucket (distributed
hash agg), take the exclusive prefix over the *bucket aggregate*
relation (whose size is bounded by the key DOMAIN / bucket width —
independent of row count), broadcast it back, and finish with a window
partitioned by bucket.  Exact rank / running sum / running max fall out
as ``prefix + intra-bucket window``, hash-identical to the global-window
formulation, with per-task work bounded by the largest bucket.

Bucket-key contract: ``bucket`` must be an integer column such that
``order(a) < order(b)  ⟹  bucket(a) <= bucket(b)`` and equal sort keys
share a bucket (any truncating integer division of the leading sort key
satisfies both — Spark's ``div`` truncates toward zero, which is still
monotone).  For DESC orderings negate the quotient.

Degenerate-distribution caveat: if the leading sort key is (nearly)
constant, one bucket holds (nearly) everything and the intra-bucket
window degrades toward the global sort this module exists to avoid.
The fix is compositional, not structural: extend the bucket to a
lexicographic composite over the tie-break key (e.g. ``(cents div C,
user_id div C2)``) — ``bucket_prefix`` already accepts any monotone
integer key, and the stats relation stays domain-bounded as long as
the composite's product of bucket counts is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: prefix combiners supported for the tiny bucket-stats window
_COMBINE = {"sum": F.sum, "max": F.max}


def bucket_prefix(
    df: DataFrame,
    bucket: str,
    aggs: dict[str, tuple[Column, str]],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Exclusive prefix aggregates over strictly-lower buckets.

    ``aggs`` maps output alias -> (per-bucket aggregate expression,
    prefix combiner name in ``_COMBINE``).  Returns one row per
    (partition_cols..., bucket) with a ``pre_<alias>`` column per agg:
    the combiner applied over all rows of strictly smaller buckets in
    the same partition group (NULL for the first bucket — callers
    coalesce to their identity).  The only unpartitioned window (when
    ``partition_cols`` is empty) runs over the bucket-aggregate
    relation, bounded by the key domain / bucket width.
    """
    stats = df.groupBy(*partition_cols, bucket).agg(
        *[expr.alias(f"_b_{alias}") for alias, (expr, _) in aggs.items()]
    )
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return stats.select(
        *partition_cols,
        bucket,
        *[
            _COMBINE[comb](f"_b_{alias}").over(w).alias(f"pre_{alias}")
            for alias, (_, comb) in aggs.items()
        ],
    )


def exact_ntile(rank: Column, n: Column, k: int) -> Column:
    """Tile index of a 1-based exact ``rank`` among ``n`` rows under
    standard SQL ``NTILE(k)`` semantics (the first ``n mod k`` tiles get
    ``ceil(n/k)`` rows, the rest ``floor(n/k)``) — pure integer
    arithmetic, so a distributed two-pass rank can reproduce the
    engine's NTILE bit-for-bit without a single-partition sort."""
    q = (n / k).cast("long")  # n, k >= 0: double division exact for n < 2^52
    m = n - q * k
    big = m * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    in_big = ((rank + q) / (q + 1)).cast("long")  # ceil(rank/(q+1))
    # When n < k, q = 0 and big = n, so the WHEN branch covers every row
    # and in_small is unreachable — but don't lean on lazy CASE
    # evaluation for the q = 0 division (ANSI mode would raise on the
    # expression even for rows that never take the branch under some
    # rewrites): greatest(q, 1) is a no-op on every reachable row.
    safe_q = F.greatest(q, F.lit(1))
    in_small = m + ((rank - big + safe_q - 1) / safe_q).cast("long")
    return F.when(rank <= big, in_big).otherwise(in_small).cast("int")
