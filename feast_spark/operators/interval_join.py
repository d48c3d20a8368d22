"""Point-in-interval join: match point events to the keyed intervals
that contain them (attribution windows, session membership, validity
ranges).

The reference's only temporal join is as-of (SURVEY §2 J1); interval
containment is its natural sibling for training pipelines: "attach
every view event to the purchase whose attribution window it falls
in", "tag each log line with the deploy that was live".

Shape: equi-join on the entity keys first (ONE hash shuffle, same
partitioning as every other keyed operator here), the range predicate
applied as a join filter. Catalyst evaluates the containment check
inside the join, so the blow-up is bounded by intervals-per-key x
points-per-key within each key group, never a cross product.

At 100 TB: hot keys with many open intervals are the risk; cap or
pre-split intervals (e.g. clamp attribution windows) or salt the key
(operators/skew.salted_join) — the range predicate itself stays
unchanged. For key-free interval joins, bucketize time into aligned
buckets on both sides and equi-join the bucket id; not needed for the
keyed case this engine ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
    closed: str = "[)",
) -> DataFrame:
    """Join each point row to every interval row (same ``keys``) whose
    [start, end) contains ``point_ts``.

    ``closed`` picks bound inclusivity: "[)" (default, half-open),
    "[]", "(]", or "()". Column-name collisions (other than keys) must
    be resolved by the caller; ``how`` of "inner" keeps matched points,
    "left" keeps all points with NULL interval columns on miss.
    """
    if closed not in ("[)", "[]", "(]", "()"):
        raise ValueError(f"closed must be one of [), [], (], (); got {closed!r}")
    p_ts = F.col(point_ts)
    lo = F.col(start_col)
    hi = F.col(end_col)
    lower = p_ts >= lo if closed[0] == "[" else p_ts > lo
    upper = p_ts <= hi if closed[1] == "]" else p_ts < hi
    cond = lower & upper
    for k in keys:
        cond = cond & (points[k] == intervals[k])
    joined = points.join(intervals, cond, how)
    # keep one copy of each key column (the points side; NULL-free even
    # for "left")
    drop = [intervals[k] for k in keys]
    for c in drop:
        joined = joined.drop(c)
    return joined
