"""Point-in-time (as-of) join.

The classic temporal operator Spark's DataFrame API lacks natively: for
every left row, attach the single most recent right row of the same key
whose timestamp is at or before the left timestamp (``backward``
direction — attribution, slowly-changing-dimension lookup, "state as of
event time").

The scalable formulation is NOT a range join (``l.key = r.key AND r.ts
<= l.ts`` explodes to O(|matches|) intermediate rows before the per-row
top-1 is taken — at web scale a hot key with a long history makes that
quadratic). Instead both sides are unioned into one stream and a single
window pass carries the latest right payload forward:

    union(left tagged side=1, right tagged side=0)
    -> one shuffle on key
    -> window last(payload, ignorenulls) over
         (partition by key order by ts, side, seq
          rows unbounded preceding .. current row)
    -> keep side=1 rows

One shuffle, one sort, O(n log n) per key, never materializes a
left-x-history pair. Skewed keys: the shuffle key is the join key, so a
pathological hot key (one user with 10^8 events) is bounded by the
window sort on one partition; split such keys by time range and
replicate the boundary right-row per split if that ever binds — the
union/window shape composes with that salting unchanged.

Determinism: ties are total-ordered. At equal timestamps the right row
wins over the left row (``<=`` inclusive semantics, side 0 sorts before
side 1), and among right rows with an equal (key, ts) the greatest
``right_seq`` wins — callers pass a unique sequence column so reruns
are bit-identical (same discipline as the dedup keep-rules in
operators/dedup.py).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window

__all__ = ["join_as_of", "scd2_history", "interval_join"]

#: internal column names; double-underscore-prefixed so they cannot
#: collide with payload columns (validated below anyway).
_K, _T, _SEQ, _PAY, _SIDE, _ROW = (
    "__k", "__t", "__seq", "__pay", "__side", "__row",
)
#: matched right timestamp, carried inside the payload struct so the
#: tolerance predicate can see it after the window pass.
_MT = "__mt"


def join_as_of(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_seq: str,
    payload: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """left LEFT-ASOF-JOIN right: most recent right row per key at or
    before each left row's timestamp.

    Returns all ``left`` columns plus the ``payload`` columns of the
    matched right row (NULL when the key has no right row at or before
    the left timestamp). ``payload`` defaults to every right column
    except ``right_key``. ``right_seq`` must totally order right rows
    within a (key, ts) tie (any unique orderable column).

    ``tolerance``: optional expression; a match older than
    ``left_ts - tolerance`` is discarded (row kept, payload NULL). For
    timestamp columns pass an INTERVAL expression
    (``F.expr("interval 30 minutes")``); for numeric ts, a number.
    """
    if payload is None:
        payload = [c for c in right.columns if c != right_key]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload columns collide with left columns: {sorted(clash)}; "
            "rename before joining"
        )
    if _MT in payload:
        raise ValueError(f"{_MT!r} is reserved")

    pay_type = StructType(
        [StructField(_MT, right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )
    row_type = StructType(list(left.schema.fields))

    lf = left.select(
        F.col(left_key).alias(_K),
        F.col(left_ts).alias(_T),
        F.lit(None).cast(right.schema[right_seq].dataType).alias(_SEQ),
        F.lit(None).cast(pay_type).alias(_PAY),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias(_ROW),
    )
    rf = right.select(
        F.col(right_key).alias(_K),
        F.col(right_ts).alias(_T),
        F.col(right_seq).alias(_SEQ),
        F.struct(
            F.col(right_ts).alias(_MT),
            *[F.col(c) for c in payload],
        ).alias(_PAY),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(row_type).alias(_ROW),
    )

    w = (
        Window.partitionBy(_K)
        .orderBy(F.asc(_T), F.asc(_SIDE), F.asc_nulls_first(_SEQ))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lf.unionByName(rf)
        .withColumn("__m", F.last(_PAY, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col(f"__m.{_MT}") >= F.col(_T) - tolerance, F.col("__m")
            ),
        )
    return matched.select(
        *[F.col(f"{_ROW}.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in payload],
    )


def scd2_history(
    captures: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    seq: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 materialization of an
    append-only capture log (the temporal-KG edge-history builder:
    captures of the same page/entity over recrawls collapse into
    validity intervals; only attribute CHANGES open a new version).

    For each ``key``, consecutive captures (ordered by ``ts``, ties
    broken by ``seq``) with identical ``attrs`` values merge into one
    version row:

      key, attrs..., valid_from (first capture ts of the run),
      valid_to (next version's valid_from; NULL for the current
      version), is_current, n_captures (captures collapsed into the
      run).

    Scale shape: ONE shuffle, on ``key``. The change flag, version
    counter, per-version capture count, and valid_to lookahead are all
    window passes over partition specs whose clustering is satisfied by
    the first key-hash exchange (HashPartitioning(key) satisfies
    ClusteredDistribution([key, version]) — Catalyst inserts sorts, not
    exchanges). A hot key's cost is bounded by its own history length
    (sort + linear scans), the same bound as join_as_of; there is no
    self-join and no key×history pair blowup, unlike the naive
    row-vs-next-row formulation.

    Determinism: ``seq`` (any unique orderable column) totally orders
    equal-``ts`` captures; omitted, equal-ts capture order is
    tie-broken by the attrs tuple itself so reruns are stable when
    duplicates are exact.
    """
    if not attrs:
        raise ValueError("attrs must name at least one tracked column")
    order = [F.asc(ts)] + (
        [F.asc(seq)] if seq else [F.asc(a) for a in attrs]
    )
    w = Window.partitionBy(key).orderBy(*order)
    a_struct = F.struct(*[F.col(a) for a in attrs])
    changed = F.coalesce(
        a_struct != F.lag(a_struct).over(w), F.lit(True)
    )
    rows = captures.select(
        key, ts, *attrs,
        F.sum(changed.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__ver"),
    )
    wv = Window.partitionBy(key, "__ver")
    wvo = wv.orderBy(F.asc(ts))
    per_ver = rows.select(
        key, *attrs,
        F.col(ts).alias("valid_from"),
        F.count(F.lit(1)).over(wv).alias("n_captures"),
        F.row_number().over(wvo).alias("__rn"),
        F.col("__ver"),
    ).where(F.col("__rn") == 1)
    wk = Window.partitionBy(key).orderBy(F.asc("__ver"))
    return per_ver.select(
        key, *attrs, "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
        F.lead("valid_from").over(wk).isNull().alias("is_current"),
        "n_captures",
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start: str,
    end: str,
    bin_width: int,
    keys: list[tuple[str, str]] | None = None,
    max_bins: int = 1024,
) -> DataFrame:
    """Interval-containment join: every (event, interval) pair with
    ``start <= event_ts <= end`` (inclusive both ends), optionally also
    matching on equi-``keys`` [(event_col, interval_col), ...].

    Spark has no native interval join — ``events JOIN intervals ON ts
    BETWEEN s AND e`` plans as BroadcastNestedLoopJoin (every event
    tested against every interval: O(|events|·|intervals|), a
    scale-killer past toy sizes). This is the standard BINNING
    reduction instead: both sides map to fixed-width time bins
    (events to ⌊ts/w⌋ — exactly one bin per event, so no dedup pass is
    needed; intervals explode to the ⌊s/w⌋..⌊e/w⌋ range they cover),
    the bin (+ keys) equi-join prunes to co-binned candidates, and the
    exact BETWEEN predicate keeps true matches. Plan-asserted: a hash
    equi-join, never a nested-loop/cartesian.

    Cost model: interval replication = interval length / ``bin_width``
    (pick w ≈ typical interval length: replication O(1) per interval
    while each event meets only intervals within ±w of its bin).
    Intervals covering more than ``max_bins`` bins are DROPPED FROM
    PAIRING, never exploded — same observable-cap discipline as the
    dedup bucket caps (named observe metrics ``n_dropped_intervals``,
    ``n_dropped_bins``; an over-cap interval is a caller's w mismatch,
    not silent data loss). Timestamps bin via a cast to double epoch
    seconds — monotone, so binning is conservative and the exact
    predicate on the ORIGINAL columns decides membership.

    Returns all ``events`` columns plus all ``intervals`` columns
    (collision-checked). Both inputs shuffle once, on (bin, keys);
    skewed bins (everything in one hour) cost their true match volume —
    AQE skew-join splits apply since it is a plain equi-join."""
    from .dedup import _metric_name

    keys = keys or []
    clash = set(intervals.columns) & set(events.columns)
    if clash:
        raise ValueError(
            f"interval columns collide with event columns: {sorted(clash)}; "
            "rename before joining"
        )
    bin_of = lambda c: F.floor(F.col(c).cast("double") / F.lit(bin_width))  # noqa: E731

    n_bins = bin_of(end) - bin_of(start) + 1
    iv = intervals.withColumn("__nb", n_bins)
    iv = iv.observe(
        _metric_name("interval_join"),
        F.sum(F.when(F.col("__nb") > max_bins, 1).otherwise(0)).alias(
            "n_dropped_intervals"
        ),
        F.sum(F.when(F.col("__nb") > max_bins, F.col("__nb")).otherwise(0)).alias(
            "n_dropped_bins"
        ),
    )
    iv = (
        iv.filter(F.col("__nb") <= max_bins)
        .withColumn(
            "__bin", F.explode(F.sequence(bin_of(start), bin_of(end)))
        )
        .drop("__nb")
    )
    ev = events.withColumn("__bin", bin_of(event_ts))
    cond = [ev["__bin"] == iv["__bin"]]
    cond += [ev[a] == iv[b] for a, b in keys]
    cond.append(ev[event_ts].between(iv[start], iv[end]))
    joined = ev.join(iv, cond, "inner")
    return joined.select(
        *[ev[c] for c in events.columns],
        *[iv[c] for c in intervals.columns],
    )
