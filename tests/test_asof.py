"""As-of join (operators/temporal.py): differential vs a brute-force
per-row reference on seeded random data, tie semantics (inclusive <=,
greatest-seq winner), no-match NULLs, tolerance, column hygiene."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from docee_spark.operators.temporal import interval_join, join_as_of


def brute_asof(lrows, rrows, tolerance=None):
    """Reference: for each (lid, k, lt), the right (k, rt, seq, val)
    maximizing (rt, seq) with rt <= lt (and lt - rt <= tolerance)."""
    out = {}
    for lid, k, lt in lrows:
        best = None
        for rk, rt, seq, val in rrows:
            if rk != k or rt > lt:
                continue
            if tolerance is not None and lt - rt > tolerance:
                continue
            if best is None or (rt, seq) > (best[0], best[1]):
                best = (rt, seq, val)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


@pytest.fixture(scope="module")
def rand_frames(spark):
    rng = random.Random(41)
    # few keys + coarse timestamps => dense ties on (key, ts), the case
    # that distinguishes a correct total order from a flaky one
    lrows = [
        (i, rng.randrange(5), rng.randrange(20)) for i in range(200)
    ]
    rrows = [
        (rng.randrange(5), rng.randrange(20), seq, seq * 10)
        for seq in range(150)
    ]
    left = spark.createDataFrame(lrows, "lid int, k int, lt int")
    right = spark.createDataFrame(rrows, "k int, rt int, seq int, val int")
    return lrows, rrows, left, right


class TestJoinAsOf:
    def test_matches_bruteforce(self, rand_frames):
        lrows, rrows, left, right = rand_frames
        got = {
            r["lid"]: (r["seq"], r["val"])
            for r in join_as_of(
                left, right, "k", "k", "lt", "rt", "seq"
            ).collect()
        }
        assert got == brute_asof(lrows, rrows)

    def test_tolerance(self, rand_frames):
        lrows, rrows, left, right = rand_frames
        got = {
            r["lid"]: (r["seq"], r["val"])
            for r in join_as_of(
                left, right, "k", "k", "lt", "rt", "seq",
                tolerance=F.lit(3),
            ).collect()
        }
        assert got == brute_asof(lrows, rrows, tolerance=3)
        # tolerance nulls the payload but keeps the left row
        assert len(got) == len(lrows)

    def test_equal_ts_is_inclusive_and_seq_breaks_ties(self, spark):
        left = spark.createDataFrame([(1, 7, 10)], "lid int, k int, lt int")
        right = spark.createDataFrame(
            [(7, 10, 1, 100), (7, 10, 2, 200), (7, 9, 3, 300)],
            "k int, rt int, seq int, val int",
        )
        [row] = join_as_of(left, right, "k", "k", "lt", "rt", "seq").collect()
        # rt == lt matches (inclusive); among equal rt the max seq wins,
        # even though seq 3 is globally larger at an earlier rt
        assert (row["seq"], row["val"]) == (2, 200)

    def test_no_match_keeps_left_row_with_nulls(self, spark):
        left = spark.createDataFrame(
            [(1, 7, 10), (2, 8, 10)], "lid int, k int, lt int"
        )
        right = spark.createDataFrame(
            [(7, 11, 1, 100)], "k int, rt int, seq int, val int"
        )
        rows = {
            r["lid"]: (r["seq"], r["val"])
            for r in join_as_of(
                left, right, "k", "k", "lt", "rt", "seq"
            ).collect()
        }
        # key 7 exists but only in the future; key 8 absent entirely
        assert rows == {1: (None, None), 2: (None, None)}

    def test_payload_selection_and_clash(self, spark):
        left = spark.createDataFrame([(1, 7, 10)], "lid int, k int, lt int")
        right = spark.createDataFrame(
            [(7, 9, 1, 100)], "k int, rt int, seq int, val int"
        )
        out = join_as_of(
            left, right, "k", "k", "lt", "rt", "seq", payload=["val"]
        )
        assert out.columns == ["lid", "k", "lt", "val"]
        with pytest.raises(ValueError, match="collide"):
            join_as_of(
                left,
                right.withColumnRenamed("val", "lid"),
                "k", "k", "lt", "rt", "seq",
            )

    def test_single_shuffle_plan(self, rand_frames):
        _, _, left, right = rand_frames
        plan = (
            join_as_of(left, right, "k", "k", "lt", "rt", "seq")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # union + one window over the key partition: exactly one
        # exchange below the window, and no join operator at all
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 1


def brute_interval(erows, irows):
    """Reference: every (event_id, iv_id) with iv_user == user and
    s <= ts <= e, inclusive both ends."""
    return {
        (eid, vid)
        for eid, u, ts in erows
        for vid, vu, s, e in irows
        if u == vu and s <= ts <= e
    }


class TestIntervalJoin:
    def _frames(self, spark, seed=7, n_ev=400, n_iv=40, span=10_000):
        rng = random.Random(seed)
        erows = [
            (i, rng.randrange(5), rng.randrange(span)) for i in range(n_ev)
        ]
        irows = []
        for j in range(n_iv):
            s = rng.randrange(span)
            irows.append(
                (1000 + j, rng.randrange(5), s, s + rng.randrange(1, span // 4))
            )
        ev = spark.createDataFrame(erows, "event_id long, user_id long, ts long")
        iv = spark.createDataFrame(
            irows, "iv_id long, iv_user long, s long, e long"
        )
        return erows, irows, ev, iv

    @pytest.mark.parametrize("bin_width", [1, 97, 1000, 100_000])
    def test_matches_bruteforce_at_any_bin_width(self, spark, bin_width):
        """With the cap out of the way, the bin width is a COST knob,
        never a semantics knob: the exact residual predicate decides
        membership at w=1 (every interval explodes wide) through w=100k
        (everything co-binned)."""
        erows, irows, ev, iv = self._frames(spark)
        got = {
            (r["event_id"], r["iv_id"])
            for r in interval_join(
                ev, iv, "ts", "s", "e", bin_width,
                keys=[("user_id", "iv_user")], max_bins=10_000,
            ).collect()
        }
        assert got == brute_interval(erows, irows)

    def test_boundaries_inclusive_both_ends(self, spark):
        ev = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 9), (4, 21)], "event_id long, ts long"
        )
        iv = spark.createDataFrame([(9, 10, 20)], "iv_id long, s long, e long")
        got = sorted(
            r["event_id"]
            for r in interval_join(ev, iv, "ts", "s", "e", 5).collect()
        )
        assert got == [1, 2]

    def test_over_cap_interval_dropped_never_exploded(self, spark):
        """An interval longer than max_bins*w never explodes: it drops
        from pairing (the dedup-cap rule — a 10^6-bin explode would be
        the scale-killer), and the drop is observable: the plan carries
        the named CollectMetrics node with both drop counters."""
        ev = spark.createDataFrame([(1, 50)], "event_id long, ts long")
        iv = spark.createDataFrame(
            [(9, 0, 100), (10, 0, 10_000_000)], "iv_id long, s long, e long"
        )
        out = interval_join(ev, iv, "ts", "s", "e", 10, max_bins=100)
        assert [r["iv_id"] for r in out.collect()] == [9]
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "n_dropped_intervals" in plan and "n_dropped_bins" in plan
        # generous cap: the long interval pairs again
        back = interval_join(ev, iv, "ts", "s", "e", 10, max_bins=2_000_000)
        assert sorted(r["iv_id"] for r in back.collect()) == [9, 10]

    def test_plan_is_hash_equi_join_never_nested_loop(self, spark):
        _, _, ev, iv = self._frames(spark)
        df = interval_join(
            ev, iv, "ts", "s", "e", 1000, keys=[("user_id", "iv_user")]
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_column_clash_raises(self, spark):
        ev = spark.createDataFrame([(1, 5)], "event_id long, ts long")
        iv = spark.createDataFrame([(9, 0, 9)], "event_id long, s long, e long")
        with pytest.raises(ValueError, match="collide"):
            interval_join(ev, iv, "ts", "s", "e", 10)
