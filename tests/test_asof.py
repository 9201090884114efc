"""As-of join (operators/temporal.py): differential vs a brute-force
per-row reference on seeded random data, tie semantics (inclusive <=,
greatest-seq winner), no-match NULLs, tolerance, column hygiene."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from docee_spark.operators.temporal import join_as_of


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
