"""SCD2 history (operators/temporal.py:scd2_history): differential vs a
brute-force per-key reference on seeded random capture logs, interval
chaining (valid_to = next valid_from, exactly one current per key),
run collapsing, and the one-shuffle plan shape."""

from __future__ import annotations

import random

import pytest

from docee_spark.operators.temporal import scd2_history


def brute_scd2(rows):
    """Reference: sort per key by (ts, seq); collapse equal-attr runs.
    rows: (key, ts, seq, attr). Returns {(key, attr, valid_from):
    (valid_to, is_current, n_captures)}."""
    by_key = {}
    for k, ts, seq, a in rows:
        by_key.setdefault(k, []).append((ts, seq, a))
    out = {}
    for k, caps in by_key.items():
        caps.sort()
        runs = []
        for ts, _seq, a in caps:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, ts, 1])
        for i, (a, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            out[(k, a, vf)] = (vt, vt is None, n)
    return out


@pytest.fixture(scope="module")
def capture_frames(spark):
    rng = random.Random(43)
    # few keys, few attr values, coarse ts => adjacent equal-attr runs
    # AND same-attr reappearing after a change (must open a NEW version)
    rows = [
        (rng.randrange(6), rng.randrange(30), seq, f"v{rng.randrange(3)}")
        for seq in range(300)
    ]
    # make (key, ts) unique so the brute reference's per-key order is
    # the operator's order regardless of tie-break choice
    seen = set()
    uniq = []
    for k, ts, seq, a in rows:
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        uniq.append((k, ts, seq, a))
    df = spark.createDataFrame(uniq, "k int, ts int, seq int, a string")
    return uniq, df


class TestScd2History:
    def test_matches_bruteforce(self, capture_frames):
        rows, df = capture_frames
        got = {
            (r["k"], r["a"], r["valid_from"]): (
                r["valid_to"], r["is_current"], r["n_captures"]
            )
            for r in scd2_history(df, "k", "ts", ["a"], seq="seq").collect()
        }
        assert got == brute_scd2(rows)

    def test_intervals_chain(self, capture_frames):
        _, df = capture_frames
        hist = scd2_history(df, "k", "ts", ["a"], seq="seq").collect()
        by_key = {}
        for r in hist:
            by_key.setdefault(r["k"], []).append(r)
        for k, rs in by_key.items():
            rs.sort(key=lambda r: r["valid_from"])
            # exactly one open (current) version per key, and it is last
            assert [r["is_current"] for r in rs].count(True) == 1
            assert rs[-1]["is_current"]
            for a, b in zip(rs, rs[1:]):
                assert a["valid_to"] == b["valid_from"]
                # adjacent versions must differ (runs were collapsed)
                assert a["a"] != b["a"]

    def test_multi_attr_and_reappearance(self, spark):
        rows = [
            ("u", 1, "x", 1), ("u", 2, "x", 1),   # run of 2
            ("u", 3, "y", 1),                     # change attr1
            ("u", 4, "y", 2),                     # change attr2
            ("u", 5, "x", 1),                     # reappearance: NEW version
        ]
        df = spark.createDataFrame(rows, "k string, ts int, a string, b int")
        hist = sorted(
            scd2_history(df, "k", "ts", ["a", "b"]).collect(),
            key=lambda r: r["valid_from"],
        )
        assert [
            (r["a"], r["b"], r["valid_from"], r["valid_to"], r["n_captures"])
            for r in hist
        ] == [
            ("x", 1, 1, 3, 2),
            ("y", 1, 3, 4, 1),
            ("y", 2, 4, 5, 1),
            ("x", 1, 5, None, 1),
        ]

    def test_single_shuffle_plan(self, capture_frames):
        _, df = capture_frames
        hist = scd2_history(df, "k", "ts", ["a"], seq="seq")
        plan = hist._jdf.queryExecution().executedPlan().toString()
        # every window spec's clustering is satisfied by the single
        # key-hash exchange: exactly one Exchange in the whole plan
        assert plan.count("Exchange") == 1, plan
