"""HyperLogLog sketch tests (operators/sketches.py).

Layers: an exhaustive cross-engine pin of the one libm exposure
(floor(ln(int)·1e6) for every integer the linear-counting branch can
see), a register-level differential vs an independently written pure
python HLL, the shard-merge identity, and accuracy gates for both
estimate branches.
"""
from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from docee_spark.operators.sketches import (
    ALPHA_E6,
    M,
    RANK_CAP,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
    hll_sql,
)


def py_hll_registers(keys):
    """Independent python HLL: same frozen contract, written against the
    spec (md5 hex → 8-bit bucket, rank of next 48 bits, cap 40) with
    BIT arithmetic rather than hex-character grammar."""
    regs: dict[int, int] = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        v = int(h[:14], 16)  # 56 bits: 8 bucket + 48 rank material
        bucket = v >> 48
        tail = v & ((1 << 48) - 1)
        rank = 49 if tail == 0 else 48 - tail.bit_length() + 1
        rank = min(rank, RANK_CAP)
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def py_hll_estimate(regs):
    sum_num = sum(
        1 << (RANK_CAP - regs.get(b, 0)) for b in range(M)
    )
    est_raw = math.floor(
        (ALPHA_E6 * M * M) / (sum_num / float(1 << RANK_CAP)) / 1e6
    )
    n_zero = M - sum(1 for r in regs.values() if r > 0)
    if n_zero > 0 and est_raw < int(2.5 * M):
        ln_m = math.floor(math.log(M) * 1e6)
        ln_v = math.floor(math.log(n_zero) * 1e6)
        return math.floor(M * (ln_m - ln_v) / 1e6)
    return est_raw


class TestLnPin:
    def test_floor_ln_e6_java_duckdb_python_agree_1_to_256(self, spark):
        """The linear-counting branch's only libm call, pinned
        exhaustively over its entire input domain in all three engines."""
        py = [math.floor(math.log(v) * 1e6) for v in range(1, 257)]
        java = [
            r.l
            for r in spark.range(1, 257)
            .select(
                F.col("id"),
                F.floor(F.log(F.col("id").cast("double")) * F.lit(1e6))
                .cast("long")
                .alias("l"),
            )
            .orderBy("id")
            .collect()
        ]
        duck = [
            r[0]
            for r in duckdb.sql(
                "select cast(floor(ln(v) * 1000000) as bigint)"
                " from range(1, 257) t(v) order by v"
            ).fetchall()
        ]
        assert java == py
        assert duck == py

    def test_floor_ln_e6_agrees_on_sampled_large_args(self, spark):
        """BM25's idf args (2N+2, 2·df+1) and keywords' (N+1, df) are
        unbounded, unlike linear counting's 1..256 — pin the same
        floor(ln·1e6) boundary on deterministically-sampled integers up
        to 1e12 across all three engines (Math.log is 1-ulp accurate;
        a value within 1 ulp of a 1e-6 floor boundary is the only
        possible divergence, so sample densely around varied scales)."""
        vals = sorted(
            {(pow(7919, i, (10**12) - 11) % (10**12 - 3)) + 2 for i in range(400)}
            | {10**k + d for k in range(1, 13) for d in (-1, 0, 1)}
            | {2, 3, 2**31 - 1, 2**40 + 7}
        )
        py = [math.floor(math.log(v) * 1e6) for v in vals]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        java = [
            r.l
            for r in df.select(
                F.col("v"),
                F.floor(F.log(F.col("v").cast("double")) * F.lit(1e6))
                .cast("long")
                .alias("l"),
            )
            .orderBy("v")
            .collect()
        ]
        vlist = ", ".join(f"({v})" for v in vals)
        duck = [
            r[0]
            for r in duckdb.sql(
                "select cast(floor(ln(v) * 1000000) as bigint)"
                f" from (values {vlist}) t(v) order by v"
            ).fetchall()
        ]
        assert java == py
        assert duck == py


class TestRegisters:
    def test_registers_match_pure_python_differential(self, spark):
        keys = [f"key-{i * 7919 % 4001}" for i in range(6000)]
        df = spark.createDataFrame([(k,) for k in keys], "key string").withColumn(
            "g", F.lit("all")
        )
        got = {
            (r.bucket, r.r)
            for r in hll_registers(df, "key", ["g"]).collect()
        }
        want = {(b, r) for b, r in py_hll_registers(set(keys)).items()}
        assert got == want

    def test_null_keys_skipped(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("b",)], "key string"
        ).withColumn("g", F.lit("x"))
        regs = hll_registers(df, "key", ["g"]).collect()
        assert len(regs) <= 2  # at most one bucket per non-null key

    def test_shard_merge_equals_whole(self, spark):
        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(3000)], "key string"
        ).withColumn("g", F.lit("all"))
        half1 = df.filter(F.length("key") % 2 == 0)
        half2 = df.filter(F.length("key") % 2 == 1)
        merged = hll_merge(
            hll_registers(half1, "key", ["g"]),
            hll_registers(half2, "key", ["g"]),
        )
        whole = hll_registers(df, "key", ["g"])
        a = sorted((r.bucket, r.r) for r in merged.collect())
        b = sorted((r.bucket, r.r) for r in whole.collect())
        assert a == b
        ea = hll_estimate(merged, ["g"]).collect()[0]
        eb = hll_estimate(whole, ["g"]).collect()[0]
        assert ea.est_distinct == eb.est_distinct
        assert ea.sum_num == eb.sum_num


class TestAccuracy:
    def test_hll_branch_within_ten_percent(self, spark):
        n = 20000
        df = spark.createDataFrame(
            [(f"item-{i}",) for i in range(n)], "key string"
        ).withColumn("g", F.lit("all"))
        est = hll_distinct(df, "key", ["g"]).collect()[0].est_distinct
        assert abs(est - n) / n < 0.10
        assert est == py_hll_estimate(py_hll_registers(f"item-{i}" for i in range(n)))

    def test_linear_counting_branch_small_cardinality(self, spark):
        n = 40
        df = spark.createDataFrame(
            [(f"s{i}",) for i in range(n)] * 5, "key string"
        ).withColumn("g", F.lit("all"))
        est = hll_distinct(df, "key", ["g"]).collect()[0].est_distinct
        assert abs(est - n) <= 8  # LC regime: tight even at m=256
        assert est == py_hll_estimate(py_hll_registers(f"s{i}" for i in range(n)))


class TestOracleParity:
    def test_engine_matches_duckdb_on_synthetic_groups(self, spark):
        rows = [(f"g{i % 3}", f"key-{i % (200 * (1 + i % 3))}") for i in range(9000)]
        df = spark.createDataFrame(rows, "g string, key string")
        got = sorted(
            (r.g, r.n_buckets_used, r.sum_num, r.est_distinct)
            for r in hll_distinct(df, "key", ["g"]).collect()
        )
        con = duckdb.connect()
        con.execute("create table src_rows (g varchar, key varchar)")
        con.executemany("insert into src_rows values (?, ?)", rows)
        sql = hll_sql("select g as grp, key from src_rows", "key", "g")
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == [tuple(w) for w in want]


def py_cm_registers(keys):
    """Independent python Count-Min over the same frozen grammar: row
    r's column is the (2r+1, 2r+2) hex-char slice of ONE md5(key)."""
    from docee_spark.operators.sketches import CM_D

    regs: dict[tuple[int, int], int] = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        for r in range(CM_D):
            col = int(h[2 * r : 2 * r + 2], 16)
            regs[(r, col)] = regs.get((r, col), 0) + 1
    return regs


class TestCountMin:
    def test_registers_match_pure_python(self, spark):
        from docee_spark.operators.sketches import cm_registers

        keys = [f"tok{i % 37}" for i in range(1500)]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        got = {(r.row, r.col): r.c for r in cm_registers(df, "key").collect()}
        assert got == py_cm_registers(keys)

    def test_never_undercounts_and_zero_for_absent(self, spark):
        from docee_spark.operators.sketches import cm_estimate, cm_registers

        keys = [f"tok{i % 37}" for i in range(1500)]
        true = {k: keys.count(k) for k in set(keys)}
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        regs = cm_registers(df, "key")
        est = {
            r.key: r.est_count
            for r in cm_estimate(regs, ["tok0", "tok5", "tok36", "missing-key"]).collect()
        }
        for k in ("tok0", "tok5", "tok36"):
            assert est[k] >= true[k]
            # classic bound: overcount <= (2/w)*N with high probability
            assert est[k] <= true[k] + 2 * len(keys) // 256 + 1
        # absent key: min over its cells — 0 unless every one of its 4
        # cells collides (p ~ (37/256)^4); pinned 0 for this fixture
        assert est["missing-key"] == 0

    def test_merge_is_cellwise_addition(self, spark):
        from docee_spark.operators.sketches import cm_registers
        from pyspark.sql import functions as SF

        rows = [(i, f"k{i % 29}") for i in range(800)]
        df = spark.createDataFrame(rows, "i long, key string")
        h1 = df.filter(F.col("i") % 2 == 0)
        h2 = df.filter(F.col("i") % 2 == 1)
        merged = (
            cm_registers(h1, "key")
            .unionByName(cm_registers(h2, "key"))
            .groupBy("row", "col")
            .agg(SF.sum("c").alias("c"))
        )
        whole = cm_registers(df, "key")
        a = sorted((r.row, r.col, r.c) for r in merged.collect())
        b = sorted((r.row, r.col, r.c) for r in whole.collect())
        assert a == b

    def test_duckdb_oracle_bit_exact(self, spark):
        from docee_spark.operators.sketches import cm_estimate, cm_registers, cm_sql

        keys = [f"w{(i * i) % 53}" for i in range(2000)]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        qk = ["w0", "w1", "w16", "nope"]
        got = sorted(
            tuple(r) for r in cm_estimate(cm_registers(df, "key"), qk).collect()
        )
        con = duckdb.connect()
        con.execute("create table t (key varchar)")
        con.executemany("insert into t values (?)", [(k,) for k in keys])
        want = sorted(con.execute(cm_sql("select key from t", qk)).fetchall())
        assert got == want
