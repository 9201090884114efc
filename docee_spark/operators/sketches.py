"""Mergeable cardinality sketches: a deterministic HyperLogLog for
distinct-count estimation over arbitrarily large key sets.

Why this operator exists in a crawl/KG pipeline: "how many distinct
urls / tokens / entities per group" is the first question every corpus
audit asks, and at 10^12 documents an exact ``groupBy(key).distinct()``
shuffles the full key set — the one thing that cannot be allowed to
scale with data volume. An HLL register table is 256 small integers per
group, built in ONE pass with map-side combine (max is associative and
commutative), mergeable across shards/days/snapshots by register-wise
max, and answers the cardinality question with ~6.5% standard error at
any scale. Reference analog: the corpus statistics the reference
computes exactly in-driver (dee/helper/__init__.py stats aggregation)
— re-expressed as the sketch a 100 TB corpus actually requires.

Determinism contract (the cross-engine exactness discipline every
oracle in this repo uses): the hash is ``md5`` of the key (identical
lowercase hex in Spark and DuckDB); the bucket is the first 2 hex chars
(m = 256 registers); the rank is the 1-based position of the first set
bit in the next 48 bits, derived purely from hex CHARACTERS (leading
'0' run length + a 4-way case on the first nonzero nibble), capped at
RANK_CAP = 40 so the per-bucket term 2^(40-rank) is an exact bigint.
``sum_num = Σ_buckets 2^(40-rank)`` (empty bucket ⇒ rank 0 ⇒ 2^40) is
therefore an exact integer ≤ 256·2^40 < 2^49. The estimate

    est = floor( (alpha_e6·m²) / (sum_num / 2^40) / 10^6 )

is two IEEE-754 double divisions over exactly-representable operands
(alpha_e6·m² = 47_072_673_792 < 2^53; sum_num < 2^49; 2^40 exact), and
IEEE division is correctly rounded — bit-identical in the JVM and in
DuckDB. No ln, no platform-libm exposure.

Small-range correction: plain HLL is biased low-cardinality, so the
classic linear-counting branch applies when the raw estimate is below
2.5·m and empty buckets exist: ``lc = floor(m·(ln_e6(m) − ln_e6(V)) /
10^6)`` with ``V = n_zero`` — ln(m/V) decomposed into two logs of
INTEGER arguments so the ``floor(ln(int)·10^6)`` boundary (the same
contract ``operators/lm.py`` froze) is the only libm exposure;
``tests/test_sketches.py`` pins Java↔DuckDB agreement exhaustively for
every integer 1..256 this branch can ever see. Branch selection
(``est_raw < 640 AND n_zero > 0``) compares exact integers.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # registers (p = 8 bucket bits)
RANK_CAP = 40  # rank clamp so 2^(RANK_CAP - rank) is an exact bigint
# alpha_m = 0.7213 / (1 + 1.079/m) for m = 256 (= 0.7182726...),
# floored at e6; shared verbatim by the engine (line ~162), the
# generated DuckDB oracle (line ~245), and the python differential, so
# all three estimate with the identical integer constant
ALPHA_E6 = 718272
_POW40 = float(1 << RANK_CAP)  # 2^40, exact double


def _nibble(ch: Column) -> Column:
    """Hex char → 0..15 (lowercase input, as md5 emits)."""
    out = F.lit(0)
    for i, c in enumerate("123456789abcdef"):
        out = F.when(ch == c, F.lit(i + 1)).otherwise(out)
    return out


def _nibble_lz(ch: Column) -> Column:
    """Leading zero BITS of a nonzero hex nibble: 8-f→0, 4-7→1, 2-3→2, 1→3."""
    return (
        F.when(ch.isin(*list("89abcdef")), F.lit(0))
        .when(ch.isin("4", "5", "6", "7"), F.lit(1))
        .when(ch.isin("2", "3"), F.lit(2))
        .otherwise(F.lit(3))
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """ONE pass → ``(*group_cols, bucket, r)``: the max observed rank per
    (group, bucket). NULL keys are skipped (SQL COUNT(DISTINCT) drops
    NULLs too). Shuffle shape: a single groupBy on (group, bucket) with
    map-side partial max — the sketch never moves more than
    |groups|·256 rows however large the input."""
    # evaluation-count discipline (the simhash64 lesson): the md5, the
    # 12-char tail and the leading-zero count are each bound ONCE via
    # 1-element-array lambdas — the nibble CASE chains and the rank
    # formula reference lambda variables, never re-evaluating the hash
    def packed(h):
        def from_tail(tail):
            def from_zeros(z):
                first_nz = F.substring(tail, (z + 1).cast("int"), 1)
                rank_raw = F.when(z == 12, F.lit(49)).otherwise(
                    z * 4 + _nibble_lz(first_nz) + 1
                )
                bucket = _nibble(F.substring(h, 1, 1)) * 16 + _nibble(
                    F.substring(h, 2, 1)
                )
                return F.struct(
                    bucket.alias("bucket"),
                    F.least(rank_raw, F.lit(RANK_CAP)).cast("int").alias("rank"),
                )

            return F.element_at(
                F.transform(
                    F.array(F.length(F.regexp_extract(tail, "^(0*)", 1))),
                    from_zeros,
                ),
                1,
            )

        return F.element_at(
            F.transform(F.array(F.substring(h, 3, 12)), from_tail), 1
        )

    cell = F.element_at(
        F.transform(F.array(F.md5(F.col(key_col).cast("string"))), packed), 1
    )
    # r6: the register is max-of-rank — idempotent in key multiplicity —
    # so deduplicating (group, key) first is exact and moves the md5 +
    # rank decode from once per occurrence to once per distinct key
    # (same wordcount-shaped exchange note as cm_registers; the register
    # table stays ≤ |groups|·256 rows regardless).
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, key_col)
        .distinct()
        .select(*group_cols, cell.alias("cell"))
        .select(
            *group_cols,
            F.col("cell.bucket").alias("bucket"),
            F.col("cell.rank").alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables (same group columns) and re-max — the HLL
    merge. Register-wise max is exactly how two shards/days/snapshots
    combine; merging shard sketches is bit-identical to sketching the
    concatenated input (max is associative/commutative/idempotent)."""
    it = iter(register_tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    keys = [c for c in u.columns if c != "r"]
    group = [c for c in keys if c != "bucket"]
    return u.groupBy(*group, "bucket").agg(F.max("r").alias("r"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize registers → ``(*group_cols, n_buckets_used, sum_num,
    est_distinct)``. ``sum_num`` is the exact-integer harmonic
    numerator (absent buckets contribute 2^40); ``est_distinct`` the
    raw-HLL estimate under the frozen two-division double contract."""
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_buckets_used"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {RANK_CAP} - r)")).alias(
            "present_sum"
        ),
    )
    sum_num = (
        F.col("present_sum")
        + (F.lit(M).cast("long") - F.col("n_buckets_used"))
        * F.lit(1 << RANK_CAP).cast("long")
    ).alias("sum_num")
    a = F.lit(float(ALPHA_E6 * M * M))
    out = agg.select(*group_cols, "n_buckets_used", sum_num)
    est_raw = F.floor(
        a / (F.col("sum_num").cast("double") / F.lit(_POW40)) / F.lit(1e6)
    ).cast("long")
    n_zero = F.lit(M).cast("long") - F.col("n_buckets_used")
    ln_m_e6 = math.floor(math.log(M) * 1e6)  # ln of an integer, frozen
    lc = (
        (
            F.lit(M).cast("long")
            * (
                F.lit(ln_m_e6)
                - F.floor(F.log(n_zero.cast("double")) * F.lit(1e6)).cast("long")
            )
        )
        / F.lit(1_000_000)
    )
    lc = F.floor(lc).cast("long")
    est = F.when((n_zero > 0) & (est_raw < int(2.5 * M)), lc).otherwise(est_raw)
    return out.withColumn("est_distinct", est)


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Sketch + finalize in one call: per-group approximate
    COUNT(DISTINCT key) with the full determinism contract above."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)


def hll_sql(source_cte: str, key_expr: str, group_expr: str) -> str:
    """The whole sketch re-derived in DuckDB SQL with a DIFFERENT
    formulation: nibble values via strpos arithmetic on the hex
    alphabet (the engine uses CASE chains), ranks via the same
    leading-zero grammar, the harmonic numerator via a generated
    256-bucket spine so absent buckets are explicit rows rather than a
    count subtraction. ``source_cte`` must define ``src(grp, key)``."""
    return f"""
with src as ({source_cte}),
hashed as (
  select grp, md5(cast(key as varchar)) as h from src where key is not null
),
ranked as (
  select grp,
    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) as bucket,
    least(
      case when length(regexp_extract(substr(h, 3, 12), '^(0*)', 1)) = 12
           then 49
           else length(regexp_extract(substr(h, 3, 12), '^(0*)', 1)) * 4
             + case
                 when strpos('89abcdef',
                   substr(h, 3 + length(regexp_extract(substr(h, 3, 12),
                                                       '^(0*)', 1)), 1)) > 0
                 then 0
                 when strpos('4567',
                   substr(h, 3 + length(regexp_extract(substr(h, 3, 12),
                                                       '^(0*)', 1)), 1)) > 0
                 then 1
                 when strpos('23',
                   substr(h, 3 + length(regexp_extract(substr(h, 3, 12),
                                                       '^(0*)', 1)), 1)) > 0
                 then 2
                 else 3
               end + 1
      end, {RANK_CAP}) as r
  from hashed
),
regs as (select grp, bucket, max(r) as r from ranked group by grp, bucket),
spine as (
  select g.grp, b.bucket, coalesce(regs.r, 0) as r
  from (select distinct grp from regs) g
  cross join (select unnest(range(0, {M})) as bucket) b
  left join regs on regs.grp = g.grp and regs.bucket = b.bucket
),
agg as (
  select grp,
    sum((r > 0)::bigint) as n_buckets_used,
    sum(cast(1 as bigint) << ({RANK_CAP} - r)) as sum_num
  from spine group by grp
),
est as (
  select grp, n_buckets_used, sum_num,
    cast(floor({float(ALPHA_E6 * M * M)!r}
               / (cast(sum_num as double) / {_POW40!r})
               / 1000000.0) as bigint) as est_raw,
    {M} - n_buckets_used as n_zero
  from agg
)
select grp as {group_expr}, cast(n_buckets_used as bigint) as n_buckets_used,
  cast(sum_num as bigint) as sum_num,
  cast(case
    when n_zero > 0 and est_raw < {int(2.5 * M)}
    then floor(({M} * ({math.floor(math.log(M) * 1e6)}
                       - cast(floor(ln(n_zero) * 1000000) as bigint)))
               / 1000000.0)
    else est_raw
  end as bigint) as est_distinct
from est
"""


# ---------------------------------------------------------------------------
# Count-Min: the frequency-estimation companion to the HLL above.
# ---------------------------------------------------------------------------

CM_D = 4  # hash rows
CM_W = 256  # columns per row (2 md5 hex chars each, like the HLL bucket)


def _cm_cols_py(key: str) -> list[int]:
    """Row r's column = hex chars (2r+1, 2r+2) of ONE md5(key) — the
    Kirsch–Mitzenmacher-style "one hash, d derived functions" trick:
    disjoint 8-bit fields of a single md5 are the d row functions, so
    the build pays ONE hash per occurrence instead of d."""
    h = hashlib.md5(str(key).encode()).hexdigest()
    return [int(h[2 * r : 2 * r + 2], 16) for r in range(CM_D)]


def cm_registers(df: DataFrame, key_col: str, weight_col: str | None = None) -> DataFrame:
    """Count-Min sketch build: ONE pass → ``(row, col, c)`` — a d×w =
    4×256 integer counter table. Each key updates one column per row;
    row r's column is hex chars (2r+1, 2r+2) of a SINGLE md5(key)
    (disjoint 8-bit fields stand in for d independent hashes — one hash
    per occurrence, not d). ``weight_col`` (default 1/row) supports
    pre-aggregated input. The groupBy has map-side combine and at most
    d·w = 1024 rows ever shuffle — frequency estimation whose state is
    constant in the data volume, mergeable across shards by cellwise
    ADDITION (count-min registers are linear)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    base = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("k"), w.alias("w")
    )
    # r6: registers are LINEAR in the weights, so summing per distinct
    # key first is exact — the md5 + nibble decode then runs once per
    # distinct key instead of once per occurrence (token streams are
    # Zipfian; measured 88,000× duplication on the sf1 corpus). The
    # added exchange is wordcount-shaped: map-side combine bounds it by
    # the per-partition vocabulary, and the register table stays ≤ d·w
    # rows regardless.
    base = base.groupBy("k").agg(F.sum("w").alias("w"))

    # evaluation-count discipline: the md5 is bound ONCE through a
    # 1-element-array lambda; the 16-branch nibble CASEs reference the
    # lambda variable (without the bind, Catalyst re-evaluates the hash
    # per CASE branch — measured 5× slower at sf0.1)
    cell_array = F.element_at(
        F.transform(
            F.array(F.md5(F.col("k"))),
            lambda h: F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        (
                            _nibble(F.substring(h, 2 * r + 1, 1)) * 16
                            + _nibble(F.substring(h, 2 * r + 2, 1))
                        ).alias("col"),
                    )
                    for r in range(CM_D)
                ]
            ),
        ),
        1,
    )
    cells = base.select("w", F.explode(cell_array).alias("cell"))
    return (
        cells.select(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"), "w")
        .groupBy("row", "col")
        .agg(F.sum("w").alias("c"))
    )


def cm_estimate(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Point queries against a register table → ``(key, est_count)``
    with ``est = min over rows of the key's cell`` — never an
    undercount; overcount ≤ (2/w)·total with prob ≥ 1 − 2⁻ᵈ per the
    classic bound. The query side is a tiny broadcast dimension."""
    spark = registers.sparkSession
    qrows = []
    for k in sorted(set(keys)):
        for r, col in enumerate(_cm_cols_py(k)):
            qrows.append((k, r, col))
    q = spark.createDataFrame(qrows, "key string, row int, col int")
    # left join from the query side: a cell no key ever hashed into has
    # no register row, and must count as 0 (never dropped — dropping it
    # would raise the min and break the never-undercount guarantee's
    # companion property that absent keys estimate 0)
    joined = q.join(
        registers,
        (registers["row"] == q["row"]) & (registers["col"] == q["col"]),
        "left",
    ).select("key", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    return (
        joined.groupBy("key")
        .agg(F.min("c").cast("long").alias("est_count"))
    )


def cm_sql(source_cte: str, keys: list[str]) -> str:
    """Registers + point queries re-derived in DuckDB (strpos nibble
    arithmetic over the same one-md5 slice grammar, a VALUES row spine
    instead of the engine's generated struct array). ``source_cte``
    must define ``src(key)`` (one row per occurrence)."""
    # SQL-escape inlined probe keys (a key containing ' must not break
    # or inject into the generated oracle)
    key_values = ", ".join(
        "('{}')".format(k.replace("'", "''")) for k in sorted(set(keys))
    )
    row_values = ", ".join(f"({r})" for r in range(CM_D))
    col = (
        "(strpos('0123456789abcdef', substr(h, 2 * r.r + 1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(h, 2 * r.r + 2, 1)) - 1)"
    )
    return f"""
with src as ({source_cte}),
hashed as (
  select md5(cast(key as varchar)) as h from src where key is not null
),
rws(r) as (values {row_values}),
cells as (
  select r.r as row, {col} as col, count(*) as c
  from hashed cross join rws r
  group by 1, 2
),
q(key) as (values {key_values}),
qh as (select key, md5(key) as h from q),
qcells as (
  select qh.key, r.r as row, {col} as col
  from qh cross join rws r
)
select qc.key, cast(min(coalesce(c.c, 0)) as bigint) as est_count
from qcells qc left join cells c on c.row = qc.row and c.col = qc.col
group by qc.key
"""
