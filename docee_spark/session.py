"""SparkSession factory tuned for this engine.

Local-mode settings mirror what we would submit on a real cluster via
``spark-submit --py-files``: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow on (every UDF in this repo is
Arrow-vectorized), shuffle partitions sized to cores rather than the
200 default, UTC timezone pinned so results compare bit-for-bit against
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docee_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``. On a real cluster this function is a
    no-op passthrough to the session created by spark-submit; every knob
    here is also safe cluster-side.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cores_env}]" if cores_env else "local[*]"
        ncores = int(cores_env) if cores_env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(ncores, 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # r6: InferFiltersFromGenerate duplicates a non-outer explode's
        # child into a Filter below the Generate. For the HOF-built
        # arrays this engine explodes everywhere (token n-grams, char
        # shingles, bigrams), that filter re-evaluates the whole
        # interpreted lambda chain per row WITHOUT subexpression
        # elimination — measured 61 s vs 3.8 s on the sf1 decontaminate
        # corpus-gram explode (identical results; the rule only infers a
        # redundant size>0/isnotnull guard that Generate enforces
        # anyway). Scale-independent: the cost is per-row CPU, not a
        # local[] artifact.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
