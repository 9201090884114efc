"""Version pins for the two private PySpark APIs this engine relies on.

Both uses are deliberate, guarded, and fail SILENTLY-SLOW (not wrong) if
a Spark upgrade removes them — these tests make the upgrade fail LOUDLY
instead, with notes on what to re-verify:

1. ``Broadcast._path`` — the worker-side per-broadcast identity used as
   the model/scorer cache key (stages/tag.py `_MODEL_CACHE`,
   stages/decode.py `_SCORER_CACHE`). pyspark 4.1 offers no public
   worker-side broadcast id; losing `_path` degrades to the id()-keyed
   fallback, which still works (entries pin the Broadcast object against
   id reuse) but rebuilds the model once per broadcast *object* instead
   of once per pickle file. Upgrade note: if this pin fails, check
   whether Broadcast grew a public id/path accessor and switch to it.

2. ``df._jdf.queryExecution().toRdd().getNumPartitions()`` — the
   JVM-side physical partition count used by
   operators/dedup.py::ensure_parallelism. The public alternative
   ``df.rdd.getNumPartitions()`` forces a full Python-RDD conversion
   plan per call. Upgrade note: if this pin fails, benchmark df.rdd
   before falling back to it permanently (it is the except-branch
   today), or read the count from df.explain's AQE plan.
"""

from __future__ import annotations

import pyspark


class TestBroadcastPathPin:
    def test_broadcast_has_path_attr(self, spark):
        bc = spark.sparkContext.broadcast({"k": 1})
        try:
            # driver-side Broadcast in local mode also carries _path in
            # pyspark 4.x (the pickled payload's temp file)
            path = getattr(bc, "_path", None)
            assert path is not None and isinstance(path, str), (
                "Broadcast._path gone: model/scorer caches fall back to "
                "id()-keys (correct but one rebuild per broadcast object); "
                "see tests/test_private_api_pins.py upgrade notes"
            )
        finally:
            bc.destroy()

    def test_distinct_broadcasts_have_distinct_paths(self, spark):
        b1 = spark.sparkContext.broadcast({"k": 1})
        b2 = spark.sparkContext.broadcast({"k": 2})
        try:
            assert b1._path != b2._path
        finally:
            b1.destroy()
            b2.destroy()


class TestJdfQueryExecutionPin:
    def test_jvm_partition_count_matches_rdd(self, spark):
        df = spark.range(0, 1000, 1, 7)
        n_jvm = df._jdf.queryExecution().toRdd().getNumPartitions()
        assert n_jvm == 7
        assert n_jvm == df.rdd.getNumPartitions()

    def test_ensure_parallelism_uses_jvm_path(self, spark):
        """ensure_parallelism must not raise and must leave an already-
        parallel frame alone (no repartition node inserted)."""
        from docee_spark.operators.dedup import ensure_parallelism

        nparts = spark.sparkContext.defaultParallelism
        df = spark.range(0, 1000, 1, nparts)
        out = ensure_parallelism(df)
        assert out is df  # no-op: already parallel enough

    def test_pyspark_version_window(self):
        """The pins above were validated on pyspark 4.1.x. A major-
        version jump should re-run this module deliberately, not
        silently."""
        major = int(pyspark.__version__.split(".")[0])
        assert major == 4, (
            f"pyspark {pyspark.__version__}: re-validate the private-API "
            "pins in this module before trusting cache/partition behavior"
        )
