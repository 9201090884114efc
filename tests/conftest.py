from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from docee_spark.session import get_spark

    # 12 of the 32 host cores: enough to overlap the thread-pooled
    # oracle prefetch and iterative canonicalization jobs, while leaving
    # headroom for the spark-submit subprocess tests' own JVMs. Shuffle
    # partitions stay at 4 — test inputs are tiny and fewer tasks per
    # stage beats idle parallelism.
    s = get_spark("tests", cores=12, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from docee_spark.fixtures import generate_corpus

    return generate_corpus(80, seed=7)


@pytest.fixture(scope="session")
def gold_df(spark, corpus):
    from docee_spark.schema import DOCS_GOLD

    _, gold_rows = corpus
    return spark.createDataFrame(
        [
            {
                "guid": g["guid"],
                "doc_type": g["doc_type"],
                "sentences": g["sentences"],
                "spans": g["spans"],
                "events": [
                    {"recguid": e["recguid"], "type": e["type"], "args": e["args"]}
                    for e in g["events"]
                ],
            }
            for g in gold_rows
        ],
        DOCS_GOLD,
    )


@pytest.fixture(scope="session")
def web_df(spark, corpus):
    from docee_spark.schema import WEBTEXT

    web_rows, _ = corpus
    return spark.createDataFrame(web_rows, WEBTEXT)
