"""Shared Spark schemas for the pipeline's nested row formats.

Spark mapping of the reference's per-document IR chain (SURVEY §1.3):
spans mirror ``ann_mspan2dranges``/``ann_mspan2guess_field``
(dee/helper/dee.py:116-124), events mirror
``recguid_eventname_eventdict_list`` (dee.py:122-124).
"""

from __future__ import annotations

from pyspark.sql import types as T

DRANGE = T.StructType(
    [
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("char_s", T.IntegerType(), False),
        T.StructField("char_e", T.IntegerType(), False),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("field", T.StringType(), True),
        T.StructField("dranges", T.ArrayType(DRANGE), False),
    ]
)

SPANS = T.ArrayType(SPAN)

EVENT = T.StructType(
    [
        T.StructField("recguid", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField(
            "args",
            T.MapType(T.StringType(), T.StringType(), valueContainsNull=True),
            False,
        ),
    ]
)

EVENTS = T.ArrayType(EVENT)

WEBTEXT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

DOCS_GOLD = T.StructType(
    [
        T.StructField("guid", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("sentences", T.ArrayType(T.StringType()), False),
        T.StructField("spans", SPANS, False),
        T.StructField("events", EVENTS, False),
    ]
)

TRIPLE = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("recguid", T.IntegerType(), False),
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)
