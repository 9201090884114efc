"""Stage 2 — segment: text → sentences, fully JVM-side.

Reference analog: T1 sentence segmentation (dee/helper/__init__.py:103-169).
The reference's algorithm — insert a newline after every run of terminal
punctuation (keeping trailing quotes attached), split, strip, drop empties —
is exactly expressible with built-in expressions, so this stage costs one
whole-stage-codegen'd projection, no Python:

    regexp_replace(text, '([。？！…]+[quotes]*)', '$1\\n')
    → split on \\n → transform(trim) → filter(len > 0)

Truncation to MAX_SENT_NUM / MAX_SENT_LEN mirrors the reference's caps
(dee/tasks/dee_task.py:60-61) and is *counted, never silent* (A9):
``n_sents_dropped`` / ``n_sents_clipped`` columns feed the metrics table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import MAX_SENT_LEN, MAX_SENT_NUM

_ZH_PUNKT = "。？！…"
_EN_PUNKT = ".?!"
_QUOTES = "’”`'\""


def _seg_expr(text: Column, punkt: str) -> Column:
    marked = F.regexp_replace(
        text, "([" + punkt + "]+[" + _QUOTES + "]*)", "$1\n"
    )
    parts = F.split(marked, "\n")
    # \s-trim, NOT F.trim: the reference strips str.strip() whitespace
    # from each sentence, and web text is full of CRLF — a space-only
    # trim leaves trailing '\r' on every sentence and emits phantom
    # '\r' sentences (caught by tests/test_segment_properties.py fuzz
    # vs pyref). Java \s covers the ASCII whitespace str.strip() does;
    # unicode spaces (NBSP …) are a documented boundary.
    strip = lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")  # noqa: E731
    return F.filter(F.transform(parts, strip), lambda s: F.length(s) > 0)


def segment(
    docs: DataFrame,
    text_col: str = "text",
    max_sent_num: int = MAX_SENT_NUM,
    max_sent_len: int = MAX_SENT_LEN,
) -> DataFrame:
    """→ docs + (sentences, n_sents, n_sents_dropped, n_sents_clipped).

    Language-aware punctuation (zh vs en branch, matching pyref.textproc);
    sentences longer than max_sent_len are clipped, documents longer than
    max_sent_num sentences truncated — both counted.
    """
    raw = F.when(
        F.col("lang") == "zh", _seg_expr(F.col(text_col), _ZH_PUNKT)
    ).otherwise(_seg_expr(F.col(text_col), _EN_PUNKT))

    df = docs.withColumn("_raw_sents", raw)
    df = df.withColumn(
        "n_sents_dropped",
        F.greatest(F.size("_raw_sents") - F.lit(max_sent_num), F.lit(0)),
    ).withColumn(
        "n_sents_clipped",
        F.size(F.filter("_raw_sents", lambda s: F.length(s) > max_sent_len)),
    )
    df = df.withColumn(
        "sentences",
        F.transform(
            F.slice("_raw_sents", 1, max_sent_num),
            lambda s: F.substring(s, 1, max_sent_len),
        ),
    )
    return df.drop("_raw_sents").withColumn("n_sents", F.size("sentences"))
