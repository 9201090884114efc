"""Loader for the reference's post-processed annotation dumps.

The reference toolkit materializes every dataset (ChFinAnn, DuEE, CCKS,
WikiEvents) into one JSON shape before training — a list of
``[guid, detail]`` pairs where ``detail`` carries pre-segmented
``sentences`` plus ``ann_valid_mspans`` / ``ann_mspan2dranges`` /
``ann_mspan2guess_field`` / ``recguid_eventname_eventdict_list``
(``dee/helper/dee.py:116-124``; the WikiEvents builder emits exactly
these keys, ``Data/WikiEvents/build_data.py:76-131``).  This module
converts that shape into the engine's (docs, gold) DataFrames so real
reference-annotated data flows through the same S1→decode→evaluate
stages as the synthetic fixtures.

Two deliberate semantic choices:

* **Token→char dranges.** The reference's dranges are token-level
  ``[sent_idx, tok_s, tok_e)`` over space-joined token sentences; the
  engine's DRANGE is char-level.  The conversion is exact — tokens are
  single-space separated, so the char slice must reproduce the span
  surface byte-for-byte; any mismatch raises instead of silently
  shifting annotations.
* **Pre-segmented sentences.** The reference consumes its dumps'
  sentence windows as-is (no re-segmentation), so the loader emits docs
  carrying the gold ``sentences`` array directly; run them through
  ``run_pipeline(..., presegmented=True)``, which skips the engine's
  own segmentation exactly like the reference skips it for
  post-processed data.

The dumps are driver-side JSON arrays (the reference loads them with a
single ``json.load``, ``dee/utils.py``); this loader mirrors that for
the annotated-evaluation path.  The 100 TB ingest path is the parquet
S1 shape — annotation dumps are small evaluation dimensions, never the
corpus itself.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .config import EventType, bio_labels
from .schema import DOCS_GOLD, T


def token_to_char_drange(
    sentence: str, tok_s: int, tok_e: int
) -> tuple[int, int]:
    """Exact char offsets of tokens ``[tok_s, tok_e)`` in a space-joined
    token sentence (the reference's drange convention,
    ``Data/WikiEvents/build_data.py:83-88`` stores token indices over
    ``' '.join(tokens)`` sentences)."""
    toks = sentence.split(" ")
    offs = []
    pos = 0
    for t in toks:
        offs.append(pos)
        pos += len(t) + 1
    return offs[tok_s], offs[tok_e - 1] + len(toks[tok_e - 1])


def parse_post_json(path: str) -> list[dict]:
    """Parse one reference post-format dump into plain row dicts with
    char-level dranges.  Raises if any token→char conversion does not
    reproduce the annotated surface exactly (annotation-integrity gate:
    a silent off-by-one here would corrupt every downstream metric)."""
    with open(path) as f:
        data = json.load(f)
    rows = []
    for guid, det in data:
        sents = det["sentences"]
        spans = []
        for text, drs in det["ann_mspan2dranges"].items():
            field = det["ann_mspan2guess_field"].get(text)
            cdrs = []
            for si, ts, te in drs:
                cs, ce = token_to_char_drange(sents[si], ts, te)
                got = sents[si][cs:ce]
                if got != text:
                    raise ValueError(
                        f"drange conversion mismatch in {guid}: "
                        f"expected {text!r}, got {got!r}"
                    )
                cdrs.append({"sent_idx": si, "char_s": cs, "char_e": ce})
            spans.append({"text": text, "field": field, "dranges": cdrs})
        events = [
            {"recguid": recguid, "type": etype, "args": dict(args)}
            for recguid, etype, args in det["recguid_eventname_eventdict_list"]
        ]
        rows.append(
            {
                "guid": guid,
                "doc_type": det.get("doc_type"),
                "sentences": sents,
                "spans": spans,
                "events": events,
            }
        )
    return rows


def load_reference_docs(
    spark: SparkSession, path: str, lang: str = "en"
) -> tuple[DataFrame, DataFrame]:
    """→ (docs, gold) for ``run_pipeline(..., presegmented=True)``.

    ``docs`` carries the dump's pre-segmented sentences (plus zeroed
    segmentation counters, matching the segment-stage schema); ``gold``
    is the DOCS_GOLD annotation shape with char-level dranges."""
    return frames_from_rows(spark, parse_post_json(path), lang)


def frames_from_rows(
    spark: SparkSession, rows: list[dict], lang: str = "en"
) -> tuple[DataFrame, DataFrame]:
    """Engine row dicts (guid/sentences/spans/events) → (docs, gold)
    frames for ``run_pipeline(..., presegmented=True)``. Shared by the
    WikiEvents loader above and the DuEE-fin builder
    (pyref/duee.py:build_rows)."""
    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("sentences", T.ArrayType(T.StringType()), False),
        ]
    )
    docs = spark.createDataFrame(
        [
            {"doc_id": r["guid"], "lang": lang, "sentences": r["sentences"]}
            for r in rows
        ],
        docs_schema,
    )
    gold = spark.createDataFrame(rows, DOCS_GOLD)
    return docs, gold


def trigger_type_keywords(rows: list[dict]) -> dict[str, tuple[str, ...]]:
    """Deterministic M5 cue table from the corpus' own Trigger args:
    {event_type: sorted trigger surfaces}.  The reference's wTgg dumps
    guarantee a Trigger role per event (``build_data.py:107-120`` backfills
    the trigger into the span inventory), so the trigger surface is the
    type's sentence-level cue — the same signal the reference's
    key-sentence supervision derives from (DCFEE key-sentence labels)."""
    kw: dict[str, set[str]] = {}
    for r in rows:
        for ev in r["events"]:
            t = ev["args"].get("Trigger")
            if t:
                kw.setdefault(ev["type"], set()).add(t)
    return {k: tuple(sorted(v)) for k, v in kw.items()}


def corpus_label_index(
    rows: list[dict], event_types: tuple[EventType, ...]
) -> dict[str, int]:
    """BIO label space = catalog roles ∪ guess fields observed in the
    dump.  The reference's guess fields are the source data's raw NER
    ontology (``build_data.py:89-90`` copies ``entity_type`` verbatim, no
    fixed enumeration), so the label universe is corpus-derived exactly
    like the reference's ``entity_label_list``."""
    labels = bio_labels(event_types)
    known = set(labels)
    extra: dict[str, None] = {}
    for r in rows:
        for s in r["spans"]:
            f = s["field"]
            if f is not None and ("B-" + f) not in known:
                extra.setdefault(f, None)
    for f in sorted(extra):
        labels.append("B-" + f)
        labels.append("I-" + f)
    return {lab: i for i, lab in enumerate(labels)}
