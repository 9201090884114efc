"""Fused tag+decode: one Arrow UDF for the whole per-document path.

The staged pipeline keeps tag and decode separate so each can materialize
as a resumable snapshot table and so a model tagger can slot in. When
neither is needed (heuristic tagger, no intermediate materialization),
chaining two ``mapInPandas`` costs an extra Arrow round-trip of the
nested spans structs and a second Python worker per task. This fused
stage does sentences → spans → events in ONE batch iterator — ~2× less
serialization on the hot path. Semantics are identical (delegates to the
same pyref routines); asserted in tests against the staged pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..config import CHFINANN_EVENT_TYPES, MAX_EDAG_PATHS, MAX_SENT_LEN, MAX_SENT_NUM
from ..pyref.edag import decode_doc
from ..pyref.textproc import sent_seg
from .decode import _sentence_adjacency
from .tag import _find_dict_spans, _merge_regex_spans

_EVENTS_FIELD = "events: array<struct<recguid:int,type:string,args:map<string,string>>>"


def tag_decode_fused(
    docs: DataFrame,
    entity_dict: dict[str, str],
    mode: str = "clique",
    max_paths: int = MAX_EDAG_PATHS,
    event_types=None,
    type_keywords: dict[str, tuple[str, ...]] | None = None,
    num_triggers: int = -1,
) -> DataFrame:
    """docs (with sentences) → + events, skipping the spans round-trip.

    ``event_types``/``type_keywords``/``num_triggers``: non-default
    catalog, per-type sentence cues, and |R| — same semantics as the
    staged decode stage (stages/decode.py)."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(entity_dict)
    cat = tuple(event_types) if event_types is not None else CHFINANN_EVENT_TYPES
    event_fields = {et.name: list(et.fields) for et in cat}
    min_fields = {et.name: et.min_field_num for et in cat}
    trigger_tiers = {
        et.name: {k: tuple(v) for k, v in et.triggers.items()}
        for et in cat
        if getattr(et, "triggers", None)
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        surfaces = bc.value
        for pdf in batches:
            events_col = []
            pruned_col = []
            for sentences in pdf["sentences"]:
                sents = list(sentences)
                spans, taken = _find_dict_spans(sents, surfaces)
                spans = _merge_regex_spans(sents, spans, taken)
                span_texts = [s["text"] for s in spans]
                span_fields = [s["field"] for s in spans]
                span_sents = [
                    sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans
                ]
                if not spans:
                    events_col.append([])
                    pruned_col.append(0)
                    continue
                adj = _sentence_adjacency(len(spans), span_sents)
                doc_stats: dict[str, int] = {}
                decoded = decode_doc(
                    sents, span_fields, span_sents, adj, event_fields,
                    min_fields, mode=mode, max_paths=max_paths,
                    exact_fields=False, stats=doc_stats,
                    type_keywords=type_keywords,
                    trigger_tiers=trigger_tiers,
                    num_triggers=num_triggers,
                )
                pruned_col.append(int(doc_stats.get("n_paths_pruned", 0)))
                recs, recguid = [], 0
                for et in event_fields:
                    for rec in decoded.get(et, []):
                        args = {
                            f: (span_texts[i] if i is not None else None)
                            for f, i in zip(event_fields[et], rec)
                        }
                        recs.append({"recguid": recguid, "type": et, "args": args})
                        recguid += 1
                events_col.append(recs)
            # same A9-style truncation counter as the staged decode —
            # fused must never lose records silently either
            yield pdf.assign(events=events_col, n_paths_pruned=pruned_col)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    return docs.mapInPandas(
        run, schema=out_schema + ", " + _EVENTS_FIELD + ", n_paths_pruned int"
    )


def segment_tag_decode_fused(
    docs: DataFrame,
    entity_dict: dict[str, str],
    mode: str = "clique",
    max_paths: int = MAX_EDAG_PATHS,
    event_types=None,
    type_keywords: dict[str, tuple[str, ...]] | None = None,
    num_triggers: int = -1,
) -> DataFrame:
    """Deepest fusion: raw ``text`` in → ``events`` out, one Arrow UDF.

    Sentence segmentation runs in-UDF via the pyref port (same semantics
    as the JVM segment stage — asserted equal in tests), so the
    array<string> sentences column never crosses the Arrow boundary:
    payload in is one string per doc, payload out is the events list.
    Python-side segmentation costs ~15 µs/doc; the saved Arrow
    serialization of sentence arrays is far larger.
    """
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(entity_dict)
    cat = tuple(event_types) if event_types is not None else CHFINANN_EVENT_TYPES
    event_fields = {et.name: list(et.fields) for et in cat}
    min_fields = {et.name: et.min_field_num for et in cat}
    trigger_tiers = {
        et.name: {k: tuple(v) for k, v in et.triggers.items()}
        for et in cat
        if getattr(et, "triggers", None)
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        surfaces = bc.value
        for pdf in batches:
            events_col = []
            pruned_col = []
            for text, lang in zip(pdf["text"], pdf["lang"]):
                # same truncate + per-sentence clip as the JVM segment
                # stage — the deep-fused path must not diverge on docs
                # past MAX_SENT_LEN/MAX_SENT_NUM (parity-tested)
                sents = [
                    s[:MAX_SENT_LEN]
                    for s in sent_seg(text or "", lang=lang or "zh")[:MAX_SENT_NUM]
                ]
                spans, taken = _find_dict_spans(sents, surfaces)
                spans = _merge_regex_spans(sents, spans, taken)
                if not spans:
                    events_col.append([])
                    pruned_col.append(0)
                    continue
                span_texts = [s["text"] for s in spans]
                span_fields = [s["field"] for s in spans]
                span_sents = [
                    sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans
                ]
                adj = _sentence_adjacency(len(spans), span_sents)
                doc_stats: dict[str, int] = {}
                decoded = decode_doc(
                    sents, span_fields, span_sents, adj, event_fields,
                    min_fields, mode=mode, max_paths=max_paths,
                    exact_fields=False, stats=doc_stats,
                    type_keywords=type_keywords,
                    trigger_tiers=trigger_tiers,
                    num_triggers=num_triggers,
                )
                pruned_col.append(int(doc_stats.get("n_paths_pruned", 0)))
                recs, recguid = [], 0
                for et in event_fields:
                    for rec in decoded.get(et, []):
                        args = {
                            f: (span_texts[i] if i is not None else None)
                            for f, i in zip(event_fields[et], rec)
                        }
                        recs.append({"recguid": recguid, "type": et, "args": args})
                        recguid += 1
                events_col.append(recs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "events": events_col,
                    "n_paths_pruned": pruned_col,
                }
            )

    return docs.mapInPandas(
        run, schema="doc_id string, " + _EVENTS_FIELD + ", n_paths_pruned int"
    )


def segment_tag_decode_fused_model(
    docs: DataFrame,
    model,
    mode: str = "clique",
    max_paths: int = MAX_EDAG_PATHS,
    ent_fix_mode: str = "n",
    event_types=None,
    type_keywords: dict[str, tuple[str, ...]] | None = None,
    num_triggers: int = -1,
) -> DataFrame:
    """Deepest fusion for the TRAINED-MODEL slot (M1): raw ``text`` in →
    ``events`` out, one Arrow UDF.

    The staged model path pays two Arrow round-trips (sentences out of
    the tag UDF, sentences+spans into the decode UDF) plus the exchange
    between them; this fuses segment (pyref ``sent_seg``, same clip as
    the JVM stage — parity-tested for the heuristic deep path), the
    batched char tagger, and the per-doc decode into one iterator UDF.
    Tagging stays vectorized: every sentence of the Arrow batch goes
    through ONE ``predict_sent_labels`` call (length-sorted + chunked
    internally), exactly like the staged ``tag_model`` — only the
    boundary crossings disappear. Decode semantics mirror the staged
    model path verbatim: sentence adjacency, ``exact_fields=True`` (the
    model emits exact role fields, so EDAG branches per role), same
    A9-style ``n_paths_pruned`` counter; asserted row-identical to the
    staged pipeline in tests/test_fused.py."""
    from ..pyref import textproc
    from .tag import _tagger_from_broadcast

    spark = docs.sparkSession
    arrays = model.to_arrays() if hasattr(model, "to_arrays") else dict(model)
    bc = spark.sparkContext.broadcast(arrays)
    cat = tuple(event_types) if event_types is not None else CHFINANN_EVENT_TYPES
    event_fields = {et.name: list(et.fields) for et in cat}
    min_fields = {et.name: et.min_field_num for et in cat}
    trigger_tiers = {
        et.name: {k: tuple(v) for k, v in et.triggers.items()}
        for et in cat
        if getattr(et, "triggers", None)
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = _tagger_from_broadcast(bc)  # once per worker, not per batch
        for pdf in batches:
            doc_sents = [
                [
                    s[:MAX_SENT_LEN]
                    for s in sent_seg(text or "", lang=lang or "zh")[:MAX_SENT_NUM]
                ]
                for text, lang in zip(pdf["text"], pdf["lang"])
            ]
            # cross-doc batching: ONE model call per Arrow batch
            flat: list[str] = []
            bounds: list[tuple[int, int]] = []
            for sents in doc_sents:
                bounds.append((len(flat), len(sents)))
                flat.extend(sents)
            labels = tagger.predict_sent_labels(flat)
            events_col = []
            pruned_col = []
            for (off, n), sents in zip(bounds, doc_sents):
                spans = tagger.spans_from_labels(sents, labels[off : off + n])
                if ent_fix_mode != "n":
                    spans = textproc.fix_ent_spans(sents, spans, ent_fix_mode)
                if not spans:
                    events_col.append([])
                    pruned_col.append(0)
                    continue
                span_texts = [s["text"] for s in spans]
                span_fields = [s["field"] for s in spans]
                span_sents = [
                    sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans
                ]
                adj = _sentence_adjacency(len(spans), span_sents)
                doc_stats: dict[str, int] = {}
                decoded = decode_doc(
                    sents, span_fields, span_sents, adj, event_fields,
                    min_fields, mode=mode, max_paths=max_paths,
                    exact_fields=True, stats=doc_stats,
                    type_keywords=type_keywords,
                    trigger_tiers=trigger_tiers,
                    num_triggers=num_triggers,
                )
                pruned_col.append(int(doc_stats.get("n_paths_pruned", 0)))
                recs, recguid = [], 0
                for et in event_fields:
                    for rec in decoded.get(et, []):
                        args = {
                            f: (span_texts[i] if i is not None else None)
                            for f, i in zip(event_fields[et], rec)
                        }
                        recs.append({"recguid": recguid, "type": et, "args": args})
                        recguid += 1
                events_col.append(recs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "events": events_col,
                    "n_paths_pruned": pruned_col,
                }
            )

    return docs.mapInPandas(
        run, schema="doc_id string, " + _EVENTS_FIELD + ", n_paths_pruned int"
    )
