"""Stage 3 — tag: sentences → entity spans (the "NER" slot).

Three interchangeable taggers behind one output contract
(doc rows + ``spans`` column, schema.SPANS), mirroring the reference's
model_type dispatch (dee/tasks/dee_task.py:381-402):

  * ``tag_heuristic`` — typed regex extractors (T6, dee/utils.py:602-663)
    + broadcast entity-dictionary matching, merged with the complementary-
    entity rules (J3, dee/helper/dee.py:49-113): a regex entity is added
    only when it does not overlap an existing dictionary span, and
    incomplete ratios (digit immediately before) are dropped (F5,
    dee.py:102-113). This is the no-model path.
  * ``tag_gold`` — "gold_span mode" (dee_task.py:809-832): join gold span
    annotations, synthesize char-BIO labels (T7, ner.py:20-55) and decode
    them back through the runtime BIO→span decoder
    (doc_info.py:22-79) — isolating decoder correctness exactly like the
    reference's gold-span evaluation.
  * a trained-model tagger drops into the same mapInPandas slot (iterator
    pandas UDF, model loaded once per executor) — out of scope here, the
    plumbing is identical.

All taggers are Arrow-vectorized mapInPandas over doc rows; no per-row
Python. Before the UDF, rows are length-bucketed + salt-repartitioned so
one executor never receives a batch of only-huge documents (north rule).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import label_index
from ..pyref import textproc
from ..pyref.spans import decode_spans, labels_from_spans

_SPANS_FIELD = "spans: array<struct<text:string,field:string,dranges:array<struct<sent_idx:int,char_s:int,char_e:int>>>>"


def length_bucketed(
    df: DataFrame, n_partitions: int, salt_buckets: int | None = None
) -> DataFrame:
    """Repartition by (doc-length bucket, salted doc hash): batches
    arriving at the Arrow UDF have homogeneous size → no straggler
    executors on the long tail of huge documents (analog of the
    reference's batch padding waste avoidance, SURVEY §4). The salt also
    spreads hot hosts, folding skew handling into this single exchange.
    Salt space default is shared with salted_repartition
    (ingest.default_salt_buckets) so (bucket, salt) combos out-number
    partitions — see salted_repartition."""
    if salt_buckets is None:
        from .ingest import default_salt_buckets

        salt_buckets = default_salt_buckets(n_partitions)
    bucket = F.floor(F.log2(F.size("sentences") + F.lit(1)))
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    return df.repartition(n_partitions, bucket, salt)


def _find_dict_spans(sentences: list[str], surfaces: dict[str, str]):
    """All occurrences of dictionary surfaces; longest-match-first so a
    surface embedded in a longer matched surface is not double-tagged."""
    out = []
    taken: dict[int, list[tuple[int, int]]] = {}
    for text in sorted(surfaces, key=len, reverse=True):
        fieldname = surfaces[text]
        dranges = []
        for si, sent in enumerate(sentences):
            start = 0
            while True:
                pos = sent.find(text, start)
                if pos < 0:
                    break
                span = (pos, pos + len(text))
                if not any(s < span[1] and span[0] < e for s, e in taken.get(si, [])):
                    dranges.append(
                        {"sent_idx": si, "char_s": span[0], "char_e": span[1]}
                    )
                    taken.setdefault(si, []).append(span)
                start = pos + len(text)
        if dranges:
            out.append({"text": text, "field": fieldname, "dranges": dranges})
    return out, taken


def _merge_regex_spans(sentences, spans, taken):
    """Complementary-entity merge (J3): typed regex entities unioned in
    unless overlapping an existing drange; ratio-completeness filter (F5)."""
    existing = {s["text"] for s in spans}
    extracted = textproc.extract_doc(sentences, exclude_ents=list(existing))
    by_text: dict[str, dict] = {}
    for typ, matches in extracted.items():
        for text, (si, cs, ce) in matches:
            if typ == "ratio" and not textproc.ratio_span_is_complete(
                sentences[si], cs
            ):
                continue
            if any(s < ce and cs < e for s, e in taken.get(si, [])):
                continue
            ent = by_text.setdefault(text, {"text": text, "field": typ, "dranges": []})
            ent["dranges"].append({"sent_idx": si, "char_s": cs, "char_e": ce})
            taken.setdefault(si, []).append((cs, ce))
    merged = spans + list(by_text.values())
    merged.sort(key=lambda s: (s["dranges"][0]["sent_idx"], s["dranges"][0]["char_s"]))
    return merged


def _rearranged(sents: list[str], spans: list[dict], max_len: int):
    """T2 — split long sentences on secondary punctuation (never inside a
    span), greedily re-merge, remap every drange (pyref.rearrange;
    reference dee/helper/dee.py:242-347). → (new_sents, new_spans,
    n_new_sentences - n_old_sentences)."""
    from ..pyref.rearrange import rearrange_sentences

    tuples = [
        (
            s["text"],
            s["field"],
            [(d["sent_idx"], d["char_s"], d["char_e"]) for d in s["dranges"]],
        )
        for s in spans
    ]
    new_sents, new_tuples = rearrange_sentences(sents, tuples, max_len=max_len)
    new_spans = [
        {
            "text": t,
            "field": f,
            "dranges": [
                {"sent_idx": a, "char_s": b, "char_e": c} for a, b, c in drs
            ],
        }
        for t, f, drs in new_tuples
    ]
    return new_sents, new_spans, len(new_sents) - len(sents)


def tag_heuristic(
    docs: DataFrame,
    entity_dict: dict[str, str],
    rearrange_max_len: int | None = None,
) -> DataFrame:
    """Dictionary + regex tagger. ``entity_dict``: surface → field; it is
    closed over and shipped once per task via Arrow (small: broadcast-dict
    resolution for big dictionaries lives in canonicalize).

    ``rearrange_max_len`` enables T2 sentence re-arrangement after
    tagging (found spans protected, dranges remapped); the rearranged
    sentences replace the ``sentences`` column and the per-doc piece
    delta is counted in ``n_sents_rearranged``."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(entity_dict)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        surfaces = bc.value
        for pdf in batches:
            spans_col = []
            sents_col = []
            delta_col = []
            for sentences in pdf["sentences"]:
                sents = list(sentences)
                spans, taken = _find_dict_spans(sents, surfaces)
                spans = _merge_regex_spans(sents, spans, taken)
                delta = 0
                if rearrange_max_len:
                    sents, spans, delta = _rearranged(
                        sents, spans, rearrange_max_len
                    )
                spans_col.append(spans)
                sents_col.append(sents)
                delta_col.append(delta)
            out = pdf.assign(spans=spans_col)
            if rearrange_max_len:
                out = out.assign(sentences=sents_col, n_sents_rearranged=delta_col)
            yield out

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    out_schema += ", " + _SPANS_FIELD
    if rearrange_max_len:
        # schema order must track the pandas assign order (position-based
        # Arrow conversion): spans first, then the rearrangement counter
        out_schema += ", n_sents_rearranged int"
    return docs.mapInPandas(run, schema=out_schema)


# per-executor-process model cache: one deserialization per (process,
# broadcast), exactly like the reference's once-per-worker model init
# (dee/tasks/dee_task.py model resume) — asserted in tests. Keyed by the
# broadcast's backing file path: stable across task closures in the same
# worker process, unique per broadcast. Entries store (bc, tagger): the
# strong reference pins the Broadcast so the id()-fallback key (used when
# _path is absent, e.g. driver-local execution) can never be reused by a
# later, different broadcast after GC.
_MODEL_CACHE: dict[str, tuple[object, object]] = {}
MODEL_LOADS = 0


def _tagger_from_broadcast(bc):
    global MODEL_LOADS
    # Broadcast identity: python-worker-side Broadcast objects expose no
    # public id (pyspark 4.1 has neither an `id` attribute nor
    # _jbroadcast on the worker path) — the pickle file path IS the
    # per-broadcast identity there, unique per sc.broadcast() call
    key = getattr(bc, "_path", None) or str(id(bc))
    entry = _MODEL_CACHE.get(key)
    if entry is not None:
        return entry[1]
    from ..model.char_tagger import CharTagger

    tagger = CharTagger.from_arrays(bc.value)
    _MODEL_CACHE[key] = (bc, tagger)
    MODEL_LOADS += 1
    return tagger


def tag_model(docs: DataFrame, model, ent_fix_mode: str = "n") -> DataFrame:
    """M1 — the trained-model tagger in the mapInPandas slot (reference
    dee/modules/ner_model.py:156-228 shape): a batched numpy char tagger
    (hashed-window emissions + constrained Viterbi; model/char_tagger.py).

    Weights are broadcast ONCE as plain arrays; each executor process
    deserializes them a single time (module cache keyed by broadcast id)
    and then only does vectorized batch inference — the iterator-UDF
    pattern, model loaded outside the batch loop. ``model``: a CharTagger
    or its to_arrays() dict.

    ``ent_fix_mode`` (J4, reference fix_ent doc_info.py:196-254): "n" no
    snapping, "f" snap regex-typed predictions to overlapping regex
    extractions, "-" drop regex-typed predictions with no exact match."""
    spark = docs.sparkSession
    arrays = model.to_arrays() if hasattr(model, "to_arrays") else dict(model)
    bc = spark.sparkContext.broadcast(arrays)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = _tagger_from_broadcast(bc)  # once per worker, not per batch
        for pdf in batches:
            # batch ALL sentences of the Arrow batch through one model
            # call (the model length-sorts + chunks internally) — per-doc
            # calls would decode tiny batches and waste the vectorization
            flat: list[str] = []
            bounds: list[tuple[int, int]] = []
            for sentences in pdf["sentences"]:
                bounds.append((len(flat), len(sentences)))
                flat.extend(sentences)
            labels = tagger.predict_sent_labels(flat)
            spans_col = []
            for (off, n), sentences in zip(bounds, pdf["sentences"]):
                sents = list(sentences)
                spans = tagger.spans_from_labels(sents, labels[off : off + n])
                if ent_fix_mode != "n":
                    spans = textproc.fix_ent_spans(sents, spans, ent_fix_mode)
                spans_col.append(spans)
            yield pdf.assign(spans=spans_col)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    return docs.mapInPandas(run, schema=out_schema + ", " + _SPANS_FIELD)


def tag_gold(
    docs: DataFrame,
    gold: DataFrame,
    rearrange_max_len: int | None = None,
    label2id: dict[str, int] | None = None,
) -> DataFrame:
    """Gold-span mode: equi-join annotations on doc_id, then round-trip
    gold spans through BIO synthesis + runtime BIO→span decoding so the
    downstream sees exactly what a perfect tagger would emit.

    ``rearrange_max_len`` enables T2 re-arrangement before the BIO
    round-trip — exactly where the reference applies it during data prep
    (dee/helper/dee.py:242-347): annotated dranges are protected from
    cuts and remapped to the new coordinates.

    ``label2id``: the BIO label space — default ChFinAnn; a span whose
    field has no B-/I- entry is silently dropped by the synthesis
    (labels_from_spans conflict rule), so non-ChFinAnn corpora must pass
    their own space (refdata.corpus_label_index)."""
    annotated = docs.join(
        gold.select(
            F.col("guid").alias("doc_id"),
            F.col("spans").alias("gold_spans"),
        ),
        "doc_id",
    )
    l2i = label2id if label2id is not None else label_index()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pyref.rearrange import rearrange_sentences

        for pdf in batches:
            spans_col = []
            sents_col = []
            delta_col = []
            for sentences, gold_spans in zip(pdf["sentences"], pdf["gold_spans"]):
                sents = list(sentences)
                span_tuples = [
                    (
                        s["text"],
                        s["field"],
                        [
                            (d["sent_idx"], d["char_s"], d["char_e"])
                            for d in s["dranges"]
                        ],
                    )
                    for s in gold_spans
                ]
                delta = 0
                if rearrange_max_len:
                    new_sents, span_tuples = rearrange_sentences(
                        sents, span_tuples, max_len=rearrange_max_len
                    )
                    delta = len(new_sents) - len(sents)
                    sents = new_sents
                labels = labels_from_spans(sents, span_tuples, l2i)
                tokens = [list(s) for s in sents]
                texts, dranges, labs = decode_spans(tokens, labels)
                field_of = {t: f for t, f, _ in span_tuples}
                spans_col.append(
                    [
                        {
                            "text": t,
                            "field": field_of.get(t),
                            "dranges": [
                                {"sent_idx": a, "char_s": b, "char_e": c}
                                for a, b, c in drs
                            ],
                        }
                        for t, drs in zip(texts, dranges)
                    ]
                )
                sents_col.append(sents)
                delta_col.append(delta)
            out = pdf.drop(columns=["gold_spans"]).assign(spans=spans_col)
            if rearrange_max_len:
                out = out.assign(sentences=sents_col, n_sents_rearranged=delta_col)
            yield out

    base_fields = [f for f in annotated.schema.fields if f.name != "gold_spans"]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in base_fields)
    out_schema += ", " + _SPANS_FIELD
    if rearrange_max_len:
        out_schema += ", n_sents_rearranged int"
    return annotated.mapInPandas(run, schema=out_schema)


def drop_empty_span_docs(df: DataFrame) -> DataFrame:
    """F3 (dee/helper/dee.py:763-765): docs with zero spans are dropped
    before the expensive decode stage — count them upstream if needed."""
    return df.filter(F.size("spans") > 0)
