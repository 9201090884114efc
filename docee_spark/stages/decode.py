"""Stage 4 — decode: spans → event records, per document.

The per-document combinatorial heart of the engine (reference G3-G9):
adjacency construction, maximal-clique or EDAG-path enumeration, role
assignment, subset-dedup. All of it is row-local — no cross-document
state — so it runs as one Arrow-vectorized mapInPandas over length-
bucketed doc rows; a 1000-executor cluster scales it linearly.

Adjacency sources (the "model" slot):
  * ``adjacency="sentence"`` — spans co-mentioned in a sentence are
    linked (deterministic analog of the PTPCG adjacency scorer M6,
    trigger_aware.py:375-387; same shape: spans → 0/1 matrix).
  * ``adjacency="gold"`` — revealed from gold events (G1,
    arg_rel.py:270-277); requires an ``events`` column (gold mode, used
    for decoder-parity evaluation exactly like the reference's gold_span
    runs).

Decode mode: "clique" (PTPCG family) or "edag" (Doc2EDAG family,
doc2edag.py:532-604), switched like the reference's model_type dispatch.
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame

from ..config import CHFINANN_EVENT_TYPES, MAX_EDAG_PATHS
from ..pyref.edag import decode_doc

_EVENTS_FIELD = "events: array<struct<recguid:int,type:string,args:map<string,string>>>"


def _sentence_adjacency(n: int, span_sents: list[list[int]]) -> list[list[int]]:
    adj = [[0] * n for _ in range(n)]
    by_sent: dict[int, list[int]] = {}
    for i, sents in enumerate(span_sents):
        adj[i][i] = 1
        for s in sents:
            by_sent.setdefault(s, []).append(i)
    for members in by_sent.values():
        for i, j in combinations(members, 2):
            adj[i][j] = adj[j][i] = 1
    return adj


def _gold_adjacency(n: int, span_texts: list[str], events) -> list[list[int]]:
    idx = {t: i for i, t in enumerate(span_texts)}
    adj = [[0] * n for _ in range(n)]
    for i in range(n):
        adj[i][i] = 1
    for ev in events:
        members = sorted(
            {idx[v] for v in dict(ev["args"]).values() if v is not None and v in idx}
        )
        for i, j in combinations(members, 2):
            adj[i][j] = adj[j][i] = 1
    return adj


#: worker-process scorer cache — mapInPandas calls the UDF once per TASK,
#: and rebuilding a scorer (tagger vocab + array copies) per task would
#: repeat hundreds of times per executor; key = the broadcast's pickle
#: path, the per-broadcast identity on the python-worker side (same
#: pattern as tag._MODEL_CACHE). Entries store (bc, scorer): the strong
#: reference pins the Broadcast so the id()-fallback key (used when
#: _path is absent, e.g. driver-local execution) can never be reused by
#: a later, different broadcast after GC.
_SCORER_CACHE: dict[str, tuple[object, object]] = {}


def _scorer_from_broadcast(bc):
    key = getattr(bc, "_path", None) or str(id(bc))
    entry = _SCORER_CACHE.get(key)
    sc = entry[1] if entry is not None else None
    if sc is None:
        arr = bc.value
        if "rgcn_Wss" in arr:  # GIT RGCN (G10) variant
            from ..model.rgcn import GitRgcnScorer

            sc = GitRgcnScorer.from_arrays(arr)
        elif "ctx_Wq" in arr:  # doc-context (M4) variant
            from ..model.biaffine_scorer import DocCtxBiaffineScorer

            sc = DocCtxBiaffineScorer.from_arrays(arr)
        elif "tag_W" in arr:  # biaffine artifact embeds its tagger
            from ..model.biaffine_scorer import BiaffineAdjScorer

            sc = BiaffineAdjScorer.from_arrays(arr)
        else:
            from ..model.adj_scorer import AdjScorer

            sc = AdjScorer.from_arrays(arr)
        _SCORER_CACHE[key] = (bc, sc)
    return sc


def score_adjacency(tagged: DataFrame, scorer) -> DataFrame:
    """M6/M7 — a trained adjacency scorer in front of the matrix slot
    (reference trigger_aware.py:375-387 shape: scores → threshold → 0/1
    matrix). ``scorer``: a model.adj_scorer.AdjScorer, a
    model.biaffine_scorer.BiaffineAdjScorer (biaffine over AWA-pooled
    span embeddings — needs the sentence text), or either one's arrays;
    broadcast once, deserialized once per worker, batched per-doc pair
    scoring inside one Arrow UDF. Output rows gain ``adj`` and feed
    ``decode(adjacency="matrix")`` unchanged."""
    spark = tagged.sparkSession
    arrays = (
        scorer.to_arrays() if hasattr(scorer, "to_arrays") else dict(scorer)
    )
    bc = spark.sparkContext.broadcast(arrays)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sc = _scorer_from_broadcast(bc)  # cached once per worker PROCESS
        needs_sents = getattr(sc, "needs_sentences", False)
        for pdf in batches:
            adj_col = []
            for sentences, spans in zip(pdf["sentences"], pdf["spans"]):
                if needs_sents:
                    adj_col.append(sc.score_doc(list(sentences), list(spans)))
                    continue
                fields = [s["field"] for s in spans]
                sents = [
                    sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans
                ]
                adj_col.append(sc.score_doc(fields, sents))
            yield pdf.assign(adj=adj_col)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in tagged.schema.fields
    )
    return tagged.mapInPandas(run, schema=out_schema + ", adj: array<array<int>>")


def decode(
    tagged: DataFrame,
    mode: str = "clique",
    adjacency: str = "sentence",
    max_paths: int = MAX_EDAG_PATHS,
    exact_fields: bool | None = None,
    event_types=None,
    type_keywords: dict[str, tuple[str, ...]] | None = None,
    num_triggers: int = -1,
) -> DataFrame:
    """→ doc rows + ``events`` column (schema.EVENTS).

    ``exact_fields``: whether span fields are exact role names (gold or
    trained-model tagger) rather than coarse types (dictionary+regex).
    Default None = infer from adjacency ("gold" ⇒ exact) — pass True
    explicitly for model-tagged spans so the EDAG expansion runs its real
    per-role branching instead of the coarse-field clique fallback.

    ``event_types``/``type_keywords``: the event-schema catalog and the
    per-type sentence cue table — default ChFinAnn, exactly like the
    reference's template selection by name (dee/event_types/__init__.py
    get_event_template); pass catalogs.WIKIEVENTS_EVENT_TYPES (+ a
    corpus cue table, refdata.trigger_type_keywords) for KAIROS data."""
    cat = tuple(event_types) if event_types is not None else CHFINANN_EVENT_TYPES
    event_fields = {et.name: list(et.fields) for et in cat}
    min_fields = {et.name: et.min_field_num for et in cat}
    trigger_tiers = {
        et.name: {k: tuple(v) for k, v in et.triggers.items()}
        for et in cat
        if getattr(et, "triggers", None)
    }
    use_gold_adj = adjacency == "gold"
    use_matrix_adj = adjacency == "matrix"
    if exact_fields is None:
        exact_fields = use_gold_adj
    if use_gold_adj and "events" not in tagged.columns:
        raise ValueError("adjacency='gold' requires an `events` column")
    if use_matrix_adj and "adj" not in tagged.columns:
        # the model slot: a trained PTPCG-style scorer (M6,
        # trigger_aware.py:375-387) emits a per-doc 0/1 matrix as
        # `adj: array<array<int>>`; decode consumes it unchanged
        raise ValueError("adjacency='matrix' requires an `adj` column")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            events_col = []
            pruned_col = []
            if use_gold_adj:
                aux = pdf["events"]
            elif use_matrix_adj:
                aux = pdf["adj"]
            else:
                aux = [None] * len(pdf)
            for sentences, spans, extra in zip(pdf["sentences"], pdf["spans"], aux):
                sents = list(sentences)
                span_texts = [s["text"] for s in spans]
                span_fields = [s["field"] for s in spans]
                span_sents = [
                    sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans
                ]
                n = len(span_texts)
                if use_gold_adj:
                    adj = _gold_adjacency(n, span_texts, extra)
                elif use_matrix_adj:
                    adj = [list(row) for row in extra]
                else:
                    adj = _sentence_adjacency(n, span_sents)
                doc_stats: dict[str, int] = {}
                decoded = decode_doc(
                    sents,
                    span_fields,
                    span_sents,
                    adj,
                    event_fields,
                    min_fields,
                    mode=mode,
                    type_keywords=type_keywords,
                    max_paths=max_paths,
                    exact_fields=exact_fields,
                    trigger_tiers=trigger_tiers,
                    num_triggers=num_triggers,
                    stats=doc_stats,
                    # the model slot's matrix is directed by declaration —
                    # never overridden by the trigger modes' symmetric-
                    # adjacency fallback (all-zero/1×1 sniffs misfire)
                    directed_adjacency=use_matrix_adj,
                )
                pruned_col.append(int(doc_stats.get("n_paths_pruned", 0)))
                recs = []
                recguid = 0
                for et in event_fields:  # deterministic catalog order
                    for rec in decoded.get(et, []):
                        args = {
                            f: (span_texts[i] if i is not None else None)
                            for f, i in zip(event_fields[et], rec)
                        }
                        recs.append({"recguid": recguid, "type": et, "args": args})
                        recguid += 1
                events_col.append(recs)
            out = pdf
            if use_gold_adj:
                out = out.drop(columns=["events"])
            if use_matrix_adj:
                out = out.drop(columns=["adj"])
            # n_paths_pruned: A9-style truncation counter for the EDAG /
            # product path caps (0 everywhere else) — adversarial docs
            # must show up in metrics, never silently lose records
            yield out.assign(events=events_col, n_paths_pruned=pruned_col)

    base_fields = [
        f for f in tagged.schema.fields if f.name not in ("events", "adj")
    ]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in base_fields
    )
    return tagged.mapInPandas(
        run, schema=out_schema + ", " + _EVENTS_FIELD + ", n_paths_pruned int"
    )
