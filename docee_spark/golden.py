"""Golden fixture tables: the DuckDB-side ground truth for docee_* queries.

The deterministic fixture corpus (fixtures.generate_corpus — same
(n_docs, seed) as ``__spark_entry__._fixture_webtext_and_gold``) is
flattened to plain relational parquet tables that DuckDB can query:

  * gold_docs      (doc_id, doc_type, n_sents, n_spans, n_events)
  * gold_args      (doc_id, recguid, event_type, role, role_idx, arg)
                   — one row per (event record, role in catalog field
                   order); arg NULL when the role is unfilled
  * gold_mentions  (doc_id, arg, field, sent_idx, char_s, char_e)
                   — one row per gold span drange
  * gold_sents     (doc_id, sent_idx, sentence) — the raw sentences the
                   SQL-tagger oracles re-tag from scratch
  * model_spans    (doc_id, span_idx, field, text, sent_idx) — the M1
                   tagger's span predictions (single-process pyref twin);
                   the model-mode oracles re-derive the ENTIRE decode in
                   SQL from this table
  * adj_*          (doc_id, i, j) — each trained scorer's thresholded
                   adjacency; the scored-mode oracles enumerate maximal
                   cliques over it in SQL

Every docee_* oracle is an independent SQL derivation over these flat
inputs — no golden decode OUTPUT is stored; only model/scorer inference
itself remains on a shared code path (its spec IS the trained weights).

Generation is idempotent: a manifest records (version, n_docs, seed) and
matching tables are not rewritten. Files are also committed to git so the
driver's DuckDB pass can read them without running Python first.

Reference parity notes: gold records/args mirror the reference dataset
shape (dee/helper/dee.py:116-124); the per-mode decoders are the pyref
re-implementations graded in tests (clique/greedy/dcfee —
dee/modules/adj_decoding.py, doc2edag.py:812-969).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .config import CHFINANN_EVENT_TYPES, MAX_SENT_LEN, MAX_SENT_NUM, label_index

VERSION = "v13"  # v12: +git_rgcn; v13: +tagger weight dump + spot docs (model_spans_spot oracle)
N_DOCS = 120
SEED = 7

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden_fixtures"
)

_EVENT_FIELDS = {et.name: list(et.fields) for et in CHFINANN_EVENT_TYPES}
_MIN_FIELDS = {et.name: et.min_field_num for et in CHFINANN_EVENT_TYPES}


def _segment(text: str, lang: str = "zh") -> list[str]:
    """pyref twin of stages.segment: sent_seg → truncate → clip."""
    from .pyref.textproc import sent_seg

    return [s[:MAX_SENT_LEN] for s in sent_seg(text or "", lang=lang)[:MAX_SENT_NUM]]


def _records_from_decoded(decoded, span_texts) -> list[dict]:
    """Catalog-ordered record list with sequential recguids — the exact
    construction of stages.decode / stages.fused."""
    recs, recguid = [], 0
    for et in _EVENT_FIELDS:
        for rec in decoded.get(et, []):
            args = {
                f: (span_texts[i] if i is not None else None)
                for f, i in zip(_EVENT_FIELDS[et], rec)
            }
            recs.append({"recguid": recguid, "type": et, "args": args})
            recguid += 1
    return recs


def _heuristic_spans(sents: list[str], entity_dict: dict[str, str]):
    """Shared head of the no-gold paths: the dictionary+regex tagger."""
    from .stages.tag import _find_dict_spans, _merge_regex_spans

    spans, taken = _find_dict_spans(sents, entity_dict)
    return _merge_regex_spans(sents, spans, taken)


def _matrix_events(sents: list[str], spans: list[dict], adj):
    """Clique decode over a scored adjacency MATRIX (the
    adjacency='matrix' slot shared by M6/M7/M4 scorers)."""
    from .pyref.edag import decode_doc

    if not spans:
        return []
    span_texts = [s["text"] for s in spans]
    span_fields = [s["field"] for s in spans]
    span_sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
    decoded = decode_doc(
        sents, span_fields, span_sents, adj, _EVENT_FIELDS, _MIN_FIELDS,
        mode="clique", max_paths=1024, exact_fields=False,
    )
    return _records_from_decoded(decoded, span_texts)


def _heuristic_events(sents: list[str], entity_dict: dict[str, str], mode: str):
    from .pyref.edag import decode_doc
    from .stages.decode import _sentence_adjacency
    from .stages.tag import _find_dict_spans, _merge_regex_spans

    spans, taken = _find_dict_spans(sents, entity_dict)
    spans = _merge_regex_spans(sents, spans, taken)
    if not spans:
        return []
    span_texts = [s["text"] for s in spans]
    span_fields = [s["field"] for s in spans]
    span_sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
    adj = _sentence_adjacency(len(spans), span_sents)
    decoded = decode_doc(
        sents, span_fields, span_sents, adj, _EVENT_FIELDS, _MIN_FIELDS,
        mode=mode, max_paths=1024, exact_fields=False,
    )
    return _records_from_decoded(decoded, span_texts)


def _gold_mode_events(sents: list[str], gold_spans: list[dict], gold_events):
    """pyref twin of tag_gold (BIO round-trip) + gold-adjacency clique
    decode with exact_fields=True."""
    from .pyref.edag import decode_doc
    from .pyref.spans import decode_spans, labels_from_spans
    from .stages.decode import _gold_adjacency

    l2i = label_index()
    span_tuples = [
        (
            s["text"],
            s["field"],
            [(d["sent_idx"], d["char_s"], d["char_e"]) for d in s["dranges"]],
        )
        for s in gold_spans
    ]
    labels = labels_from_spans(sents, span_tuples, l2i)
    tokens = [list(s) for s in sents]
    texts, dranges, _ = decode_spans(tokens, labels)
    field_of = {t: f for t, f, _ in span_tuples}
    spans = [
        {
            "text": t,
            "field": field_of.get(t),
            "dranges": [
                {"sent_idx": a, "char_s": b, "char_e": c} for a, b, c in drs
            ],
        }
        for t, drs in zip(texts, dranges)
    ]
    if not spans:
        return []
    span_texts = [s["text"] for s in spans]
    span_fields = [s["field"] for s in spans]
    span_sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
    adj = _gold_adjacency(len(span_texts), span_texts, gold_events)
    decoded = decode_doc(
        sents, span_fields, span_sents, adj, _EVENT_FIELDS, _MIN_FIELDS,
        mode="clique", max_paths=1024, exact_fields=True,
    )
    return _records_from_decoded(decoded, span_texts)


#: the trained M1 tagger artifact (committed; retrained only if missing —
#: training is deterministic: seeded SGD, single-threaded scatter/gather)
TAGGER_PATH = os.path.join(GOLDEN_DIR, "char_tagger.npz")
TAGGER_TRAIN_DOCS = 600
TAGGER_TRAIN_SEED = 1234


def ensure_tagger(force: bool = False):
    """Train-or-load the char tagger; returns the CharTagger. The train
    corpus is the index-pure generator stream (make_doc_indexed) with a
    DIFFERENT seed from the eval fixture corpus — no train/eval leak."""
    from .model.char_tagger import load_tagger, save_tagger, train_char_tagger

    if not force and os.path.exists(TAGGER_PATH):
        return load_tagger(TAGGER_PATH)
    from .fixtures import make_doc_indexed

    train_docs = [
        make_doc_indexed(i, seed=TAGGER_TRAIN_SEED)[1]
        for i in range(TAGGER_TRAIN_DOCS)
    ]
    tagger = train_char_tagger(
        train_docs, epochs=10, lr=0.2, offsets=tuple(range(-14, 9))
    )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    save_tagger(tagger, TAGGER_PATH)
    return tagger


SCORER_PATH = os.path.join(GOLDEN_DIR, "adj_scorer.npz")
SCORER_TRAIN_DOCS = 400
SCORER_TRAIN_SEED = 4321
BIAFFINE_PATH = os.path.join(GOLDEN_DIR, "biaffine_scorer.npz")
BIAFFINE_TRAIN_DOCS = 200
BIAFFINE_TRAIN_SEED = 8765
DOC_CTX_PATH = os.path.join(GOLDEN_DIR, "doc_ctx_scorer.npz")
DOC_CTX_TRAIN_DOCS = 200
DOC_CTX_TRAIN_SEED = 5432
GIT_RGCN_PATH = os.path.join(GOLDEN_DIR, "git_rgcn_scorer.npz")
GIT_RGCN_TRAIN_DOCS = 200
GIT_RGCN_TRAIN_SEED = 3141


def ensure_scorer(force: bool = False):
    """Train-or-load the M6 adjacency pair scorer (logistic over pair
    features, gold adjacencies from a disjoint-seed generator stream)."""
    from .model.adj_scorer import load_scorer, save_scorer, train_adj_scorer

    if not force and os.path.exists(SCORER_PATH):
        return load_scorer(SCORER_PATH)
    from .fixtures import make_doc_indexed

    train_docs = [
        make_doc_indexed(i, seed=SCORER_TRAIN_SEED)[1]
        for i in range(SCORER_TRAIN_DOCS)
    ]
    scorer = train_adj_scorer(train_docs)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    save_scorer(scorer, SCORER_PATH)
    return scorer


def ensure_biaffine(force: bool = False):
    """Train-or-load the M7 biaffine scorer over M3 AWA-pooled span
    embeddings of the M1 tagger's char features — all three parameter
    groups trained jointly on gold adjacencies from a disjoint-seed
    generator stream (model/biaffine_scorer.py)."""
    from .model.biaffine_scorer import (
        load_biaffine,
        save_biaffine,
        train_biaffine_scorer,
    )

    if not force and os.path.exists(BIAFFINE_PATH):
        return load_biaffine(BIAFFINE_PATH)
    from .fixtures import make_doc_indexed

    train_docs = [
        make_doc_indexed(i, seed=BIAFFINE_TRAIN_SEED)[1]
        for i in range(BIAFFINE_TRAIN_DOCS)
    ]
    scorer = train_biaffine_scorer(train_docs, ensure_tagger())
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    save_biaffine(scorer, BIAFFINE_PATH)
    return scorer


def ensure_doc_ctx(force: bool = False):
    """Train-or-load the M4 doc-context scorer: biaffine pair scoring over
    span embeddings contextualized by one residual self-attention layer
    over [spans ∥ sentences] (model/doc_context.py) — all parameters
    trained jointly on gold adjacencies from a disjoint-seed stream."""
    from .model.biaffine_scorer import (
        DocCtxBiaffineScorer,
        train_doc_context_scorer,
    )

    if not force and os.path.exists(DOC_CTX_PATH):
        import numpy as np

        with np.load(DOC_CTX_PATH, allow_pickle=False) as z:
            return DocCtxBiaffineScorer.from_arrays(dict(z.items()))
    from .fixtures import make_doc_indexed

    train_docs = [
        make_doc_indexed(i, seed=DOC_CTX_TRAIN_SEED)[1]
        for i in range(DOC_CTX_TRAIN_DOCS)
    ]
    scorer = train_doc_context_scorer(train_docs, ensure_tagger())
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from .model.biaffine_scorer import save_biaffine

    save_biaffine(scorer, DOC_CTX_PATH)
    return scorer


def ensure_git_rgcn(force: bool = False):
    """Train-or-load the G10 GIT-RGCN scorer: biaffine pair scoring over
    span embeddings enriched by one relational graph-convolution layer on
    the GIT-typed document graph (model/rgcn.py) — all parameters trained
    jointly on gold adjacencies from a disjoint-seed stream."""
    from .model.rgcn import GitRgcnScorer, train_git_rgcn_scorer

    if not force and os.path.exists(GIT_RGCN_PATH):
        import numpy as np

        with np.load(GIT_RGCN_PATH, allow_pickle=False) as z:
            return GitRgcnScorer.from_arrays(dict(z.items()))
    from .fixtures import make_doc_indexed

    train_docs = [
        make_doc_indexed(i, seed=GIT_RGCN_TRAIN_SEED)[1]
        for i in range(GIT_RGCN_TRAIN_DOCS)
    ]
    scorer = train_git_rgcn_scorer(train_docs, ensure_tagger())
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from .model.biaffine_scorer import save_biaffine

    save_biaffine(scorer, GIT_RGCN_PATH)
    return scorer


TRANSE_PATH = os.path.join(GOLDEN_DIR, "transe.npz")
TRANSE_SEED = 17


def ensure_transe(force: bool = False):
    """Train-or-load the TransE KG-completion model on the deterministic
    composition KG (model/transe.py:synth_kg) and dump the frozen
    e6-integer embeddings as parquet (transe_ent/transe_rel) so the
    DuckDB oracles re-derive scoring and ranking from the weight TABLES
    — the same dump-the-weights independence pattern as the tagger
    (tagger_weights.parquet)."""
    from .model.transe import load_transe, save_transe, synth_kg, train_transe

    ent_pq = os.path.join(GOLDEN_DIR, "transe_ent.parquet")
    rel_pq = os.path.join(GOLDEN_DIR, "transe_rel.parquet")
    kg_pq = os.path.join(GOLDEN_DIR, "transe_kg.parquet")
    if not force and all(
        os.path.exists(p) for p in (TRANSE_PATH, ent_pq, rel_pq, kg_pq)
    ):
        return load_transe(TRANSE_PATH)
    train, held = synth_kg()
    model = train_transe(train, seed=TRANSE_SEED)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    save_transe(model, TRANSE_PATH)
    pq.write_table(
        pa.table(
            {
                "entity": model.entities,
                "vec": [list(map(int, v)) for v in model.ent_e6],
            },
            schema=pa.schema(
                [("entity", pa.string()), ("vec", pa.list_(pa.int64()))]
            ),
        ),
        ent_pq,
    )
    pq.write_table(
        pa.table(
            {
                "pred": model.relations,
                "vec": [list(map(int, v)) for v in model.rel_e6],
            },
            schema=pa.schema(
                [("pred", pa.string()), ("vec", pa.list_(pa.int64()))]
            ),
        ),
        rel_pq,
    )
    rows = [(s, r, o, "train") for s, r, o in train] + [
        (s, r, o, "held") for s, r, o in held
    ]
    pq.write_table(
        pa.table(
            {
                "subj": [x[0] for x in rows],
                "pred": [x[1] for x in rows],
                "obj": [x[2] for x in rows],
                "split": [x[3] for x in rows],
            },
            schema=pa.schema(
                [
                    ("subj", pa.string()),
                    ("pred", pa.string()),
                    ("obj", pa.string()),
                    ("split", pa.string()),
                ]
            ),
        ),
        kg_pq,
    )
    return model


def ensure_golden(force: bool = False) -> str:
    """Generate the golden tables if missing/stale; return the directory."""
    manifest_path = os.path.join(GOLDEN_DIR, "manifest.json")
    want = {"version": VERSION, "n_docs": N_DOCS, "seed": SEED}
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return GOLDEN_DIR

    from .fixtures import generate_corpus, heuristic_entity_dict

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    web_rows, gold_rows = generate_corpus(N_DOCS, seed=SEED)
    entity_dict = heuristic_entity_dict()

    mspan_tbl = {k: [] for k in ("doc_id", "span_idx", "field", "text", "sent_idx")}
    adj_tbl = {
        m: {k: [] for k in ("doc_id", "i", "j")}
        for m in ("scored", "biaffine", "doc_ctx", "git_rgcn")
    }
    docs_tbl = {k: [] for k in ("doc_id", "doc_type", "n_sents", "n_spans", "n_events")}
    args_tbl = {k: [] for k in ("doc_id", "recguid", "event_type", "role", "role_idx", "arg")}
    ment_tbl = {k: [] for k in ("doc_id", "arg", "field", "sent_idx", "char_s", "char_e")}
    sent_tbl = {k: [] for k in ("doc_id", "sent_idx", "sentence")}
    eval_tbl = {k: [] for k in ("doc_id", "doc_type", "event_type", "role", "tp", "fp", "fn")}
    tagger = ensure_tagger()
    scorer = ensure_scorer()
    biaffine = ensure_biaffine()
    doc_ctx = ensure_doc_ctx()
    git_rgcn = ensure_git_rgcn()

    for web, g in zip(web_rows, gold_rows):
        doc_id = g["guid"]
        events = g["events"]
        types = [e["type"] for e in events]
        doc_type = (
            "unk" if not events
            else "o2o" if len(events) == 1
            else "o2m" if len(set(types)) == 1
            else "m2m"
        )
        docs_tbl["doc_id"].append(doc_id)
        docs_tbl["doc_type"].append(doc_type)
        docs_tbl["n_sents"].append(len(g["sentences"]))
        docs_tbl["n_spans"].append(len(g["spans"]))
        docs_tbl["n_events"].append(len(events))
        for ev in events:
            for role_idx, role in enumerate(_EVENT_FIELDS[ev["type"]]):
                args_tbl["doc_id"].append(doc_id)
                args_tbl["recguid"].append(ev["recguid"])
                args_tbl["event_type"].append(ev["type"])
                args_tbl["role"].append(role)
                args_tbl["role_idx"].append(role_idx)
                args_tbl["arg"].append(ev["args"].get(role))
        for si, sent in enumerate(g["sentences"]):
            sent_tbl["doc_id"].append(doc_id)
            sent_tbl["sent_idx"].append(si)
            sent_tbl["sentence"].append(sent)
        for sp in g["spans"]:
            for d in sp["dranges"]:
                ment_tbl["doc_id"].append(doc_id)
                ment_tbl["arg"].append(sp["text"])
                ment_tbl["field"].append(sp["field"])
                ment_tbl["sent_idx"].append(d["sent_idx"])
                ment_tbl["char_s"].append(d["char_s"])
                ment_tbl["char_e"].append(d["char_e"])

        sents = _segment(web["text"], lang=web["lang"])
        gold_mode = _gold_mode_events(sents, g["spans"], events)
        # eval_stats: pyref twin of stages.evaluate.role_stats on the
        # gold-mode pipeline (pred = decoded events, [] for docs dropped
        # by the zero-span filter; gold = annotated events)
        from .pyref.matching import event_role_tpfpfn

        def _by_type(evs):
            out = {}
            for ev in evs:
                out.setdefault(ev["type"], []).append(
                    tuple(ev["args"].get(f) for f in _EVENT_FIELDS[ev["type"]])
                )
            return out

        preds, golds = _by_type(gold_mode), _by_type(events)
        for et, fields in _EVENT_FIELDS.items():
            p, gg = preds.get(et), golds.get(et)
            if p is None and gg is None:
                continue
            stats = event_role_tpfpfn(p, gg, len(fields))
            for role, (tp, fp, fn) in zip(fields, stats):
                eval_tbl["doc_id"].append(doc_id)
                eval_tbl["doc_type"].append(doc_type)
                eval_tbl["event_type"].append(et)
                eval_tbl["role"].append(role)
                eval_tbl["tp"].append(tp)
                eval_tbl["fp"].append(fp)
                eval_tbl["fn"].append(fn)
        # model spans dumped flat — the model_spans table lets the
        # docee_triples_model{,_edag} oracles re-derive the ENTIRE decode
        # in pure SQL, leaving only the tagger inference itself on a
        # shared code path
        model_spans = tagger.doc_spans(sents)
        for sp_idx, sp in enumerate(model_spans):
            for si in sorted({d["sent_idx"] for d in sp["dranges"]}):
                mspan_tbl["doc_id"].append(doc_id)
                mspan_tbl["span_idx"].append(sp_idx)
                mspan_tbl["field"].append(sp["field"])
                mspan_tbl["text"].append(sp["text"])
                mspan_tbl["sent_idx"].append(si)
        # scored-matrix modes: heuristic spans tagged ONCE, each trained
        # scorer's thresholded adjacency dumped flat — the adj_* tables
        # let the scored-mode oracles re-derive the entire maximal-clique
        # decode in pure SQL (recursive-CTE clique enumeration), leaving
        # only the scorer inference itself on a shared code path
        h_spans = _heuristic_spans(sents, entity_dict)
        if h_spans:
            h_fields = [s["field"] for s in h_spans]
            h_sents = [
                sorted({d["sent_idx"] for d in s["dranges"]}) for s in h_spans
            ]
            scorer_adjs = {
                "scored": scorer.score_doc(h_fields, h_sents),
                "biaffine": biaffine.score_doc(sents, h_spans),
                "doc_ctx": doc_ctx.score_doc(sents, h_spans),
                "git_rgcn": git_rgcn.score_doc(sents, h_spans),
            }
        else:
            scorer_adjs = {
                m: [] for m in ("scored", "biaffine", "doc_ctx", "git_rgcn")
            }
        for mode_name, adj in scorer_adjs.items():
            for i, row in enumerate(adj):
                for j, v in enumerate(row):
                    if v == 1 and i != j:
                        adj_tbl[mode_name]["doc_id"].append(doc_id)
                        adj_tbl[mode_name]["i"].append(i)
                        adj_tbl[mode_name]["j"].append(j)

    pq.write_table(
        pa.table(
            docs_tbl,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("doc_type", pa.string()),
                    ("n_sents", pa.int32()),
                    ("n_spans", pa.int32()),
                    ("n_events", pa.int32()),
                ]
            ),
        ),
        os.path.join(GOLDEN_DIR, "gold_docs.parquet"),
    )
    pq.write_table(
        pa.table(
            args_tbl,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("recguid", pa.int32()),
                    ("event_type", pa.string()),
                    ("role", pa.string()),
                    ("role_idx", pa.int32()),
                    ("arg", pa.string()),
                ]
            ),
        ),
        os.path.join(GOLDEN_DIR, "gold_args.parquet"),
    )
    pq.write_table(
        pa.table(
            ment_tbl,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("arg", pa.string()),
                    ("field", pa.string()),
                    ("sent_idx", pa.int32()),
                    ("char_s", pa.int32()),
                    ("char_e", pa.int32()),
                ]
            ),
        ),
        os.path.join(GOLDEN_DIR, "gold_mentions.parquet"),
    )
    pq.write_table(
        pa.table(
            sent_tbl,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("sent_idx", pa.int32()),
                    ("sentence", pa.string()),
                ]
            ),
        ),
        os.path.join(GOLDEN_DIR, "gold_sents.parquet"),
    )
    pq.write_table(
        pa.table(
            mspan_tbl,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("span_idx", pa.int32()),
                    ("field", pa.string()),
                    ("text", pa.string()),
                    ("sent_idx", pa.int32()),
                ]
            ),
        ),
        os.path.join(GOLDEN_DIR, "model_spans.parquet"),
    )
    for mode_name, tbl in adj_tbl.items():
        pq.write_table(
            pa.table(
                tbl,
                schema=pa.schema(
                    [
                        ("doc_id", pa.string()),
                        ("i", pa.int32()),
                        ("j", pa.int32()),
                    ]
                ),
            ),
            os.path.join(GOLDEN_DIR, f"adj_{mode_name}.parquet"),
        )
    pq.write_table(
        pa.table(
            eval_tbl,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("doc_type", pa.string()),
                    ("event_type", pa.string()),
                    ("role", pa.string()),
                    ("tp", pa.int64()),
                    ("fp", pa.int64()),
                    ("fn", pa.int64()),
                ]
            ),
        ),
        os.path.join(GOLDEN_DIR, "eval_stats.parquet"),
    )
    _write_adj_metrics(gold_rows)
    _write_tagger_tables(tagger, web_rows)

    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(want, f)
    os.replace(tmp, manifest_path)
    return GOLDEN_DIR


def _write_tagger_tables(tagger, web_rows: list[dict]) -> None:
    """Dump the trained char tagger as flat relations + pick SPOT docs —
    the `model_spans_spot` oracle re-derives the tagger's ENTIRE
    inference (char ids → windowed emission sums → constrained Viterbi →
    BIO→span assembly) in DuckDB SQL from these tables, shrinking the
    model-oracle residue to the training step alone.

    Spot docs: the 4 shortest span-bearing fixture docs whose float64
    re-inference (what SQL computes — float32 weights widened exactly,
    summed in double) chooses the same Viterbi paths as the engine's
    float32 inference.  Rounding can only diverge when an argmax margin
    is ~1e-6; such docs are excluded by construction here (none on the
    current corpus), so the SQL derivation is exact on the spot set."""
    import numpy as np

    O, V, L = tagger.W.shape

    def f64_paths(sents: list[str]) -> list[list[int]]:
        W64 = tagger.W.astype(np.float64)
        out = []
        neg = -1e30
        for s in sents:
            ids = np.array([tagger.vocab.get(c, 1) for c in s], dtype=np.int64)
            T = len(ids)
            if T == 0:
                out.append([])
                continue
            em = np.zeros((T, L), dtype=np.float64)
            for oi, off in enumerate(tagger.offsets):
                idx = np.arange(T) + off
                src = np.where((idx >= 0) & (idx < T), ids[np.clip(idx, 0, T - 1)], 0)
                em += W64[oi][src]
            dp = np.where(tagger.start_ok, em[0], neg)
            back = np.zeros((T, L), dtype=np.int64)
            mask = np.where(tagger.trans_ok, 0.0, neg)
            for t in range(1, T):
                sc = dp[:, None] + mask
                back[t] = sc.argmax(axis=0)
                dp = sc.max(axis=0) + em[t]
            path = np.zeros(T, dtype=np.int64)
            path[-1] = int(dp.argmax())
            for t in range(T - 1, 0, -1):
                path[t - 1] = back[t, path[t]]
            out.append([int(x) for x in path])
        return out

    cands = []
    for web in web_rows:
        sents = _segment(web["text"], lang=web["lang"])
        if not tagger.doc_spans(sents):
            continue
        cands.append((max(len(s) for s in sents), web["url"], sents))
    cands.sort(key=lambda x: (x[0], x[1]))
    spots = []
    for max_len, doc_id, sents in cands:
        if tagger.predict_sent_labels(sents) == f64_paths(sents):
            spots.append((doc_id, max_len))
        if len(spots) >= 4:
            break

    oi = np.repeat(np.arange(O, dtype=np.int32), V * L)
    cid = np.tile(np.repeat(np.arange(V, dtype=np.int32), L), O)
    lid = np.tile(np.arange(L, dtype=np.int32), O * V)
    pq.write_table(
        pa.table(
            {
                "oi": oi,
                "char_id": cid,
                "label_id": lid,
                "w": tagger.W.astype(np.float64).ravel(),
            }
        ),
        os.path.join(GOLDEN_DIR, "tagger_weights.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "oi": np.arange(O, dtype=np.int32),
                "off": np.array(tagger.offsets, dtype=np.int32),
            }
        ),
        os.path.join(GOLDEN_DIR, "tagger_offsets.parquet"),
    )
    chars = sorted(tagger.vocab, key=tagger.vocab.get)
    pq.write_table(
        pa.table(
            {
                "ch": pa.array(chars, pa.string()),
                "char_id": pa.array(
                    [tagger.vocab[c] for c in chars], pa.int32()
                ),
            }
        ),
        os.path.join(GOLDEN_DIR, "tagger_vocab.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "label_id": np.arange(L, dtype=np.int32),
                "label": pa.array(tagger.labels, pa.string()),
                "start_ok": pa.array(
                    [bool(x) for x in tagger.start_ok], pa.bool_()
                ),
            }
        ),
        os.path.join(GOLDEN_DIR, "tagger_labels.parquet"),
    )
    frm, to = np.nonzero(tagger.trans_ok)
    pq.write_table(
        pa.table(
            {
                "from_id": frm.astype(np.int32),
                "to_id": to.astype(np.int32),
            }
        ),
        os.path.join(GOLDEN_DIR, "tagger_trans.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in spots], pa.string()),
                "max_len": pa.array([m for _, m in spots], pa.int32()),
            }
        ),
        os.path.join(GOLDEN_DIR, "spot_docs.parquet"),
    )


def _write_adj_metrics(gold_rows: list[dict]) -> None:
    """Python twin of stages.evaluate.adjacency_stats over the fixture
    corpus (pred = sentence adjacency, gold = record-revealed adjacency),
    with the reference's per-doc edge-set semantics (metrics.py:310-399)."""
    from .stages.decode import _gold_adjacency, _sentence_adjacency

    def edges(adj):
        return {
            (i, j)
            for i in range(len(adj))
            for j in range(len(adj))
            if adj[i][j] == 1 and i != j
        }

    n_docs = exact = 0
    conn = [0, 0, 0]
    trig = [0, 0, 0]
    for g in gold_rows:
        spans = g["spans"]
        span_texts = [s["text"] for s in spans]
        span_sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
        n = len(span_texts)
        pe = edges(_sentence_adjacency(n, span_sents))
        ge = edges(_gold_adjacency(n, span_texts, g["events"]))
        n_docs += 1
        exact += int(pe == ge)
        conn[0] += len(pe & ge)
        conn[1] += len(pe - ge)
        conn[2] += len(ge - pe)
        pt = {i for i, _ in pe}
        gt = {i for i, _ in ge}
        trig[0] += len(pt & gt)
        trig[1] += len(pt - gt)
        trig[2] += len(gt - pt)

    import math

    def prf_e4(tp, fp, fn):
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return [int(math.floor(x * 10000)) for x in (p, r, f1)]

    row = {
        "n_docs": n_docs,
        "exact_acc_e4": int(math.floor(exact * 10000 / n_docs)),
        "conn_tp": conn[0],
        "conn_fp": conn[1],
        "conn_fn": conn[2],
    }
    for k, v in zip(("conn_precision_e4", "conn_recall_e4", "conn_f1_e4"), prf_e4(*conn)):
        row[k] = v
    row.update({"trig_tp": trig[0], "trig_fp": trig[1], "trig_fn": trig[2]})
    for k, v in zip(("trig_precision_e4", "trig_recall_e4", "trig_f1_e4"), prf_e4(*trig)):
        row[k] = v
    pq.write_table(
        pa.table({k: [v] for k, v in row.items()},
                 schema=pa.schema([(k, pa.int64()) for k in row])),
        os.path.join(GOLDEN_DIR, "adj_metrics.parquet"),
    )
