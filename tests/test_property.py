"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): randomized invariants for the
correctness-bearing kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from docee_spark.config import CHFINANN_EVENT_TYPES, label_index
from docee_spark.pyref.edag import decode_doc
from docee_spark.pyref.graph import adjacency_from_records, max_cliques_bk
from docee_spark.pyref.matching import event_role_tpfpfn, prf1
from docee_spark.pyref.spans import decode_spans, labels_from_spans

L2I = label_index()
FIELDS = [f[2:] for f in L2I if f.startswith("B-")]
FIELDS_OF = {et.name: list(et.fields) for et in CHFINANN_EVENT_TYPES}

# --- BIO round-trip ---------------------------------------------------------

_spans_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # sent_idx
        st.integers(0, 12),  # char_s
        st.integers(1, 6),  # length
        st.sampled_from(FIELDS),
    ),
    max_size=6,
)


@settings(max_examples=60, deadline=None)
@given(_spans_strategy)
def test_bio_roundtrip_recovers_nonoverlapping_spans(raw):
    sents = ["零一二三四五六七八九十甲乙丙丁戊己庚辛壬", "癸子丑寅卯辰巳午未申酉戌亥金木水火土天地", "人日月星雲風雨雷電山川湖海岩沙泥冰雪"]
    spans, taken = [], {}
    for si, cs, ln, field in raw:
        ce = min(cs + ln, len(sents[si]))
        if ce <= cs:
            continue
        if any(s < ce and cs < e for s, e in taken.get(si, [])):
            continue  # only non-overlapping spans round-trip exactly
        text = sents[si][cs:ce]
        if any(t == text for t, _f, _d in spans):
            continue  # duplicate surface merges — skip for exactness
        taken.setdefault(si, []).append((cs, ce))
        spans.append((text, field, [(si, cs, ce)]))
    labels = labels_from_spans(sents, spans, L2I)
    texts, dranges, _ = decode_spans([list(s) for s in sents], labels)
    got = {(t, tuple(d)) for t, ds in zip(texts, dranges) for d in ds}
    want = {(t, d[0]) for t, _f, d in spans}
    assert got == want


# --- matching metric invariants ---------------------------------------------

_record = st.lists(st.one_of(st.none(), st.sampled_from("abcd")), min_size=3, max_size=3).map(tuple)
_records = st.lists(_record, min_size=1, max_size=4)


@settings(max_examples=80, deadline=None)
@given(_records)
def test_identical_pred_gold_is_all_tp(recs):
    stats = event_role_tpfpfn(list(recs), list(recs), 3)
    for tp, fp, fn in stats:
        assert fp == 0 and fn == 0
    total_nonnull = sum(1 for r in recs for a in r if a is not None)
    assert sum(s[0] for s in stats) == total_nonnull


@settings(max_examples=80, deadline=None)
@given(_records, _records)
def test_counts_conserved(preds, golds):
    """Every non-null pred arg lands in TP or FP; every non-null gold arg
    in TP or FN (conservation — no arg silently dropped)."""
    stats = event_role_tpfpfn(list(preds), list(golds), 3)
    n_pred = sum(1 for r in preds for a in r if a is not None)
    n_gold = sum(1 for r in golds for a in r if a is not None)
    assert sum(s[0] + s[1] for s in stats) == n_pred
    assert sum(s[0] + s[2] for s in stats) == n_gold


@settings(max_examples=80, deadline=None)
@given(_records)
def test_pred_order_invariance_distinct_counts(recs):
    """The sort-before-match (dee/metrics.py:42-46) makes the score
    order-invariant ONLY across records with distinct non-null counts —
    the reference's sorted() is stable, so equal-count records keep input
    order and CAN tie-break differently (a faithful-port subtlety, pinned
    by test_equal_count_tie_is_order_sensitive below)."""
    counts = [sum(1 for a in r if a is not None) for r in recs]
    if len(set(counts)) != len(counts):
        return  # equal counts: order-sensitivity is reference behavior
    gold = [("a", "b", "c"), ("a", None, None)]
    s1 = event_role_tpfpfn(list(recs), list(gold), 3)
    s2 = event_role_tpfpfn(list(reversed(recs)), list(gold), 3)
    assert s1 == s2


def test_equal_count_tie_is_order_sensitive():
    """Regression pin: two preds with the same non-null count keep input
    order through the stable sort, so swapping them changes which gold
    each grabs — exactly what the reference does."""
    gold = [(None, None), ("a", "a")]
    p1, p2 = (None, "a"), (None, "b")
    s_fwd = event_role_tpfpfn([p1, p2], list(gold), 2)
    s_rev = event_role_tpfpfn([p2, p1], list(gold), 2)
    assert s_fwd != s_rev  # order-sensitive by (reference) design
    assert s_fwd == [[0, 0, 1], [0, 2, 1]]
    assert s_rev == [[0, 0, 1], [1, 1, 0]]


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 100), st.integers(0, 100), st.integers(0, 100))
def test_prf1_bounds(tp, fp, fn):
    p, r, f = prf1(tp, fp, fn)
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f <= 1.0
    assert f <= max(p, r) + 1e-12


# --- decode invariants --------------------------------------------------

_graph = st.integers(2, 7).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            max_size=12,
        ),
    )
)


@settings(max_examples=60, deadline=None)
@given(_graph)
def test_cliques_cover_all_edges(g):
    n, edges = g
    adj = [[0] * n for _ in range(n)]
    for i in range(n):
        adj[i][i] = 1
    for i, j in edges:
        adj[i][j] = adj[j][i] = 1
    cliques = max_cliques_bk(adj, 1)
    # every edge appears inside at least one maximal clique
    for i, j in edges:
        if i == j:
            continue
        assert any(i in c and j in c for c in cliques), (i, j, cliques)
    # every node covered
    covered = set().union(*map(set, cliques)) if cliques else set()
    assert covered == set(range(n))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(0, 5), min_size=1, max_size=4), min_size=1, max_size=3))
def test_gold_adjacency_decode_recall(recs):
    """Whatever records built the adjacency, clique decode over exact
    fields loses no argument (recall=1 at the argument level)."""
    et = CHFINANN_EVENT_TYPES[2]  # EquityUnderweight, 6 roles
    n = 6
    recs = [sorted(set(r))[: len(et.fields)] for r in recs]
    span_fields = [et.fields[i % len(et.fields)] for i in range(n)]
    # make each record's role assignment consistent: span i ↔ field i%k
    adj = adjacency_from_records(n, recs)
    sents = ["公告EquityUnderweight事件：减持。"]
    span_sents = [[0]] * n
    out = decode_doc(sents, span_fields, span_sents, adj, FIELDS_OF,
                     {}, mode="clique")
    decoded_args = {i for rs in out.values() for r in rs for i in r if i is not None}
    wanted = set()
    for r in recs:
        # only spans whose field is unique within the record are guaranteed
        fields_seen = {}
        for i in r:
            fields_seen.setdefault(span_fields[i], []).append(i)
        for f, members in fields_seen.items():
            wanted.add(min(members))
    assert wanted <= decoded_args | set()
