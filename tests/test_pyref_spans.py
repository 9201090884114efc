"""BIO→span decode semantics (reference dee/modules/doc_info.py:22-79)
and char-BIO synthesis (dee/helper/ner.py:20-55)."""

from docee_spark.config import bio_labels, label_index
from docee_spark.pyref.spans import decode_spans, labels_from_spans

L2I = label_index()
B = lambda f: L2I["B-" + f]  # noqa: E731
I = lambda f: L2I["I-" + f]  # noqa: E731


def test_basic_b_i_run():
    toks = [list("x张三y")]
    labs = [[0, B("EquityHolder"), I("EquityHolder"), 0]]
    texts, dranges, first = decode_spans(toks, labs)
    assert texts == ["张三"]
    assert dranges == [[(0, 1, 3)]]
    assert first == [B("EquityHolder")]


def test_orphan_i_ignored():
    toks = [list("ab")]
    labs = [[I("EquityHolder"), I("EquityHolder")]]
    assert decode_spans(toks, labs)[0] == []


def test_i_of_different_entity_terminates():
    toks = [list("abc")]
    labs = [[B("EquityHolder"), I("Pledgee"), 0]]
    texts, dranges, _ = decode_spans(toks, labs)
    assert texts == ["a"]
    assert dranges == [[(0, 0, 1)]]


def test_adjacent_b_b_two_spans():
    toks = [list("ab")]
    labs = [[B("StartDate"), B("StartDate")]]
    texts, dranges, _ = decode_spans(toks, labs)
    assert texts == ["a", "b"]


def test_multi_mention_grouped_in_drange_order():
    # same surface in two sentences → one span, two dranges, sorted
    toks = [list("甲乙"), list("丙甲")]
    labs = [
        [B("Pledgee"), 0],
        [0, B("Pledgee")],
    ]
    texts, dranges, _ = decode_spans(toks, labs)
    assert texts == ["甲"]
    assert dranges == [[(0, 0, 1), (1, 1, 2)]]


def test_en_word_tokens_join_with_space():
    toks = [["Acme", "Corp", "said"]]
    labs = [[B("CompanyName"), I("CompanyName"), 0]]
    texts, _, _ = decode_spans(toks, labs, join_sep=" ")
    assert texts == ["Acme Corp"]


def test_labels_from_spans_roundtrip():
    sents = ["张三质押100股，好。", "张三承诺。"]
    spans = [
        ("张三", "Pledger", [(0, 0, 2), (1, 0, 2)]),
        ("100股", "PledgedShares", [(0, 4, 8)]),
    ]
    labs = labels_from_spans(sents, spans, L2I)
    texts, dranges, _ = decode_spans([list(s) for s in sents], labs)
    assert set(texts) == {"张三", "100股"}
    assert dranges[texts.index("张三")] == [(0, 0, 2), (1, 0, 2)]


def test_overlap_conflict_dropped():
    # second span overlapping the first is dropped (ner.py:41-48)
    sents = ["abcdef"]
    spans = [
        ("abc", "Pledger", [(0, 0, 3)]),
        ("bcd", "Pledgee", [(0, 1, 4)]),
    ]
    labs = labels_from_spans(sents, spans, L2I)
    texts, _, _ = decode_spans([list(s) for s in sents], labs)
    assert texts == ["abc"]


def test_bio_vocab_parity():
    # B at odd index, I = B+1 (dee/helper/dee.py:215-220)
    labels = bio_labels()
    assert labels[0] == "O"
    for i in range(1, len(labels), 2):
        assert labels[i].startswith("B-")
        assert labels[i + 1] == "I-" + labels[i][2:]
