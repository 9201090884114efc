"""DuEE-fin builder semantics — independent reimplementation of the
reference's dataset builder (``Data/DuEEData/build_data.py``) for the
second real-data-shaped fidelity gate.

The builder defines how raw DuEE-fin line-JSON (title, text,
event_list with per-argument role/argument pairs and a trigger word)
becomes the document format the extraction pipeline consumes:

* sentence segmentation with ``；`` as an extra terminal
  (``build_data.py:204`` — the shared ``sent_seg`` semantics already
  ported in :mod:`docee_spark.pyref.textproc`),
* cross-sentence re-grouping under ``max_seq_len`` with a CJK-boundary
  concat rule and recursive comma-level splitting of over-long
  sentences (``reorganise_sents``, ``build_data.py:161-191``),
* ≥5-char sentence filtering and title insertion at index 0
  (``build_data.py:205-209``),
* regex span occurrence search with digit-boundary guards that reject
  matches embedded in larger numbers (``get_span_drange``,
  ``build_data.py:114-160``),
* per-event record assembly with trigger-mandatory semantics (an event
  whose trigger never occurs in the text is dropped;
  ``build_data.py:226-249``) and o2o/o2m/m2m doc typing
  (``build_data.py:252-260``).

Functions here are differentially tested against the reference builder
(exec'd from its file when present) on adversarial fixtures in
tests/test_duee_fidelity.py — byte-identical behavior without copying
reference code.
"""

from __future__ import annotations

import re
from collections import Counter

from .textproc import sent_seg

_CJK_LO, _CJK_HI = "一", "龥"


def reorganise_sents(
    sents: list[str],
    max_seq_len: int,
    concat: bool = False,
    final_cut: bool = False,
    concat_str: str = " ",
) -> list[str]:
    """Re-group segmented sentences under ``max_seq_len``
    (build_data.py:161-191, independent reimplementation).

    Greedy accumulation: while the running group plus the next sentence
    stays under the cap, either append the sentence to the group
    (``concat=True``; a ``concat_str`` separator is inserted only when
    the group currently ends in a CJK char and has length > 1) or emit
    it alone. An over-long sentence is re-segmented at comma level
    (``，``/``、``) and recursively re-grouped with ``final_cut=True``,
    where anything still over the cap is hard-truncated to its first
    ``max_seq_len`` chars."""
    new_sents: list[str] = []
    group = ""
    for sent in sents:
        if len(sent) + len(group) < max_seq_len:
            if concat:
                if len(group) > 1 and _CJK_LO <= group[-1] <= _CJK_HI:
                    group += concat_str + sent
                else:
                    group += sent
            else:
                new_sents.append(sent)
        else:
            if group:
                new_sents.append(group)
                group = ""
            if len(sent) > max_seq_len:
                if final_cut:
                    group = sent[:max_seq_len]
                else:
                    new_sents.extend(
                        reorganise_sents(
                            sent_seg(sent, punctuations={"，", "、"}),
                            max_seq_len,
                            concat=True,
                            final_cut=True,
                        )
                    )
            else:
                group = sent
    if group:
        new_sents.append(group)
    return [s.strip() for s in new_sents if len(s.strip()) > 0]


_DIGITS = set("0123456789")

# the reference escapes exactly these metachars by hand
# (build_data.py:116-126) — NOT re.escape: other regex-special chars
# ({}|^$\) stay live, and the sentence-length skip below compares
# against the ESCAPED pattern's length, so a span with k escaped chars
# silently skips sentences shorter than len(span)+k. Both quirks are
# observable behavior and preserved bug-for-bug (differential-tested).
_ESCAPES = "*?+[]().-"


def _common_span(span: str) -> str:
    for ch in _ESCAPES:
        span = span.replace(ch, "\\" + ch)
    return span


def get_span_drange(
    sents: list[str], span: str
) -> list[list[int]]:
    """Every occurrence of ``span`` in ``sents`` as ``[sent_idx,
    char_s, char_e]`` (build_data.py:114-160, independent
    reimplementation, guard semantics preserved bug-for-bug).

    A match is rejected when it sits inside a larger number: a
    digit-initial span preceded by a digit, or by ``<char≥'0'>.``
    (the reference compares only the LOWER bound on that char — any
    codepoint ≥ '0' qualifies, not just digits — preserved here); a
    digit-final span followed by a digit or by ``.<digit>``. The
    reference evaluates the index before its own bounds guard, so a
    match at position 0 reads the sentence's LAST char via Python
    negative indexing and then discards the clause on ``-1 > -1`` —
    net effect: no rejection at position 0, which the explicit bounds
    checks below reproduce."""
    out: list[list[int]] = []
    pattern = _common_span(span)
    for sent_idx, sent in enumerate(sents):
        if len(sent) < len(pattern):
            continue
        for m in re.finditer(pattern, sent):
            s, e = m.span()
            reject = False
            if span[0] in _DIGITS:
                if s - 1 > -1 and sent[s - 1] in _DIGITS:
                    reject = True
                elif s - 2 > -1 and sent[s - 1] == "." and sent[s - 2] >= "0":
                    reject = True
            if span[-1] in _DIGITS:
                if e < len(sent) and sent[e] in _DIGITS:
                    reject = True
                elif (
                    e + 1 < len(sent)
                    and sent[e] == "."
                    and sent[e + 1] in _DIGITS
                ):
                    reject = True
            if not reject:
                out.append([sent_idx, s, e])
    return out


def build_doc(
    raw: dict,
    event_fields: dict[str, list[str]],
    max_seq_len: int = 128,
    add_trigger: bool = True,
) -> dict | None:
    """One raw DuEE-fin doc (``{"id", "title", "text", "event_list"}``)
    → the engine row shape (guid / doc_type / sentences / spans /
    events), mirroring build_data.py:193-276. Returns None for docs
    with no event_list (the builder's not_valid drop)."""
    sents = sent_seg(raw["text"], punctuations={"；"})
    sents = reorganise_sents(sents, max_seq_len, concat=True)
    sents = [s for s in sents if len(s) >= 5]
    sents.insert(0, raw["title"])

    if not raw.get("event_list"):
        return None

    span_order: list[str] = []
    span2dranges: dict[str, list[list[int]]] = {}
    span2field: dict[str, str] = {}
    events = []
    event_types = []
    for event_idx, ins in enumerate(raw["event_list"]):
        event_types.append(ins["event_type"])
        roles = event_fields[ins["event_type"]]
        role2arg: dict[str, str | None] = {x: None for x in roles}
        trigger = ins["trigger"]
        trig_occ = get_span_drange(sents, trigger)
        if not trig_occ:
            continue  # trigger-mandatory: event dropped entirely
        if add_trigger:
            role2arg["Trigger"] = trigger
            span2field[trigger] = "Trigger"
            if trigger not in span2dranges:
                span_order.append(trigger)
            span2dranges[trigger] = trig_occ
        for arg_pair in ins["arguments"]:
            occ = get_span_drange(sents, arg_pair["argument"])
            if not occ:
                continue
            role2arg[arg_pair["role"]] = arg_pair["argument"]
            span2field[arg_pair["argument"]] = arg_pair["role"]
            if arg_pair["argument"] not in span2dranges:
                span_order.append(arg_pair["argument"])
            span2dranges[arg_pair["argument"]] = occ
        events.append(
            {"recguid": event_idx, "type": ins["event_type"], "args": role2arg}
        )

    doc_type = "unk"
    if event_types:
        et = Counter(event_types).most_common()
        if len(et) == 1 and et[0][1] == 1:
            doc_type = "o2o"
        elif len(et) == 1 and et[0][1] > 1:
            doc_type = "o2m"
        elif len(et) > 1:
            doc_type = "m2m"

    spans = [
        {
            "text": text,
            "field": span2field[text],
            "dranges": [
                {"sent_idx": si, "char_s": cs, "char_e": ce}
                for si, cs, ce in span2dranges[text]
            ],
        }
        for text in span_order
    ]
    return {
        "guid": str(raw["id"]),
        "doc_type": doc_type,
        "sentences": sents,
        "spans": spans,
        "events": events,
    }


def build_rows(
    raw_docs: list[dict],
    event_fields: dict[str, list[str]],
    max_seq_len: int = 128,
    add_trigger: bool = True,
) -> list[dict]:
    rows = []
    for raw in raw_docs:
        row = build_doc(raw, event_fields, max_seq_len, add_trigger)
        if row is not None:
            rows.append(row)
    return rows
