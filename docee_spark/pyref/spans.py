"""BIO label matrix → span extraction.

Semantics of ``extract_doc_valid_span_info`` (reference
dee/modules/doc_info.py:22-79):

  * labels are integer ids into ['O', 'B-X', 'I-X', ...]; a B label has an
    odd id and its I label is id+1 (dee/helper/dee.py:215-220);
  * scan each sentence left-to-right; at an odd id start a span and extend
    while the next position carries exactly id+1 (and is unmasked);
  * collect (token_tuple, drange=(sent_idx, char_s, char_e)) with char_e
    exclusive; a masked / padded position terminates the sentence;
  * sort all mentions by drange, then group mentions of the same
    token_tuple preserving first-occurrence order (OrderedDict).

Here tokens are the sentence characters (zh branch) or word tokens (en),
so ``token_tuple`` is the span surface string — the equality key used by
all downstream matching, exactly like the reference's token-id tuples
(dee/metrics.py:417-431).
"""

from __future__ import annotations


def decode_spans(
    sent_tokens: list[list[str]],
    sent_label_ids: list[list[int]],
    join_sep: str = "",
) -> tuple[list[str], list[list[tuple[int, int, int]]], list[int]]:
    """Return (span_texts, span_dranges_list, span_first_label).

    ``span_texts[i]`` is the joined surface form of span i;
    ``span_dranges_list[i]`` all its mention locations in document order;
    ``span_first_label[i]`` the B-label id (as int) of its first mention,
    returned so the caller can map span → guessed field.
    """
    mention_list: list[tuple[str, tuple[int, int, int], int]] = []
    for sent_idx, (tokens, labels) in enumerate(zip(sent_tokens, sent_label_ids)):
        seq_len = min(len(tokens), len(labels))
        char_s = 0
        while char_s < seq_len:
            lab = labels[char_s]
            if lab % 2 == 1:  # B- label
                char_e = char_s + 1
                while char_e < seq_len and labels[char_e] == lab + 1:
                    char_e += 1
                surface = join_sep.join(tokens[char_s:char_e])
                mention_list.append((surface, (sent_idx, char_s, char_e), lab))
                char_s = char_e
            else:
                char_s += 1

    mention_list.sort(key=lambda x: x[1])
    span_texts: list[str] = []
    span_dranges: list[list[tuple[int, int, int]]] = []
    span_labels: list[int] = []
    index: dict[str, int] = {}
    for surface, drange, lab in mention_list:
        if surface not in index:
            index[surface] = len(span_texts)
            span_texts.append(surface)
            span_dranges.append([])
            span_labels.append(lab)
        span_dranges[index[surface]].append(drange)
    return span_texts, span_dranges, span_labels


def labels_from_spans(
    sentences: list[str],
    spans: list[tuple[str, str, list[tuple[int, int, int]]]],
    label2id: dict[str, int],
) -> list[list[int]]:
    """Char-level BIO synthesis (T7, dee/helper/ner.py:20-55): sort spans
    by drange; emit B-field at char_s and I-field through char_e; a span
    overlapping an already-labelled region is dropped (conflict rule at
    ner.py:41-48)."""
    out = [[0] * len(s) for s in sentences]
    flat: list[tuple[tuple[int, int, int], str]] = []
    for _text, fieldname, dranges in spans:
        for dr in dranges:
            flat.append((tuple(dr), fieldname))
    flat.sort(key=lambda x: x[0])
    for (sent_idx, char_s, char_e), fieldname in flat:
        if sent_idx >= len(out) or char_e > len(out[sent_idx]):
            continue
        if any(out[sent_idx][i] != 0 for i in range(char_s, char_e)):
            continue  # overlap conflict → drop
        b_id = label2id.get("B-" + fieldname)
        if b_id is None:
            continue
        out[sent_idx][char_s] = b_id
        for i in range(char_s + 1, char_e):
            out[sent_idx][i] = b_id + 1
    return out
