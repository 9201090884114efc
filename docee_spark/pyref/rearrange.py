"""T2 — sentence re-arrangement (reference dee/helper/dee.py:242-347).

Long sentences are split on secondary punctuation (，：:；;、）)）, never
inside an annotated span; adjacent pieces are then greedily re-merged
while the combined length stays ≤ max_len; every span drange is remapped
to the new (sentence, offset) coordinates. Row-local and deterministic —
runs inside the tag stage's Arrow UDF when enabled.
"""

from __future__ import annotations

SECONDARY_PUNCT = set("，：:；;、）)")

Span = tuple[str, str, list[tuple[int, int, int]]]


def _cut_points(sentence: str, protected: list[tuple[int, int]]) -> list[int]:
    """Positions AFTER a secondary punctuation char, excluding cuts that
    would split a protected [s, e) range."""
    cuts = []
    for i, ch in enumerate(sentence):
        p = i + 1
        if ch in SECONDARY_PUNCT and p < len(sentence):
            if not any(s < p < e for s, e in protected):
                cuts.append(p)
    return cuts


def rearrange_sentences(
    sentences: list[str],
    spans: list[Span],
    max_len: int = 128,
) -> tuple[list[str], list[Span]]:
    """→ (new_sentences, spans with remapped dranges)."""
    protected_by_sent: dict[int, list[tuple[int, int]]] = {}
    for _t, _f, dranges in spans:
        for si, s, e in dranges:
            protected_by_sent.setdefault(si, []).append((s, e))

    # 1. split long sentences into pieces; record origin coordinates
    pieces: list[tuple[str, int, int]] = []  # (text, orig_sent, orig_offset)
    for si, sent in enumerate(sentences):
        if len(sent) <= max_len:
            pieces.append((sent, si, 0))
            continue
        cuts = _cut_points(sent, protected_by_sent.get(si, []))
        starts = [0] + cuts
        ends = cuts + [len(sent)]
        pos = 0
        for s, e in zip(starts, ends):
            if e > s:
                pieces.append((sent[s:e], si, s))
                pos = e
        assert pos == len(sent)

    # 2. greedy re-merge: only pieces of the SAME original sentence merge
    # back together (keeps cross-sentence offsets unambiguous), while the
    # combined length stays ≤ max_len
    merged: list[list[tuple[str, int, int]]] = []
    for piece in pieces:
        if (
            merged
            and merged[-1][0][1] == piece[1]
            and sum(len(p[0]) for p in merged[-1]) + len(piece[0]) <= max_len
        ):
            merged[-1].append(piece)
        else:
            merged.append([piece])

    new_sentences: list[str] = []
    # (orig_sent, orig_offset_start, orig_offset_end) → (new_sent, delta)
    remap: list[tuple[int, int, int, int, int]] = []
    for new_idx, group in enumerate(merged):
        text = "".join(p[0] for p in group)
        new_sentences.append(text)
        out_off = 0
        for ptext, osent, ooff in group:
            remap.append((osent, ooff, ooff + len(ptext), new_idx, out_off - ooff))
            out_off += len(ptext)

    def _remap(si: int, s: int, e: int) -> tuple[int, int, int]:
        for osent, lo, hi, new_idx, delta in remap:
            if osent == si and lo <= s and e <= hi:
                return (new_idx, s + delta, e + delta)
        raise ValueError(f"drange ({si},{s},{e}) split by rearrangement")

    new_spans: list[Span] = []
    for text, field, dranges in spans:
        new_spans.append(
            (text, field, [_remap(si, s, e) for si, s, e in dranges])
        )
    return new_sentences, new_spans
