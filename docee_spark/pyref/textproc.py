"""Text preparation semantics: sentence segmentation, tokenization,
typed regex entity extraction.

Reference behavior re-implemented (not copied):
  - sent_seg           → dee/helper/__init__.py:103-169
  - char/space tokenize → dee/utils.py:147-181
  - share/ratio/date/money extractors → dee/utils.py:602-623, extract_doc :642-663
"""

from __future__ import annotations

import re

ZH_PUNKT = frozenset("。？！…")
EN_PUNKT = frozenset(".?!")
_QUOTES = "’”`'\""


def sent_seg(
    text: str,
    lang: str = "zh",
    punctuations: frozenset[str] | None = None,
    quotation_seg_mode: bool = True,
) -> list[str]:
    """Split ``text`` into sentences on terminal punctuation.

    Semantics of dee/helper/__init__.py:103-169: insert a newline after
    every run of terminal punctuation (in quotation mode, trailing quote
    characters stay attached to the preceding sentence), split on newlines,
    strip, drop empties. A lone punctuation "sentence" survives, matching
    the reference's filter (its predicate reduces to len(strip) > 0).
    """
    if not isinstance(text, str):
        raise ValueError("sent_seg expects a string")
    if len(text) == 0:
        return []
    punkt = set(ZH_PUNKT if lang == "zh" else EN_PUNKT)
    if punctuations:
        punkt |= set(punctuations)
    cls = re.escape("".join(sorted(punkt)))
    if quotation_seg_mode:
        pattern = "([%s]+[%s]*)" % (cls, _QUOTES)
    else:
        pattern = "([%s])" % cls
    marked = re.sub(pattern, "\\1\n", text)
    return [s.strip() for s in marked.split("\n") if s.strip()]


def char_tokenize(text: str) -> list[str]:
    """Character-level tokenization (zh branch, dee/utils.py:171-181)."""
    return list(text)


def space_tokenize(text: str) -> list[str]:
    """Whitespace tokenization (en branch, dee/utils.py:147-157)."""
    return text.split()


def tokenize(text: str, lang: str) -> list[str]:
    return char_tokenize(text) if lang == "zh" else space_tokenize(text)


# --- typed regex extractors (T6) -------------------------------------------
# Patterns match the reference's extractors for Chinese financial text
# (dee/utils.py:602-623). Each returns [(matched_text, (char_s, char_e)), ...]
# with char_e exclusive, like re.Match.span().

# verbatim from the reference (dee/utils.py:603) INCLUDING its quirks,
# preserved deliberately for extraction parity: the consumed [^票]
# character means a share amount at end-of-sentence never matches, and
# finditer resumes after the consumed char (adjacent amounts can split);
# a lookahead would fix both but diverge from the reference's output
_SHARE_RE = re.compile(r"(\d+股)[^票]")
_RATIO_RE = re.compile(r"\d+(\.\d+)?%")
_DATE_RE = re.compile(r"\d{4}年\d{1,2}月\d{1,2}日")
_MONEY_RE = re.compile(r"\d+(\.\d+)?元")


def extract_share(text: str) -> list[tuple[str, tuple[int, int]]]:
    return [(m.group(1), m.span(1)) for m in _SHARE_RE.finditer(text)]


def extract_ratio(text: str) -> list[tuple[str, tuple[int, int]]]:
    return [(m.group(0), m.span(0)) for m in _RATIO_RE.finditer(text)]


def extract_date(text: str) -> list[tuple[str, tuple[int, int]]]:
    return [(m.group(0), m.span(0)) for m in _DATE_RE.finditer(text)]


def extract_money(text: str) -> list[tuple[str, tuple[int, int]]]:
    return [(m.group(0), m.span(0)) for m in _MONEY_RE.finditer(text)]


TYPE2EXTRACTOR = {
    "share": extract_share,
    "ratio": extract_ratio,
    "date": extract_date,
    "money": extract_money,
}


def extract_doc(
    sentences: list[str], exclude_ents: list[str] | None = None
) -> dict[str, list[tuple[str, tuple[int, int, int]]]]:
    """Typed extraction over a whole document (dee/utils.py:642-663):
    {type: [(text, (sent_idx, char_s, char_e)), ...]} with matches whose
    surface form is in ``exclude_ents`` dropped."""
    exclude = set(exclude_ents or ())
    out: dict[str, list[tuple[str, tuple[int, int, int]]]] = {}
    for sent_idx, line in enumerate(sentences):
        for typ, fn in TYPE2EXTRACTOR.items():
            for text, (s, e) in fn(line):
                if text not in exclude:
                    out.setdefault(typ, []).append((text, (sent_idx, s, e)))
    return out


def ratio_span_is_complete(sentence: str, char_s: int) -> bool:
    """Ratio-annotation correction (F5, dee/helper/dee.py:102-113): a span
    like "50%" preceded immediately by a digit is an incomplete ratio
    annotation and must be dropped."""
    return not (char_s > 0 and sentence[char_s - 1].isdigit())


# --- J4: predicted-span snapping to regex extractions (fix_ent) -------------

_REGEX_TYPES = frozenset(("share", "ratio", "date", "money"))


def _overlaps_prefix_or_suffix(part: str, whole: str) -> bool:
    """The reference's _is_overlapping (dee/modules/doc_info.py:192-193):
    part is a prefix or a suffix of whole."""
    return part == whole[: len(part)] or part == whole[len(whole) - len(part):]


def fix_ent_spans(
    sentences: list[str], spans: list[dict], mode: str = "n"
) -> list[dict]:
    """J4 — snap predicted regex-typed spans to the document's regex
    extractions (reference fix_ent, dee/modules/doc_info.py:196-254):

      * mode "n": no fixing — spans returned untouched;
      * per mention of a span whose (exact or coarse) field maps to a
        regex type: an exact same-sentence regex match keeps the mention;
        otherwise mode "f" snaps prefix/suffix-overlapping mentions to the
        full regex entity (falling back to the original when nothing
        overlaps), and mode "-" drops the unmatched mention;
      * non-regex-typed mentions always pass through;
      * result re-grouped by surface (first-seen field), dranges sorted.

    ``spans``: tag-stage records {text, field, dranges:[{sent_idx,
    char_s, char_e}]}.
    """
    if mode == "n":
        return spans
    if mode not in ("-", "f"):
        raise ValueError(f"unknown ent_fix_mode: {mode}")
    from ..config import FIELD2REGEX_TYPE

    extracted = extract_doc(sentences)
    by_type_sent: dict[tuple[str, int], list[tuple[str, tuple[int, int, int]]]] = {}
    for typ, matches in extracted.items():
        for text, dr in matches:
            by_type_sent.setdefault((typ, dr[0]), []).append((text, dr))

    merged: dict[str, dict] = {}

    def add(text: str, field: str | None, dr: tuple[int, int, int]) -> None:
        ent = merged.setdefault(text, {"text": text, "field": field, "dranges": set()})
        ent["dranges"].add(dr)

    for sp in spans:
        field = sp["field"]
        typ = FIELD2REGEX_TYPE.get(field, field if field in _REGEX_TYPES else None)
        for d in sp["dranges"]:
            dr = (d["sent_idx"], d["char_s"], d["char_e"])
            if typ is None:
                add(sp["text"], field, dr)
                continue
            same_sent = by_type_sent.get((typ, dr[0]), [])
            if any(text == sp["text"] for text, _ in same_sent):
                add(sp["text"], field, dr)
                continue
            if mode == "-":
                continue  # unmatched regex-typed mention dropped
            snapped = next(
                (
                    (text, edr)
                    for text, edr in same_sent
                    if _overlaps_prefix_or_suffix(sp["text"], text)
                ),
                None,
            )
            if snapped is not None:
                add(snapped[0], field, snapped[1])
            else:
                add(sp["text"], field, dr)

    return [
        {
            "text": ent["text"],
            "field": ent["field"],
            "dranges": [
                {"sent_idx": a, "char_s": b, "char_e": c}
                for a, b, c in sorted(ent["dranges"])
            ],
        }
        for ent in merged.values()
    ]
