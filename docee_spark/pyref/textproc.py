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
