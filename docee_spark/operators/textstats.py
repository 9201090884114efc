"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure Column expressions over a ``text`` column — whole-stage codegen,
no Python in the hot path. Ratios are integerized (×10⁴, rounded) so
results hash identically across engines (floats never cross the oracle
boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed stopword inventories for the n-gram/stopword heuristics
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
ZH_STOPCHARS = ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (en branch of T4, dee/utils.py:147-157);
    empty strings filtered so '  ' doesn't yield ghost tokens."""
    return F.filter(F.split(F.trim(col), "\\s+"), lambda t: F.length(t) > 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND on
    letter/digit/other boundaries (a cheap BPE proxy for budget
    estimation): counts maximal runs of [A-Za-z]+ | [0-9]+ | single other
    non-space char."""
    return F.size(
        F.regexp_extract_all(col, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), 0)
    )


def stopword_ratio_e4(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """⌊10⁴ · (#stopword tokens / #tokens)⌋; 0 for empty docs."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, F.floor(hits * 10000 / n)).otherwise(F.lit(0)).cast("long")


def punct_ratio_e4(col: Column) -> Column:
    n = F.length(col)
    punct = n - F.length(F.regexp_replace(col, "[\\p{Punct}]", ""))
    return F.when(n > 0, F.floor(punct * 10000 / n)).otherwise(F.lit(0)).cast("long")


def avg_token_len_e2(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, F.floor(total * 100 / n)).otherwise(F.lit(0)).cast("long")


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (length / punctuation / stopword
    ratios) — the standard pre-training quality gate inputs."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        avg_token_len_e2(c).alias("avg_token_len_e2"),
        stopword_ratio_e4(c).alias("stopword_ratio_e4"),
        punct_ratio_e4(c).alias("punct_ratio_e4"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK-character share vs EN-stopword share.
    Deterministic n-gram/dictionary heuristic (no model): lang_guess ∈
    {zh, en, unk}."""
    c = F.col(text_col)
    n = F.length(c)
    cjk = n - F.length(F.regexp_replace(c, "[\\x{4e00}-\\x{9fff}]", ""))
    en_hits = F.size(F.filter(tokens(F.lower(c)), lambda t: t.isin(*EN_STOPWORDS)))
    guess = (
        F.when(n == 0, F.lit("unk"))
        .when(cjk * 10 >= n, F.lit("zh"))  # ≥10% CJK chars
        .when(en_hits > 0, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return df.select("doc_id", guess.alias("lang_guess"))


def fingerprint_md5(col: Column) -> Column:
    """Exact-content fingerprint (normalized whitespace then md5)."""
    return F.md5(F.regexp_replace(F.trim(col), "\\s+", " "))


def rolling_hash(col: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters: h = Σ h·base + code(c)
    (mod p). Expressed with ``aggregate`` over the char array — stays in
    codegen; the same recurrence is SQL-expressible for the oracle."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
