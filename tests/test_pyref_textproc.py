"""Unit goldens for text preparation (reference: dee/helper/__init__.py:
103-169 sent_seg; dee/utils.py:602-663 regex extractors)."""

import pytest

from docee_spark.pyref import textproc as tp


class TestSentSeg:
    def test_zh_basic(self):
        assert tp.sent_seg("今天天气好。明天下雨！后天呢？", lang="zh") == [
            "今天天气好。",
            "明天下雨！",
            "后天呢？",
        ]

    def test_quotation_mode_keeps_quote_attached(self):
        text = "我说：“上酸菜。”，她说：“好嘞。”"
        out = tp.sent_seg(text, lang="zh", quotation_seg_mode=True)
        assert out == ["我说：“上酸菜。”", "，她说：“好嘞。”"]

    def test_en_branch(self):
        assert tp.sent_seg("Hello world. How are you? Fine!", lang="en") == [
            "Hello world.",
            "How are you?",
            "Fine!",
        ]

    def test_empty_and_invalid(self):
        assert tp.sent_seg("", lang="zh") == []
        with pytest.raises(ValueError):
            tp.sent_seg(None)  # type: ignore[arg-type]

    def test_lone_punct_survives(self):
        # the reference's filter predicate reduces to len(strip)>0:
        # a bare punctuation sentence is kept
        assert tp.sent_seg("。", lang="zh") == ["。"]

    def test_punct_run_collapses_to_one_boundary(self):
        assert tp.sent_seg("什么？！真的。", lang="zh") == ["什么？！", "真的。"]

    def test_no_terminal_punct_one_sentence(self):
        assert tp.sent_seg("没有标点的句子", lang="zh") == ["没有标点的句子"]

    def test_custom_punctuations(self):
        out = tp.sent_seg("a;b", lang="en", punctuations=frozenset(";"))
        assert out == ["a;", "b"]


class TestTokenize:
    def test_char_zh(self):
        assert tp.tokenize("中文abc", "zh") == ["中", "文", "a", "b", "c"]

    def test_space_en(self):
        assert tp.tokenize("hello  world", "en") == ["hello", "world"]


class TestRegexExtractors:
    def test_share_requires_following_non_piao(self):
        # "1000股票" must NOT match (the [^票] guard, dee/utils.py:602-606)
        assert tp.extract_share("持有1000股票") == []
        assert tp.extract_share("持有1000股，增加") == [("1000股", (2, 7))]

    def test_share_at_end_of_string_unmatched(self):
        # the guard consumes one following char: string-final share missed
        assert tp.extract_share("持有1000股") == []

    def test_ratio(self):
        assert [t for t, _ in tp.extract_ratio("占比12.5%和7%")] == ["12.5%", "7%"]

    def test_date(self):
        assert [t for t, _ in tp.extract_date("于2020年1月15日生效")] == [
            "2020年1月15日"
        ]

    def test_money(self):
        assert [t for t, _ in tp.extract_money("价格3.50元整")] == ["3.50元"]

    def test_extract_doc_excludes_known(self):
        doc = ["价格3.50元。", "另一价格4.00元。"]
        out = tp.extract_doc(doc, exclude_ents=["3.50元"])
        assert [t for t, _ in out["money"]] == ["4.00元"]
        # sentence index recorded
        assert out["money"][0][1][0] == 1

    def test_ratio_completeness_guard(self):
        # F5 (dee/helper/dee.py:102-113): "...112.5%" where span starts at
        # the '2.5%' boundary after a digit → incomplete
        sent = "占比112.5%"
        assert tp.ratio_span_is_complete(sent, 2) is True  # full "112.5%"
        assert tp.ratio_span_is_complete(sent, 3) is False  # "12.5%" after '1'
