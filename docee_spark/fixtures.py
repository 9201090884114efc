"""Deterministic synthetic corpus: ChFinAnn-style annotated web pages.

Generates, from a fixed seed, the three coupled fixtures of FIXTURES.md:
  1. `webtext`  — (url, warc_ts, html, text, lang) rows; hosts drawn from a
     Zipf-skewed pool (exercises salted repartitioning), html is a
     deterministic boilerplate wrapper with ``extract(html) == text``
     byte-identical per url (north-rule invariant);
  2. `docs_gold` — per-document gold annotation in the reference's dataset
     shape (guid/doc_type/sentences/spans/events — dee/helper/dee.py:116-124);
  3. `triples_expected` — flattened (subj, pred, obj) golden output.

Every reference code path is represented: o2o / o2m / m2m docs
(dee/event_types/__init__.py:21-34), multi-mention spans, zero-span docs
(drop path dee/helper/dee.py:763-765), regex-extractable share/ratio/date/
money strings (dee/utils.py:602-623), and long-tail sentence counts
(5% of docs get 70 filler sentences) to exercise length bucketing.
Docs past the MAX_SENT_LEN/MAX_SENT_NUM caps (512/256) are exercised by
dedicated tests (tests/test_fused.py cap-parity), not this corpus — the
caps were raised above anything generate_corpus emits.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from .config import CHFINANN_EVENT_TYPES, FIELD2REGEX_TYPE

_EPOCH = datetime(2023, 1, 1, tzinfo=timezone.utc)

_PERSONS = [
    "张伟明", "李秀娟", "王建国", "刘晓芳", "陈志强", "杨丽华", "赵国栋",
    "黄海燕", "周文斌", "吴雅婷", "徐正平", "孙立军", "马晓东", "朱丹凤",
]
_COMPANIES = [
    "华夏科技股份有限公司", "东方电子集团", "南山矿业股份", "北辰投资控股",
    "中天建设集团", "蓝海生物科技", "金鼎证券股份", "绿洲农业开发",
]
_INSTITUTIONS = ["上海市高级人民法院", "北京市第一中级人民法院", "深圳市中级人民法院"]


def _date(rng: random.Random) -> str:
    return f"{rng.randint(2015, 2023)}年{rng.randint(1, 12)}月{rng.randint(1, 28)}日"


def _share(rng: random.Random) -> str:
    return f"{rng.randint(1000, 99999) * 100}股"


def _ratio(rng: random.Random) -> str:
    return f"{rng.randint(1, 89)}.{rng.randint(0, 99):02d}%"


def _money(rng: random.Random) -> str:
    return f"{rng.randint(1, 999)}.{rng.randint(0, 99):02d}元"


def _value_for(field: str, rng: random.Random) -> str:
    typ = FIELD2REGEX_TYPE.get(field)
    if typ == "share":
        return _share(rng)
    if typ == "ratio":
        return _ratio(rng)
    if typ == "date":
        return _date(rng)
    if typ == "money":
        return _money(rng)
    if field in ("EquityHolder", "Pledger"):
        return rng.choice(_PERSONS)
    if field in ("Pledgee",):
        return rng.choice(_COMPANIES)
    if field in ("CompanyName",):
        return rng.choice(_COMPANIES)
    if field in ("LegalInstitution",):
        return rng.choice(_INSTITUTIONS)
    return rng.choice(_COMPANIES)


def _render_sentence(event_type: str, args: dict[str, str | None]) -> str:
    """One sentence holding every non-null argument verbatim, ending in a
    zh terminal punctuation so sent_seg round-trips it. Shares are never
    sentence-final (the share regex needs a following char,
    dee/utils.py:602-606)."""
    parts: list[str] = [f"公告{event_type}事件："]
    for role, val in args.items():
        if val is not None:
            parts.append(f"{role}为{val}，")
    sent = "".join(parts)
    return sent[:-1] + "。" if sent.endswith("，") else sent + "。"


def _find_spans(
    sentences: list[str], events: list[dict]
) -> list[dict]:
    """Locate every argument string in the sentences → gold span records
    with all mention dranges (the invariant checked by the reference at
    dee/helper/dee.py:140-145: sentences[i][s:e] == text)."""
    arg_fields: dict[str, str] = {}
    for ev in events:
        for role, val in ev["args"].items():
            if val is not None and val not in arg_fields:
                arg_fields[val] = role
    spans = []
    for text, fieldname in arg_fields.items():
        dranges = []
        for si, sent in enumerate(sentences):
            start = 0
            while True:
                pos = sent.find(text, start)
                if pos < 0:
                    break
                dranges.append({"sent_idx": si, "char_s": pos, "char_e": pos + len(text)})
                start = pos + len(text)
        if dranges:
            spans.append({"text": text, "field": fieldname, "dranges": dranges})
    spans.sort(key=lambda s: (s["dranges"][0]["sent_idx"], s["dranges"][0]["char_s"]))
    return spans


def _make_doc(rng: random.Random, doc_idx: int) -> dict:
    roll = rng.random()
    if roll < 0.05:
        doc_type, n_records = "unk", 0  # zero-event doc
    elif roll < 0.55:
        doc_type, n_records = "o2o", 1
    elif roll < 0.8:
        doc_type, n_records = "o2m", rng.randint(2, 3)  # same type, multi records
    else:
        doc_type, n_records = "m2m", rng.randint(2, 3)  # multiple types

    events: list[dict] = []
    sentences: list[str] = [f"证券代码{600000 + doc_idx}：本公司发布重要公告。"]
    if doc_type == "o2o":
        types = [rng.choice(CHFINANN_EVENT_TYPES)]
    elif doc_type == "o2m":
        types = [rng.choice(CHFINANN_EVENT_TYPES)] * n_records
    elif doc_type == "m2m":
        types = rng.sample(list(CHFINANN_EVENT_TYPES), min(n_records, len(CHFINANN_EVENT_TYPES)))
    else:
        types = []

    used_values: set[str] = set()
    for recguid, et in enumerate(types):
        args: dict[str, str | None] = {}
        n_null = rng.randint(0, max(0, len(et.fields) - et.min_field_num))
        null_fields = set(rng.sample(list(et.fields), n_null))
        for f in et.fields:
            if f in null_fields:
                args[f] = None
                continue
            # values unique within a doc so records stay clique-separable
            for _ in range(32):
                v = _value_for(f, rng)
                if v not in used_values:
                    break
            used_values.add(v)
            args[f] = v
        events.append({"recguid": recguid, "type": et.name, "args": args})
        sentences.append(_render_sentence(et.name, args))
        # multi-mention: repeat the key entity in a trailing remark sentence
        key_val = args.get(et.key_fields[0]) if et.key_fields else None
        if key_val and rng.random() < 0.4:
            sentences.append(f"{key_val}承诺将及时履行信息披露义务。")

    # long-tail filler sentences (truncation path)
    n_filler = rng.randint(0, 3) if rng.random() > 0.05 else 70
    for i in range(n_filler):
        if rng.random() < 0.05:
            sentences.append("风险提示" + "，内容详见公告正文" * 30 + "。")
        else:
            sentences.append(f"第{i + 1}项其他事项说明。")

    spans = _find_spans(sentences, events)
    return {
        "guid": f"doc{doc_idx:05d}",
        "doc_type": doc_type,
        "sentences": sentences,
        "spans": spans,
        "events": events,
    }


def _zipf_host(rng: random.Random, n_hosts: int = 50) -> str:
    # Zipf-ish skew: host 0 ≫ host 1 ≫ ... — exercises salted repartitioning
    z = min(int(rng.paretovariate(1.1)) - 1, n_hosts - 1)
    return f"host{z:03d}.example.com"


def make_html(text: str, title: str) -> bytes:
    """Deterministic boilerplate wrapper; ``extract_text`` inverts it
    byte-identically (pure function of html — north-rule invariant)."""
    return (
        "<html><head><title>" + title + "</title></head><body>"
        "<nav><a href='/'>首页</a><a href='/news'>新闻</a></nav>"
        "<article>" + text + "</article>"
        "<footer>© example.com 版权所有</footer></body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """The frozen extractor: pull the <article> payload. Byte-identical per
    url by construction (golden-tested)."""
    s = html.decode("utf-8")
    start = s.index("<article>") + len("<article>")
    end = s.index("</article>", start)
    return s[start:end]


def generate_corpus(n_docs: int = 200, seed: int = 7) -> tuple[list[dict], list[dict]]:
    """Return (webtext_rows, docs_gold_rows)."""
    rng = random.Random(seed)
    webtext, gold = [], []
    for i in range(n_docs):
        doc = _make_doc(rng, i)
        text = "".join(doc["sentences"])
        url = f"https://{_zipf_host(rng)}/announce/{doc['guid']}"
        doc["guid"] = url  # guid == url for joinability (FIXTURES.md §2)
        webtext.append(
            {
                "url": url,
                "warc_ts": _EPOCH + timedelta(seconds=i * 137),
                "html": make_html(text, doc["guid"]),
                "text": text,
                "lang": "zh",
            }
        )
        gold.append(doc)
    return webtext, gold


def make_doc_indexed(doc_idx: int, seed: int = 7) -> tuple[dict, dict]:
    """Index-pure single-document generator: doc i is a function of
    (seed, i) only — enables distributed corpus generation where each
    executor synthesizes its own slice (no driver-side materialization).
    Statistically like generate_corpus but a different stream."""
    rng = random.Random((seed << 32) ^ (doc_idx * 0x9E3779B9))
    doc = _make_doc(rng, doc_idx)
    text = "".join(doc["sentences"])
    url = f"https://{_zipf_host(rng)}/announce/{doc['guid']}"
    doc["guid"] = url
    web = {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=doc_idx * 137),
        "html": make_html(text, doc["guid"]),
        "text": text,
        "lang": "zh",
    }
    return web, doc


def distributed_corpus(spark, n_docs: int, seed: int = 7, with_html: bool = False):
    """Webtext DataFrame generated ON THE EXECUTORS via mapInPandas over
    spark.range — the 100 TB-shaped input path (no driver bottleneck)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                web, _ = make_doc_indexed(int(i), seed)
                if not with_html:
                    web = dict(web, html=None)
                rows.append(web)
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    nparts = spark.sparkContext.defaultParallelism
    return spark.range(0, n_docs, 1, nparts).mapInPandas(
        gen,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )


def heuristic_entity_dict() -> dict[str, str]:
    """surface → coarse type dictionary for the no-model tagger (the
    broadcast entity dictionary of the north rule). Types pair with
    config.ROLE_COARSE_TYPE."""
    d: dict[str, str] = {}
    d.update({p: "person" for p in _PERSONS})
    d.update({c: "company" for c in _COMPANIES})
    d.update({i: "institution" for i in _INSTITUTIONS})
    return d


def expected_triples(docs_gold: list[dict]) -> list[dict]:
    """Golden (subj, pred, obj) rows flattened from gold events
    (FIXTURES.md §4): subj = first non-null key-field argument, pred =
    event_type#role, obj = argument text."""
    key_fields = {et.name: et.key_fields for et in CHFINANN_EVENT_TYPES}
    fields_order = {et.name: et.fields for et in CHFINANN_EVENT_TYPES}
    rows = []
    for doc in docs_gold:
        for ev in doc["events"]:
            et = ev["type"]
            subj = None
            for kf in key_fields[et]:
                if ev["args"].get(kf) is not None:
                    subj = ev["args"][kf]
                    break
            if subj is None:  # fall back to first non-null arg in field order
                for f in fields_order[et]:
                    if ev["args"].get(f) is not None:
                        subj = ev["args"][f]
                        break
            for role in fields_order[et]:
                obj = ev["args"].get(role)
                if obj is not None:
                    rows.append(
                        {
                            "doc_id": doc["guid"],
                            "event_type": et,
                            "recguid": ev["recguid"],
                            "subj": subj,
                            "pred": f"{et}#{role}",
                            "obj": obj,
                        }
                    )
    return rows


# --------------------------------------------------------------------------
# Refinery fixtures: adversarial junk corpus + hygiene tables
# --------------------------------------------------------------------------
# Each junk KIND is constructed to die at exactly one refinery stage
# (stages/refinery.py), so the staged run's per-stage drop counters are
# assertable end-to-end. Index-pure like make_doc_indexed: doc j is a
# function of (seed, j) only — executors synthesize their own slice.

_JUNK_KINDS = 6
_EVAL_SECRETS = 4  # distinct planted 13-grams shared with the eval set


def eval_secret(k: int) -> str:
    """The k-th planted benchmark 13-gram (decontamination bait)."""
    return " ".join(f"bench{k}tok{i}" for i in range(13))


def _en_filler(rng: random.Random, n: int, tag: str) -> str:
    """~n EN-looking tokens that PASS the C4 gate: unique-ish short
    words laced with stopwords, terminal period."""
    stop = ("the", "and", "of", "to", "in", "is", "it", "that", "for", "a")
    words = []
    for i in range(n):
        if i % 3 == 2:
            words.append(stop[rng.randrange(len(stop))])
        else:
            words.append(f"{tag}w{rng.randrange(10_000)}")
    return " ".join(words) + "."


def make_junk_indexed(j: int, n_real: int, seed: int = 7) -> dict:
    """Junk/adversarial web doc #j. kind = j % 6:

    0 — host on the domain blocklist            (dies: hygiene/blocklist)
    1 — host whose robots.txt disallows all     (dies: hygiene/robots)
    2 — recrawl captures (2 per page, tracking-param variants) carrying
        PII; freshest capture survives          (collapses: url_dedup;
                                                 scrubbed: pii stage)
    3 — EN spam: lorem-ipsum (C4 blocklist) or a repeated 2-gram ad
        (Gopher repetition)                     (dies: quality gate)
    4 — near-duplicate family of 4 (members 0,1 byte-identical → exact
        dedup; 2,3 high-Jaccard variants → MinHash); min-id rep survives
                                                (dies: dedup, 1 survivor)
    5 — contains a planted eval-set 13-gram     (dies: decontaminate)
    """
    rng = random.Random((seed << 40) ^ (j * 0x9E3779B97F4A7C15))
    kind = j % _JUNK_KINDS
    m = j // _JUNK_KINDS
    ts = _EPOCH + timedelta(seconds=(n_real + j) * 137)
    if kind == 0:
        url = f"https://cdn{m % 3}.blocked.junk.example/p/{j}"
        text = "blocked host " + _en_filler(rng, 40, "blk")
    elif kind == 1:
        url = f"https://norobots.junk.example/private/{j}"
        text = "disallowed " + _en_filler(rng, 40, "rob")
    elif kind == 2:
        page, capture = m // 2, m % 2
        url = f"https://recrawl.ok.example/page/{page}?utm_source=u{capture}"
        pr = random.Random((seed << 20) ^ page)  # page-stable filler
        text = (
            f"recrawl page {page} capture {capture} contact "
            f"sales{page}@example-mail.com or 10.1.2.{page % 250} or "
            f"+1555{page % 10}100200 " + _en_filler(pr, 36, f"pg{page}")
        )
    elif kind == 3:
        if m % 2 == 0:
            text = ("lorem ipsum dolor sit amet consectetur " * 9).strip() + "."
        else:
            text = ("buy cheap meds now " * 30).strip() + "."
        url = f"https://spam{m % 5}.ok.example/offer/{j}"
    elif kind == 4:
        famid, member = m // 4, m % 4
        fr = random.Random((seed << 16) ^ (famid * 0x1F123BB5))
        base = _en_filler(fr, 48, f"fam{famid}")
        tail = ("alpha", "alpha", "beta", "gamma")[member]
        text = f"tale{famid} {base[:-1]} {tail}."
        url = f"https://mirror{member}.ok.example/story/{famid}"
    else:
        k = m % _EVAL_SECRETS
        text = (
            _en_filler(rng, 16, "pre")[:-1]
            + " "
            + eval_secret(k)
            + " "
            + _en_filler(rng, 16, "post")
        )
        url = f"https://benchleak.ok.example/doc/{j}"
    return {
        "url": url,
        "warc_ts": ts,
        "html": None,
        "text": text,
        "lang": "en",
    }


def junk_corpus(spark, n_junk: int, n_real: int, seed: int = 7):
    """Junk webtext frame generated on the executors (same shape and
    protocol as distributed_corpus)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [make_junk_indexed(int(i), n_real, seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    nparts = spark.sparkContext.defaultParallelism
    return spark.range(0, n_junk, 1, nparts).mapInPandas(
        gen,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )


def refinery_tables(spark, seed: int = 7):
    """→ (robots_df, blocked_df, eval_df): the hygiene side-inputs of the
    refinery. All tiny (they broadcast); deterministic in seed."""
    rng = random.Random(seed ^ 0x5EED)
    robots = spark.createDataFrame(
        [
            ("norobots.junk.example", "User-agent: *\nDisallow: /\n"),
            ("recrawl.ok.example", "User-agent: *\nDisallow: /admin\n"),
        ],
        "host string, body string",
    )
    blocked = spark.createDataFrame(
        [("blocked.junk.example",)], "domain string"
    )
    eval_rows = [
        (f"eval{k}", eval_secret(k) + " " + _en_filler(rng, 10, f"ev{k}"))
        for k in range(_EVAL_SECRETS)
    ] + [(f"evalclean{k}", _en_filler(rng, 24, f"clean{k}")) for k in range(4)]
    eval_df = spark.createDataFrame(eval_rows, "doc_id string, text string")
    return robots, blocked, eval_df
