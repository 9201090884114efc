"""Differential property test for robots.txt evaluation: the Spark
relational pipeline (``robots_rules`` + ``robots_verdict``) vs an
independent pure-Python RFC-9309 evaluator written directly from the
spec semantics the module documents (contiguous user-agent blocks,
exact-agent-over-star, longest-pattern wins, allow wins length ties,
no match ⇒ allowed, ``*``/``$`` pattern syntax over the url path).

Batched like tests/test_url_properties.py: one hypothesis example =
one robots corpus + one url list = one Spark job."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

AGENT = "bot"

# pattern/path vocabulary exercises '*' and '$' plus every regex
# metacharacter the compiler must keep literal
_SEGS = ["/a", "/b", "/ab", "/a.b", "/x(y)", "/q+r", "/c/d"]
_PAT_BITS = _SEGS + ["*", "$", "/a*", "*b", "/"]

_pattern = st.lists(st.sampled_from(_PAT_BITS), min_size=1, max_size=3).map(
    "".join
)
_path = st.lists(st.sampled_from(_SEGS), min_size=0, max_size=3).map("".join)

_line = st.one_of(
    st.sampled_from(
        [
            "User-agent: *",
            "User-Agent: bot",
            "user-agent: crawler",
            "User-agent: BOT",
            "# a comment",
            "Crawl-delay: 3",
            "Sitemap: http://x/s.xml",
            "junk line",
            "Disallow:",
            "",
        ]
    ),
    _pattern.map(lambda p: f"Disallow: {p}"),
    _pattern.map(lambda p: f"Allow: {p}"),
    _pattern.map(lambda p: f"disallow: {p} # trailing"),
)

_body = st.lists(_line, min_size=0, max_size=12).map("\n".join)
_hosts = ["a.com", "b.com"]


# ---------------------------------------------------------------------------
# independent reference evaluator (pure python, no shared code)
# ---------------------------------------------------------------------------

def _ref_effective_rules(body: str, agent: str) -> list[tuple[str, str]]:
    entries: list[tuple[str, str]] = []
    for raw in body.split("\n"):
        line = re.sub(r"#.*", "", raw).strip()
        m = re.match(r"^([A-Za-z-]+)\s*:", line)
        if not m:
            continue
        directive = m.group(1).lower()
        if directive not in ("user-agent", "allow", "disallow"):
            continue
        value = re.match(r"^[A-Za-z-]+\s*:\s*(.*)$", line).group(1).strip()
        entries.append((directive, value))

    block = -1
    prev = None
    groups: list[tuple[int, str]] = []
    rules: list[tuple[int, str, str]] = []
    for directive, value in entries:
        if directive == "user-agent":
            if prev != "user-agent":
                block += 1
            groups.append((block, value.lower()))
        elif value != "":
            rules.append((block, directive, value))
        prev = directive

    mine = [
        (name, rule, pat)
        for b, name in groups
        for b2, rule, pat in rules
        if b2 == b and name in (agent, "*")
    ]
    if any(name == agent for name, _, _ in mine):
        mine = [t for t in mine if t[0] == agent]
    return sorted({(rule, pat) for _, rule, pat in mine})


def _ref_rx(pattern: str) -> str:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    esc = re.sub(r"([.\[\]{}()+?^$|\\])", r"\\\1", body)
    wild = esc.replace("*", ".*")
    return "^" + wild + ("$" if anchored else "")


def _ref_allowed(path: str, eff: list[tuple[str, str]]) -> int:
    best: tuple[int, int] | None = None
    for rule, pattern in eff:
        if re.search(_ref_rx(pattern), path):
            key = (len(pattern), 1 if rule == "allow" else 0)
            if best is None or key > best:
                best = key
    return 1 if best is None else best[1]


# ---------------------------------------------------------------------------


class TestRobotsDifferential:
    @settings(max_examples=10, deadline=None)
    @given(
        bodies=st.tuples(_body, _body),
        reqs=st.lists(
            st.tuples(st.sampled_from(_hosts), _path), min_size=5, max_size=25
        ),
    )
    def test_verdict_matches_pure_python_rfc9309(self, spark, bodies, reqs):
        from docee_spark.stages.robots import robots_rules, robots_verdict

        robots = spark.createDataFrame(
            list(zip(_hosts, bodies)), "host string, body string"
        )
        urls = spark.createDataFrame(
            [
                (i, f"http://{h}{p}")
                for i, (h, p) in enumerate(reqs)
            ],
            "doc_id long, url string",
        )
        rules = robots_rules(robots, agent=AGENT)
        got = {
            r["key"]: r["is_allowed"]
            for r in robots_verdict(urls, rules).collect()
        }

        eff = {h: _ref_effective_rules(b, AGENT) for h, b in zip(_hosts, bodies)}
        for i, (h, p) in enumerate(reqs):
            want = _ref_allowed(p or "/", eff[h])
            assert got[i] == want, (
                h,
                p,
                eff[h],
                got[i],
                want,
            )
