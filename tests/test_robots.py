"""robots.txt evaluation (stages/robots.py): RFC 9309 parsing (groups,
contiguous ua blocks, comments), pattern syntax (*/$), longest-match +
allow-tie decisions, agent selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docee_spark.stages.robots import robots_rules, robots_verdict

BODY_A = """# politeness file
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp*.log
Disallow: /exact$

User-agent: specialbot
User-agent: otherbot
Disallow: /
Allow: /welcome/
"""

BODY_B = """User-agent: *
Disallow:
"""  # empty disallow = no restriction


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(
        [("a.com", BODY_A), ("b.com", BODY_B)], "host string, body string"
    )


def _verdicts(spark, robots_df, agent, urls):
    rules = robots_rules(robots_df, agent=agent)
    u = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    return {
        r["url"]: r["is_allowed"]
        for r in robots_verdict(u, rules).collect()
    }


class TestRobots:
    def test_star_group_decisions(self, spark, robots):
        got = _verdicts(
            spark,
            robots,
            "mycrawler",
            [
                "https://a.com/public/x",        # no rule → allowed
                "https://a.com/private/x",       # disallowed
                "https://a.com/private/ok/x",    # longer allow wins
                "https://a.com/tmp123.log",      # * wildcard
                "https://a.com/tmp/x",           # /tmp*.log doesn't match
                "https://a.com/exact",           # $ anchor
                "https://a.com/exact/sub",       # anchor must NOT match
                "https://b.com/anything",        # empty disallow → allowed
                "https://c.com/x",               # no robots at all
            ],
        )
        assert got == {
            "https://a.com/public/x": 1,
            "https://a.com/private/x": 0,
            "https://a.com/private/ok/x": 1,
            "https://a.com/tmp123.log": 0,
            "https://a.com/tmp/x": 1,
            "https://a.com/exact": 0,
            "https://a.com/exact/sub": 1,
            "https://b.com/anything": 1,
            "https://c.com/x": 1,
        }

    def test_exact_agent_group_beats_star(self, spark, robots):
        got = _verdicts(
            spark,
            robots,
            "SpecialBot",  # case-insensitive
            [
                "https://a.com/anything",     # exact group: Disallow /
                "https://a.com/welcome/hi",   # exact group allow
                "https://a.com/private/ok/x", # star rules NOT in effect
            ],
        )
        assert got == {
            "https://a.com/anything": 0,
            "https://a.com/welcome/hi": 1,
            "https://a.com/private/ok/x": 0,
        }

    def test_contiguous_ua_block_shares_rules(self, spark, robots):
        got = _verdicts(spark, robots, "otherbot", ["https://a.com/welcome/hi",
                                                    "https://a.com/zzz"])
        assert got == {"https://a.com/welcome/hi": 1, "https://a.com/zzz": 0}

    def test_rule_table_shape(self, robots):
        rules = {
            (r["rule"], r["pattern"])
            for r in robots_rules(robots, agent="*").collect()
        }
        assert ("disallow", "/private/") in rules
        assert ("allow", "/private/ok/") in rules
        # the specialbot group's rules must not leak into the * view
        assert ("allow", "/welcome/") not in rules

    def test_regex_metachars_stay_literal(self, spark):
        rb = spark.createDataFrame(
            [("x.com", "User-agent: *\nDisallow: /a.b/\n")],
            "host string, body string",
        )
        got = _verdicts(spark, rb, "any", ["https://x.com/a.b/1", "https://x.com/aXb/1"])
        # '.' is literal: /aXb/ must NOT be caught
        assert got == {"https://x.com/a.b/1": 0, "https://x.com/aXb/1": 1}
