"""robots.txt evaluation (RFC 9309) — the crawl-politeness gate, as
relational operators.

``robots_rules`` parses a per-host robots.txt corpus into an effective
rule table for one crawler agent, entirely with column expressions and
window functions (line explode → contiguous user-agent blocks via
windowed flags → rule/group join → exact-agent-over-star selection).
``robots_verdict`` then scores a url table: longest-matching pattern
wins, allow wins length ties, no match ⇒ allowed (all per RFC 9309 §2.2,
with the standard ``*``/``$`` pattern syntax).

Scale shape: robots bodies are one row per HOST (millions of rows, tiny
next to the crawl) and the rule table a few rows per host; the verdict
is one join on host + one groupBy on the url key with a struct-max — no
Python, no explode of the url side beyond its matched rules.

Scope notes (documented simplifications): agent groups match by exact
token or ``*`` (RFC's longest-product-token matching is a dictionary
nicety); patterns match the url PATH (query excluded); ``crawl-delay``
and ``sitemap`` lines are ignored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ingest import url_host

# regex metacharacters escaped literally when compiling robots patterns;
# '*' becomes '.*' and a trailing '$' anchors — everything else literal
_ESCAPE = r"([.\[\]{}()+?^$|\\])"


def _pattern_rx(pattern: Column) -> Column:
    """robots path pattern → anchored Java/RE2-safe regex."""
    has_anchor = pattern.endswith("$")
    body = F.when(
        has_anchor, pattern.substr(F.lit(1), F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(body, _ESCAPE, r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(has_anchor, F.lit("$")).otherwise(F.lit("")))


def robots_rules(robots: DataFrame, agent: str = "*") -> DataFrame:
    """``robots(host, body)`` → ``(host, rule, pattern, plen, rx)`` — the
    effective rule set for ``agent``: rules from exact-agent groups when
    the host has any, else from ``*`` groups. Consecutive ``user-agent``
    lines share the following rules (contiguous-block semantics)."""
    lines = robots.select(
        "host",
        F.posexplode(F.split(F.col("body"), "\n")).alias("idx", "raw"),
    ).select(
        "host",
        "idx",
        F.trim(F.regexp_replace(F.col("raw"), "#.*", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "idx",
        F.lower(F.regexp_extract(F.col("line"), r"^([A-Za-z-]+)\s*:", 1)).alias(
            "directive"
        ),
        F.trim(F.regexp_extract(F.col("line"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1)).alias(
            "value"
        ),
    ).filter(F.col("directive").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("idx")
    is_ua = F.col("directive") == "user-agent"
    # a ua line OPENS a block iff the previous directive line is not ua
    opens = is_ua & (F.coalesce(F.lag("directive").over(w), F.lit("")) != "user-agent")
    blocks = parsed.withColumn(
        "block",
        F.sum(opens.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    groups = blocks.filter(is_ua).select(
        "host", "block", F.lower(F.col("value")).alias("agent_name")
    )
    rules = blocks.filter(~is_ua & (F.col("value") != "")).select(
        "host",
        "block",
        F.col("directive").alias("rule"),
        F.col("value").alias("pattern"),
    )
    tagged = rules.join(groups, ["host", "block"]).select(
        "host", "agent_name", "rule", "pattern"
    )
    mine = tagged.filter(
        F.col("agent_name").isin(agent.lower(), "*")
    ).withColumn("exact", (F.col("agent_name") == agent.lower()).cast("int"))
    has_exact = mine.groupBy("host").agg(F.max("exact").alias("has_exact"))
    eff = (
        mine.join(has_exact, "host")
        .filter(F.col("exact") == F.col("has_exact"))
        .select("host", "rule", "pattern")
        .distinct()
    )
    return eff.select(
        "host",
        "rule",
        "pattern",
        F.length("pattern").alias("plen"),
        _pattern_rx(F.col("pattern")).alias("rx"),
    )


def robots_verdict(
    urls: DataFrame, rules: DataFrame, key_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """→ ``(key, url, is_allowed)``: RFC 9309 decision per url — among
    rules whose pattern matches the url path, the LONGEST pattern wins
    and ``allow`` wins length ties; a url with no matching rule (or a
    host with no robots) is allowed."""
    from docee_spark.stages.ingest import _SCHEME_PREFIX

    path = F.regexp_extract(F.col(url_col), _SCHEME_PREFIX + r"[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    u = urls.select(
        F.col(key_col).alias("key"),
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        path.alias("path"),
    )
    cand = u.join(rules, "host", "left").withColumn(
        "hit", F.col("rx").isNotNull() & F.regexp_like(F.col("path"), F.col("rx"))
    )
    best = (
        cand.groupBy("key", "url")
        .agg(
            F.max(
                F.when(
                    F.col("hit"),
                    F.struct(
                        F.col("plen").alias("plen"),
                        (F.col("rule") == "allow").cast("int").alias("is_allow"),
                    ),
                )
            ).alias("best")
        )
        .select(
            F.col("key"),
            "url",
            F.coalesce(F.col("best.is_allow").cast("long"), F.lit(1)).alias(
                "is_allowed"
            ),
        )
    )
    return best
