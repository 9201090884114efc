"""SURT keys + public-suffix / registered-domain extraction
(stages/ingest.py): pinned examples, the domain-prefix property that
makes SURT a range-partition key, and PSL fallback rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from docee_spark.stages.ingest import (
    public_suffix,
    registered_domain,
    surt_key,
    url_host,
)


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["o"] for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


class TestSurtKey:
    def test_pinned_examples(self, spark):
        got = _eval(
            spark,
            surt_key,
            [
                "https://www.Example.org:443/a/B?b=2&a=1&utm_source=x#frag",
                "http://sub.news.co.uk/",
                "HTTP://X.COM:80",
                "not a url",
            ],
        )
        assert got == [
            "org,example)/a/B?a=1&b=2",
            "uk,co,news,sub)/",
            "com,x)/",
            "not a url",
        ]

    def test_domain_prefix_property(self, spark):
        # every page of a registrant's subtree shares the reversed-host
        # prefix — the property that makes SURT a range-scan key
        keys = _eval(
            spark,
            surt_key,
            [
                "https://example.org/x",
                "https://a.example.org/y?q=1",
                "https://b.a.example.org/",
                "https://examplezorg.org/",
            ],
        )
        # a subtree scan uses the label-terminated prefixes
        # "org,example)" and "org,example," — unrelated registrants
        # ("examplezorg") share neither
        assert keys[0].startswith("org,example)")
        assert keys[1].startswith("org,example,")
        assert keys[2].startswith("org,example,a,")
        assert not keys[3].startswith("org,example)")
        assert not keys[3].startswith("org,example,")


class TestRegisteredDomain:
    def test_psl_rules(self, spark):
        hosts = [
            "www.example.com",        # plain TLD
            "foo.bar.co.uk",          # 2-level public suffix
            "co.uk",                  # host IS a public suffix
            "alice.github.io",        # user-content suffix
            "deep.sub.alice.github.io",
            "host.unknowntld",        # default rule: last two labels
            "unknowntld",             # single label, no match
        ]
        ps = _eval(spark, public_suffix, hosts)
        rd = _eval(spark, registered_domain, hosts)
        assert ps == ["com", "co.uk", "co.uk", "github.io", "github.io",
                      None, None]
        assert rd == [
            "example.com", "bar.co.uk", None, "alice.github.io",
            "alice.github.io", "host.unknowntld", None,
        ]

    def test_composes_with_url_host(self, spark):
        got = _eval(
            spark,
            lambda c: registered_domain(url_host(c)),
            ["https://a.b.example.co.uk:8443/p?q=1"],
        )
        assert got == ["example.co.uk"]
