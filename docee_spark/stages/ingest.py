"""Stage 1 — ingest: webtext (url, warc_ts, html, text, lang) → clean docs.

Reference analog: the dataset loaders (S1/S2, dee/utils.py:74-77,
dee/helper/dee.py:391-402). The graft-specific addition is boilerplate
stripping ``html → text`` as a *pure function of html*, byte-identical per
url (north-rule invariant): the extraction runs only when ``text`` is null
and is a deterministic Arrow-vectorized UDF — no per-row Python.

At 100 TB the input is an Iceberg table partitioned by (crawl date, lang);
this stage's filter/projection push into the scan (verified in
tests/test_plans.py). Host-skew is broken by salted repartitioning *after*
the scan so partition pruning still applies.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fixtures import extract_text


def _extract_any(b: bytes) -> str:
    """Dispatching extractor: the frozen fixture extractor for annotated
    pages (byte-identity contract on the <article> payload), generic
    boilerplate strip for arbitrary webtext — a real crawl page without
    an <article> tag must degrade, never crash the job."""
    if b"<article>" in b and b"</article>" in b:
        return extract_text(b)
    return strip_boilerplate(b)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched boilerplate strip; pure function of the html bytes."""
    return html.map(lambda b: _extract_any(b) if b is not None else None)


import re as _re

# ONE leftmost-wins alternation for comments / CDATA / container blocks:
# whichever construct starts first owns the text up to ITS terminator,
# matching real HTML tokenization. Separate sequential passes get this
# wrong in both orders — comments-first lets a '<!--' INSIDE a script
# (legal raw text, e.g. document.write('<!--')) eat the '</script>' and
# destroy the rest of the document; blocks-first lets an unclosed
# '<script>' inside a comment eat past the '-->'. Unterminated
# constructs (crawler truncation) drop to EOF rather than leaking raw
# JS/CSS; comments are still consumed before the tag regex runs, so
# '<!-- a > b -->' cannot leak ' b -->' past the first '>'.
_BOILER = _re.compile(
    r"(?is)"
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    # raw-text elements: unterminated (crawler-truncated) blocks drop to
    # EOF — leaking raw JS/CSS into text is worse than losing the tail
    r"|<(script|style|noscript)\b[^>]*>.*?(?:</\1\s*>|$)"
    # structural containers: NO EOF fallback — an author-unclosed <nav>
    # (very common malformation) must not eat the document body; browsers
    # auto-close at EOF and keep the content, and so do we (the open tag
    # itself is stripped by _TAGS)
    r"|<(nav|header|footer|aside)\b[^>]*>.*?</\2\s*>"
)
# a tag left open at EOF is dropped, not emitted as text
# a tag starts only at '<' + letter / '/' / '!' / '?' (the HTML5
# tokenizer rule): a bare '<' in prose ("3 < 5") is text and must not
# swallow everything to the next '>' — or, with the EOF fallback for
# crawl-truncated tags, the entire rest of the document
_TAGS = _re.compile(r"(?s)<[/!?a-zA-Z][^>]*(?:>|$)")
_WS = _re.compile(r"[ \t\r\f\v]+")

# frozen entity table (most common named refs; NOT stdlib html.unescape,
# whose table could drift across Python versions — byte-stability per url
# is the north-rule invariant, SURVEY §7 risk 3)
_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "mdash": "—", "ndash": "–",
    "hellip": "…", "copy": "©", "reg": "®",
    "trade": "™", "laquo": "«", "raquo": "»",
    "ldquo": "“", "rdquo": "”", "lsquo": "‘",
    "rsquo": "’", "middot": "·", "bull": "•",
    "deg": "°", "times": "×", "divide": "÷",
    "euro": "€", "pound": "£", "yen": "¥",
    "cent": "¢", "sect": "§", "para": "¶",
    "plusmn": "±",
}
_ENTITY = _re.compile(r"&(#[xX]?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,30});")


def _decode_entity(m: "_re.Match[str]") -> str:
    body = m.group(1)
    if body.startswith("#"):
        try:
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
        except ValueError:
            return m.group(0)
        # reject NUL, surrogates, out-of-range — keep the literal text
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return m.group(0)
    return _NAMED_ENTITIES.get(body, m.group(0))


def strip_boilerplate(html: bytes) -> str:
    """Generic extractor for arbitrary pages: drop comments/CDATA and
    script/style/nav/header/footer/aside blocks (including blocks left
    unterminated by crawl truncation), strip remaining tags (including a
    tag left open at EOF), decode numeric + common named character
    entities from a frozen table, normalize whitespace. Pure function of
    the bytes (frozen + golden-tested — SURVEY §7 risk 3); the fixture
    extractor (``fixtures.extract_text``) stays the byte-identity
    reference for annotated corpora. Entities are decoded AFTER tag
    stripping, so escaped markup (&lt;script&gt;) correctly survives as
    text content."""
    s = html.decode("utf-8", errors="replace")
    s = _BOILER.sub(" ", s)
    s = _TAGS.sub(" ", s)
    s = _ENTITY.sub(_decode_entity, s)
    s = _WS.sub(" ", s)
    return "\n".join(
        line.strip() for line in s.split("\n") if line.strip()
    ).strip()


@F.pandas_udf(T.StringType())
def strip_boilerplate_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: strip_boilerplate(b) if b is not None else None)


def host_of(url: Column) -> Column:
    """Host component of a url — the skew key (Zipf-distributed hosts)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)/", 1)


def default_salt_buckets(n_partitions: int) -> int:
    """Shared salting default: 8× the partition count. The (key, salt)
    combos land in partitions by hash, so a hot key needs ≫ n_partitions
    combos for the balls-into-bins variance to flatten out (with only
    n_partitions combos, collisions leave 2-3× imbalance — measured).
    ONE definition: length_bucketed and salted_repartition must agree or
    the two exchanges silently diverge on the next retune."""
    return 8 * n_partitions


def salted_repartition(
    df: DataFrame, n_partitions: int, salt_buckets: int | None = None
) -> DataFrame:
    """Break host-level skew: repartition on (host, salt) so one hot host
    spreads over ``salt_buckets`` combos (SURVEY §7 risk 5). The salt is
    deterministic (hash of url) — reruns place rows identically;
    default = ``default_salt_buckets``."""
    if salt_buckets is None:
        salt_buckets = default_salt_buckets(n_partitions)
    return df.repartition(
        n_partitions,
        host_of(F.col("url")),
        F.pmod(F.xxhash64("url"), F.lit(salt_buckets)),
    )


def url_host(url: Column) -> Column:
    """Registrable host of a url: lowercased authority minus port — the
    key every crawl-hygiene list (UT1 blocklists, robots policies,
    per-host budgets) is keyed by. Scheme-less garbage → empty string."""
    auth = F.lower(F.regexp_extract(url, _SCHEME_PREFIX + r"([^/?#]*)", 1))
    return F.regexp_replace(auth, r":[0-9]+$", "")


def _host_suffixes(host: Column) -> Column:
    """['a.b.co', 'b.co', 'co'] for host 'a.b.co' — domain lists match by
    suffix (blocking 'spam.example' must catch 'cdn.spam.example')."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n - i + 1)),
    )


def host_flags(
    webtext: DataFrame,
    blocked: DataFrame,
    allowed: DataFrame | None = None,
    url_col: str = "url",
    broadcast_verdict: bool | None = True,
) -> DataFrame:
    """Domain-blocklist verdict per row → input + (host, is_blocked).

    A row is blocked iff its host has ANY suffix in ``blocked(domain)``
    and NO suffix in ``allowed(domain)`` (the allowlist carves
    exceptions: allow 'docs.spam.example' out of a blocked
    'spam.example'). ``is_blocked`` is a 0/1 long — a FLAG, not a silent
    drop, so filter volume is observable; ``host_filter`` applies it.

    Scale shape (the decontaminate pattern): suffixes explode ONLY into
    the match probe — distinct hosts → explode suffixes → inner join the
    BROADCAST domain lists → distinct blocked-host set → join-back. With
    ``broadcast_verdict=True`` (default) the join-back is a broadcast and
    the corpus never shuffles — correct while |blocked hosts| fits the
    broadcast budget (typical: blocklists block apex domains, the blocked
    HOST set ≈ the blocklist hit count). A UT1-scale list (~10⁶ domains)
    against a full crawl can exceed it: pass ``None`` to let AQE decide
    on the measured size, or ``False`` to force the shuffle join."""
    with_host = webtext.withColumn("host", url_host(F.col(url_col)))
    hosts = with_host.select("host").distinct()
    probe = hosts.select(
        "host", F.explode(_host_suffixes(F.col("host"))).alias("domain")
    )
    hit = probe.join(
        F.broadcast(blocked.select("domain")), "domain"
    ).select("host")
    if allowed is not None:
        excused = probe.join(
            F.broadcast(allowed.select("domain")), "domain"
        ).select("host")
        # excused ≤ allowlist hits — broadcastable by construction
        hit = hit.join(F.broadcast(excused), "host", "left_anti")
    blocked_hosts = hit.distinct().withColumn("is_blocked", F.lit(1).cast("long"))
    if broadcast_verdict is True:
        blocked_hosts = F.broadcast(blocked_hosts)
    elif broadcast_verdict is False:
        blocked_hosts = blocked_hosts.hint("shuffle_merge")
    return (
        with_host.join(blocked_hosts, "host", "left")
        .withColumn("is_blocked", F.coalesce(F.col("is_blocked"), F.lit(0)))
        .select(*webtext.columns, "host", "is_blocked")
    )


def host_filter(
    webtext: DataFrame,
    blocked: DataFrame,
    allowed: DataFrame | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Rows surviving the domain blocklist (see ``host_flags``)."""
    return host_flags(webtext, blocked, allowed, url_col).filter(
        F.col("is_blocked") == 0
    ).drop("is_blocked")


# Tracking query parameters dropped during url canonicalization (name
# match, value-insensitive). Frozen list: canonical urls must be stable
# across releases or recrawl dedup silently re-admits old captures.
_TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)="
)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_SCHEME_PREFIX = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def canonical_url(url: Column) -> Column:
    """RFC-3986-style url normalization as pure codegen expressions (no
    UDF): lowercase scheme+authority, strip ``www.`` and the scheme's
    default port, empty path → ``/``, drop the fragment, drop tracking
    params (frozen list), sort the remaining query params. A string
    without a ``scheme://`` prefix passes through unchanged — crawl
    inputs contain garbage and an un-parseable url must stay a distinct
    key, not collapse into ``://…``. Recrawl captures of the same page
    differ only in tracking params / fragment / case, so this is the
    blocking key for capture dedup (``url_dedup``)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _SCHEME_PREFIX + r"([^/?#]*)", 1))
    # strip ALL leading 'www.' labels, not just one: the canonical url
    # is the recrawl-dedup blocking key, so it must be a fixed point —
    # 'www.www.x' stripping to 'www.x' would re-strip on a second pass
    # and two crawls of the same page could land in different groups
    # (idempotence property-tested in tests/test_url_properties.py)
    host = F.regexp_replace(auth, r"^(www\.)+", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(url, _SCHEME_PREFIX + r"[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query = first '?' .. fragment; [^#?]* pins the '?' BEFORE any '#'
    # so a '?' inside the fragment cannot fake a query string
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", url).otherwise(canon)


# Public-suffix snapshot used by registered_domain: the high-traffic
# subset of the Mozilla Public Suffix List (publicsuffix.org — plain
# TLDs plus the common country second-levels and the big user-content
# suffixes). FROZEN for the same reason as _TRACKING_PARAM_RE: the
# registered domain is a blocking/partition key, so it must be stable
# across releases. Callers with full-PSL needs pass their own tuple —
# the honest boundary, the list itself is data not code. Wildcard and
# exception PSL rules (*.ck, !www.ck) are not modeled.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app", "xyz", "me", "tv", "cc",
    "us", "uk", "de", "fr", "jp", "cn", "ru", "br", "in", "au", "ca",
    "it", "nl", "es", "se", "no", "pl", "ch", "at", "be", "dk", "fi",
    "kr", "mx", "ar", "tr", "sg", "nz", "za", "eu",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "co.kr", "com.br", "com.cn", "com.mx", "co.in", "co.nz",
    "com.sg", "com.tr", "com.ar", "co.za", "com.pl",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "s3.amazonaws.com",
)


def public_suffix(
    host: Column, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES
) -> Column:
    """Longest suffix of ``host`` present in the suffix list; NULL when
    none matches. Pure codegen: the candidate suffixes of a host are
    enumerated longest-first (``_host_suffixes``) and filtered against
    the frozen literal set — no join, no UDF, so it composes into any
    scan-side projection."""
    matches = F.filter(_host_suffixes(host), lambda s: s.isin(*suffixes))
    return F.get(matches, 0)


def registered_domain(
    host: Column, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES
) -> Column:
    """eTLD+1: one label more than the public suffix — the key crawl
    systems budget, block, and aggregate by (a million ``*.blogspot.com``
    subdomains are one registrant, ``foo.co.uk`` must not collapse into
    ``co.uk``). Unknown TLD → PSL default-rule fallback (the TLD is
    treated as the public suffix, registered domain = last two labels);
    a host that IS a public suffix → NULL."""
    cands = _host_suffixes(host)
    ps = public_suffix(host, suffixes)
    # 1-based; no match → 0 (array_position yields NULL for a NULL
    # needle, which would otherwise swallow the default-rule branch)
    pos = F.coalesce(F.array_position(cands, ps), F.lit(0))
    return (
        F.when(pos > 1, F.get(cands, pos - 2))
        .when(
            # no PSL match: default rule — last two labels (when present)
            (pos == 0) & (F.size(cands) >= 2),
            F.get(cands, F.size(cands) - 2),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) of the CANONICAL
    url: ``tld,domain,sub,)/path?query`` — the CDX/Common-Crawl index
    key. Host labels reversed and comma-joined put a registrant's whole
    subtree under one string prefix, so "every page under example.org"
    is a prefix range scan, and range-partitioning the crawl by this key
    co-locates domains without a shuffle-heavy groupBy. Scheme is
    dropped (http/https collapse — they already share a canonical host);
    a string without a scheme passes through unchanged, same garbage
    discipline as ``canonical_url``."""
    canon = canonical_url(url)
    scheme = F.lower(F.regexp_extract(canon, _SCHEME_RE, 1))
    host = F.regexp_extract(canon, _SCHEME_PREFIX + r"([^/?#]*)", 1)
    rest = F.regexp_extract(canon, _SCHEME_PREFIX + r"[^/?#]*(.*)", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.when(scheme == "", url).otherwise(
        F.concat(rev, F.lit(")"), rest)
    )


def url_dedup(webtext: DataFrame) -> DataFrame:
    """Freshest-capture-per-page dedup over the crawl shape
    (url, warc_ts, …): group by ``canonical_url`` and keep the newest
    capture (ties broken by url descending via lexicographic struct
    max — deterministic under reruns; a NULL warc_ts loses to any
    non-null). ONE groupBy with map-side partial aggregation — no
    join-back, no window over the full crawl — so at 10^12 captures the
    shuffle carries one (ts, url) struct + count per canonical url per
    map partition. The struct-max buffer is non-primitive, so Spark
    plans partial/final SortAggregate instead of HashAggregate
    (plan-asserted): the extra per-partition sort rides the shuffle
    sort, and the alternatives (window row_number, max_by) are the same
    or worse — max_by's tie behavior is additionally nondeterministic.

    → (canonical_url, url, warc_ts, n_captures)."""
    agg = webtext.groupBy(
        canonical_url(F.col("url")).alias("canonical_url")
    ).agg(
        F.max(
            F.struct(
                F.col("warc_ts").alias("warc_ts"), F.col("url").alias("url")
            )
        ).alias("best"),
        F.count("*").cast("long").alias("n_captures"),
    )
    return agg.select(
        "canonical_url",
        F.col("best.url").alias("url"),
        F.col("best.warc_ts").alias("warc_ts"),
        "n_captures",
    )


def recrawl_churn(
    webtext: DataFrame,
    canonicalize: bool = True,
) -> DataFrame:
    """Recrawl change detection over the crawl shape (url, warc_ts,
    text): for each page, how many recrawls actually changed the
    content? → ``(canonical_url, n_captures, n_changes, churn_e4,
    first_ts, last_ts)``.

    The crawl-scheduling signal: pages with churn ~0 are wasted
    recrawls (back off), churn ~1 are hot pages (fetch more often) —
    the rate a Common-Crawl-style operator feeds back into the
    frontier. A change is a capture whose content fingerprint differs
    from the PREVIOUS capture of the same page (captures ordered by
    (warc_ts, fingerprint); the fingerprint tiebreak makes equal-
    timestamp reruns deterministic, and equal-fingerprint ties are
    changeless under any order). ``churn_e4`` =
    floor(10⁴·n_changes/(n_captures−1)); 0 for single-capture pages.

    Scale shape: the text column collapses to a 32-char md5 BEFORE the
    shuffle (a map-side projection — page bodies never move), then ONE
    hash exchange on canonical_url feeds both the lag window and the
    final groupBy (same key → AQE reuses the exchange; no second
    shuffle). ``canonicalize=False`` skips url normalization when the
    caller already dedup'd/canonicalized (composes after
    :func:`url_dedup`'s output or any curated url column).
    """
    from pyspark.sql import Window

    from ..operators.textstats import fingerprint_md5

    key = (
        canonical_url(F.col("url")) if canonicalize else F.col("url")
    ).alias("canonical_url")
    per = webtext.select(
        key,
        F.col("warc_ts"),
        fingerprint_md5(F.col("text")).alias("fp"),
    )
    w = Window.partitionBy("canonical_url").orderBy("warc_ts", "fp")
    lagged = per.select(
        "canonical_url",
        "warc_ts",
        (F.col("fp") != F.lag("fp").over(w))
        .cast("long")
        .alias("changed"),  # NULL lag (first capture) -> NULL -> sum skips
    )
    agg = lagged.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_captures"),
        F.coalesce(F.sum("changed"), F.lit(0)).cast("long").alias(
            "n_changes"
        ),
        F.min("warc_ts").alias("first_ts"),
        F.max("warc_ts").alias("last_ts"),
    )
    n, c = F.col("n_captures"), F.col("n_changes")
    num, den = c * F.lit(10_000), n - F.lit(1)
    churn = F.when(
        n >= 2, ((num - F.pmod(num, den)) / den).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return agg.select(
        "canonical_url",
        "n_captures",
        "n_changes",
        churn.alias("churn_e4"),
        "first_ts",
        "last_ts",
    )


def ingest(
    webtext: DataFrame,
    langs: tuple[str, ...] | None = None,
    use_html: bool = True,
) -> DataFrame:
    """→ (doc_id, lang, text, warc_ts). Filters push into the source scan.

    ``use_html=True`` extracts text from html for rows with null text;
    pass False when the source guarantees text — the html column is then
    never referenced and column pruning drops it from the scan entirely
    (binary html dominates the bytes at 100 TB, so this is the single
    biggest I/O knob in the pipeline).
    """
    df = webtext
    if langs:
        df = df.filter(F.col("lang").isin(*langs))
    if use_html:
        text = F.when(
            F.col("text").isNull(), extract_text_udf(F.col("html"))
        ).otherwise(F.col("text"))
    else:
        text = F.col("text")
    return df.select(
        F.col("url").alias("doc_id"),
        F.col("lang"),
        text.alias("text"),
        F.col("warc_ts"),
    ).filter(F.col("text").isNotNull() & (F.length("text") > 0))
