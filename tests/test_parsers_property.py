"""Property-based fuzzing of the web-format parsers (robots, sitemaps,
redirects) against their pure-Python mirrors.

Each hypothesis example is a BATCH (one Spark job checks ~dozens of
generated inputs at once — the test_properties.py amortization
pattern), few examples each. Alphabets are printable ASCII: the
parsers target ASCII-ish crawl formats, and Java vs Python regex
semantics legitimately diverge on exotic unicode line terminators
(U+2028 etc.), which is out of contract."""

from __future__ import annotations


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_robots import mirror_match, mirror_parse
from tests.test_sitemaps import mirror as sitemap_mirror

# --------------------------------------------------------------------------
# robots
# --------------------------------------------------------------------------

_KEYS = ["User-agent", "user-AGENT", "Allow", "Disallow", "disallow",
         "Crawl-delay", "Sitemap", "Junk-key", "noise"]
_VALS = ["", "/a", "/ab", "/a/b", "/*.x$", "/b$", "*", "/a*b", "/(c)", "/c+d",
         "/d.e", "/[f]", "/g|h", "/i\\j", "/k^l", "/m$n", "egabot", "EGAbot",
         "otherbot", "  /sp  ", "/y # tail comment", "# whole", "5", "x"]
_PATHS = ["/a", "/ab", "/a/b", "/b", "/c", "/x.x", "/a*b", "/(c)", "/c+d",
          "/d.e", "/[f]", "/g|h", "/i\\j", "/k^l", "/m$n", "/sp", "/y"]
_EOLS = ["\n", "\r\n", "\r"]


@st.composite
def robots_body(draw):
    n = draw(st.integers(0, 12))
    lines = []
    for _ in range(n):
        k = draw(st.sampled_from(_KEYS))
        v = draw(st.sampled_from(_VALS))
        sep = draw(st.sampled_from([":", " : ", ":  "]))
        lines.append(f"{k}{sep}{v}" + draw(st.sampled_from(_EOLS)))
    return "".join(lines)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(bodies=st.lists(robots_body(), min_size=1, max_size=25),
       agent=st.sampled_from(["egabot", "otherbot", "*"]))
def test_robots_property(spark, bodies, agent):
    from efficient_graph_algorithms_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    hosts = [(f"h{i}", b) for i, b in enumerate(bodies)]
    urls = [(f"h{i}:{p}", f"h{i}", p) for i in range(len(bodies)) for p in _PATHS]
    robots = spark.createDataFrame(hosts, "host string, robots_txt string")
    udf_ = spark.createDataFrame(urls, "url string, host string, path string")
    got = {
        r["url"]: (r["allowed"], r["matched_rule"])
        for r in robots_filter(udf_, parse_robots(robots, agent)).collect()
    }
    assert len(got) == len(urls)
    bodies_by_host = dict(hosts)
    for url, host, path in urls:
        want = mirror_match(mirror_parse(bodies_by_host[host], agent), path)
        assert got[url] == want, (url, agent, bodies_by_host[host], got[url], want)


# --------------------------------------------------------------------------
# sitemaps
# --------------------------------------------------------------------------

_FRAGS = ["<url>", "</url>", "<sitemap>", "</sitemap>", "<loc>", "</loc>",
          "<lastmod>", "</lastmod>", "<urlset>", "</urlset>", "https://x/p",
          "a&amp;b", "&lt;q&gt;", "2026-01-02", " ", "\n", "text", "<loc/>",
          '<url data-x="1">', "</", ">", "plain"]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(bodies=st.lists(
    st.lists(st.sampled_from(_FRAGS), min_size=0, max_size=30).map("".join),
    min_size=1, max_size=25))
def test_sitemaps_property(spark, bodies):
    from efficient_graph_algorithms_spark.operators.sitemaps import (
        parse_sitemaps,
    )

    rows = [(f"h{i}", b) for i, b in enumerate(bodies)]
    df = spark.createDataFrame(rows, "host string, sitemap_xml string")
    got = sorted(
        (r["host"], r["kind"], r["url"], r["lastmod"])
        for r in parse_sitemaps(df).collect()
    )
    want = sorted(
        (h, k, u, lm) for h, b in rows for k, u, lm in sitemap_mirror(b)
    )
    assert got == want


# --------------------------------------------------------------------------
# redirects
# --------------------------------------------------------------------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    pairs=st.dictionaries(st.integers(0, 40), st.integers(0, 60),
                          min_size=1, max_size=30),
    rounds=st.integers(1, 5),
)
def test_redirects_property(spark, pairs, rounds):
    from efficient_graph_algorithms_spark.operators.redirects import (
        resolve_redirects,
    )
    from tests.test_redirects import mirror_doubling

    red = spark.createDataFrame(
        [(int(k), int(v)) for k, v in pairs.items()], "id long, target long"
    )
    out, _ = resolve_redirects(spark, red, rounds=rounds)
    got = {r["id"]: (r["terminal"], r["hops"], r["resolved"]) for r in out.collect()}
    assert got == mirror_doubling(pairs, rounds)
