"""robots.txt matching: Spark operator vs a pure-Python RFC 9309
mirror over bodies exercising groups, UA selection, longest-match,
allow-tie, wildcards, $ anchors, comments, empty patterns, orphan
rules, and hosts with no robots at all."""

from __future__ import annotations

import re

import pytest

from efficient_graph_algorithms_spark.operators.robots import (
    parse_robots,
    robots_filter,
)

ROBOTS = {
    "hostA": (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow: /*.json$\n"
        "# full-line comment\n"
        "Disallow:\n"
    ),
    "hostB": (
        "User-agent: googlebot\n"
        "User-agent: EGAbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /tmp\n"
    ),
    "hostD": (
        "Disallow: /orphan\n"  # before any group: ignored
        "User-agent: EGAbot\n"
        "Allow: /a$\n"
        "Disallow: /a  # trailing comment\n"
    ),
    "hostE": "User-agent: *\r\nDisallow: /crlf\r\n",  # CRLF body
}

URLS = [
    ("a1", "hostA", "/private/x"),
    ("a2", "hostA", "/private/ok/y"),
    ("a3", "hostA", "/data.json"),
    ("a4", "hostA", "/other"),
    ("a5", "hostA", "/private.json"),
    ("b1", "hostB", "/anything"),
    ("b2", "hostB", "/tmp/x"),
    ("b3", "hostB", "/zzz"),
    ("c1", "hostC", "/no/robots/here"),  # host absent from ROBOTS
    ("d1", "hostD", "/a"),
    ("d2", "hostD", "/ab"),
    ("d3", "hostD", "/orphan/x"),
    ("e1", "hostE", "/crlf/x"),
    ("e2", "hostE", "/fine"),
]


def mirror_parse(body: str, agent: str):
    agent = agent.lower()
    entries = []
    for raw in re.split(r"\r\n|\r|\n", body or ""):
        m = re.match(r"^\s*([A-Za-z-]+)\s*:", raw)
        if not m:
            continue
        key = m.group(1).lower()
        val = re.sub("#.*$", "", re.search(r":(.*)$", raw).group(1)).strip()
        # crawl-delay is a group record too: it ends a user-agent
        # accumulation even though it contributes no rule
        if key in ("user-agent", "allow", "disallow", "crawl-delay"):
            entries.append((key, val))
    groups, prev = [], ""
    for key, val in entries:
        if key == "user-agent":
            if prev != "user-agent":
                groups.append(([], []))
            groups[-1][0].append(val.lower())
        elif groups and key in ("allow", "disallow"):
            groups[-1][1].append((val, key == "allow"))
        prev = key
    sel = [g for g in groups if agent in g[0]]
    if not sel:
        sel = [g for g in groups if "*" in g[0]]
    return {(p, al) for g in sel for (p, al) in g[1] if p}


def mirror_match(rules, path: str):
    best = None
    for p, al in rules:
        anchored = p.endswith("$")
        body = p[:-1] if anchored else p
        rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
        if re.search(rx, path):
            cand = (len(p), 1 if al else 0, p)
            if best is None:
                better = True
            else:
                better = (cand[0], cand[1]) > (best[0], best[1]) or (
                    (cand[0], cand[1]) == (best[0], best[1]) and cand[2] < best[2]
                )
            if better:
                best = cand
    if best is None:
        return 1, None
    return best[1], best[2]


@pytest.mark.parametrize("agent", ["egabot", "otherbot", "*"])
def test_robots_match_mirror(spark, agent):
    robots = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    )
    urls = spark.createDataFrame(URLS, "url string, host string, path string")
    rules = parse_robots(robots, user_agent=agent)
    got = {
        r["url"]: (r["allowed"], r["matched_rule"])
        for r in robots_filter(urls, rules).collect()
    }
    assert len(got) == len(URLS)  # no url may vanish
    for url, host, path in URLS:
        want = mirror_match(mirror_parse(ROBOTS.get(host, ""), agent), path)
        assert got[url] == want, (url, agent, got[url], want)


def test_robots_directives(spark):
    from efficient_graph_algorithms_spark.operators.robots import (
        robots_directives,
    )

    bodies = {
        "h1": (
            "Sitemap: https://h1/s1.xml\n"
            "User-agent: EGAbot\n"
            "Crawl-delay: 2.5\n"
            "User-agent: *\n"
            "Crawl-delay: 10\n"
            "Sitemap: https://h1/s0.xml\n"  # host-wide, position-independent
        ),
        "h2": (
            "User-agent: *\n"
            "Crawl-delay: 7\n"
            "Crawl-delay: 3\n"  # several in one group: min wins
        ),
        "h3": "User-agent: *\nDisallow: /x\n",  # no directives
        "h4": "User-agent: *\nCrawl-delay: fast\n",  # non-numeric -> NULL
        # the delay belongs to rudebot's group (the Disallow line ends
        # egabot's accumulation) — egabot must NOT inherit it
        "h5": (
            "User-agent: egabot\n"
            "Disallow: /a\n"
            "User-agent: rudebot\n"
            "Crawl-delay: 600\n"
        ),
    }
    robots = spark.createDataFrame(
        list(bodies.items()), "host string, robots_txt string"
    )
    got = {
        r["host"]: (r["crawl_delay"], r["sitemaps"])
        for r in robots_directives(robots, user_agent="egabot").collect()
    }
    assert got["h1"] == (2.5, ["https://h1/s0.xml", "https://h1/s1.xml"])
    assert got["h2"] == (3.0, None)
    assert got["h3"] == (None, None)
    assert got["h4"] == (None, None)
    assert got["h5"] == (None, None)  # rudebot's delay is not egabot's
    # star agent picks the * group's delay on h1
    star = {
        r["host"]: r["crawl_delay"]
        for r in robots_directives(robots, user_agent="*").collect()
    }
    assert star["h1"] == 10.0


def test_robots_expected_verdicts(spark):
    """Spot-check the headline semantics directly (not via the mirror)."""
    robots = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    )
    urls = spark.createDataFrame(URLS, "url string, host string, path string")
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, parse_robots(robots, "egabot")).collect()
    }
    assert got == {
        "a1": 0,  # /private
        "a2": 1,  # Allow /private/ok is longer
        "a3": 0,  # /*.json$
        "a4": 1,  # no rule
        "a5": 0,  # /private and /*.json$ both disallow
        "b1": 0,  # specific group: Disallow /
        "b2": 0,  # the * group does NOT soften a specific match
        "b3": 0,
        "c1": 1,  # no robots.txt: allowed
        "d1": 1,  # Allow /a$ beats Disallow /a (longer)
        "d2": 0,  # anchor doesn't match /ab; Disallow /a does
        "d3": 1,  # orphan rule ignored
        "e1": 0,  # CRLF body parses cleanly
        "e2": 1,
    }
