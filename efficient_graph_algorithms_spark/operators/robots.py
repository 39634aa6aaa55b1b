"""robots.txt crawl-permission matching (RFC 9309 / Google REP).

The politeness layer above the crawl frontier: given each host's
robots.txt body and a url table, decide per url whether the crawler's
user-agent may fetch it.  Frontier sharding (`operators/frontier.py`)
spreads hosts across fetchers; this operator decides what those
fetchers may touch.

Semantics implemented (the RFC 9309 core):

- groups: consecutive ``User-agent:`` lines share the following group
  records (``Allow:``/``Disallow:``/``Crawl-delay:``); ANY group
  record after a ``User-agent:`` line ends that accumulation, so the
  next ``User-agent:`` starts a new group.  ``Sitemap:`` is a
  host-wide record — transparent to grouping.  Both faces of the
  operator (rules and directives) share ONE grouping computation, so
  they can never disagree about which group a line belongs to.
- group selection: if any group names the crawler's agent token
  exactly (case-insensitive), exactly those groups apply; otherwise
  the ``*`` groups apply; a host with neither (or no robots.txt row
  at all) allows everything.
- rule match: patterns are path prefixes with ``*`` (any chars) and a
  trailing ``$`` (end anchor); comments (``#``) stripped; empty
  patterns ignored (an empty Disallow allows all).
- precedence: the LONGEST matching pattern wins (raw pattern length,
  the Google-REP rule); at equal length Allow beats Disallow; no
  matching rule means allowed.

Plan shape — everything stays in JVM whole-stage codegen:
parsing is split/posexplode + regexp_extract per line, group ids are
one running-sum window per (host, line) — robots bodies are small
(crawlers cap them at 500 KiB) so the per-host window is bounded;
matching is one equi-join urls ⋈ rules on host followed by a per-url
ranking window.  Hot hosts fan out rules-per-host times, which is
bounded by the robots size cap, never by the corpus.  No Python in
the path: the ``RLIKE`` pattern column is compiled JVM-side per rule.

No counterpart in ``reference src/ega``; engine extension in the
§2.12 web-pipeline family (frontier/Bloom/redirects siblings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# escape every regex metacharacter EXCEPT * (wildcard); $ is escaped
# too — the TRAILING anchor is stripped before escaping and re-appended
# raw, so only interior (literal, per the REP) dollars reach this
_ESCAPE_RX = r"([.^+?(){}\[\]|\\$])"

# records that belong to (and delimit) user-agent groups
_GROUP_KEYS = ("user-agent", "allow", "disallow", "crawl-delay")


def _kv_lines(
    robots: DataFrame, host_col: str, body_col: str, keys: tuple[str, ...]
) -> DataFrame:
    """(host, ln, key, val) per recognized robots.txt line."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        # CRLF/CR/LF all terminate lines (lone \r included — Java's
        # dot treats \r as a terminator, so letting it survive into a
        # line would make ':(.*)$' silently fail on that line)
        F.posexplode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), r"\r\n|\r|\n")
        ).alias("ln", "raw"),
    )
    strip_ws = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")  # noqa: E731
    return lines.select(
        "host",
        "ln",
        F.lower(
            F.regexp_extract(F.col("raw"), r"^\s*([A-Za-z-]+)\s*:", 1)
        ).alias("key"),
        # value: after the first colon, comment-stripped, whitespace-stripped
        strip_ws(
            F.regexp_replace(
                F.regexp_extract(F.col("raw"), r":(.*)$", 1), "#.*$", ""
            )
        ).alias("val"),
    ).where(F.col("key").isin(*keys))


def _grouped_chosen(
    gkv: DataFrame, agent: str
) -> tuple[DataFrame, DataFrame]:
    """Group ids over the group-record stream + the applicable groups.

    gkv must contain exactly the ``_GROUP_KEYS`` records (sitemap and
    junk already dropped).  Returns (grouped, chosen): grouped is gkv
    plus a ``gid`` column; chosen is the (host, gid) set that applies
    to ``agent`` — exact-token groups when the host has any, else the
    ``*`` groups.
    """
    w = Window.partitionBy("host").orderBy("ln")
    grouped = gkv.select(
        "host",
        "key",
        "val",
        F.sum(
            # a user-agent line NOT preceded by another user-agent line
            # opens a new group — any group record in between ends the
            # previous accumulation
            F.when(
                (F.col("key") == "user-agent")
                & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent"),
                1,
            ).otherwise(0)
        )
        .over(w)
        .alias("gid"),
    )
    uas = grouped.where(F.col("key") == "user-agent").select(
        "host", "gid", F.lower(F.col("val")).alias("ua")
    )
    chosen = (
        uas.where(F.col("ua").isin(agent, "*"))
        .groupBy("host", "gid")
        .agg(F.max(F.when(F.col("ua") == agent, 1).otherwise(0)).alias("spec"))
        .withColumn("best", F.max("spec").over(Window.partitionBy("host")))
        .where(F.col("spec") == F.col("best"))
        .select("host", "gid")
    )
    return grouped, chosen


def parse_robots(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into the applicable rule table.

    robots: one row per host with the raw robots.txt body.  Returns
    (host, pattern, is_allow, plen, rx) — only the rules of the
    groups that apply to ``user_agent`` (exact-token groups when the
    host has any, else the ``*`` groups), empty patterns dropped,
    ``rx`` the anchored regex translation of the pattern.
    """
    agent = user_agent.strip().lower()
    gkv = _kv_lines(robots, host_col, body_col, _GROUP_KEYS)
    grouped, chosen = _grouped_chosen(gkv, agent)

    rules = (
        grouped.where(F.col("key").isin("allow", "disallow") & (F.col("val") != ""))
        .join(chosen, ["host", "gid"])
        .select(
            "host",
            F.col("val").alias("pattern"),
            (F.col("key") == "allow").cast("int").alias("is_allow"),
            F.length("val").alias("plen"),
        )
        .distinct()
    )
    anchored = F.col("pattern").endswith("$")
    body = F.when(anchored, F.expr("substring(pattern, 1, length(pattern) - 1)")).otherwise(
        F.col("pattern")
    )
    rx_body = F.regexp_replace(
        F.regexp_replace(body, _ESCAPE_RX, r"\\$1"), r"\*", ".*"
    )
    return rules.select(
        "host",
        "pattern",
        "is_allow",
        "plen",
        F.concat(
            F.lit("^"), rx_body, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
        ).alias("rx"),
    )


def robots_directives(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Non-rule REP directives: per-host ``Crawl-delay`` and ``Sitemap``.

    Returns (host, crawl_delay, sitemaps): crawl_delay is the MINIMUM
    delay (seconds, double) across the groups that apply to
    ``user_agent`` — grouping computed identically to ``parse_robots``,
    so a delay declared in another agent's group is never inherited
    (NULL when none is declared in an applicable group or the value
    isn't numeric); sitemaps is the sorted distinct list of
    ``Sitemap:`` urls, which are host-wide per the REP (they neither
    belong to nor split groups). Feeds the frontier politeness layer
    (`operators/frontier.py`) and crawl discovery.
    """
    agent = user_agent.strip().lower()
    kv = _kv_lines(robots, host_col, body_col, _GROUP_KEYS + ("sitemap",))

    sitemaps = (
        kv.where((F.col("key") == "sitemap") & (F.col("val") != ""))
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("val")).alias("sitemaps"))
    )

    grouped, chosen = _grouped_chosen(
        kv.where(F.col("key") != "sitemap"), agent
    )
    delays = (
        grouped.where(F.col("key") == "crawl-delay")
        .join(chosen, ["host", "gid"])
        .groupBy("host")
        .agg(F.min(F.col("val").try_cast("double")).alias("crawl_delay"))
    )

    hosts = robots.select(F.col(host_col).alias("host")).distinct()
    return (
        hosts.join(delays, "host", "left")
        .join(sitemaps, "host", "left")
        .select("host", "crawl_delay", "sitemaps")
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-url crawl verdicts against a parsed rule table.

    urls: (url, host, path) — ``url`` must be unique (it keys the
    ranking window).  Returns (url, host, path, allowed, matched_rule)
    where matched_rule is the winning pattern (NULL when no rule
    matched and the default-allow applied).
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(path_col).alias("path"),
    )
    matches = u.join(rules, "host").where(F.expr("path RLIKE rx"))
    w = Window.partitionBy("url").orderBy(
        F.desc("plen"), F.desc("is_allow"), F.asc("pattern")
    )
    winner = (
        matches.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("url", "is_allow", "pattern")
    )
    # urls whose host has no applicable rules — or none that match —
    # fall through to the default allow via this left join
    return u.join(winner, "url", "left").select(
        "url",
        "host",
        "path",
        F.coalesce(F.col("is_allow"), F.lit(1)).cast("int").alias("allowed"),
        F.col("pattern").alias("matched_rule"),
    )
