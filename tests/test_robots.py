"""robots.txt parsing + politeness filter (ops/robots.py)."""

from pyspark.sql import functions as F

from html_parser_spark.ops.robots import parse_robots, robots_filter, robots_verdict

ROBOTS = """# corpus crawler policy
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 10

User-agent: badbot
Disallow: /
"""


def _rules(spark, bodies):
    df = spark.createDataFrame(bodies, ["host", "body"])
    return parse_robots(df)


def test_parse_groups_and_directives(spark):
    rows = {
        (r["agent"], r["rule"], r["path_prefix"])
        for r in _rules(spark, [("a.com", ROBOTS)]).collect()
    }
    assert rows == {
        ("*", "disallow", "/private"),
        ("*", "allow", "/private/ok"),
        ("badbot", "disallow", "/"),
    }


def test_parse_edge_cases(spark):
    body = (
        "USER-AGENT: Mixed\n"
        "DisAllow: /x  # trailing comment\n"
        "Disallow:\n"          # empty value: not a rule
        "Allow: /x/y\n"
        "orphan-line\n"
        "Sitemap: https://a.com/map.xml\n"
    )
    rows = {
        (r["agent"], r["rule"], r["path_prefix"])
        for r in _rules(spark, [("a.com", body)]).collect()
    }
    assert rows == {("mixed", "disallow", "/x"), ("mixed", "allow", "/x/y")}
    # rules before any user-agent line are dropped (no group)
    headless = _rules(spark, [("b.com", "Disallow: /early\nUser-agent: *\nDisallow: /late")])
    assert {(r["agent"], r["path_prefix"]) for r in headless.collect()} == {("*", "/late")}


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_verdict_longest_match_and_allow_tiebreak(spark):
    rules = _rules(spark, [("a.com", ROBOTS)])
    pages = _pages(
        spark,
        [
            "https://a.com/public/x",       # no match -> allowed
            "https://a.com/private/x",      # /private disallow
            "https://a.com/private/ok/x",   # longer allow wins
            "https://a.com/",               # root, no match
            "https://other.com/private/x",  # host has no rules
        ],
    )
    got = {r["url"]: r["allowed"] for r in robots_verdict(pages, rules).collect()}
    assert got == {
        "https://a.com/public/x": 1,
        "https://a.com/private/x": 0,
        "https://a.com/private/ok/x": 1,
        "https://a.com/": 1,
        "https://other.com/private/x": 1,
    }


def test_agent_selection(spark):
    rules = _rules(spark, [("a.com", ROBOTS)])
    pages = _pages(spark, ["https://a.com/anything"])
    assert robots_filter(pages, rules, agent="badbot").count() == 0
    assert robots_filter(pages, rules, agent="*").count() == 1


def test_agent_wildcard_fallback_rfc9309(spark):
    """An agent with no group on a host falls back to that host's '*'
    group (RFC 9309 §2.2.1); on a host that DOES define the agent's
    group, only that group applies — never a merge with '*'."""
    rules = _rules(
        spark,
        [
            # a.com: only a wildcard group
            ("a.com", "User-agent: *\nDisallow: /private"),
            # b.com: goodbot group allows what the wildcard group blocks
            (
                "b.com",
                "User-agent: *\nDisallow: /\n\n"
                "User-agent: goodbot\nDisallow: /secret",
            ),
        ],
    )
    pages = _pages(
        spark,
        [
            "https://a.com/private/x",  # via fallback to a.com's '*'
            "https://a.com/open",
            "https://b.com/anything",   # goodbot group, not '*': allowed
            "https://b.com/secret/x",   # goodbot group disallow
        ],
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_verdict(pages, rules, agent="goodbot").collect()
    }
    assert got == {
        "https://a.com/private/x": 0,
        "https://a.com/open": 1,
        "https://b.com/anything": 1,
        "https://b.com/secret/x": 0,
    }


def test_filter_schema_preserving_no_window_over_pages(spark):
    rules = _rules(spark, [("a.com", ROBOTS)])
    pages = _pages(spark, ["https://a.com/private/x", "https://a.com/ok"])
    out = robots_filter(pages, rules)
    assert out.columns == ["url"]
    assert [r["url"] for r in out.collect()] == ["https://a.com/ok"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only Window is inside rule parsing (per-host robots lines);
    # the pages side must see joins + partial aggs, never a pages window
    assert "CartesianProduct" not in plan


def test_extract_job_robots_gate(spark, tmp_path, capsys):
    """--robots drops disallowed pages before the parse stage."""
    import json

    from pyspark.sql import functions as F

    import jobs.extract_job as ej
    from html_parser_spark.data.pages import synthetic_pages_df

    pages = synthetic_pages_df(
        spark, "/root/testdata/sf0.001", paragraphs=1
    ).limit(20)
    # synthetic urls share one host; block half the paths by prefix
    host = pages.select(
        F.parse_url("url", F.lit("HOST")).alias("h")
    ).first()["h"]
    some_paths = [
        r["p"] for r in pages.select(
            F.parse_url("url", F.lit("PATH")).alias("p")
        ).collect()
    ]
    blocked = sorted(set(some_paths))[:10]
    body = "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in blocked)
    robots_dir = str(tmp_path / "robots")
    spark.createDataFrame([(host, body)], ["host", "body"]).write.parquet(robots_dir)

    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    out = str(tmp_path / "results")
    ej.main([
        "--pages", src, "--output", out, "--partitions", "4",
        "--robots", robots_dir,
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == 20 - len(set(blocked) & set(some_paths))


def test_crawl_delays_and_fetch_plan(spark):
    """Crawl-delay extraction with RFC 9309 group selection + the per-host
    politeness cost model."""
    from html_parser_spark.ops.robots import crawl_delays, fetch_plan

    rules = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 10\nDisallow: /x"),
            # agent group beats wildcard; fractional rounds UP; the max of
            # several lines in the winning group is kept
            ("b.com", "User-agent: bot\nCrawl-delay: 2.5\nCrawl-delay: 4\n\n"
                      "User-agent: *\nCrawl-delay: 9"),
            ("c.com", "User-agent: *\nCrawl-delay: nonsense"),
        ],
        ["host", "body"],
    )
    got = {r["host"]: r["crawl_delay_sec"]
           for r in crawl_delays(rules, agent="bot").collect()}
    assert got == {"a.com": 10, "b.com": 4}  # c.com: unparsable -> absent

    pages = spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("a.com", "b.com", "d.com")
         for i in range(3)],
        ["url"],
    )
    plan = {r["host"]: r for r in
            fetch_plan(pages, crawl_delays(rules, agent="bot")).collect()}
    assert plan["a.com"]["est_fetch_sec"] == 30
    assert plan["b.com"]["est_fetch_sec"] == 12
    assert plan["d.com"]["crawl_delay_sec"] == 1  # no robots row -> default
    assert plan["d.com"]["est_fetch_sec"] == 3


def test_group_presence_from_declared_user_agent_lines(spark):
    """RFC 9309: a declared agent group exists even when none of its
    directives survive parsing.  'User-agent: mybot\\nDisallow:' is a
    group that allows everything — with the robots_groups channel mybot
    must NOT fall back to the '*' group's Disallow: /."""
    from html_parser_spark.ops.robots import robots_groups

    bodies = spark.createDataFrame(
        [("a.com", "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /")],
        ["host", "body"],
    )
    rules, groups = parse_robots(bodies), robots_groups(bodies)
    pages = _pages(spark, ["https://a.com/anything"])
    exact = robots_verdict(pages, rules, agent="mybot", groups=groups)
    assert exact.first()["allowed"] == 1
    # without the channel the rule-less group is invisible (documented
    # approximation): fallback to '*' blocks the page
    approx = robots_verdict(pages, rules, agent="mybot")
    assert approx.first()["allowed"] == 0
    # '*' itself is blocked either way
    assert robots_verdict(pages, rules).first()["allowed"] == 0


def test_crawl_delay_group_isolation_rfc9309(spark):
    """An agent whose declared group has rules but no Crawl-delay gets NO
    delay — groups apply whole; the '*' group's delay must not leak in."""
    from html_parser_spark.ops.robots import crawl_delays

    bodies = spark.createDataFrame(
        [("b.com", "User-agent: mybot\nDisallow: /x\n\n"
                   "User-agent: *\nCrawl-delay: 10")],
        ["host", "body"],
    )
    assert crawl_delays(bodies, agent="mybot").count() == 0
    got = {r["host"]: r["crawl_delay_sec"]
           for r in crawl_delays(bodies, agent="otherbot").collect()}
    assert got == {"b.com": 10}  # no declared group -> '*' fallback


def test_robots_sitemaps_group_independent(spark):
    """Sitemap: lines surface regardless of User-agent group position,
    case, indentation, and inline comments; hosts without one yield no
    rows."""
    from html_parser_spark.ops.robots import robots_sitemaps

    rows = [
        ("a.org", "User-agent: x\nDisallow: /\nSitemap: https://a.org/s.xml"),
        ("b.org", "sitemap: https://b.org/1.xml # main\n  SITEMAP:https://b.org/2.xml"),
        ("c.org", "User-agent: *\nDisallow: /p\n# Sitemap: https://c.org/no.xml"),
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    got = sorted(
        (r["host"], r["sitemap_url"]) for r in robots_sitemaps(df).collect()
    )
    assert got == [
        ("a.org", "https://a.org/s.xml"),
        ("b.org", "https://b.org/1.xml"),
        ("b.org", "https://b.org/2.xml"),
    ]
