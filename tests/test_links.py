"""Link extraction + host link graph — closed-form anchors, dangling docs,
and the composed PageRank-over-extracted-edges pipeline."""

import pyspark.sql.functions as F

from gaia_spark.functions import web as W


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_extract_links_closed_form(spark):
    """doc_id=1 (host h1, not dangling): three anchors at hosts
    (1·3+0)%97=3, (1·4+1)%97=5, (1·5+2)%97=7 plus the self link."""
    d = _docs(spark, [(1, "hello world")])
    links = (
        d.select(F.explode(F.expr(W.extract_links_sql(W.linked_html_sql("text", "doc_id")))).alias("l"))
        .select(F.expr(W.host_sql("l")).alias("h"))
        .collect()
    )
    assert [r.h for r in links] == [
        "h3.example.com",
        "h5.example.com",
        "h7.example.com",
        "h1.example.com",
    ]


def test_dangling_docs_emit_no_links(spark):
    """Hosts ≡ 0 (mod 10) have no anchors — doc ids 0, 10, 97 (host 0)."""
    d = _docs(spark, [(0, "a"), (10, "b"), (97, "c"), (11, "d")])
    n = (
        d.select(
            F.size(F.expr(W.extract_links_sql(W.linked_html_sql("text", "doc_id")))).alias("n"),
            "doc_id",
        )
        .collect()
    )
    got = {r.doc_id: r.n for r in n}
    assert got[0] == 0 and got[10] == 0 and got[97] == 0 and got[11] == 4


def test_pagerank_over_extracted_edges_mass_conservation(spark):
    """The composed pipeline conserves rank mass (Σ rank = 1 ± e12 float
    dust) and every node gets at least the teleport floor."""
    from gaia_spark.operators.graph import pagerank

    d = _docs(spark, [(i, "x") for i in range(60)])
    h = d.select("doc_id", F.expr(W.linked_html_sql("text", "doc_id")).alias("html"))
    edges = (
        h.select(
            F.expr("'h' || cast(doc_id % 97 as string) || '.example.com'").alias("src"),
            F.explode(F.expr(W.extract_links_sql("html"))).alias("l"),
        )
        .select("src", F.expr(W.host_sql("l")).alias("dst"))
        .distinct()
    )
    pr = pagerank(edges, iters=3).collect()
    total = sum(r.rank for r in pr)
    n = len(pr)
    assert abs(total - 1.0) < 1e-6
    assert all(r.rank >= 0.15 / n - 1e-12 for r in pr)


# --- anchor-text aggregation ---------------------------------------------------


def test_anchor_text_agg_closed_form(spark):
    """Hand-built pages: host a gets anchors x, x, y → majority x(2),
    variety 2, n 3; host b gets y, z (tie) → majority y (smaller text)."""
    pages = spark.createDataFrame(
        [
            (1, '<a href="http://a/1">x</a><a href="http://b/1">y</a>'),
            (2, '<a href="http://a/2">x</a><a href="http://a/3">y</a>'
                '<a href="http://b/2">z</a>'),
        ],
        "doc_id long, html string",
    )
    got = {r.host: r for r in W.anchor_text_agg(pages).collect()}
    assert got["a"].n_anchors == 3 and got["a"].variety == 2
    assert got["a"].top_anchor == "x" and got["a"].top_anchor_n == 2
    assert got["b"].n_anchors == 2 and got["b"].variety == 2
    assert got["b"].top_anchor == "y" and got["b"].top_anchor_n == 1


def test_anchor_text_skips_malformed_and_dangling(spark):
    """Unquoted hrefs, anchors with nested tags, and anchorless pages all
    fall out of the pair extraction instead of corrupting it."""
    pages = spark.createDataFrame(
        [
            (1, "<a href=http://u/1>u</a><p>no anchors here</p>"),
            (2, '<a href="http://v/1"><b>bold</b></a><a href="http://v/2">ok</a>'),
        ],
        "doc_id long, html string",
    )
    got = {r.host: r for r in W.anchor_text_agg(pages).collect()}
    assert set(got) == {"v"} and got["v"].n_anchors == 1
    assert got["v"].top_anchor == "ok"


# --- blocklist filtering ---------------------------------------------------------


def test_blocklist_suffix_semantics(spark):
    """'bad.example' blocks itself AND subdomains, never 'notbad.example';
    two matching rules resolve to the lexicographically first."""
    pages = spark.createDataFrame(
        [
            ("https://bad.example/a",),
            ("https://www.bad.example/b",),
            ("https://notbad.example/c",),
            ("https://deep.www.bad.example/d",),
            ("https://ok.example/e",),
        ],
        "url string",
    )
    out = {
        r.url: r.blocked_by
        for r in W.blocklist_filter(
            pages, ["bad.example", "www.bad.example"]
        ).collect()
    }
    assert out["https://bad.example/a"] == "bad.example"
    assert out["https://www.bad.example/b"] == "bad.example"  # first rule wins
    assert out["https://deep.www.bad.example/d"] == "bad.example"
    assert out["https://notbad.example/c"] is None
    assert out["https://ok.example/e"] is None


def test_host_suffixes_sql_both_dialects():
    import duckdb

    from gaia_spark.functions import portable as P

    got = duckdb.sql(
        f"SELECT {W.host_suffixes_sql(chr(39) + 'a.b.c' + chr(39), P.DUCK)} AS s"
    ).fetchone()[0]
    assert got == ["a.b.c", "b.c", "c"]


def test_robots_longest_match_semantics(spark):
    from gaia_spark.functions.web import robots_verdicts

    urls = spark.createDataFrame(
        [("https://a.ex/r/3x",), ("https://a.ex/r/31",), ("https://a.ex/ok",),
         ("https://b.ex/r/3",), ("https://a.ex/r/31/deep",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("a.ex", "disallow", "/r/3"), ("a.ex", "allow", "/r/31"),
         ("a.ex", "allow", "/r/3")],  # tie with disallow /r/3 -> disallow wins
        "host string, rule_type string, path_prefix string",
    )
    out = {r.url: (r.verdict, r.matched_rule) for r in
           robots_verdicts(urls, rules).collect()}
    assert out["https://a.ex/r/3x"] == ("disallow", "/r/3")     # tie -> disallow
    assert out["https://a.ex/r/31"] == ("allow", "/r/31")        # longer allow
    assert out["https://a.ex/r/31/deep"] == ("allow", "/r/31")
    assert out["https://a.ex/ok"] == ("allow", None)             # no match
    assert out["https://b.ex/r/3"] == ("allow", None)            # no rules host


def test_host_concentration_closed_forms(spark):
    import math

    from gaia_spark.functions.web import host_concentration

    # perfectly equal: 4 hosts x 10 docs -> Gini = (2*(1+2+3+4)*10 - 5*40)
    # / (4*40) = (200-200)/160 = 0; HHI = 4*100/1600 = 0.25; H = ln 4
    eq = spark.createDataFrame(
        [(f"h{i}", 10) for i in range(4)], "host string, n_docs long"
    )
    r = host_concentration(eq).collect()[0]
    assert (r.n_hosts, r.n_total, r.gini_e6) == (4, 40, 0)
    assert r.hhi_e6 == 250_000
    ent = math.log(40) - (4 * math.floor(10 * math.log(10) * 1e4 + 0.5)) / (1e4 * 40)
    assert r.entropy_e4 == math.floor(ent * 1e4 + 0.5)

    # total concentration: one host owns everything -> HHI = 1, H = 0
    one = spark.createDataFrame([("h", 50)], "host string, n_docs long")
    r1 = host_concentration(one).collect()[0]
    assert (r1.gini_e6, r1.hhi_e6, r1.entropy_e4) == (0, 1_000_000, 0)

    # skewed two hosts 1 + 99: Gini = (2*(1*1 + 2*99) - 3*100)/(2*100)
    sk = spark.createDataFrame([("a", 1), ("b", 99)], "host string, n_docs long")
    r2 = host_concentration(sk).collect()[0]
    assert r2.gini_e6 == ((2 * (1 + 198) - 300) * 1_000_000) // 200


def test_registered_domain_semantics(spark):
    from gaia_spark.functions.web import registered_domain

    hosts = spark.createDataFrame(
        [("www.site.co.uk",), ("a.b.site.com",), ("site.uk",), ("com",),
         ("x.internal",)],
        "host string",
    )
    sfx = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",)], "suffix string"
    )
    out = {r.host: (r.public_suffix, r.etld1) for r in
           registered_domain(hosts, sfx).collect()}
    assert out["www.site.co.uk"] == ("co.uk", "site.co.uk")  # longest wins
    assert out["a.b.site.com"] == ("com", "site.com")
    assert out["site.uk"] == ("uk", "site.uk")
    assert out["com"] == ("com", None)          # bare suffix unregistrable
    assert out["x.internal"] == (None, None)    # off-list
