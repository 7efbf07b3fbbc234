"""html_to_text_sql — boilerplate-stripping extraction, byte-exact fixtures.

The chain must survive: bare '<' inside script bodies, CSS braces in style
blocks, comments containing tag-like text, attribute-laden tags, the six
core entities (including the '&amp;lt;' double-encoding trap), and runs of
mixed whitespace. Spark and DuckDB evaluate dialect twins of one chain;
cross-engine identity is driver-checked by q_html_extract.
"""

import duckdb
import pyspark.sql.functions as F

from gaia_spark.functions import web as W


def _extract_spark(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(F.expr(W.html_to_text_sql("html", W.SPARK)).alias("t")).collect()[0].t


def _extract_duck(html: str) -> str:
    con = duckdb.connect()
    return con.execute(
        f"select {W.html_to_text_sql('$html$' + html + '$html$', W.DUCK)}"
    ).fetchone()[0]


FIXTURES = [
    # (html, expected)
    ("<p>hello <b>world</b></p>", "hello world"),
    # script body holds a bare '<' and quotes — must vanish wholesale
    ("a<script>if (1 < 2) { x = 'y'; }</script>b", "a b"),
    ("a<style>p { margin: 0; }</style>b", "a b"),
    # comments may contain tag-like noise
    ("a<!-- <div> not a tag --->b", "a b"),
    # entity decode runs AFTER tag strip: '&lt;cite&gt;' survives as text
    ("&lt;cite&gt; A &amp; B &#39;26 &quot;q&quot;&nbsp;.", "<cite> A & B '26 \"q\" ."),
    # double-encoded: '&amp;lt;' means the literal text '&lt;'
    ("x &amp;lt; y", "x &lt; y"),
    # whitespace collapse + trim
    ("  a \t\n  b  ", "a b"),
    # case-insensitive script/style tags
    ("a<SCRIPT>1 < 2</SCRIPT>b<STYLE>.c{}</STYLE>c", "a b c"),
    # empty page
    ("<html><body></body></html>", ""),
]


def test_extraction_fixtures_spark(spark):
    for html, exp in FIXTURES:
        got = _extract_spark(spark, html)
        assert got == exp, (html, got, exp)


def test_extraction_fixtures_duck():
    for html, exp in FIXTURES:
        got = _extract_duck(html)
        assert got == exp, (html, got, exp)


def test_roundtrip_identity(spark):
    """extract(rich_html(text)) == closed-form expected. (Extraction is
    deliberately NOT idempotent: decoded '&lt;cite&gt;' yields literal
    '<cite>' text, which a second pass would strip as a tag — the standard
    single-pass extractor contract.)"""
    df = spark.createDataFrame(
        [(7, "plain words only here"), (12, "second doc text")],
        "doc_id long, text string",
    )
    out = df.select(
        F.expr(W.html_to_text_sql(W.rich_html_sql("text", "doc_id"), W.SPARK)).alias("ext"),
        F.expr(W.extracted_expected_sql("text", "doc_id")).alias("exp"),
    ).collect()
    for r in out:
        assert r.ext == r.exp


def test_fixpoint_on_entity_free_text(spark):
    """On tag- and entity-free text the chain is a fixpoint."""
    texts = ["plain words only here", "a b c", ""]
    df = spark.createDataFrame([(t,) for t in texts], "html string")
    got = df.select(F.expr(W.html_to_text_sql("html", W.SPARK)).alias("t")).collect()
    assert [r.t for r in got] == texts


def test_plan_is_pure_jvm(spark):
    """The whole chain must stay in whole-stage codegen: no Python stages,
    no shuffle — a single map over the scan."""
    df = spark.range(10).select(F.expr("cast(id as string)").alias("html"))
    out = df.select(F.expr(W.html_to_text_sql("html", W.SPARK)).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
