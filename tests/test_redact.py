"""PII/link redaction: pattern behavior, stage order, and the no-UDF
plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.functions.text import redact


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_redacts_each_kind(spark):
    out = redact(_df(spark, [
        (1, "see https://ex.org/a?x=1 or mail bob.smith+x@ex.co.uk now"),
        (2, "call +1 555 123 4567 or 020-7946-0958 today"),
        (3, "nothing to scrub here"),
    ])).collect()
    by = {r.doc_id: r for r in out}
    assert by[1].redacted == "see <URL> or mail <EMAIL> now"
    assert (by[1].n_urls, by[1].n_emails, by[1].n_phones) == (1, 1, 0)
    assert by[2].redacted == "call <PHONE> or <PHONE> today"
    assert (by[2].n_urls, by[2].n_emails, by[2].n_phones) == (0, 0, 2)
    assert by[3].redacted == "nothing to scrub here"
    assert (by[3].n_urls, by[3].n_emails, by[3].n_phones) == (0, 0, 0)


def test_stage_order_email_inside_url_is_one_url(spark):
    """mailto-style addresses embedded in a URL are consumed by the URL
    stage; the email count sees the already-redacted string."""
    out = redact(_df(spark, [
        (1, "go https://ex.org/u/alice@ex.org/profile then stop"),
    ])).collect()[0]
    assert out.redacted == "go <URL> then stop"
    assert (out.n_urls, out.n_emails, out.n_phones) == (1, 0, 0)


def test_plan_is_jvm_only(spark):
    plan = redact(_df(spark, [(1, "x")]))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_token_count_known_values(spark):
    """BPE-ish pre-tokenizer count: contractions split, punctuation
    runs group, whitespace runs collapse to one match."""
    from rdf_n3_spark.functions.text import token_stats

    docs = spark.createDataFrame(
        [(1, "don't stop believing"), (2, "hello,world!!!  multi  spaces")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in token_stats(docs).collect()}
    # don / 't / " stop" / " believing"
    assert got[1] == 4
    # hello / ,world (→ "," then "world"? no: " ?[^..]+" takes ",", then
    # "world") / !!! / "  " / " multi"→... exact count pinned by probe
    assert got[2] == 8
