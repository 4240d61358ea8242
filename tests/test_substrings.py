"""Exact duplicated-substring spans (substrings.py): semantics on
hand-built corpora + oracle parity at the smoke SF."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rdf_n3_spark.operators.substrings import (
    dup_spans,
    kgram_positions,
    substring_dup_stats,
)
from tests.conftest import SF_SMOKE
from tests.parity import assert_match, duck_run


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_short_docs_emit_no_windows(spark):
    docs = _docs(spark, ["a b c", _words("u", 8)])
    assert kgram_positions(docs, k=8).count() == 1  # only the 8-token doc
    stats = {r["doc_id"]: r for r in substring_dup_stats(docs, k=8).collect()}
    assert stats[0]["dup_tokens"] == 0 and stats[0]["keep"] == 1
    assert len(stats) == 2  # every doc appears, even sub-k ones


def test_cross_doc_passage_found_and_merged(spark):
    # a 12-token passage shared by docs 0 and 1 → 5 overlapping dup
    # 8-gram windows per doc, merged to ONE span of exactly 12 tokens
    passage = _words("p", 12)
    docs = _docs(
        spark,
        [
            _words("a", 10) + " " + passage + " " + _words("b", 10),
            _words("c", 4) + " " + passage,
            _words("z", 30),  # unique filler, no spans
        ],
    )
    spans = sorted(dup_spans(docs, k=8).collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in spans] == [0, 1]
    assert spans[0]["span_start"] == 11 and spans[0]["span_len"] == 12
    assert spans[1]["span_start"] == 5 and spans[1]["span_len"] == 12
    assert spans[1]["span_end"] == 16


def test_within_doc_repetition_counts(spark):
    # the same 8-gram twice inside ONE document is corpus count 2
    block = _words("r", 8)
    docs = _docs(spark, [block + " " + _words("x", 5) + " " + block])
    spans = sorted(dup_spans(docs, k=8).collect(), key=lambda r: r["span_start"])
    assert [(r["span_start"], r["span_end"]) for r in spans] == [(1, 8), (14, 21)]


def test_disjoint_spans_stay_separate(spark):
    # two shared passages with a unique gap → two spans, not one
    p1, p2 = _words("m", 9), _words("n", 9)
    docs = _docs(
        spark,
        [
            p1 + " " + _words("g", 10) + " " + p2,
            p2 + " " + _words("h", 10) + " " + p1,
        ],
    )
    spans = dup_spans(docs, k=8).collect()
    assert len(spans) == 4  # 2 docs × 2 disjoint spans
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r["span_len"])
    assert all(sorted(v) == [9, 9] for v in by_doc.values())


def test_keep_flag_budget(spark):
    # doc 1 is ~all duplicated passage → keep=0 at max_dup_pct=50;
    # doc 2 has the same passage inside 3x unique padding → keep=1
    passage = _words("q", 16)
    docs = _docs(
        spark,
        [passage, passage + " tail", passage + " " + _words("u", 48)],
    )
    stats = {r["doc_id"]: r for r in substring_dup_stats(docs, k=8).collect()}
    assert stats[0]["keep"] == 0 and stats[0]["dup_tokens"] == 16
    assert stats[1]["keep"] == 0
    assert stats[2]["keep"] == 1 and stats[2]["dup_tokens"] == 16


def test_oracle_parity_smoke_sf(spark):
    """Cross-SF parity spot: the driver gate runs sf0.01; this pins
    the same oracle SQL at sf0.001 (catches SF-baked constants)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    oracles = entry_mod.oracle_sql()
    assert_match(
        dup_spans(docs, k=8),
        duck_run(oracles["substring_spans"], SF_SMOKE),
        "substring_spans",
    )
    assert_match(
        substring_dup_stats(docs, k=8, max_dup_pct=50),
        duck_run(oracles["substring_dedup"], SF_SMOKE),
        "substring_dedup",
    )


def test_paragraph_dedup_first_copy_survives(spark):
    """Dolma-style paragraph dedup: corpus-first occurrence of each
    repeated paragraph keeps is_dup=0, every later copy (cross-doc or
    later position in the SAME doc) is 1; blank paragraphs drop."""
    from rdf_n3_spark.operators.curation import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "shared para\nunique one"),
         (2, "other text\nshared para"),
         (3, "shared para\n\n  \nshared para")],  # blanks + self-repeat
        ["doc_id", "text"])
    rows = {(r["doc_id"], r["para_idx"]): r["is_dup"]
            for r in paragraph_dedup(docs).collect()}
    assert rows[(1, 0)] == 0          # corpus-first copy survives
    assert rows[(2, 1)] == 1 and rows[(3, 0)] == 1
    assert rows[(3, 3)] == 1          # same-doc repeat is a dup too
    assert (3, 1) not in rows and (3, 2) not in rows  # blanks dropped
    assert rows[(1, 1)] == 0 and rows[(2, 0)] == 0    # uniques survive
