"""Text-analysis functions for the training-data pipeline: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd; no UDFs) and
engine-portable for the DuckDB oracle. Doubles only come from
single-shape expression trees (ratios of ints), so cross-engine float
equality holds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tiny English stopword list for the n-gram/stopword language heuristic
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")


def tokens(col):
    return F.split(F.lower(col), " ")


#: GPT-2-style pre-tokenizer, restricted to the Java∩RE2 regex subset
#: (no lookaround — the original's trailing-space lookahead is dropped;
#: contractions first so leftmost-first alternation splits "don't" into
#: "don" + "'t" in both engines; whitespace is the EXPLICIT class
#: [ \t\n\x0B\f\r] because \s itself differs — Java's includes vertical
#: tab, RE2's does not). Counting matches of this pattern is the
#: standard cheap proxy for BPE token counts.
_WS = r" \t\n\x0B\f\r"
BPE_TOKEN_RE = (r"'re|'ve|'ll|'[sdmt]| ?[A-Za-z]+| ?[0-9]+"
                + r"| ?[^A-Za-z0-9" + _WS + r"]+|[" + _WS + r"]+")


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens, n_chars, avg_token_len,
    stopword_ratio) — whitespace token count plus the BPE-ish
    pre-tokenizer match count (:data:`BPE_TOKEN_RE`), the pair a
    budget-aware pipeline needs (whitespace for text heuristics,
    BPE-ish for context-length estimates)."""
    t = tokens(F.col("text"))
    n_tok = F.size(t)
    stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return documents.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), F.lit(0)))
        .cast("bigint").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        (
            F.aggregate(t, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x))
            / n_tok
        ).alias("avg_token_len"),
        (stop / n_tok).alias("stopword_ratio"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Deterministic quality score in [0,1]: length sweet-spot +
    stopword-ratio band + token-length sanity — the standard cheap
    pre-filter shape for corpus curation."""
    s = token_stats(documents)
    len_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000), 1.0).otherwise(0.3)
    stop_ok = F.when(
        (F.col("stopword_ratio") >= 0.02) & (F.col("stopword_ratio") <= 0.5), 1.0
    ).otherwise(0.5)
    tok_ok = F.when(
        (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0), 1.0
    ).otherwise(0.5)
    return s.select(
        "doc_id",
        ((len_ok * 0.4) + (stop_ok * 0.3) + (tok_ok * 0.3)).alias("quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-presence language heuristic: 'en' when the English
    stopword ratio clears a threshold, else 'unk'. (The reference
    pipeline treats language-ID as a per-row scalar stage; swapping a
    real n-gram model in changes only this expression.)"""
    s = token_stats(documents)
    return s.select(
        "doc_id",
        F.when(F.col("stopword_ratio") > 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
    )


#: redaction patterns — shared verbatim with the DuckDB oracle, so they
#: must stay inside the Java-regex ∩ RE2 common subset (no lookaround,
#: no backrefs; \S \d and bounded quantifiers are identical in both).
URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d -]{6,}\d"


def redact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted, n_urls, n_emails, n_phones) — PII/link
    scrubbing, the standard pre-training hygiene pass: URLs, then
    emails, then phone-shaped digit runs replaced by typed tokens.

    Pure Column expressions (regexp_replace / regexp_extract_all —
    JVM-side, codegen'd, no UDF), so the pass is a narrow map: no
    shuffle, scales with the scan.  The three stages apply
    SEQUENTIALLY (each count is taken on the previous stage's output),
    which makes the composition order part of the contract — an email
    inside a URL is one <URL>, not a double redaction — and lets the
    DuckDB oracle replay the identical pipeline."""
    # bind each stage once: counts reference the PRIOR stage's string,
    # so an unbound chain would re-run every regex up to 3×
    return (
        documents.select("doc_id", F.col(text_col).alias("__t0"))
        .select("doc_id", "__t0",
                F.regexp_replace("__t0", URL_RE, "<URL>").alias("__t1"),
                F.size(F.regexp_extract_all("__t0", F.lit(URL_RE), F.lit(0)))
                .cast("bigint").alias("n_urls"))
        .select("doc_id", "n_urls",
                F.regexp_replace("__t1", EMAIL_RE, "<EMAIL>").alias("__t2"),
                F.size(F.regexp_extract_all("__t1", F.lit(EMAIL_RE), F.lit(0)))
                .cast("bigint").alias("n_emails"))
        .select("doc_id",
                F.regexp_replace("__t2", PHONE_RE, "<PHONE>").alias("redacted"),
                "n_urls", "n_emails",
                F.size(F.regexp_extract_all("__t2", F.lit(PHONE_RE), F.lit(0)))
                .cast("bigint").alias("n_phones"))
    )


def repetition_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dup_line_frac, dup_word_frac, dup_bigram_frac,
    top_bigram_frac) — Gopher-style within-document repetition
    signals, the standard cheap filter for boilerplate/spam:

    - dup_line_frac / dup_word_frac: fraction of lines / words that
      are repeats of an earlier occurrence — pure Column arithmetic
      over bound split arrays (no shuffle, scales with the scan).
    - dup_bigram_frac / top_bigram_frac: repeated-2-gram fraction and
      most-frequent-2-gram share — these need per-(doc, gram) counts,
      so they go explode → two map-side-combinable groupBys keyed by
      doc_id; an in-array O(n²) count would not survive 100k-token
      documents.  The final join is doc_id-co-partitioned with the
      aggregate's own shuffle.

    All ratios are int/int single divisions, so cross-engine float
    equality with the DuckDB oracle holds bit-for-bit."""
    bound = documents.select(
        "doc_id",
        F.split(F.col(text_col), "\n").alias("__lines"),
        F.split(F.lower(F.col(text_col)), "[ \n]+").alias("__toks"),
    )
    # __lines/__toks are each referenced 2-3× below, so CollapseProject
    # keeps them materialized (see fingerprint's note on the 1-use case)
    per_doc = bound.select(
        "doc_id",
        ((F.size("__lines") - F.size(F.array_distinct("__lines")))
         / F.size("__lines")).alias("dup_line_frac"),
        ((F.size("__toks") - F.size(F.array_distinct("__toks")))
         / F.size("__toks")).alias("dup_word_frac"),
        "__toks",
    )
    bigrams = per_doc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("__toks") - 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, 2)),
            )
        ).alias("bg"),
    )
    bg_stats = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            ((F.sum("c") - F.count(F.lit(1))) / F.sum("c")).alias("dup_bigram_frac"),
            (F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        )
    )
    return per_doc.drop("__toks").join(bg_stats, "doc_id")


def keyword_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, token, tf, df, rank) — top-``k`` keywords per document
    by tf-idf ORDER, computed entirely in exact integers: rank sorts
    by (tf desc, df asc, token asc).  For a fixed document, tf·idf(df)
    is monotone in tf and anti-monotone in df, so this integer sort
    realizes the tf-idf ranking for the dominant tf tier without ever
    materializing a float score — floats are where cross-engine
    (ln/log ulp) and cross-run (sum order) nondeterminism live.

    Scale shape: doc-term counts and document frequencies are both
    map-side-combinable groupBys; the tf←df join is keyed by token
    (vocab-sized right side — AQE turns it into a broadcast when the
    vocab fits, and its skew-join handles stopword-heavy keys
    otherwise); the final per-doc top-k is one window over rows
    already bounded by per-doc distinct vocab."""
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc()
    )
    return (
        tf.join(df, "token")
        .select("doc_id", "token", "tf", "df",
                F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def search_topk(documents: DataFrame, queries: DataFrame, k: int = 10,
                idf_scale: int = 1000) -> DataFrame:
    """(query_id, rank, doc_id, score) — inverted-index retrieval:
    top-``k`` documents per query under integer-exact tf-idf.

    score(q, d) = Σ over distinct query tokens t present in d of
    tf(t, d) · idf_int(t), with idf_int = (N · idf_scale) DIV df(t) —
    exact bigint floor division, so the score (and therefore the
    ranking, tie-broken by doc_id) is bit-identical across engines and
    partitionings; floats (ln-based idf, sum order) are where
    cross-engine nondeterminism lives, exactly as in
    :func:`keyword_topk`.

    Scale shape: tf and df are map-side-combinable groupBys over the
    token explode (one pass, shared); the query-token table is tiny →
    Catalyst broadcasts it into the posting-list join keyed by token;
    the per-(query, doc) score is another partial-aggregated sum; the
    final top-k is one window partitioned by query over rows bounded
    by the query's posting lists.  Stopword-sized posting lists are
    the skew risk at corpus scale — AQE skew-join splits them, and
    retrieval deployments additionally prune query tokens with
    df/N above a cutoff (the idf_int of such tokens rounds toward 0,
    so the ranking they influence is the low-signal tail)."""
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = df.join(F.broadcast(n_docs)).select(
        "token",
        F.expr(f"CAST(n_docs * {idf_scale} AS BIGINT) DIV df").alias("idf_int"),
    )
    qtok = queries.select(
        "query_id",
        F.explode(F.array_distinct(tokens(F.col("qtext")))).alias("token"),
    )
    scored = (
        qtok.join(tf, "token")
        .join(idf, "token")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_int")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select("query_id", F.row_number().over(w).alias("rank"),
                      "doc_id", "score")
        .where(F.col("rank") <= k)
    )


def search_bm25(documents: DataFrame, queries: DataFrame, k: int = 10,
                k1_milli: int = 1200, b_milli: int = 750,
                idf_scale: int = 1000) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-``k`` retrieval beside
    the plain tf-idf :func:`search_topk`, computed entirely in exact
    bigints so the ranking is bit-identical across engines and
    partitionings (the float formulation's ln-idf and sum order are
    where cross-engine nondeterminism lives).

    Fixed-point formulation (k1 = ``k1_milli``/1000, b = ``b_milli``/1000,
    every ``DIV`` a positive-operand floor division that Spark ``DIV``
    and DuckDB ``//`` evaluate identically):

    * ``A = (Σ dl · 1000) DIV N``                 (avg doc length, milli)
    * ``norm6 = (1000−bs)·1000 + bs·((dl·10⁹) DIV A) DIV 1000``
      — BM25's ``1 − b + b·dl/avgdl``, scaled 10⁶
    * ``den6 = tf·10⁶ + (k1s·norm6) DIV 1000``    (``tf + k1·norm``, 10⁶)
    * ``term = (tf·(k1s+1000)·10⁶) DIV den6``     (``tf·(k1+1)/den``, milli)
    * ``score = Σ_t idf_int(t) · term(t, d)``, idf_int = (N·scale) DIV df
      — the same rational-idf family as :func:`search_topk` (monotone in
      1/df; the ln() shape only rescales, it never reorders one term).

    Scale shape (identical to :func:`search_topk`): tf/df/dl are
    map-side-combinable groupBys over ONE token explode; N and avgdl are
    two 1-row aggregates broadcast into the per-row arithmetic; the
    query-token table is tiny → Catalyst broadcasts it into the
    posting-list join; the score is a partial-aggregated bigint sum and
    the top-k window is bounded by the query's posting lists.  Stopword
    posting lists are the skew risk — AQE skew-join splits them, and
    their idf_int rounds toward 0 so pruning them barely moves the
    ranking."""
    k1s, bs = int(k1_milli), int(b_milli)
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    avg = dl.agg(F.sum("dl").alias("tot")).join(F.broadcast(n_docs)).select(
        F.expr("CAST(tot * 1000 AS BIGINT) DIV n_docs").alias("avgdl_milli")
    )
    idf = df.join(F.broadcast(n_docs)).select(
        "token",
        F.expr(f"CAST(n_docs * {idf_scale} AS BIGINT) DIV df").alias("idf_int"),
    )
    qtok = queries.select(
        "query_id",
        F.explode(F.array_distinct(tokens(F.col("qtext")))).alias("token"),
    )
    scored = (
        qtok.join(tf, "token")
        .join(idf, "token")
        .join(dl, "doc_id")
        .join(F.broadcast(avg))
        .withColumn("norm6", F.expr(
            f"CAST(({1000 - bs} * 1000) AS BIGINT)"
            f" + ({bs} * ((dl * 1000000000) DIV avgdl_milli)) DIV 1000"))
        .withColumn("den6", F.expr(
            f"tf * 1000000 + ({k1s} * norm6) DIV 1000"))
        .withColumn("term", F.expr(
            f"(tf * {k1s + 1000} * 1000000) DIV den6"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("idf_int") * F.col("term")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select("query_id", F.row_number().over(w).alias("rank"),
                      "doc_id", "score")
        .where(F.col("rank") <= k)
    )


def search_rrf(rankings: list[DataFrame], k: int = 10,
               k_rrf: int = 60) -> DataFrame:
    """(query_id, rank, doc_id, score) — reciprocal-rank fusion of any
    number of (query_id, doc_id, rank) tables (the standard way to
    combine lexical tf-idf/BM25 and vector rankings without score
    calibration).  Contribution per system = ``10⁶ DIV (k_rrf + rank)``
    — the classic 1/(60+r) in exact integer micro-units, so the fused
    ranking is bit-identical across engines and partitionings; a doc
    missing from a system simply contributes nothing.

    Scale shape: each input is already top-k-bounded per query, so the
    union is (queries × systems × k)-sized — the fusion groupBy and
    final window are tiny regardless of corpus size; all the heavy
    lifting stays in the upstream retrieval operators."""
    both = rankings[0].select("query_id", "doc_id", "rank")
    for r in rankings[1:]:
        both = both.unionByName(r.select("query_id", "doc_id", "rank"))
    fused = both.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(f"1000000 DIV ({int(k_rrf)} + rank)")).alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        fused.select("query_id", F.row_number().over(w).alias("rank"),
                     "doc_id", "score")
        .where(F.col("rank") <= k)
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, exact_fp, shingle_fp): exact = md5 of whitespace-
    normalized text; shingle_fp = min md5 over word-3-gram shingles
    (winnowing-style robust fingerprint, stable under local edits).

    No explicit barrier between the token projection and the shingle
    select: the bound ``__toks`` array is referenced TWICE downstream
    (size + slice), so CollapseProject declines to duplicate the
    split() into the HOF lambda — tokenization stays once-per-row.
    (Single-use projections DO get inlined and re-evaluate per
    element; see dedup.doc_shingles for that case and its barrier.)
    The shape is pinned by
    tests/test_plans.py::test_fingerprint_tokenizes_once_per_row."""
    from rdf_n3_spark.operators.dedup import shingles_of_tokens

    norm = F.regexp_replace(F.lower(F.col("text")), " +", " ")
    return documents.select(
        "doc_id",
        F.md5(norm).alias("exact_fp"),
        F.split(F.lower("text"), " ").alias("__toks"),
    ).select(
        "doc_id",
        "exact_fp",
        F.array_min(F.transform(shingles_of_tokens(F.col("__toks")), F.md5)).alias("shingle_fp"),
    )


def lm_score(documents: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob, avg_logfreq) — corpus-bigram
    language-model scoring, the CCNet-style quality signal, as two
    complementary columns:

    * ``avg_logprob`` — mean ln P(w_i | w_{i-1}) with
      P = c(w_{i-1} w_i) / c_prefix(w_{i-1}) (prefix counts over
      non-final positions, so probabilities per prefix sum to 1).
      Catches "common prefix, weird continuation" disfluency.  Note
      the self-training artifact: a document of globally-UNIQUE tokens
      has P = 1 everywhere (its prefixes appear only in itself) — a
      conditional LM trained on the corpus itself cannot call unique
      gibberish rare, which is exactly why the second column exists.
    * ``avg_logfreq`` — mean ln(c(bigram) / N_corpus_bigrams):
      unconditional commonness; unique-token spam scores at the floor
      ln(1/N) while fluent repeated text scores orders higher.

    The corpus includes the document itself, so counts are ≥ 1 and the
    log never sees zero.  Documents with < 2 tokens have no bigrams
    and are emitted with NULL scores.

    Scale shape: the two count tables are map-side-combinable groupBys
    (one row per distinct bigram/prefix AFTER combine); scoring joins
    doc bigrams against those aggregated tables — hot keys ("of the")
    are 1 row on the build side, so AQE skew-split applies; the final
    per-doc mean combines map-side.  ``avg_logprob`` is rounded to 6
    decimals: ln and the sum order contribute ~1e-15 cross-engine
    wobble, 9 orders below the rounding step."""
    toks = documents.select(
        F.col("doc_id"), tokens(F.col("text")).alias("t"))
    big = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.concat_ws(
                            " ", F.element_at("t", i),
                            F.element_at("t", i + 1)).alias("bg"),
                    ),
                )
            ).alias("e"),
        )
        .select("doc_id", F.col("e.w1").alias("w1"), F.col("e.bg").alias("bg"))
    )
    bg_counts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1_counts = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    total = big.agg(F.count(F.lit(1)).alias("n_total"))  # 1 row, broadcast
    scored = (
        big.join(bg_counts, "bg")
        .join(w1_counts, "w1")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("c_bg") / F.col("c_w1"))), 6
            ).alias("avg_logprob"),
            F.round(
                F.avg(F.log(F.col("c_bg") / F.col("n_total"))), 6
            ).alias("avg_logfreq"),
        )
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            "avg_logprob",
            "avg_logfreq",
        )
    )


def hash_embed(documents: DataFrame, dims: int = 64,
               seed: str = "hembed-v1") -> DataFrame:
    """(doc_id, dim, value) — feature-hashing (hashing-trick) text
    embedding as SPARSE integer rows: every token adds ±1 (sign hash,
    the Weinberger et al. unbiasing trick) into md5-bucket ``dim``;
    zero-sum dims are dropped.  The text-side bridge into the
    embedding operator family (cosine ANN, k-means, SemDeDup) with no
    model weights: exact bigint counts, engine-portable hashes, so
    the vectors — and everything computed from them — are
    bit-identical on any engine or partitioning.

    Scale shape: explode tokens → ONE map-side-combinable
    (doc_id, dim) sum; output is min(|tokens|, dims) rows per doc.
    The sparse (doc_id, dim, value) layout joins/aggregates directly
    (same shape as similarity.project_embeddings) and never pays the
    dense-array fill for short documents."""
    tok = documents.select(
        "doc_id",
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).withColumn("h", F.md5(F.concat(F.lit(seed + "|"), F.col("tok"))))
    dim = F.pmod(F.conv(F.substring("h", 1, 8), 16, 10).cast("long"),
                 F.lit(dims))
    sign = F.when(
        F.substring("h", 9, 1).isin(*"89abcdef"), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", dim.alias("dim"), sign.alias("v"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("v").cast("bigint").alias("value"))
        .where(F.col("value") != 0)
    )


#: the Gopher/MassiveText "stop word presence" list (Rae et al. 2021
#: §A1.1: a document must contain ≥2 of these to pass)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(documents: DataFrame, min_words: int = 50,
                   max_words: int = 100_000,
                   min_stop: int = 2) -> DataFrame:
    """(doc_id, n_words, mean_word_len, frac_alpha_words, symbol_ratio,
    bullet_frac, ellipsis_frac, n_stop_present, keep) — the
    Gopher/MassiveText repetition-free quality rules (Rae et al. 2021
    §A1.1) as one narrow map:

    * 50 ≤ word count ≤ 100 000;
    * 3 ≤ mean word length ≤ 10;
    * ≥ 80% of words contain an alphabetic character;
    * symbol-to-word ratio (``#`` and ``...``) ≤ 0.1;
    * ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis;
    * ≥ 2 of the 8 canonical stop words present.

    ``keep`` = 1 iff every rule passes (degenerate/empty docs fail the
    word-count floor; null arithmetic falls through to keep=0, never
    an error).  The word-count and stop-word floors are parameters
    (corpora with synthetic/non-English vocabularies re-tune them;
    defaults are the paper's).  Pure Column expressions over bound arrays — zero
    shuffle, scales with the scan; every ratio is an int/int single
    division, so the DuckDB oracle matches bit-for-bit.  The ``...``
    and ``#`` counts use the replace-length trick (greedy left-to-
    right non-overlapping in both engines)."""
    t = tokens(F.col("text"))
    lines = F.split(F.col("text"), "\n")
    n = F.size(t)
    total_len = F.aggregate(t, F.lit(0).cast("bigint"),
                            lambda a, x: a + F.length(x))
    alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    hashes = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    ell = (F.length("text")
           - F.length(F.regexp_replace("text", r"\.\.\.", ""))) / 3
    bullet = F.size(F.filter(
        lines, lambda l: l.startswith("-") | l.startswith("*")))
    ell_end = F.size(F.filter(lines, lambda l: l.endswith("...")))
    n_lines = F.size(lines)
    stops = F.size(F.filter(
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        lambda w: F.array_contains(t, w)))
    out = documents.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        (total_len / n).alias("mean_word_len"),
        (alpha / n).alias("frac_alpha_words"),
        ((hashes + ell) / n).alias("symbol_ratio"),
        (bullet / n_lines).alias("bullet_frac"),
        (ell_end / n_lines).alias("ellipsis_frac"),
        stops.cast("bigint").alias("n_stop_present"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("n_stop_present") >= min_stop)
    )
    return out.select(
        "*", F.when(keep, 1).otherwise(0).cast("int").alias("keep"))
