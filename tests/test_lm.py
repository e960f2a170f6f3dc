"""Corpus bigram LM scoring (operators/lm.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mcp_vector_search_spark.operators.lm import lm_fit, lm_perplexity, lm_score


def test_lm_word_salad_scores_worse_than_corpus_like_text(spark):
    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat and the cat slept") for i in range(20)]
        + [(100, "the cat sat on the mat"), (101, "mat slept zq cat xv on the")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_perplexity(corpus).collect()}
    # in-distribution doc ≈ corpus bigrams → higher avg logp than the shuffle
    assert out[100]["avg_logp"] > out[101]["avg_logp"]
    assert out[100]["ppl"] < out[101]["ppl"]
    assert all(math.isfinite(r["avg_logp"]) for r in out.values())


def test_lm_fit_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b")], "doc_id long, text string"
    )
    unigrams, bigrams, total = lm_fit(docs)
    uc = {r["term"]: r["c1"] for r in unigrams.collect()}
    bc = {r["gram"]: r["c2"] for r in bigrams.collect()}
    assert uc == {"a": 3, "b": 2} and total == 5
    assert bc == {"a_b": 2, "b_a": 1}


def test_lm_score_single_token_doc_has_no_row(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "hello world")], "doc_id long, text string"
    )
    unigrams, bigrams, total = lm_fit(docs)
    out = lm_score(docs, unigrams, bigrams, total)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {2}  # doc 1 has no bigram events


def test_lm_score_feeds_weighted_downsample(spark):
    """Composition: perplexity → keep-probability → deterministic thin."""
    from mcp_vector_search_spark.operators.sampling import weighted_downsample

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat " + ("zq xv " if i % 2 else "")) for i in range(200)],
        "doc_id long, text string",
    )
    scored = lm_perplexity(corpus).cache()
    mid = scored.agg(F.avg("ppl")).collect()[0][0]  # between the two modes
    lo, hi = 0.05, 1.0
    w = F.when(F.col("ppl") > mid, F.lit(lo)).otherwise(F.lit(hi))
    kept = weighted_downsample(scored.withColumn("w", w), "w")
    n_bad_kept = kept.filter(F.col("doc_id") % 2 == 1).count()
    n_good_kept = kept.filter(F.col("doc_id") % 2 == 0).count()
    assert n_good_kept > n_bad_kept
