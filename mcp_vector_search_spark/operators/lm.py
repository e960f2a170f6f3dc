"""Corpus n-gram language-model scoring — the LM-quality leg of a
training-data pipeline.

The published pre-training recipe (CCNet and successors) filters or
buckets documents by perplexity under a small LM trained on trusted
text. A full KenLM is out of scope for a SQL-replayable engine, but an
interpolated bigram model fit on the corpus itself captures the same
signal — word-salad and boilerplate score far from the corpus mean —
and both the fit and the scoring are pure DataFrame aggregations.

Model: p(w_i | w_{i-1}) = α·c(w_{i-1}w_i)/c(w_{i-1}) + (1−α)·c(w_i)/N
(interpolated bigram/unigram, α = 0.4 backoff weight). Unseen events
get the unigram leg, unseen unigrams a 1/N floor, so log p is always
finite.

100 TB shape: the model is two groupBy counts (unigrams, bigrams) —
classic map-side-combinable aggregations; scoring explodes each doc's
bigrams once and joins the count tables on the term/gram key. Count
tables for a bounded vocabulary broadcast; open-vocabulary corpora
shuffle on the term key, which AQE skew-splits (Zipf head). Compose
with ``operators/sampling.weighted_downsample`` to thin the
worst-perplexity tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.text import tokenize, word_ngrams

LM_ALPHA = 0.4


def lm_fit(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the corpus bigram model → (unigrams(term, c1),
    bigrams(gram, c2), total_tokens).

    Both count tables come back CACHED: `lm_score` joins each one
    (unigrams twice), and the `total` scalar is an aggregate over the
    cached unigram table — without the cache, the corpus tokenize +
    explode + groupBy lineage re-executed once for the total and again
    per join input (r6 review #5)."""
    toks = docs.select(tokenize(text_col).alias("toks"))
    unigrams = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
        .cache()
    )
    bigrams = (
        toks.select(F.explode(word_ngrams(F.col("toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("c2"))
        .cache()
    )
    # one job over the (just-cached) vocab-sized table, not a second
    # full-corpus aggregation
    total = unigrams.agg(F.sum("c1")).collect()[0][0] or 0
    return unigrams, bigrams, int(total)


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = LM_ALPHA,
    round_to: int = 6,
) -> DataFrame:
    """Per-doc average bigram log-probability →
    (doc_id, n_bigrams, avg_logp, ppl). Higher ppl = less like the
    corpus (word salad, boilerplate, foreign text). Docs with < 2
    tokens produce NO output row (they have zero bigram events, so
    they never enter the groupBy — pinned by
    tests/test_lm.py::test_lm_score_single_token_doc_has_no_row);
    left-join from the corpus to keep them with NULL scores.

    avg_logp is rounded (float-sum order noise sits ~1e-14 below the
    rounding grid); ppl = exp(−avg_logp) is derived from the rounded
    value so the pair stays consistent."""
    ev = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(tokenize(text_col), 2)).alias("gram"),
    ).withColumn("prev", F.split(F.col("gram"), "_").getItem(0)).withColumn(
        "cur", F.split(F.col("gram"), "_").getItem(1)
    )
    joined = (
        ev.join(bigrams, "gram", "left")
        .join(unigrams.select(F.col("term").alias("prev"), F.col("c1").alias("c_prev")), "prev", "left")
        .join(unigrams.select(F.col("term").alias("cur"), F.col("c1").alias("c_cur")), "cur", "left")
    )
    n = float(total_tokens) if total_tokens else 1.0
    big_leg = F.when(
        F.col("c2").isNotNull() & F.col("c_prev").isNotNull(),
        F.lit(alpha) * F.col("c2") / F.col("c_prev"),
    ).otherwise(F.lit(0.0))
    uni_leg = F.lit(1.0 - alpha) * F.coalesce(F.col("c_cur"), F.lit(1)) / F.lit(n)
    logp = F.log(big_leg + uni_leg)
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), round_to).alias("avg_logp"),
        )
        .withColumn("ppl", F.exp(-F.col("avg_logp")))
    )


def lm_perplexity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fit + score in one call (self-scored corpus model)."""
    unigrams, bigrams, total = lm_fit(docs, text_col)
    return lm_score(docs, unigrams, bigrams, total, id_col=id_col, text_col=text_col)
