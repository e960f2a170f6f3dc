from __future__ import annotations

import math

from mcp_vector_search_spark.operators.bm25 import (
    B,
    EPSILON,
    K1,
    bm25_topk,
    build_doc_stats,
    build_postings,
)


def _okapi_reference(corpus: list[list[str]], query: list[str]) -> dict[int, float]:
    """Pure-python BM25Okapi (public formula, rank_bm25 semantics) used
    as the golden oracle for the Spark implementation."""
    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n
    df: dict[str, int] = {}
    for d in corpus:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    idf_raw = {t: math.log((n - f + 0.5) / (f + 0.5)) for t, f in df.items()}
    avg_idf = sum(idf_raw.values()) / len(idf_raw)
    idf = {t: (v if v >= 0 else EPSILON * avg_idf) for t, v in idf_raw.items()}
    scores = {}
    for i, d in enumerate(corpus):
        s = 0.0
        matched = False
        for t in set(query):
            tf = d.count(t)
            if tf == 0:
                continue
            matched = True
            s += idf[t] * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(d) / avgdl))
        if matched:  # engine returns every doc containing ≥1 query term
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_okapi_reference(spark, docs):
    texts = [r.text for r in docs.orderBy("doc_id").collect()]
    # token-less docs never reach the index (the reference's chunker
    # skips empty chunks before BM25Okapi ever sees them)
    corpus = [t.lower().split() for t in texts if t.strip()]
    query = ["quick", "fox", "queries"]
    want = _okapi_reference(corpus, query)

    got = {
        r.doc_id: r.score
        for r in bm25_topk(docs, query, k=10).collect()
    }
    assert got == dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10])


def test_postings_and_doc_stats(spark, docs):
    p = build_postings(docs).filter("doc_id = 0 and term = 'the'").first()
    assert p.tf == 2
    dl = {r.doc_id: r.dl for r in build_doc_stats(docs).collect()}
    assert dl[0] == 9.0 and dl[5] == 0.0
