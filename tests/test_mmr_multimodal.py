from __future__ import annotations

import numpy as np

from mcp_vector_search_spark.operators.mmr import _mmr_select, mmr_diversify
from mcp_vector_search_spark.operators.multimodal import (
    _fake_features,
    attach_fake_media,
    extract_features,
)


def test_mmr_select_prefers_diversity():
    # two near-identical high-relevance vectors + one distinct lower one:
    # with diversity on, the distinct vector must beat the duplicate.
    rel = np.array([1.0, 0.99, 0.8])
    vecs = np.array([[1.0, 0.0], [1.0, 0.01], [0.0, 1.0]])
    order = _mmr_select(rel, vecs, k=3, lam=0.5)
    assert order[0] == 0 and order[1] == 2 and order[2] == 1


def test_mmr_lambda_one_is_pure_relevance():
    rel = np.array([0.5, 0.9, 0.7])
    vecs = np.eye(3)
    assert _mmr_select(rel, vecs, k=3, lam=1.0) == [1, 2, 0]


def test_mmr_diversify_spark(spark):
    rows = [
        (1, 1.0, [1.0, 0.0]),
        (2, 0.99, [1.0, 0.01]),
        (3, 0.8, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, embedding array<double>")
    got = mmr_diversify(df, k=2, diversity=0.5).orderBy("mmr_rank").collect()
    assert [(r.doc_id, r.mmr_rank) for r in got] == [(1, 1), (3, 2)]


def test_fake_features_deterministic():
    assert _fake_features(b"") == [0.0, 0.0, 0.0, 0.0]
    f = _fake_features(b"abc")
    assert f == [ord("a") / 255, ord("b") / 255, ord("c") / 255, 3 / 255]


def test_extract_features_arrow_batches(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (i + 1), "s") for i in range(10)], "doc_id long, text string, source string"
    )
    media = attach_fake_media(docs)
    assert dict(media.dtypes)["media"] == "binary"
    out = extract_features(media).collect()
    assert len(out) == 10
    byid = {r.doc_id: r for r in out}
    assert byid[2].n_bytes == 3 and len(byid[2].feature) == 4
    assert abs(byid[2].feature[0] - ord("x") / 255) < 1e-12


def test_mmr_diversify_empty_candidates(spark):
    """Zero retrieval hits must yield an empty result, not a
    pd.concat ValueError in the Python worker (r6 review)."""
    empty = spark.createDataFrame(
        [], "doc_id long, score double, embedding array<double>"
    )
    assert mmr_diversify(empty, k=5).count() == 0


def test_extract_features_string_ids(spark):
    """The mapInPandas schema must follow the input id type — string
    chunk ids used to hit an Arrow cast error (r6 review)."""
    from mcp_vector_search_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    docs = spark.createDataFrame(
        [("c0ffee", "hello"), ("dead17", "world")], "doc_id string, text string"
    )
    out = extract_features(attach_fake_media(docs)).collect()
    assert {r.doc_id for r in out} == {"c0ffee", "dead17"}
    assert all(len(r.feature) == 4 for r in out)
