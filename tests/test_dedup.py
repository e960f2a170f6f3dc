from __future__ import annotations

from mcp_vector_search_spark.operators.dedup import (
    exact_duplicates,
    jaccard_verify,
    minhash_candidates,
    neighbor_jaccard,
    shingle_sets,
)


def test_exact_duplicates(spark, docs):
    got = exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0].dup_count == 2 and got[0].keep_id == 0


def test_minhash_finds_planted_near_dup(spark, docs):
    cand = minhash_candidates(docs, num_hashes=8, num_bands=4)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    assert (0, 1) in pairs  # exact dup always collides on every band
    verified = jaccard_verify(cand, shingle_sets(docs, 3), threshold=0.4)
    jac = {(r.doc_a, r.doc_b): r.jaccard for r in verified.collect()}
    assert jac[(0, 1)] == 1.0
    if (0, 3) in jac:  # near-dup pair: 1-word change in 9 → shared shingles
        assert 0.4 <= jac[(0, 3)] < 1.0


def test_bucket_cap_drops_giant_buckets(spark, docs):
    uncapped = minhash_candidates(docs, num_hashes=8, num_bands=4).count()
    capped = minhash_candidates(docs, num_hashes=8, num_bands=4, max_bucket_size=1).count()
    assert capped == 0 and uncapped > 0


def test_neighbor_jaccard_sparse_ids(spark):
    """Ids with gaps (10, 20, 30) must still pair via rank positions —
    the round-1 dense-id assumption compared nothing here."""
    rows = [
        (10, "alpha beta gamma delta epsilon"),
        (20, "alpha beta gamma delta epsilon"),
        (30, "zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard for r in neighbor_jaccard(df, window=2).collect()}
    assert got[(10, 20)] == 1.0
    assert got[(10, 30)] == 0.0 and got[(20, 30)] == 0.0


def test_band_keys_no_aliasing(spark):
    """Variable-length long members must not alias buckets: (12,345)
    and (123,45) concatenate identically without the separator."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.functions.hashing import band_keys

    df = spark.createDataFrame(
        [(1, [12, 345]), (2, [123, 45])], "i long, sig array<long>"
    )
    keys = {
        r["i"]: r["bk"]
        for r in df.select("i", band_keys(F.col("sig"), 1, 2).alias("bk")).collect()
    }
    assert keys[1] != keys[2]


def test_contaminated_docs_flags_exact_and_partial_overlap(spark):
    from mcp_vector_search_spark.operators.dedup import contaminated_docs

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated words about spark query planning"),
            (3, "prefix words then the quick brown fox jumps too"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contaminated_docs(corpus, bench, n=5).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
    assert out[3]["contaminated"]  # shares 'the quick brown fox jumps'
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0


def _span_docs(spark):
    shared = " ".join(f"boiler{i}" for i in range(25))
    rows = [
        (1, shared + " " + " ".join(f"aa{i}" for i in range(10))),
        (2, shared + " " + " ".join(f"bb{i}" for i in range(10))),
        (3, " ".join(f"cc{i}" for i in range(30))),  # unique, no spans
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_marks_shared_boilerplate(spark):
    from mcp_vector_search_spark.operators.dedup import duplicate_spans

    out = duplicate_spans(_span_docs(spark), k=20).collect()
    spans = {(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in out}
    # shared 25-token prefix: windows 1..6 survive in BOTH docs and
    # merge into one island [1, 25]; doc 3 emits nothing
    assert spans == {(1, 1, 25, 6), (2, 1, 25, 6)}


def test_duplicate_spans_within_doc_repeat(spark):
    from mcp_vector_search_spark.operators.dedup import duplicate_spans

    block = " ".join(f"rep{i}" for i in range(20))
    mid = " ".join(f"mid{i}" for i in range(15))
    df = spark.createDataFrame(
        [(7, block + " " + mid + " " + block)], "doc_id long, text string"
    )
    out = duplicate_spans(df, k=20).collect()
    # the two copies of the 20-token block are each exactly one
    # window (positions 1 and 36); the separator keeps them apart
    assert {(r.span_start, r.span_end) for r in out} == {(1, 20), (36, 55)}


def test_duplicate_spans_xxhash64_equals_md5(spark):
    from mcp_vector_search_spark.operators.dedup import duplicate_spans

    docs = _span_docs(spark)
    a = sorted(map(tuple, duplicate_spans(docs, k=20).collect()))
    b = sorted(map(tuple, duplicate_spans(docs, k=20, hash_fn="xxhash64").collect()))
    assert a == b


def test_strip_duplicate_spans_removes_flagged_tokens(spark):
    from mcp_vector_search_spark.operators.dedup import (
        duplicate_spans,
        strip_duplicate_spans,
    )

    docs = _span_docs(spark)
    spans = duplicate_spans(docs, k=20)
    out = {r.doc_id: r.text for r in strip_duplicate_spans(docs, spans).collect()}
    assert out[1] == " ".join(f"aa{i}" for i in range(10))
    assert out[2] == " ".join(f"bb{i}" for i in range(10))
    # untouched doc keeps its ORIGINAL text verbatim
    assert out[3] == " ".join(f"cc{i}" for i in range(30))


def test_duplicate_spans_touching_windows_merge(spark):
    """A duplicated block immediately followed by ANOTHER duplicated
    block (windows at pos 1 and pos k+1, nothing between) is ONE
    contiguous region — the island merge treats touching spans as one
    row, per the documented contract."""
    from mcp_vector_search_spark.operators.dedup import duplicate_spans

    x = " ".join(f"x{i}" for i in range(20))  # block X, dup'd via doc 2
    y = " ".join(f"y{i}" for i in range(20))  # block Y, dup'd via doc 3
    docs = spark.createDataFrame(
        [
            (1, x + " " + y),
            (2, x + " " + " ".join(f"p{i}" for i in range(21))),
            (3, " ".join(f"q{i}" for i in range(21)) + " " + y),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.span_start, r.span_end) for r in
           duplicate_spans(docs, k=20).collect()}
    # doc 1: X at [1,20], Y at [21,40] — touching → one island [1,40]
    assert out[1] == (1, 40)
    assert out[2] == (1, 20) and out[3] == (22, 41)


def test_embedding_near_dups_auto_routes_clustered(spark):
    """VERDICT r4 #4: method='auto' with NO prebuilt layout must build
    a sampled IVF layout and block on cluster_id — never degrade to
    id-window adjacency, which misses any true pair > window positions
    apart in id order. The plan must not contain the window blocker's
    sequence-explode, and a planted near-dup pair with FAR-apart ids
    must be found."""
    import numpy as np
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.operators.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    rows = [(int(i), [float(x) for x in rng.normal(size=16)]) for i in range(400)]
    # plant a near-identical pair 395 id-positions apart (>> any window)
    rows[399] = (399, [v + 1e-4 for v in rows[4][1]])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = embedding_near_dups(df, threshold=0.99)  # method defaults to auto
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "sequence(" not in plan  # no global_positions explode
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (4, 399) in pairs


def test_minhash_rejects_bad_band_split(spark):
    """num_bands must divide num_hashes: rows_per_band = 0 silently
    degenerated to a full cross join (r6 review)."""
    import pytest

    from mcp_vector_search_spark.operators.dedup import (
        minhash_candidates,
        neighbor_jaccard,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of num_bands"):
        minhash_candidates(docs, num_hashes=8, num_bands=16)
    with pytest.raises(ValueError, match="window"):
        neighbor_jaccard(docs, window=0)


def test_cosine_sim_zero_vector_scores_zero(spark):
    """A zero-norm embedding scores 0, never ANSI DIVIDE_BY_ZERO
    (r6 review)."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.functions.vectors import cosine_sim

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_sim(F.col("a"), F.col("b"))).first()[0] == 0.0


def test_simhash_arrow_kernel_matches_expression_form(spark):
    """r12: simhash_fingerprints folds bit majorities in ONE Arrow
    pass; `hashing.simhash` (the 60-filter-pass expression) stays the
    semantic reference. The two must agree bit-for-bit, including the
    empty-token and null-text edges."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.functions.hashing import simhash, token_hash60
    from mcp_vector_search_spark.functions.text import tokenize
    from mcp_vector_search_spark.operators.dedup import simhash_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha beta gamma alpha"),  # identical -> same fp
            (3, "totally different words here"),
            (4, ""),  # empty token set -> fp 0
            (5, None),  # null text -> fp 0 (the expression form's
            # per-bit when(null).otherwise(0) folds to 0, not null)
            (6, "x " * 500),  # long repeated doc
        ],
        "doc_id long, text string",
    )
    expr = docs.select(
        "doc_id",
        simhash(
            F.transform(tokenize("text"), token_hash60)
        ).alias("simhash"),
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    want = {r["doc_id"]: r["simhash"] for r in expr.collect()}
    assert got == want
    assert got[1] == got[2] and got[1] != got[3]
    assert got[4] == 0 and got[5] == 0
