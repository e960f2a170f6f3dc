from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.hashing import chunk_id_expr
from mcp_vector_search_spark.functions.text import (
    distinct_token_ratio,
    doc_fingerprint,
    punct_ratio,
    tokenize,
    word_ngrams,
)


def test_tokenize(spark):
    df = spark.createDataFrame([("Hello, World!  42-x",), ("",)], "text string")
    out = [r[0] for r in df.select(tokenize("text")).collect()]
    assert out == [["hello", "world", "42", "x"], []]


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    out = [r[0] for r in df.select(word_ngrams(tokenize("text"), 3)).collect()]
    assert out == [[], ["a_b_c", "b_c_d"]]


def test_punct_and_distinct_ratio(spark):
    df = spark.createDataFrame([("a, b; a!",)], "text string")
    pr, dr = df.select(
        punct_ratio("text"), distinct_token_ratio(tokenize("text"))
    ).first()
    # "a, b; a!" = 8 chars, 3 punct (, ; !)
    assert abs(pr - 3 / 8) < 1e-12
    assert abs(dr - 2 / 3) < 1e-12


def test_punct_ratio_ignores_line_breaks(spark):
    """Newlines/tabs are whitespace, not punctuation — counting them
    pushed ordinary line-dense text over HIGH_PUNCT_RATIO (r6 review)."""
    df = spark.createDataFrame([("line one\nline two\tend\r\n",)], "text string")
    assert df.select(punct_ratio("text")).first()[0] == 0.0


def test_doc_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("Hello,  WORLD!",), ("hello world",)], "text string")
    fps = [r[0] for r in df.select(doc_fingerprint("text")).collect()]
    assert fps[0] == fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_chunk_id_null_name_keeps_separator(spark):
    """concat_ws drops NULL args silently; the coalesce guard must keep
    the reference's `path:type::start:end:hash` shape (ADVICE r1)."""
    df = spark.createDataFrame([("p", "t", None, 0, 5, "body")],
                               "fp string, ct string, nm string, s int, e int, c string")
    got = df.select(
        chunk_id_expr(F.col("fp"), F.col("ct"), F.col("nm"), F.col("s"), F.col("e"), F.col("c"))
    ).first()[0]
    h8 = hashlib.sha256(b"body").hexdigest()[:8]
    want = hashlib.sha256(f"p:t::0:5:{h8}".encode()).hexdigest()[:16]
    assert got == want


def test_gopher_line_signals(spark):
    from mcp_vector_search_spark.functions.text import (
        bullet_line_fraction,
        doc_lines,
        dup_line_fraction,
        ellipsis_line_fraction,
    )

    text = "alpha\nalpha\n- bullet\n* item\nend...\n\n  \n"
    df = spark.createDataFrame([(text,)], "text string")
    lines = doc_lines("text")
    dup, bul, ell = df.select(
        dup_line_fraction(lines),
        bullet_line_fraction(lines),
        ellipsis_line_fraction(lines),
    ).first()
    # 5 non-empty lines; "alpha" duplicated once
    assert abs(dup - 1 / 5) < 1e-12
    assert abs(bul - 2 / 5) < 1e-12
    assert abs(ell - 1 / 5) < 1e-12


def test_gopher_word_signals(spark):
    from mcp_vector_search_spark.functions.text import (
        alpha_word_fraction,
        mean_word_length,
        symbol_word_ratio,
        tokenize,
    )

    df = spark.createDataFrame([("ab 12 cdef ## ...",)], "text string")
    toks = tokenize("text")
    mwl, awf, swr = df.select(
        mean_word_length(toks),
        alpha_word_fraction(toks),
        symbol_word_ratio("text", toks),
    ).first()
    # tokens: ab, 12, cdef → lengths 2,2,4
    assert abs(mwl - 8 / 3) < 1e-12
    assert abs(awf - 2 / 3) < 1e-12
    # 2 '#' + 1 '...' over 3 words
    assert abs(swr - 3 / 3) < 1e-12


def test_gopher_empty_doc_is_zero(spark):
    from mcp_vector_search_spark.functions.text import (
        alpha_word_fraction,
        doc_lines,
        dup_line_fraction,
        mean_word_length,
        tokenize,
    )

    df = spark.createDataFrame([("",)], "text string")
    toks = tokenize("text")
    vals = df.select(
        dup_line_fraction(doc_lines("text")),
        mean_word_length(toks),
        alpha_word_fraction(toks),
    ).first()
    assert list(vals) == [0.0, 0.0, 0.0]


def test_bpe_token_estimate(spark):
    from mcp_vector_search_spark.functions.text import bpe_token_estimate

    rows = [
        (1, "hello"),         # 1 alpha run of 5 -> ceil(5/4) = 2
        (2, "a b c"),         # 3 runs of 1 -> 3
        (3, "x = 42;"),       # 1 + 2 digits + '=' + ';' = 5
        (4, "1234"),          # 4 digit tokens
        (5, ""),              # nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["est"]
        for r in df.select("doc_id", bpe_token_estimate("text").alias("est")).collect()
    }
    assert out == {1: 2, 2: 3, 3: 5, 4: 4, 5: 0}


def test_redact_pii_masks_and_counts(spark):
    from mcp_vector_search_spark.functions.text import pii_counts, redact_pii

    rows = [
        (1, "mail a.b@x.io or call +1-555-123-4567 from 10.0.0.1"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("red"),
            pii_counts("text").alias("c"),
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> or call <PHONE> from <IP>"
    assert out[1]["c"]["n_email"] == 1
    assert out[1]["c"]["n_ip"] == 1
    assert out[1]["c"]["n_phone"] == 1
    assert out[2]["red"] == "no pii here at all"
    assert sum(out[2]["c"]) == 0


def test_lang_id_real_text(spark):
    from mcp_vector_search_spark.functions.text import lang_id

    samples = [
        ("en", "The quick brown fox jumps over the lazy dog and it is fast."),
        ("es", "El gato es negro y los perros corren por el parque para jugar "
               "con sus amigos, pero ya es tarde."),
        ("fr", "Les enfants sont dans le jardin pour jouer avec nous, "
               "mais pas sur la route aux voitures."),
        ("de", "Der Hund und die Katze sind auf dem Tisch, aber das ist "
               "nicht ein Problem mit dem Haus."),
        ("zh", "今天天气很好我们一起去公园散步吧这里风景非常漂亮"),
        ("unknown", "zzz qqq xyzzy 12345"),
        ("unknown", ""),
    ]
    df = spark.createDataFrame(
        [(lbl, txt) for lbl, txt in samples], "expected string, text string"
    )
    rows = df.select("expected", lang_id("text").alias("lid")).collect()
    for r in rows:
        assert r["lid"]["lang"] == r["expected"], (
            r["expected"], r["lid"]["lang"], r["lid"]["confidence"])
    # confidence bounded and monotone-sane
    for r in rows:
        assert 0.0 <= r["lid"]["confidence"] <= 1.0


def test_lang_id_priority_tiebreak(spark):
    from mcp_vector_search_spark.functions.text import lang_id

    # one en stopword + one de stopword in a 2-token doc: equal 0.5
    # scores; priority order says en wins
    df = spark.createDataFrame([("the der",)], "text string")
    r = df.select(lang_id("text").alias("lid")).first()
    assert r["lid"]["lang"] == "en"
    assert abs(r["lid"]["confidence"] - 0.5) < 1e-12


def test_redact_pii_leaves_dates_and_ids_alone(spark):
    """ISO dates and dash-separated ids are NOT phone numbers — the
    earlier permissive pattern rewrote '2026-08-14' to <PHONE>."""
    from mcp_vector_search_spark.functions.text import redact_pii

    rows = [
        (1, "released 2026-08-14 build 1234-5678-9012 ok"),
        (2, "call 555-123-4567 or +44 20 7946 0958 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.red for r in df.select("doc_id", redact_pii("text").alias("red")).collect()}
    assert out[1] == "released 2026-08-14 build 1234-5678-9012 ok"
    assert out[2] == "call <PHONE> or <PHONE> now"


def test_redact_pii_bare_digit_runs(spark):
    """Unformatted 10-11 digit numbers ARE redacted (ADVICE r4: the
    tightened pattern had dropped them), while shorter runs — years,
    zip+4 digits, 9-digit ids — and longer runs pass through."""
    from mcp_vector_search_spark.functions.text import redact_pii

    rows = [
        (1, "call 5551234567 today"),
        (2, "or 15551234567 with country code"),
        (3, "order 123456789 shipped 2026 count 123456789012"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.red
        for r in df.select("doc_id", redact_pii("text").alias("red")).collect()
    }
    assert out[1] == "call <PHONE> today"
    assert out[2] == "or <PHONE> with country code"
    assert out[3] == "order 123456789 shipped 2026 count 123456789012"


def test_top_and_dup_ngram_fractions(spark):
    from mcp_vector_search_spark.functions.text import (
        dup_ngram_fraction,
        top_ngram_fraction,
    )

    rows = [
        # bigrams: ab ba ab ba ab bc -> top ab=3/6, dup (3+2)/6
        ("a b a b a b c",),
        # all-unique bigrams -> top 1/3, dup 0
        ("p q r s",),
        # bigrams az za az za -> sorted [az az za za]: the za run is
        # still open when the fold ends — exercises the finish-lambda
        ("a z a z a",),
        # fewer tokens than n -> empty grams -> 0.0
        ("lone",),
        ("",),
    ]
    df = spark.createDataFrame(rows, "text string").select(
        word_ngrams(tokenize("text"), 2).alias("g")
    )
    out = df.select(
        top_ngram_fraction(F.col("g")).alias("top"),
        dup_ngram_fraction(F.col("g")).alias("dup"),
    ).collect()
    assert [(r["top"], r["dup"]) for r in out] == [
        (0.5, 0.833333),
        (round(1 / 3, 6), 0.0),
        (0.5, 1.0),
        (0.0, 0.0),
        (0.0, 0.0),
    ]


def test_dup_ngram_fraction_run_in_middle(spark):
    from mcp_vector_search_spark.functions.text import dup_ngram_fraction

    # sorted trigram array has its duplicated run in the MIDDLE, with
    # unique grams on both sides — the x != prev close path
    df = spark.createDataFrame([("x a b c a b c a b y",)], "text string").select(
        word_ngrams(tokenize("text"), 3).alias("g")
    )
    # trigrams: xab abc bca cab abc bca cab aby -> dup: abc,bca,cab each x2
    out = df.select(dup_ngram_fraction(F.col("g"))).collect()[0][0]
    assert out == 0.75
