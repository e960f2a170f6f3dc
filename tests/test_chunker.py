from __future__ import annotations

from mcp_vector_search_spark.sources.chunker import chunk_tokens


def test_chunk_windows(spark):
    text = " ".join(f"w{i}" for i in range(120))
    df = spark.createDataFrame(
        [(0, text, "a.txt"), (1, "", "b.txt")], "doc_id long, text string, source string"
    )
    got = chunk_tokens(df, chunk_size=50).orderBy("chunk_idx").collect()
    # 120 tokens → 3 chunks (50/50/20); empty doc emits nothing
    assert [r.n_tokens for r in got] == [50, 50, 20]
    assert all(r.doc_id == 0 for r in got)
    assert len({r.chunk_id for r in got}) == 3
    assert got[0].chunk_text.startswith("w0 w1 ") and got[2].chunk_text.endswith("w119")
