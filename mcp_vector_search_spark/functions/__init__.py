"""Column-expression library.

Everything here is a pure `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen friendly, no Python UDFs in the hot path (reference
runs the same logic row-at-a-time in Python, e.g. the BM25 tokenizer
``bm25_backend.py:297-375`` and result-ranker boosts
``result_ranker.py:10-208``).
"""

from mcp_vector_search_spark.functions.text import (  # noqa: F401
    tokenize,
    token_count,
    word_ngrams,
    normalized_text,
    doc_fingerprint,
)
from mcp_vector_search_spark.functions.vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine_sim,
    distance_to_similarity,
)
from mcp_vector_search_spark.functions.hashing import (  # noqa: F401
    minhash_signature,
    chunk_id_expr,
)
