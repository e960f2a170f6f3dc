from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mcp_vector_search_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "src/a.py"),
        (1, "the quick brown fox jumps over the lazy dog", "src/b.py"),  # exact dup of 0
        (2, "pack my box with five dozen liquor jugs", "src/c.py"),
        (3, "the quick brown fox leaps over the lazy dog", "src/d.py"),  # near dup of 0
        (4, "spark sql runs relational queries at scale", "src/e.py"),
        (5, "", "src/empty.py"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")
