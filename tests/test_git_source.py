from __future__ import annotations

import subprocess

from pyspark.sql import functions as F

from mcp_vector_search_spark.sources.git_source import (
    commit_order,
    entities_at_commit,
    git_log_df,
)


def _init_repo(path):
    def g(*args):
        subprocess.run(["git", "-C", str(path), *args], check=True, capture_output=True)

    subprocess.run(["git", "init", "-q", str(path)], check=True)
    g("config", "user.email", "t@example.com")
    g("config", "user.name", "t")
    for i in range(3):
        (path / f"f{i}.txt").write_text(str(i))
        g("add", ".")
        g("commit", "-q", "-m", f"c{i}", "--date", f"2024-01-0{i + 1}T00:00:00")
    return path


def test_git_log_and_ancestry(spark, tmp_path):
    repo = _init_repo(tmp_path / "repo")
    commits = git_log_df(spark, str(repo))
    assert commits.count() == 3
    ordered = commit_order(commits)
    rows = ordered.orderBy("pos").collect()
    assert [r.subject for r in rows] == ["c0", "c1", "c2"]
    assert rows[0].parent_sha is None and rows[2].parent_sha == rows[1].commit_sha

    # entity created at each commit; ask for the state at c1
    entities = spark.createDataFrame(
        [(f"e{i}", r.commit_sha) for i, r in enumerate(rows)],
        "entity_id string, commit_sha string",
    )
    at_c1 = entities_at_commit(entities, ordered, rows[1].commit_sha)
    assert sorted(r.entity_id for r in at_c1.collect()) == ["e0", "e1"]


def test_repo_nodes_full_graph(spark, tmp_path):
    """Version-control node tables (Person/Project/Repository/Branch/
    Commit) + authorship/hierarchy edges from a real git log."""
    from mcp_vector_search_spark.operators.kg import repo_nodes
    from mcp_vector_search_spark.sources.git_source import current_branch

    repo = _init_repo(tmp_path / "repo")
    commits = git_log_df(spark, str(repo))
    assert "author_email" in commits.columns
    branch = current_branch(str(repo))
    nodes, edges = repo_nodes(commits, "proj", branch=branch)
    by_type = {
        r["entity_type"]: r["count"]
        for r in nodes.groupBy("entity_type").count().collect()
    }
    assert by_type == {
        "Person": 1, "Commit": 3, "Project": 1, "Repository": 1, "Branch": 1
    }
    # privacy: the raw email never appears in any node column
    assert nodes.filter(F.col("id").contains("example.com")).count() == 0
    by_rel = {
        r["rel"]: r["count"] for r in edges.groupBy("rel").count().collect()
    }
    assert by_rel == {"AUTHORED": 3, "IN_BRANCH": 3, "OF_REPO": 1, "OF_PROJECT": 1}
    # AUTHORED edges resolve to existing Person and Commit nodes
    ids = {r["id"] for r in nodes.collect()}
    for r in edges.collect():
        assert r["src"] in ids and r["dst"] in ids
