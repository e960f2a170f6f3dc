from __future__ import annotations

import subprocess

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
