"""Git history source (reference S5, ``core/git.py``/``git_blame.py``)
and the commit-ancestry precompute that powers temporal KG queries
(G6, ``knowledge_graph.py:3395-3572``).

The log is read once on the driver (a repo's commit list is metadata,
not data — thousands of rows, not billions) and becomes a `commits`
DataFrame; everything downstream (ancestry, per-commit entity
filtering, authorship edges) is joins. Blame-style attribution at
scale is the `asof_join` in operators/events.py on (file, line-range)
keys.
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

COMMITS_SCHEMA = (
    "commit_sha string, parent_sha string, author string, author_email string,"
    " ts long, subject string"
)


def git_log_df(spark: SparkSession, repo_path: str) -> DataFrame:
    """commits(commit_sha, parent_sha, author, author_email, ts,
    subject) from `git log --first-parent` (linear mainline history;
    merge side branches enter via their merge commit, matching the
    reference's history walk)."""
    out = subprocess.run(
        [
            "git", "-C", repo_path, "log", "--first-parent",
            "--format=%H%x1f%P%x1f%an%x1f%ae%x1f%at%x1f%s",
        ],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    rows = []
    for line in out.splitlines():
        sha, parents, author, email, ts, subject = line.split("\x1f")
        rows.append(
            (
                sha,
                parents.split(" ")[0] if parents else None,
                author,
                email,
                int(ts),
                subject,
            )
        )
    return spark.createDataFrame(rows, COMMITS_SCHEMA)


def current_branch(repo_path: str) -> str:
    return subprocess.run(
        ["git", "-C", repo_path, "rev-parse", "--abbrev-ref", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()


def commit_order(commits: DataFrame) -> DataFrame:
    """Attach a topological position (first-parent chains are linear,
    so commit time + sha is a total order) — the G6 trick: 'B is an
    ancestor of A' becomes `pos_b <= pos_a`, a range predicate instead
    of a graph walk per query."""
    w = Window.orderBy("ts", "commit_sha")
    return commits.withColumn("pos", F.row_number().over(w))


def entities_at_commit(
    entities: DataFrame, ordered_commits: DataFrame, commit_sha: str
) -> DataFrame:
    """G6 get_entities_at_commit: entities whose creating commit is an
    ancestor of (≤) the asked commit. `entities` carries a
    `commit_sha` column; one broadcast lookup + range filter."""
    target = ordered_commits.filter(F.col("commit_sha") == commit_sha).select(
        F.col("pos").alias("_target_pos")
    )
    positioned = entities.join(
        ordered_commits.select("commit_sha", "pos"), "commit_sha"
    )
    return (
        positioned.join(F.broadcast(target))
        .filter(F.col("pos") <= F.col("_target_pos"))
        .drop("pos", "_target_pos")
    )
