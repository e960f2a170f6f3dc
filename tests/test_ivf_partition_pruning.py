"""The 100 TB IVF claim made concrete: vectors persisted partitioned by
cluster_id turn probe filters into physical partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_vector_search_spark import io
from mcp_vector_search_spark.operators.ivf import ivf_build

SF_DIR = "/root/testdata/sf0.001"


def test_cluster_partitioned_scan_prunes(spark, tmp_path):
    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, _ = ivf_build(emb, num_clusters=8)
    path = str(tmp_path / "vectors_ivf")
    assigned.write.partitionBy("cluster_id").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cluster_id").isin([1, 3]))
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    # the probe filter must appear as a partition filter on the scan,
    # not a post-scan row filter
    assert "PartitionFilters" in plan and "cluster_id" in plan.split("PartitionFilters")[1].split("]")[0]
    # and only the probed partitions are read
    import os

    n_dirs = len([d for d in os.listdir(path) if d.startswith("cluster_id=")])
    assert n_dirs == 8
    assert probed.select("cluster_id").distinct().count() == 2
