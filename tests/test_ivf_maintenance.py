"""IVF layout maintenance: unpack round-trip, per-cluster health
stats, the retrain decision signal, and the atomic quantizer retrain
(reference: LanceDB index re-creation on drift,
vectors_backend.py:665-731)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_vector_search_spark.operators.ivf import (
    ivf_build_sampled,
    ivf_layout_stats,
    ivf_pack,
    ivf_retrain_gain,
    ivf_topk_batch_packed,
    ivf_unpack,
    read_ivf_layout,
    retrain_ivf_layout,
    write_ivf_layout,
)
from mcp_vector_search_spark.operators.topk import topk_per_query_np


def _clustered_vecs(spark, n=400, dim=8, n_groups=4, seed=7, shift=0.0, id0=0):
    """n unit vectors in n_groups tight bundles; `shift` rotates the
    bundle axes so a second batch lands off the first fit's centroids."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        g = i % n_groups
        base = np.zeros(dim)
        base[g] = 1.0
        if shift:
            base[(g + 1) % dim] = shift
        v = base + 0.05 * rng.standard_normal(dim)
        rows.append((id0 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_maint") / "layout")
    vecs = _clustered_vecs(spark)
    assigned, cents = ivf_build_sampled(vecs, num_clusters=4, seed=3)
    write_ivf_layout(ivf_pack(assigned, rows_per_block=64), cents, path)
    return path


def test_unpack_is_pack_inverse(spark, layout):
    packed, cents = read_ivf_layout(spark, layout)
    rows = ivf_unpack(packed).collect()
    assert len(rows) == 400
    assert sorted(r["vec_id"] for r in rows) == list(range(400))
    # vectors reconstruct exactly (float64 packs) and stay unit-norm
    u = np.array(rows[0]["unit"])
    assert abs(np.linalg.norm(u) - 1.0) < 1e-9
    # cluster ids match the layout's own blocks
    by_block = {}
    for b in packed.collect():
        for vid in b["vec_ids"]:
            by_block[vid] = b["cluster_id"]
    assert all(by_block[r["vec_id"]] == r["cluster_id"] for r in rows)


def test_stats_shape_and_totals(spark, layout):
    stats = ivf_layout_stats(spark, layout).collect()
    assert len(stats) == 4  # every centroid has a row
    assert sum(r["n_rows"] for r in stats) == 400
    assert all(r["n_blocks"] >= 1 for r in stats)
    # tight bundles → small residuals
    assert all(0 < r["mean_resid"] < 0.5 for r in stats)


def test_retrain_gain_near_zero_on_fresh_fit(spark, layout):
    g = ivf_retrain_gain(spark, layout, sample_rows=400, seed=11)
    assert g["n_sample"] == 400
    # the standing quantizer was fit on this very data: a refit can
    # only buy noise
    assert g["gain_pct"] < 10.0


def test_facade_maintenance_methods(spark, layout):
    from mcp_vector_search_spark.api import SparkProject

    vecs = _clustered_vecs(spark)
    proj = SparkProject(spark, docs=vecs, vectors=vecs)
    health = proj.ann_index_health(layout).collect()
    assert sum(r["n_rows"] for r in health) == 400
    gain = proj.ann_retrain_gain(layout, sample_rows=400)
    assert set(gain) == {"current_resid", "refit_resid", "gain_pct", "n_sample"}
    # wrong-kind layouts are refused before any block is touched;
    # restore the (manifest-less) fixture state afterwards — later
    # tests share this module-scoped layout (r6 review)
    import shutil

    spark.createDataFrame([("ivfpq",)], "kind string").write.mode(
        "overwrite"
    ).parquet(f"{layout}/kind")
    try:
        with pytest.raises(ValueError, match="maintenance"):
            proj.ann_index_health(layout)
        with pytest.raises(ValueError, match="maintenance"):
            proj.retrain_ann_index(layout)
    finally:
        shutil.rmtree(f"{layout}/kind")


def test_unpack_rejects_code_layouts(spark, layout):
    packed, _ = read_ivf_layout(spark, layout)
    with pytest.raises(ValueError, match="float IVF"):
        ivf_unpack(packed.withColumnRenamed("mat", "codes")).collect()


def test_drift_then_retrain_restores_fit(spark, tmp_path):
    path = str(tmp_path / "layout")
    vecs = _clustered_vecs(spark, seed=7)
    assigned, cents = ivf_build_sampled(vecs, num_clusters=4, seed=3)
    write_ivf_layout(ivf_pack(assigned, rows_per_block=64), cents, path)

    # stream-append a drifted batch against the STANDING quantizer
    from mcp_vector_search_spark.operators.ivf import ivf_assign

    drifted = _clustered_vecs(spark, n=400, seed=8, shift=1.4, id0=1000)
    app = ivf_assign(drifted, cents)
    write_ivf_layout(ivf_pack(app, rows_per_block=64), cents, path, mode="append")

    before = ivf_retrain_gain(spark, path, sample_rows=800, seed=11)
    assert before["gain_pct"] > 8.0  # drift is visible

    # the corpus now holds 8 bundles (4 original + 4 drifted): the
    # maintenance action is a refit at the grown cluster count
    k = retrain_ivf_layout(spark, path, num_clusters=8, sample_rows=800, seed=5)
    assert k == 8
    after = ivf_retrain_gain(spark, path, sample_rows=800, seed=11)
    assert after["current_resid"] < before["current_resid"]
    assert after["gain_pct"] < 5.0  # quantizer fits the data again

    # layout integrity: same ids, and probe-all serving == brute force
    packed, cents2 = read_ivf_layout(spark, path)
    ids = sorted(r["vec_id"] for r in ivf_unpack(packed).collect())
    assert ids == list(range(400)) + list(range(1000, 1400))

    all_vecs = vecs.unionByName(drifted)
    queries = all_vecs.filter(F.col("vec_id").isin([0, 5, 1001])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in topk_per_query_np(all_vecs, queries, 5).collect()
    }
    served = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk_batch_packed(packed, cents2, queries, 5, nprobes=8).collect()
    }
    assert served == exact


def test_retrain_preserves_kind_manifest(spark, tmp_path):
    # save → retrain → load must round-trip: the retrain overwrite
    # swaps the whole layout root, and dropping the facade's kind
    # manifest broke the documented reload-after-retrain workflow and
    # silently lost the wrong-kind load guard (r6 review)
    from mcp_vector_search_spark.api import SparkProject

    path = str(tmp_path / "layout")
    vecs = _clustered_vecs(spark)
    proj = SparkProject(spark, docs=vecs, vectors=vecs)
    proj.build_ann_index(num_clusters=4, kind="ivf")
    proj.save_ann_index(path)
    proj.retrain_ann_index(path, num_clusters=4, sample_rows=400)
    proj.load_ann_index(path)  # no kind= — must read the manifest
    with pytest.raises(ValueError, match="kind"):
        proj.load_ann_index(path, kind="ivfpq")


def test_retrain_reports_actual_cluster_count(spark, tmp_path):
    # _lloyd_fit caps k at the sample size; the return value must be
    # the REAL cluster count, not the requested one (r6 review)
    path = str(tmp_path / "layout")
    vecs = _clustered_vecs(spark)
    assigned, cents = ivf_build_sampled(vecs, num_clusters=4, seed=3)
    write_ivf_layout(ivf_pack(assigned, rows_per_block=64), cents, path)
    k = retrain_ivf_layout(spark, path, num_clusters=64, sample_rows=10, seed=5)
    assert k <= 10
    _, new_cents = read_ivf_layout(spark, path)
    assert new_cents.count() == k


def test_layout_root_crash_is_recovered(spark, tmp_path):
    # a crash inside the retrain/overwrite root swap leaves only
    # `<path>.old`; readers must rename it back (r6 review)
    import os

    path = str(tmp_path / "layout")
    vecs = _clustered_vecs(spark)
    assigned, cents = ivf_build_sampled(vecs, num_clusters=4, seed=3)
    write_ivf_layout(ivf_pack(assigned, rows_per_block=64), cents, path)
    os.rename(path, path + ".old")
    packed, cents2 = read_ivf_layout(spark, path)
    assert packed.count() > 0 and cents2.count() == 4


def test_stats_reject_code_layouts(spark, layout):
    from mcp_vector_search_spark.operators.ivf import ivf_stats

    packed, cents = read_ivf_layout(spark, layout)
    with pytest.raises(ValueError, match="float IVF"):
        ivf_stats(packed.withColumnRenamed("mat", "codes"), cents)
