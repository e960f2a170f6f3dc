"""Durable serving layouts for the packed codec family (r6).

Round 5 gave the float IVF layout a full disk lifecycle
(``operators/ivf.py:write_ivf_layout``/``read_ivf_layout`` — blocks
partitioned for physical pruning, append with a quantizer-equality
guard, streaming sink, compaction). The PQ/SQ code layouts — the
codecs that carry the 100 TB memory story (80× smaller than float
vectors) — only lived in the session cache. This module is the
generic write/read/append for any packed layout:

    {path}/blocks/...       parquet, partitioned (part_col, batch_id)
    {path}/<meta_name>/...  one parquet table per metadata frame
                            (centroids, codebooks, bounds, ...)

matching the reference's persisted-index behavior (LanceDB tables,
``vectors_backend.py:202-341``) re-expressed as parquet + partition
pruning. The partition scheme shares the float layout's
(part, batch_id) shape — batch writes stamp batch_id=-1 — so a
future streaming sink can append per-micro-batch partitions the same
way `ann_layout_sink` does.

Append contract: appended blocks MUST be encoded against the SAME
metadata (same coarse centroids, same codebooks, same SQ bounds) —
mixed quantizers silently corrupt recall — so ``mode="append"``
verifies every persisted metadata table equals the given one exactly
(all are small: ≤512 centroids, m·k codebook rows, one bounds row)
and raises on drift. A re-fit means a new layout path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rows_key(rows) -> list:
    """Order-insensitive, nested-list-insensitive comparison key for a
    small collected metadata table."""

    def norm(v):
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    return sorted(tuple(norm(v) for v in row) for row in rows)


def write_codec_layout(
    packed: DataFrame,
    meta: dict[str, DataFrame],
    path: str,
    mode: str = "overwrite",
    part_col: str = "cluster_id",
) -> None:
    """Persist a packed layout: blocks partitioned by
    (part_col, batch_id) + one table per metadata frame. See module
    docstring for the append contract."""
    if "batch_id" not in packed.columns:
        packed = packed.withColumn("batch_id", F.lit(-1))
    if mode == "append":
        spark = packed.sparkSession
        for name, df in meta.items():
            try:
                existing = spark.read.parquet(f"{path}/{name}").collect()
            except Exception as e:
                raise ValueError(
                    f"append to a layout with no readable {name} table at "
                    f"{path}/{name}: write the initial layout with "
                    f"mode='overwrite' first ({e.__class__.__name__})"
                ) from e
            if _rows_key(existing) != _rows_key(df.collect()):
                raise ValueError(
                    f"append {name} differ from the persisted layout — "
                    "blocks encoded against different quantizer state "
                    "cannot be appended (overwrite, or use a new path)"
                )
        packed.write.mode("append").partitionBy(part_col, "batch_id").parquet(
            f"{path}/blocks"
        )
        return
    packed.write.mode(mode).partitionBy(part_col, "batch_id").parquet(
        f"{path}/blocks"
    )
    for name, df in meta.items():
        df.write.mode(mode).parquet(f"{path}/{name}")


def read_codec_layout(
    spark: SparkSession, path: str, meta_names: tuple[str, ...]
) -> tuple[DataFrame, ...]:
    """(blocks, *meta) — ready for the packed scoring kernels
    (batch_id rides along as a passthrough column they ignore)."""
    return (spark.read.parquet(f"{path}/blocks"),) + tuple(
        spark.read.parquet(f"{path}/{name}") for name in meta_names
    )


def write_ivfpq_layout(
    packed_codes: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist an IVF-PQ code layout (`ivfpq_pack` blocks + coarse
    centroids + per-subspace codebooks). Append verifies BOTH the
    coarse quantizer and the codebooks are unchanged."""
    write_codec_layout(
        packed_codes,
        {"centroids": centroids, "codebooks": codebooks},
        path,
        mode=mode,
        part_col="cluster_id",
    )


def read_ivfpq_layout(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(packed_codes, centroids, codebooks) for `ivfpq_topk_packed` /
    `ivfpq_topk_refined(packed_codes=...)`."""
    return read_codec_layout(spark, path, ("centroids", "codebooks"))


def write_sq_layout(
    packed_codes: DataFrame,
    bounds: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist an SQ code layout (`sq_pack` blocks + the pinned
    per-dimension bounds). SQ blocks are hash-bucketed, not
    clustered, so the partition column is `bucket`; there is no probe
    pruning (the SQ scan is flat) — persistence here buys the
    startup/restart story and the 8× smaller scan bytes."""
    write_codec_layout(
        packed_codes, {"bounds": bounds}, path, mode=mode, part_col="bucket"
    )


def read_sq_layout(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(packed_codes, bounds) for `sq_topk_packed` /
    `sq_topk_refined(packed_codes=...)`."""
    return read_codec_layout(spark, path, ("bounds",))
