"""Incremental indexing as a Structured Streaming pipeline (reference
ST1 ``core/watcher.py:18-120`` + ST4/ST5 resumable & atomic rebuild).

Shape: a file-source stream of document batches → `foreachBatch`
running the SAME batch operators (fingerprint → changed_or_new
anti-join → chunk) → atomic state swap. Everything the reference
hand-builds dissolves into Spark machinery:

- debounce (2s timer)        → micro-batch trigger (availableNow here;
                               processingTime in a live deployment)
- resumable state machine    → the checkpoint dir: a crashed batch
                               re-runs, and the anti-join makes the
                               replay idempotent
- atomic rebuild (stage+swap)→ write state to `<dir>.tmp`, os.rename
- move detection / dedupe    → the incremental joins in
                               operators/incremental.py

State layout: `<state_dir>/state.parquet` holds (doc_id, fingerprint);
`<state_dir>/chunks.parquet` accumulates chunk rows partitioned by
batch_id (append-only across batches, replay-idempotent within one).
The accumulated table keeps EVERY batch's rows — a changed document's
old chunks stay on disk — so consumers read the live set through
`latest_chunks`, which supersedes a doc's chunks with its newest
batch (the reference's incremental reindex REPLACES a changed file's
chunks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.text import doc_fingerprint
from mcp_vector_search_spark.io import atomic_swap_dir
from mcp_vector_search_spark.operators.incremental import changed_or_new
from mcp_vector_search_spark.sources.chunker import chunk_tokens

DOC_SCHEMA = "doc_id long, text string, source string"


def _dir_has_no_partitions(path: str) -> bool:
    """True when `path` exists but holds NO batch_id= partition dirs —
    the state a zero-row bootstrap batch leaves behind (partitionBy
    writes only _SUCCESS for zero rows). Hadoop FS listing, not
    os.listdir: the state_dir may be an HDFS/S3 URI (r6 review)."""
    from mcp_vector_search_spark.io import _hadoop_fs

    fs, P = _hadoop_fs(path)
    jpath = P(path)
    if not fs.exists(jpath):
        return True
    for st in fs.listStatus(jpath):
        if st.getPath().getName().startswith("batch_id="):
            return False
    return True


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "state.parquet")


def _chunks_path(state_dir: str) -> str:
    return os.path.join(state_dir, "chunks.parquet")


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    from mcp_vector_search_spark.io import recover_swap

    path = _state_path(state_dir)
    # a crash inside the upsert swap leaves only <path>.old — restore
    # it rather than treating the whole corpus as brand new
    recover_swap(path)
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], "doc_id long, fingerprint string")


def latest_chunks(spark: SparkSession, state_dir: str) -> DataFrame:
    """The LIVE chunk set: each document's chunks from the newest
    batch that wrote it. The accumulated chunks table keeps every
    batch's rows (replay-idempotent writes need stable per-batch
    partitions), so a changed document would otherwise serve BOTH its
    old and new text to any consumer reading the raw table
    (r6 review #6). One shuffle on doc_id; at scale the max-batch
    filter prunes with the partition column in the scan."""
    from pyspark.sql.window import Window

    ch = spark.read.parquet(_chunks_path(state_dir))
    w = Window.partitionBy("doc_id")
    return (
        ch.withColumn("_mx", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("_mx"))
        .drop("_mx")
    )


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int | None = None,
) -> int:
    """One incremental round: fingerprint → anti-join against indexed
    state → chunk only the delta → write chunks, swap state atomically.
    Returns the number of changed/new docs (0 ⇒ no writes at all)."""
    # corrupt/partial records (permissive JSON parse yields null ids)
    # must not enter the index
    batch = batch.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    docs = batch.withColumn("fingerprint", doc_fingerprint("text"))
    # Late-arriving duplicates within one batch: keep the latest
    # delivery as ONE whole row — text/source/fingerprint must come
    # from the same record or the persisted fingerprint would not match
    # the chunked text. Arrival order is the file modification time when
    # the stream provides it (`_arrival_ts`); ties (and the plain batch
    # path) fall back to a deterministic (source, fingerprint) order.
    order_cols = ["source", "fingerprint"]
    if "_arrival_ts" in docs.columns:
        order_cols = ["_arrival_ts", *order_cols]
    docs = (
        docs.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("text", "source", "fingerprint"),
                F.struct(*order_cols),
            ).alias("r")
        )
        .select("doc_id", "r.text", "r.source", "r.fingerprint")
    )
    indexed = read_state(spark, state_dir)
    delta = changed_or_new(docs, indexed).cache()
    n = delta.count()
    if n == 0:
        delta.unpersist()
        return 0

    # Chunk write is keyed by the foreachBatch batch_id: a replayed
    # micro-batch dynamically overwrites its own partition instead of
    # appending duplicate chunk rows (plain append otherwise broke the
    # replay-idempotency claim). The plain-batch path (batch_id=None)
    # uses the SAME partition scheme with the next free id — mixing an
    # unpartitioned append with partitioned stream writes corrupted
    # parquet partition discovery for the whole table (r6 review #6);
    # don't interleave plain and stream lifecycles on one state_dir
    # (a plain call's synthesized id could collide with a future
    # micro-batch id).
    chunks = chunk_tokens(delta)
    if batch_id is None:
        # 'first write' is ONLY a missing/empty path. A bare
        # `except Exception: 0` here masked genuine read errors
        # (permissions, corruption) as first-write and — for a chunks
        # table written by a pre-batch_id layout — wrote partitioned
        # files into an unpartitioned directory, the exact
        # mixed-partition-depth corruption warned about above
        # (r6 advice).
        from pyspark.errors import AnalysisException

        try:
            prev_tbl = spark.read.parquet(_chunks_path(state_dir))
        except AnalysisException as e:
            cond = (
                getattr(e, "getCondition", None)
                or getattr(e, "getErrorClass", None)
            )
            cond = cond() if cond is not None else None
            # condition-less AnalysisExceptions (message-only variants on
            # some Spark builds) fall back to message matching, the same
            # detection api._persisted_kind uses (r7 review)
            if cond == "PATH_NOT_FOUND" or (
                cond is None and "Path does not exist" in str(e)
            ):
                batch_id = 0  # first write (no table yet)
            elif cond == "UNABLE_TO_INFER_SCHEMA" and _dir_has_no_partitions(
                _chunks_path(state_dir)
            ):
                # a zero-row bootstrap batch legitimately leaves a chunks
                # dir with only _SUCCESS (partitionBy writes no files for
                # zero rows) — genuinely empty is still first-write
                batch_id = 0
            elif cond == "UNABLE_TO_INFER_SCHEMA":
                # present-but-unreadable WITH partition dirs = torn copy /
                # manual truncation. Restarting batch numbering at 0 here
                # would silently re-issue batch ids that downstream
                # batch-id-keyed state may have consumed — corruption, not
                # first-write; mirror bm25._bm25_meta (r7 advice)
                raise ValueError(
                    f"corrupt chunks table at {_chunks_path(state_dir)}: "
                    "batch_id partition dirs exist but no parquet files "
                    "are readable — restore the state_dir or delete the "
                    "chunks table to restart batch numbering explicitly"
                ) from e
            else:
                raise
        else:
            if "batch_id" not in prev_tbl.columns:
                raise ValueError(
                    f"existing chunks table at {_chunks_path(state_dir)} has "
                    "no batch_id partition column — it was written by an "
                    "unpartitioned append; refusing to write a mixed "
                    "partition layout. Rebuild the state_dir (or migrate "
                    "the table to batch_id partitions) first."
                )
            prev = prev_tbl.agg(F.max("batch_id")).first()[0]
            batch_id = (prev if prev is not None else -1) + 1
    (
        chunks.withColumn("batch_id", F.lit(int(batch_id)))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(_chunks_path(state_dir))
    )

    # new state = old rows for unchanged ids + delta rows (upsert),
    # staged then swapped — the ST5 atomic-rebuild pattern
    new_state = (
        indexed.join(delta.select("doc_id"), "doc_id", "left_anti")
        .unionByName(delta.select("doc_id", "fingerprint"))
    )
    tmp = _state_path(state_dir) + ".tmp"
    new_state.write.mode("overwrite").parquet(tmp)
    atomic_swap_dir(tmp, _state_path(state_dir))
    delta.unpersist()
    return n


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch `input_dir` for JSONL doc batches and index incrementally.
    With `available_now` the query drains pending files and stops —
    the deterministic test/backfill mode; a live deployment uses a
    processingTime trigger (the reference's 2s debounce)."""
    stream = spark.readStream.schema(DOC_SCHEMA).json(input_dir)
    # file-source metadata gives a real arrival order for the
    # keep-the-last-delivery collapse in process_batch
    stream = stream.withColumn(
        "_arrival_ts", F.col("_metadata.file_modification_time")
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: process_batch(spark, batch, state_dir, batch_id=bid)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()


def versioned_upsert_sink(
    spark: SparkSession, path: str, key_cols: list[str], scope: str = "default"
):
    """foreachBatch writer with EXACTLY-ONCE commits into the
    versioned manifest table (io.upsert_versioned): every micro-batch
    upserts copy-on-write and its (scope, batch id) is recorded in
    the committed manifest; a REPLAYED batch (restart between sink
    commit and checkpoint advance — the classic foreachBatch
    at-least-once window) finds its id already committed and skips.
    Transactional idempotency instead of partition-overwrite
    bookkeeping; composes with any streaming source.

    `scope` identifies the streaming query — batch ids restart from 0
    per CHECKPOINT, so a table fed by multiple queries (or a query
    whose checkpoint was reset) needs one scope per checkpoint to keep
    replay detection from eating a different query's batch 0. Use the
    checkpoint dir (or any stable per-query name):

        stream.writeStream.foreachBatch(
            versioned_upsert_sink(spark, table_path, ["doc_id"],
                                  scope=checkpoint_dir))
    """
    from mcp_vector_search_spark import io as vio

    def write(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        # O(1) replay check against the latest manifest's txn map
        # (batch ids are monotone per checkpoint, so ≤ latest-committed
        # means replay). Reading EVERY manifest here was O(versions)
        # per batch and broke once vacuum pruned old manifests.
        last = vio.latest_txn(path).get(str(scope))
        if last is not None and bid <= last:
            return  # replay of an already-committed batch
        vio.upsert_versioned(
            spark, batch_df, path, key_cols,
            meta={"batch_id": bid, "scope": scope},
        )

    return write


def streaming_dedup(changes: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming exact-dedup: content fingerprints deduped within the
    watermark horizon (`dropDuplicatesWithinWatermark` — state is
    bounded by event time, unlike a plain dropDuplicates whose state
    grows forever). The batch analog is `exact_duplicates`; this is
    the arrival-stream half of the training-data dedup surface: docs
    whose fingerprint already streamed by within the horizon are
    suppressed at ingest.

    `changes` must carry (doc_id, text, ts TIMESTAMP). Corrupt rows
    (null text/ts) are filtered first — distinct corrupt records would
    otherwise collapse onto one NULL fingerprint and suppress each
    other (same guard the batch path applies in process_batch).
    """
    clean = changes.filter(F.col("text").isNotNull() & F.col("ts").isNotNull())
    fp = clean.withColumn("fingerprint", doc_fingerprint("text"))
    return (
        fp.withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


# --- streaming ANN indexing (r5): the arrival-stream half of the ----
# --- IVF layout lifecycle (operators/ivf.py ivf_assign/ivf_pack) ----


def bootstrap_ann_layout(
    vectors: DataFrame,
    layout_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int | None = None,
    dtype: str = "float64",
) -> None:
    """One-time base build for a STREAM-MAINTAINED packed IVF layout:
    sample-fit quantizer → pack → `write_ivf_layout` (blocks
    partitioned by (cluster_id, batch_id=-1) + the centroid table —
    since r6 the batch writer shares this scheme, so the two
    lifecycles can touch one layout path without mixing partition
    depths, ADVICE r5). The batch_id partition level is what lets
    `ann_layout_sink` append micro-batches idempotently (each batch
    owns its partitions); readers see it as one more passthrough
    column the scoring kernel ignores."""
    from mcp_vector_search_spark.operators.ivf import (
        ivf_build_sampled_packed,
        write_ivf_layout,
    )

    # refuse to clobber a standing layout (r6 review: the pre-r6 direct
    # write failed on an existing path via parquet's errorifexists —
    # keep that guard rather than inheriting write_ivf_layout's
    # overwrite default, which would silently destroy every streamed
    # batch partition AND swap the quantizer under serving readers).
    # Read-probe, not isdir: the path may be hdfs://, s3a://, etc.
    try:
        vectors.sparkSession.read.parquet(f"{layout_path}/centroids").head(1)
        exists = True
    except Exception:
        exists = False
    if exists:
        raise ValueError(
            f"{layout_path} already holds a layout — bootstrap refuses to "
            "overwrite (delete it, or use write_ivf_layout(mode='overwrite') "
            "deliberately)"
        )
    kwargs = {} if num_clusters is None else {"num_clusters": num_clusters}
    # r7: the fused one-pass build (bit-identical layout, only block
    # blobs shuffle); `dtype` sets the layout's pack codec — appends
    # through ann_layout_sink inherit it from the standing blocks
    packed, centroids = ivf_build_sampled_packed(
        vectors, vec_col=vec_col, id_col=id_col, dtype=dtype, **kwargs
    )
    write_ivf_layout(packed, centroids, layout_path)


def ann_layout_sink(
    spark: SparkSession,
    layout_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """foreachBatch writer: incremental ANN indexing against a
    standing quantizer. Each micro-batch of (id, vector) rows is
    assigned map-side to the bootstrap centroids (`ivf_assign` — no
    refit, no shuffle of the indexed corpus), packed into per-cluster
    blocks, and written into its own (cluster_id, batch_id)
    partitions with dynamic partition overwrite — a REPLAYED batch
    (restart inside the classic foreachBatch at-least-once window)
    deterministically reproduces the same assignment and overwrites
    its own partitions instead of double-appending blocks.

        stream.writeStream.foreachBatch(
            ann_layout_sink(spark, layout_path))

    Centroid drift: a stream that outgrows its bootstrap quantizer
    (new content far from every centroid) needs an OFFLINE refit into
    a fresh layout path — `write_ivf_layout` refuses cross-quantizer
    appends for the same reason.
    """
    from mcp_vector_search_spark.operators.ivf import ivf_pack_fused
    from mcp_vector_search_spark.operators.layout import (
        load_local_meta,
        write_stream_blocks,
    )

    # load the quantizer ONCE at sink creation (the layout must be
    # bootstrapped first): centroids are immutable for the layout's
    # lifetime by contract, so a per-micro-batch re-read was a wasted
    # Spark job + driver round-trip on every batch.
    cents = load_local_meta(spark, layout_path, "centroids")
    # appends inherit the STANDING layout's pack dtype: a float32
    # layout appended with the float64 default would mix dtypes and
    # the next compaction's widest-present upcast would silently
    # rewrite the whole layout as float64, losing the halved bytes the
    # builder opted into (r7 review)
    dtype_row = (
        spark.read.parquet(f"{layout_path}/blocks").select("dtype").first()
    )
    if dtype_row is None:
        # blocks dir exists but holds zero rows — first() returns None
        # and subscripting it raised an opaque TypeError (r7 advice)
        raise ValueError(
            f"ANN layout at {layout_path} has no blocks — bootstrap the "
            "layout (write_ivf_layout / facade build) before attaching "
            "the streaming sink"
        )
    dtype = dtype_row["dtype"]

    def write(batch_df: DataFrame, batch_id: int) -> None:
        # fused assign+pack: per-row unit arrays never cross Arrow and
        # the per-batch row shuffle carries block blobs only —
        # bit-identical blocks (tests/test_ivf.py)
        packed = ivf_pack_fused(
            batch_df, cents, vec_col=vec_col, id_col=id_col, dtype=dtype
        )
        write_stream_blocks(packed, layout_path, "cluster_id", batch_id)

    return write


def compact_ann_layout(
    spark: SparkSession,
    layout_path: str,
    rows_per_block: int = 65536,
    max_block_bytes: int = 32 << 20,
) -> tuple[int, int]:
    """Periodic maintenance for a stream-maintained packed IVF layout
    (VERDICT r5 #3; reference behavior: LanceDB's periodic compaction,
    ``vectors_backend.py:665-731``): a long-lived `ann_layout_sink`
    stream fragments each cluster into one block-set per micro-batch —
    many small matmuls and many small files. This rewrites every
    cluster's blocks into full-size id-sorted blocks
    (`operators/ivf.py:repack_blocks` — bit-identical serving results
    by construction), stages them under `blocks.tmp`, and atomically
    swaps via the rename-aside pattern the chunks sink uses (ST5;
    crash between the two renames is recovered by `recover_swap`,
    which this function runs first). Returns (blocks_before,
    blocks_after).

    The compacted blocks land in the batch_id=-1 partition — the same
    scheme bootstrap/batch writes use — so a stream can keep appending
    new batch_id partitions afterwards.

    CONTRACT: run with the appending stream QUIESCED (between
    triggers, or stopped) — the swap replaces `blocks/` wholesale, so
    a micro-batch committed mid-compaction would be lost. A pre-swap
    recheck aborts (RuntimeError, nothing modified) if blocks changed
    since the snapshot; the recheck-to-rename window is still racy in
    principle, hence the contract.

    The layout must have a readable centroid table (it is not
    otherwise a layout); centroids are untouched — compaction never
    changes the quantizer, it only merges blobs within each cluster.

    Storage note: the swap primitive is POSIX rename — right for the
    local/NFS checkpoints this engine tests on. On an object store,
    stage to a NEW layout path and flip the serving pointer (the
    `upsert_versioned` manifest pattern) instead.

    (r6: delegates to the generic codec compactor,
    `operators/layout.py:compact_codec_layout` — one implementation
    of the snapshot/recheck/swap sequence across the float, IVF-PQ,
    and SQ layouts.)
    """
    from mcp_vector_search_spark.operators.layout import compact_codec_layout

    return compact_codec_layout(
        spark,
        layout_path,
        part_col="cluster_id",
        width_col="dim",
        blob_col="mat",
        dtype_col="dtype",
        rows_per_block=rows_per_block,
        max_block_bytes=max_block_bytes,
        require_meta=("centroids",),
    )


def bm25_index_sink(
    spark: SparkSession,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    refresh_term_stats: bool = True,
):
    """foreachBatch writer: incremental TEXT indexing — the BM25
    analog of `ann_layout_sink`, completing the watch → reindex story
    for the lexical leg (reference: file watcher → incremental
    reindex, ``chunks_backend.py:269-551``). Each micro-batch is
    applied with `update_bm25_index`, which appends ONE postings
    segment (the batch is tokenized once) and rewrites the small
    live-doc map; stale postings from superseded docs stay invisible
    through the (doc_id, seg) join and are physically dropped by a
    periodic `compact_bm25_index` (same QUIESCED contract as
    `compact_ann_layout`).

        stream.writeStream.foreachBatch(
            bm25_index_sink(spark, index_path))

    `op_col` names an optional string column: rows with value
    'delete' become deletions (their text is ignored), everything
    else upserts — one CDC-shaped batch drives both. At-least-once
    upstream duplicates are absorbed: repeated deletes of one id and
    repeated (id, text)-identical upserts are deduped before the
    update. What still raises — deliberately, these are upstream DATA
    bugs with no defined winner, and foreachBatch will replay the
    batch so the error persists until the source is fixed: one id
    upserted with two DIFFERENT texts in a batch, or an id both
    upserted and deleted in one batch (same contract as
    `update_bm25_index`).

    Replay safety: a replayed micro-batch (restart inside the classic
    foreachBatch at-least-once window) allocates a NEW segment and
    re-points each touched doc's doc_stats row at it — the previous
    delivery's postings become invisible, so results are unchanged;
    the only cost is dead postings rows until the next compaction.

    Scale knob: `refresh_term_stats=False` skips the per-batch global
    idf recompute (an aggregation over the live postings — the one
    O(index) step per update); run `refresh_bm25_term_stats`
    periodically instead. The staleness is bounded but not
    weighting-only (r6 review): terms first introduced after the last
    refresh have no idf row yet, so docs matching ONLY brand-new terms
    are absent from results until the next refresh — existing-term
    updates and deletes serve correctly immediately. The index must
    exist (`write_bm25_index`, possibly over an empty corpus) before
    the stream starts."""
    from mcp_vector_search_spark.operators.bm25 import update_bm25_index

    def write(batch_df: DataFrame, batch_id: int) -> None:
        # one persist for the whole batch: foreachBatch sources are
        # re-read per action, and this function needs several (the
        # emptiness probe here, then tokenize + dupe-check + doc_stats
        # merge inside update_bm25_index) — unpersisted, each would
        # re-scan the source, wasting the latency budget the
        # refresh_term_stats knob exists to save (r6 review)
        batch_df.persist()
        try:
            if op_col is not None:
                is_del = F.coalesce(F.col(op_col) == "delete", F.lit(False))
                # deletes are idempotent — distinct() absorbs
                # at-least-once duplicates; identical re-delivered
                # upserts dedup on (id, text). One aggregation decides
                # both branches (was: three isEmpty probes = three
                # jobs per micro-batch).
                dels = batch_df.filter(is_del).select(id_col).distinct()
                ups = batch_df.filter(~is_del).dropDuplicates([id_col, text_col])
                ops = {
                    bool(r["is_del"]): r["cnt"]
                    for r in batch_df.groupBy(is_del.alias("is_del"))
                    .agg(F.count("*").alias("cnt"))
                    .collect()
                }
                if not ops:
                    return
                update_bm25_index(
                    spark,
                    index_path,
                    ups if ops.get(False) else None,
                    deleted_ids=dels if ops.get(True) else None,
                    id_col=id_col,
                    text_col=text_col,
                    refresh_term_stats=refresh_term_stats,
                )
            else:
                if batch_df.isEmpty():
                    return
                update_bm25_index(
                    spark,
                    index_path,
                    batch_df.dropDuplicates([id_col, text_col]),
                    id_col=id_col,
                    text_col=text_col,
                    refresh_term_stats=refresh_term_stats,
                )
        finally:
            batch_df.unpersist()

    return write
