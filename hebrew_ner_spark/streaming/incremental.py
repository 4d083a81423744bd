"""Structured-Streaming ingestion: the same stage kernels, incrementally.

The reference has no streaming semantics (SURVEY.md §2.10) and the
north-rule's "incremental" is satisfied by the checkpoint/lineage
contract (plans/checkpoint.py). This module is the forward path the
survey reserves: the batch stage operators drop unchanged into
``foreachBatch``, with the file source's exactly-once offset tracking
(checkpointLocation) replacing the bucket ledger for arrival-driven
processing.

* ``run_incremental_triples`` — drain whatever landed in a documents
  directory with Trigger.availableNow, extract triples per micro-batch
  through the *identical* batch operator, write parquet. Re-running
  after new files arrive processes only the new files. The sink is
  **idempotent per micro-batch**: each batch overwrites its own
  deterministic ``batch_id=<N>`` subdirectory, so a crash between the
  sink write and the streaming checkpoint commit replays the batch into
  the same path instead of duplicating rows (a plain append would be
  at-least-once).
* ``run_windowed_event_counts`` — event-time tumbling-window counts with
  a watermark for late data, drained with availableNow; the aggregate
  matches the batch groupBy exactly once the stream is drained.
* ``run_incremental_unique_docs`` — streaming exact dedup at ingestion:
  dropDuplicates keyed state persists in the checkpoint, so re-landed
  mirror pages are dropped across drains AND restarts.
* ``run_stateful_entity_totals`` — custom stateful operator via
  ``applyInPandasWithState``: cumulative per-entity mention totals whose
  state restores from the checkpointed state store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def run_incremental_triples(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> int:
    """Drain new document files -> append extracted triples. Returns the
    number of micro-batches processed in this drain."""
    # batch_id numbering restarts at 0 when the checkpoint is gone, so a
    # fresh checkpoint + surviving output would pair a replayed batch 0
    # with stale higher-numbered directories from the previous life and
    # double-count. A missing checkpoint therefore resets the output:
    # exactly-once holds per checkpoint lifetime.
    triples_dir = os.path.join(out_dir, "triples")
    if not os.path.exists(checkpoint_dir) and os.path.exists(triples_dir):
        import shutil

        shutil.rmtree(triples_dir)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        n_batches["n"] += 1
        # overwrite of a batch-keyed path = exactly-once under replay:
        # the same batch_id always lands in (and fully replaces) the
        # same directory, whatever partial state a crash left there
        (
            kg.doc_triples(batch_df)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "triples", f"batch_id={batch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def run_windowed_event_counts(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Event-time tumbling 1h windows with a 2h watermark, availableNow."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("hour_ms"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_unique_docs(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Streaming exact dedup at ingestion: documents whose text hash was
    seen in ANY earlier micro-batch (or an earlier run of the same
    checkpoint) are dropped by Structured Streaming's keyed state store —
    ``dropDuplicates`` state survives restarts via the checkpoint, so a
    re-landed mirror page never re-enters the corpus.

    availableNow-drained here; a 24/7 ingest would bound the state with
    ``dropDuplicatesWithinWatermark`` instead of keeping every hash
    forever. Sink uses the same per-batch-overwrite idempotence as the
    triples path.
    """
    uniq_dir = os.path.join(out_dir, "unique")
    if not os.path.exists(checkpoint_dir) and os.path.exists(uniq_dir):
        import shutil

        shutil.rmtree(uniq_dir)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    uniq = stream.withColumn("text_md5", F.md5("text")).dropDuplicates(["text_md5"])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(os.path.join(uniq_dir, f"batch_id={batch_id}"))
        )

    q = (
        uniq.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stateful_entity_totals(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Custom stateful streaming operator (applyInPandasWithState):
    cumulative mention totals per entity across ALL micro-batches and
    runs — the state (one long per entity) lives in the streaming state
    store and restores from the checkpoint on restart.

    Emits (entity, total) rows with the updated running total whenever an
    entity appears in a batch; the parquet sink keeps the latest row per
    entity per drain under the idempotent per-batch layout.
    """
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from hebrew_ner_spark.operators import kg

    totals_dir = os.path.join(out_dir, "entity_totals")
    if not os.path.exists(checkpoint_dir) and os.path.exists(totals_dir):
        import shutil

        shutil.rmtree(totals_dir)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    mentions = (
        kg.doc_token_labels(stream)
        .where(F.col("label") != "O")
        .select(F.col("token").alias("entity"))
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_new = sum(len(pdf) for pdf in pdfs)
        (prev,) = state.get if state.exists else (0,)
        total = prev + n_new
        state.update((total,))
        yield pd.DataFrame({"entity": [key[0]], "total": [total]})

    totals = mentions.groupBy("entity").applyInPandasWithState(
        update,
        outputStructType="entity string, total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(os.path.join(totals_dir, f"batch_id={batch_id}"))
        )

    q = (
        totals.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def run_incremental_link_graph(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> int:
    """Drain newly-landed page files -> per-batch PARTIAL host-graph
    counts. Each micro-batch runs the identical batch extractor
    (weblinks.link_edges) over just its files and overwrites its own
    batch-keyed directory (exactly-once under replay, the
    run_incremental_triples contract); ``read_link_graph`` folds the
    partials with one aggregate — counts are algebraic, so
    fold(partials) == batch build, which the pytest pins. Returns the
    number of micro-batches processed in this drain."""
    from hebrew_ner_spark.operators import weblinks

    edges_dir = os.path.join(out_dir, "link_edges")
    if not os.path.exists(checkpoint_dir) and os.path.exists(edges_dir):
        import shutil

        shutil.rmtree(edges_dir)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        n_batches["n"] += 1
        (
            weblinks.link_edges(batch_df)
            .write.mode("overwrite")
            .parquet(os.path.join(edges_dir, f"batch_id={batch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def read_link_graph(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the per-batch partial counts into the host graph (one
    aggregation — the partials are already host-pair-keyed and tiny).
    A drain that processed zero batches wrote nothing; fold to an empty
    graph instead of raising PATH_NOT_FOUND — caught from the reader
    (not os.path.exists, which is local-FS-only and would silently
    empty a populated s3a://hdfs:// graph)."""
    from pyspark.errors import AnalysisException

    edges_dir = os.path.join(out_dir, "link_edges")
    try:
        partials = spark.read.parquet(edges_dir)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        return spark.createDataFrame(
            [], "src_host string, dst_host string, n_links long"
        )
    return partials.groupBy("src_host", "dst_host").agg(
        F.sum("n_links").cast("long").alias("n_links")
    )


def run_incremental_postings(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> int:
    """Drain newly-landed page files -> per-batch PARTIAL postings
    statistics (term, df, cf). Same exactly-once contract as
    run_incremental_link_graph: each micro-batch runs the identical
    batch operator (search.term_postings) over only its files and
    overwrites its own batch-keyed directory; the postings summary is
    algebraic (both counts are sums), so fold(partials) == one-shot
    build over everything drained — the retrieval index never
    re-tokenizes the base corpus as the crawl grows."""
    from hebrew_ner_spark.operators import search

    postings_dir = os.path.join(out_dir, "postings")
    if not os.path.exists(checkpoint_dir) and os.path.exists(postings_dir):
        import shutil

        shutil.rmtree(postings_dir)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        n_batches["n"] += 1
        docs = batch_df.select(F.xxhash64("url").alias("doc_id"), "text")
        (
            search.term_postings(docs)
            .write.mode("overwrite")
            .parquet(os.path.join(postings_dir, f"batch_id={batch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def read_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the per-batch partial postings into the index (one term-keyed
    aggregate — the merge_postings algebra applied across all partials).
    Empty drains fold to an empty index, same reader-side PATH_NOT_FOUND
    contract as read_link_graph."""
    from pyspark.errors import AnalysisException

    postings_dir = os.path.join(out_dir, "postings")
    try:
        partials = spark.read.parquet(postings_dir)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        return spark.createDataFrame([], "term string, df long, cf long")
    return partials.groupBy("term").agg(
        F.sum("df").cast("long").alias("df"),
        F.sum("cf").cast("long").alias("cf"),
    )


def run_attribution_join(
    spark: SparkSession,
    clicks_dir: str,
    views_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_min: int = 10,
) -> None:
    """Stream-STREAM interval join (the ad-attribution canonical form):
    each click joins the same user's views from the preceding
    ``window_min`` minutes. Both sides carry 1-hour event-time
    watermarks, so Spark bounds the view-side join state — views older
    than watermark - window are evicted instead of buffered forever,
    which is the entire point of watermarked stream-stream joins at
    10^12-event scale (unbounded state is the naive join's failure
    mode). Append output; availableNow drains.

    Cross-batch correctness contract (pytest-pinned): a click arriving
    in a later micro-batch still finds views from earlier batches while
    they are inside the watermark horizon — state lives across
    triggers, and time-ordered file landings (the ingest reality) keep
    every in-window pair alive until matched.
    """
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(clicks_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    views = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(views_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    joined = clicks.join(
        views,
        (clicks.user_id == views.user_id)
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {window_min} MINUTES")
        ),
    ).select(
        "click_id",
        "view_id",
        clicks.user_id.alias("user_id"),
        F.unix_millis("click_ts").alias("click_ms"),
        F.unix_millis("view_ts").alias("view_ms"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()



CHANGES_SCHEMA = (
    "o_orderkey long, op string, o_custkey long, o_totalprice double, "
    "o_orderstatus string"
)


def run_streaming_mv(
    spark: SparkSession, base_path: str, src_dir: str, out_dir: str,
    checkpoint_dir: str
) -> int:
    """Streaming INCREMENTAL VIEW MAINTENANCE: drain CDC change files
    and fold each micro-batch's additive delta onto the materialized
    orders summary — the lakehouse pattern where the MV is maintained
    by the change stream, never by rescanning the fact table.

    Per batch N the sink reads the MV as of batch N-1 (an immutable
    batch-versioned snapshot — exactly the Iceberg snapshot discipline),
    applies ``maintenance.mv_delta(base, batch)`` via
    ``apply_mv_delta``, and overwrites ``mv/batch_id=N`` with the FULL
    post-batch MV. A replayed batch therefore rewrites its own version
    from its immutable predecessor: exactly-once per checkpoint
    lifetime, same contract as the other sinks here. Retraction
    pre-images come from the original base under the CDC batch's
    one-change-per-key contract (each key appears in at most one batch),
    so no base-table versioning is needed in the fold.

    Returns the last batch id (the current MV version).
    """
    import shutil

    from hebrew_ner_spark.operators.maintenance import (
        apply_mv_delta,
        mv_delta,
        orders_mv,
    )

    mv_dir = os.path.join(out_dir, "mv")
    if not os.path.exists(checkpoint_dir) and os.path.exists(mv_dir):
        shutil.rmtree(mv_dir)

    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    last = {"id": -1}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        base = spark.read.parquet(base_path)
        if batch_id == 0:
            prev = orders_mv(base)
        else:
            prev = spark.read.parquet(
                os.path.join(mv_dir, f"batch_id={batch_id - 1}")
            )
        new = apply_mv_delta(prev, mv_delta(base, batch_df))
        new.write.mode("overwrite").parquet(
            os.path.join(mv_dir, f"batch_id={batch_id}")
        )
        last["id"] = batch_id

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return last["id"]


DEDUP_WM_DELAY = "1 hour"


def run_bounded_stream_dedup(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> list:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    keyed on doc_id with a 1-hour event-time watermark — the 24/7
    counterpart of ``run_incremental_unique_docs`` (whose keyed state
    grows forever). State for a key is evicted once the watermark
    passes its event time + delay, so memory is O(traffic in the
    horizon) at any stream length; the price is that a re-landing
    BEYOND the horizon re-emits — which is not a bug but the documented
    contract, and exactly what the gate pins: near re-landings (within
    the delay) are dropped, far ones (days later) re-emit, both
    deterministically under in-order arrival."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA + ", ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", DEDUP_WM_DELAY)
        .dropDuplicatesWithinWatermark(["doc_id"])
        .select("doc_id", F.unix_millis("ts").alias("ts_ms"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # recentProgress carries per-micro-batch stateOperators metrics
    # (numRowsTotal etc.) — the soak test asserts bounded-state growth
    # from these; gates ignore the return value
    return list(q.recentProgress)


SESS_GAP_MIN = 30      # session gap (matches the batch operator)
SESS_WM_DELAY = "10 minutes"


def run_stateful_sessions(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> list:
    """Custom stateful SESSIONIZATION via ``applyInPandasWithState`` +
    EVENT-TIME TIMEOUT — the flagship custom-operator pattern: the
    state store carries each user's open session (start, last, count);
    new batches fold their rows into it (splitting on in-batch and
    cross-batch gaps — closed sessions emit immediately), and an IDLE
    key's open session is closed by the state timeout when the
    watermark (advanced by OTHER users' traffic) passes last + gap —
    no per-key poll, which is what makes the operator viable over
    10^9 concurrent sessions.

    Emitted rows: (user_id, sess_start_ms, sess_end_ms, n_events) with
    sess_end_ms = last event + gap (the session-window convention the
    batch operator uses). Trailing sessions whose timeout the final
    watermark never reaches stay in state, unemitted — part of the
    gated semantics, exactly like the append-mode window gate.
    """
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = SESS_GAP_MIN * 60_000

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", SESS_WM_DELAY)
        .select("user_id", "ts")
    )

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((key[0], start, last + gap_ms, n))
            state.remove()
        else:
            ts = pd.concat(list(pdfs))["ts"].sort_values()
            ms = (ts.astype("int64") // 1_000_000).tolist()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ms[0], ms[0] - 1, 0  # sentinel: no row yet
            for t in ms:
                if n and t - last > gap_ms:
                    closed.append((key[0], start, last + gap_ms, n))
                    start, n = t, 0
                last = t
                n += 1
            state.update((start, last, n))
            state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "sess_start_ms", "sess_end_ms",
                         "n_events"],
            )

    sessions = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, sess_start_ms long, sess_end_ms long, "
            "n_events long"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return list(q.recentProgress)
