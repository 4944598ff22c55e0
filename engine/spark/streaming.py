"""Structured Streaming surface.

The reference is batch-with-resume (pickle checkpoints), which maps to
batch + lineage (engine/spark/lineage.py) — but a transcript firehose is
naturally a stream, so the engine also exposes the same extraction and
a windowed-aggregation operator as Structured Streaming jobs with
watermarked event-time windows and Trigger.AvailableNow (gives exactly
the reference's resume semantics via the checkpointLocation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_event_window_counts(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_counts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source stream → watermarked tumbling-window counts → memory
    sink, run to completion with availableNow (batch-equivalent result,
    streaming execution path)."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(events_path)
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum → exact, deterministic across engines/partitions
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_event_window_counts_append(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    output_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The PRODUCTION shape of the windowed aggregation: ``append``
    output mode + file (parquet) sink.  Unlike the complete-mode memory
    sink (:func:`stream_event_window_counts` — fine as a test harness),
    state here is BOUNDED: a window is held only until the watermark
    passes its end, then emitted once and evicted — the only shape that
    survives an unbounded firehose.

    Emission contract (the DuckDB oracle mirrors it): exactly the
    windows with ``window_end <= max(event_time) - watermark_delay``
    are in the sink when an availableNow run terminates; the trailing
    still-open windows stay in state for the next incremental run
    (same checkpoint), which is the streaming twin of the batch
    lineage/resume semantics."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.load(events_path)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(output_path)


def stream_dedup_keys(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_dedup",
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "365 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: one output row per distinct key, duplicate
    arrivals dropped with ``dropDuplicatesWithinWatermark`` — state for a
    key is held only for the watermark horizon, so state size is bounded
    by (distinct keys within horizon), not the stream's full history.
    That bounded-state property is what makes streaming dedup viable on
    an unbounded 100 TB firehose; a plain dropDuplicates would grow
    state forever.

    Only the key columns are emitted: WHICH duplicate survives depends
    on micro-batch arrival order, but the key set is deterministic —
    the oracle is a batch SELECT DISTINCT.  NOTE the contract: output ==
    DISTINCT only while the corpus event-time span stays inside the
    watermark horizon (a key re-appearing after its state expired is
    correctly re-emitted — that's the bounded-state semantics, not a
    bug).  The default horizon is deliberately generous for the bounded
    test corpora; production picks the dedup horizon it wants."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        # chunk availableNow into per-file micro-batches so cross-batch
        # dedup state is actually exercised
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.load(events_path)
    deduped = (
        src.withWatermark("ts", watermark)
        .select("ts", *keys)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_stream_join(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_joined",
    lookback: str = "1 hour",
    state_watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition — the
    trades×quotes shape as a genuinely streaming operator: each trade
    matches the quotes of the SAME user within ``lookback`` before it.

    Both sides carry watermarks and the join condition bounds event time
    on both sides, so Spark derives a state eviction horizon — state is
    BOUNDED by the lookback + watermark, never the stream's history
    (the only stream-stream join shape that survives an unbounded
    firehose; an unconstrained join would accumulate state forever)."""
    def side():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .format("parquet")
            .load(events_path)
        )

    quotes = (
        side()
        .filter(F.col("event_id") % 17 == 0)
        .select(
            F.col("user_id").alias("q_user"),
            F.col("ts").alias("q_ts"),
            F.col("event_id").alias("quote_id"),
            F.col("value").alias("quote_value"),
        )
        .withWatermark("q_ts", state_watermark)
    )
    trades = (
        side()
        .filter(F.col("event_id") % 17 != 0)
        .select(
            F.col("event_id").alias("trade_id"),
            F.col("user_id").alias("t_user"),
            F.col("ts").alias("t_ts"),
        )
        .withWatermark("t_ts", state_watermark)
    )
    joined = trades.join(
        quotes,
        F.expr(
            f"t_user = q_user AND "
            f"q_ts BETWEEN t_ts - INTERVAL {lookback} AND t_ts"
        ),
    ).select("trade_id", "t_user", "t_ts", "quote_id", "q_ts", "quote_value")
    q = (
        joined.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# open-session carry-over: (start_us, last_us, n, sum_q)
# sum_q = exact integer ten-thousandths (decimal(18,4) semantics), so the
# accumulated sum is identical no matter how events split across
# micro-batches — float carry would drift with the batch boundaries.
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_q", T.LongType()),
    ]
)


def _quantize4(values) -> int:
    """Σ value as exact integer ten-thousandths — the same HALF_UP
    double→DECIMAL(18,4) quantisation Spark/DuckDB use in the oracle."""
    import numpy as np

    a = values.to_numpy(dtype="float64")
    return int((np.sign(a) * np.floor(np.abs(a) * 10000.0 + 0.5)).sum())


def _round2(q: int) -> float:
    """Integer-exact HALF_UP round of ten-thousandths to 2 decimals."""
    sign = -1 if q < 0 else 1
    return sign * ((abs(q) + 50) // 100) / 100.0


def _make_session_fn(gap_minutes: int):
    import pandas as pd

    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(key, pdfs, state):
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"]).reset_index(drop=True)
        user_id = int(key[0])

        ts = rows["ts"]
        starts_new = ts.diff() > gap           # first row: NaT diff → False
        session_id = starts_new.cumsum()

        if state.exists:
            start_us, last_us, n0, q0 = state.get
            prev_last = pd.Timestamp(last_us, unit="us")
        else:
            prev_last = None
            start_us, n0, q0 = None, 0, 0

        out = []
        groups = list(rows.groupby(session_id, sort=True))
        for gi, (_, g) in enumerate(groups):
            g_start, g_end = g["ts"].iloc[0], g["ts"].iloc[-1]
            g_n, g_q = len(g), _quantize4(g["value"])
            if gi == 0 and prev_last is not None and (g_start - prev_last) <= gap:
                # continues the open session from state
                g_start = pd.Timestamp(start_us, unit="us")
                g_n += n0
                g_q += q0
            elif gi == 0 and prev_last is not None:
                # state session closed by the gap → emit it
                out.append(
                    (user_id, pd.Timestamp(start_us, unit="us"), prev_last,
                     n0, _round2(q0))
                )
            if gi < len(groups) - 1:
                out.append((user_id, g_start, g_end, g_n, _round2(g_q)))
            else:
                # trailing session stays open in state
                state.update((int(g_start.value // 1000),
                              int(g_end.value // 1000), g_n, g_q))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events",
                     "sum_value"],
        )

    return fn


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_sessions",
    gap_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user session windows split on >gap inactivity.  Completed
    sessions are emitted (append mode); each user's trailing open
    session is carried in state for the next micro-batch."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(events_path)
    )
    sessions = (
        src.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_sessionize_tws(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_sessions_tws",
    gap_minutes: int = 30,
) -> DataFrame:
    """The SAME session-window semantics as :func:`stream_sessionize`,
    on Spark 4's transformWithStateInPandas API (StatefulProcessor +
    typed ValueState) instead of applyInPandasWithState — the
    arbitrary-stateful-operator surface Spark is converging on.  Both
    implementations share one oracle, so the two stateful APIs
    cross-check each other.

    SANDBOX NOTE: the transformWithState state-server protocol imports
    ``google.protobuf`` on the Python side; this container ships no
    protobuf (and installs are disallowed), so the operator raises
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE here.  The parity
    test (test_stream_sessionize_tws_matches_classic) importorskips on
    protobuf — on any standard Spark 4 deployment it runs."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap = pd.Timedelta(minutes=gap_minutes)

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("open", SESSION_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows))
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            user_id = int(key[0])

            ts = pdf["ts"]
            session_id = (ts.diff() > gap).cumsum()

            if self._state.exists():
                start_us, last_us, n0, q0 = self._state.get()
                prev_last = pd.Timestamp(last_us, unit="us")
            else:
                prev_last = None
                start_us, n0, q0 = None, 0, 0

            out = []
            groups = list(pdf.groupby(session_id, sort=True))
            for gi, (_, g) in enumerate(groups):
                g_start, g_end = g["ts"].iloc[0], g["ts"].iloc[-1]
                g_n, g_q = len(g), _quantize4(g["value"])
                if gi == 0 and prev_last is not None and (
                    g_start - prev_last
                ) <= gap:
                    g_start = pd.Timestamp(start_us, unit="us")
                    g_n += n0
                    g_q += q0
                elif gi == 0 and prev_last is not None:
                    out.append(
                        (user_id, pd.Timestamp(start_us, unit="us"),
                         prev_last, n0, _round2(q0))
                    )
                if gi < len(groups) - 1:
                    out.append((user_id, g_start, g_end, g_n, _round2(g_q)))
                else:
                    self._state.update(
                        (int(g_start.value // 1000),
                         int(g_end.value // 1000), g_n, g_q)
                    )
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "sum_value"],
            )

        def close(self) -> None:
            pass

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(events_path)
    )
    sessions = (
        src.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            Sessionizer(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_extract_turns(
    spark: SparkSession,
    transcripts_path: str,
    checkpoint_dir: str,
    output_path: str,
) -> None:
    """Streaming flavour of the extraction pipeline: same per-turn parse
    (stateless map ⇒ identical semantics), file sink + checkpoint gives
    idempotent resume."""
    from engine.spark import pipeline

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = (
        spark.readStream.schema(schema).format("parquet").load(transcripts_path)
    )
    turns = pipeline.extract_turns(src)
    q = (
        turns.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_quarantine(
    spark: SparkSession,
    transcripts_path: str,
    checkpoint_dir: str,
    output_path: str,
) -> None:
    """Streaming flavour of the extraction error channel: the same
    stateless classification as ``pipeline.quarantine`` (scan → Arrow
    parse → codegen'd reason filter), so the streaming result is
    byte-identical to batch and shares its oracle.  File sink +
    checkpoint ⇒ diverted rows survive restarts exactly once."""
    from engine.spark import pipeline

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = (
        spark.readStream.schema(schema).format("parquet").load(transcripts_path)
    )
    q = (
        pipeline.quarantine(src)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _overwrite_batch_partition(
    df: DataFrame, path: str, batch_id: int
) -> None:
    """Idempotent per-micro-batch parquet sink: rows are stamped with
    the foreachBatch ``batch_id`` and written with dynamic-partition
    overwrite into ``ingest_batch=<id>/`` — an at-least-once retry of
    the same batch replaces its own partition instead of appending a
    duplicate copy, and never touches other batches' partitions."""
    (
        df.withColumn("ingest_batch", F.lit(batch_id).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(path)
    )


def stream_near_dup(
    spark: SparkSession,
    docs_path: str,
    corpus_docs,
    checkpoint_dir: str,
    output_path: str,
    band_store: str,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
) -> None:
    """Streaming near-duplicate screen against a persisted corpus — the
    production shape of daily/continuous ingest dedup:

      1. the corpus's LSH band table is computed ONCE and persisted to
         ``band_store`` (``dedup.band_table``; origin='corpus');
      2. each arriving micro-batch of documents is banded and probed
         against the store via ``foreachBatch`` (new×new within the
         batch + broadcast probe into the store scan — the store is
         never shuffled, the corpus never re-shingled);
      3. the batch's own bands are added to the store
         (origin='stream'), so later batches pair against earlier
         stream arrivals — a run split across any number of
         micro-batches yields the identical pair set as one big batch,
         which is exactly why this shares the batch oracle.

    Retry idempotence: foreachBatch is at-least-once on retry, so a
    blind append would duplicate the retried batch's band rows forever
    and every later batch's probe-join fan-out would grow with each
    duplicate.  Both sinks are therefore partitioned by
    ``ingest_batch`` (= the foreachBatch batch_id; −1 for the corpus
    seed) and written with dynamic-partition OVERWRITE: a re-delivered
    batch replaces exactly its own partition, leaving the store — and
    the pairs output — byte-identical to the single-delivery run
    (pinned by tests/test_llm_ops.py::test_stream_near_dup_retry_
    idempotent).  This is the parquet analog of the MERGE a
    table-format sink would use."""
    from engine.spark import dedup

    (
        dedup.band_table(corpus_docs, num_perm, bands, n)
        .withColumn("origin", F.lit("corpus"))
        .withColumn("ingest_batch", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(band_store)
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def _probe(batch_df, batch_id):
        # persist: the band table is the expensive pass (shingle +
        # minhash) and is consumed THREE times — both sides of the
        # new×new self-join and the store append; without the cache each
        # consumer re-runs the whole pipeline per micro-batch
        b_new = dedup.band_table(batch_df, num_perm, bands, n).persist()
        try:
            b_old = batch_df.sparkSession.read.parquet(band_store)
            pairs = dedup.incremental_pairs_from_bands(
                b_new, b_old, num_perm
            )
            _overwrite_batch_partition(pairs, output_path, batch_id)
            _overwrite_batch_partition(
                b_new.withColumn("origin", F.lit("stream")),
                band_store,
                batch_id,
            )
        finally:
            b_new.unpersist()

    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(docs_path)
    )
    q = (
        src.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_enrich(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    checkpoint_dir: str,
    output_path: str,
) -> None:
    """Stream-static enrichment: arriving events joined to a broadcast
    dimension table — the standard streaming lookup-join.  Stateless
    per micro-batch (the static side is re-broadcast, no streaming
    state), so the result is byte-identical to the batch join and
    shares its oracle.  File sink + checkpoint = idempotent resume."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    src = (
        spark.readStream.schema(schema).format("parquet").load(events_path)
    )
    joined = src.join(F.broadcast(dim), src["user_id"] == dim["c_custkey"])
    q = (
        joined.select(
            "event_id", "user_id", "event_type", "c_name", "c_nationkey"
        )
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------- streaming turn dedup

TURN_DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_repeats", T.LongType()),
    ]
)

TURN_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _turn_dedup_fn(key, pdfs, state):
    """Per-conversation run-length collapse across micro-batches: the
    trailing open run (its first turn_idx, role, text, count) is
    carried in state; a batch's rows are sorted by turn_idx, runs that
    get TERMINATED (by a differing turn) are emitted, the still-open
    tail run goes back into state.  Assumes each conversation's turns
    arrive in turn_idx order ACROSS micro-batches (file-stream feeds of
    ordered shards satisfy this); within a batch order is restored by
    the sort."""
    import pandas as pd

    rows = pd.concat(list(pdfs)).sort_values("turn_idx")
    if state.exists:
        s_idx, s_role, s_text, s_cnt = state.get
    else:
        s_idx = None
        s_role = s_text = None
        s_cnt = 0
    out = []
    for r in rows.itertuples(index=False):
        if s_idx is not None and r.role == s_role and r.text == s_text:
            s_cnt += 1
        else:
            if s_idx is not None:
                out.append((key[0], s_idx, s_role, s_text, s_cnt))
            s_idx, s_role, s_text, s_cnt = int(r.turn_idx), r.role, r.text, 1
    state.update((s_idx, s_role, s_text, s_cnt))
    if out:
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "role", "text", "n_repeats"]
        )


def stream_turn_dedup(
    spark: SparkSession,
    turns_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_turn_dedup",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``mix.turn_dedup`` (custom stateful operator,
    applyInPandasWithState): collapses consecutive repeated (role, text)
    turns per conversation as transcripts arrive.  Emitted = runs
    CLOSED by a later differing turn; each conversation's trailing run
    stays open in state (the batch result minus every conversation's
    last run — the oracle encodes exactly that).  State per key is one
    4-field row, so memory is O(active conversations), independent of
    turns seen — the shape that survives an unbounded stream.  A run
    split across any number of micro-batches yields byte-identical
    output (split-invariance pinned in tests)."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(turns_path)
    runs = (
        src.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _turn_dedup_fn,
            outputStructType=TURN_DEDUP_OUTPUT_SCHEMA,
            stateStructType=TURN_DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        runs.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


# ----------------------------------------------------- stream_sft_examples

SFT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("prompt", T.StringType()),
        T.StructField("completion", T.StringType()),
        T.StructField("n_ctx_turns", T.IntegerType()),
    ]
)

# Bounded context: the last ≤k turns as parallel arrays — state size is
# O(k · turn size) per active conversation, independent of stream length.
SFT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("roles", T.ArrayType(T.StringType())),
        T.StructField("texts", T.ArrayType(T.StringType())),
        T.StructField("tools", T.ArrayType(T.StringType())),
    ]
)

_SFT_K = 3


def _render_turn_py(role: str, tool: str, text: str) -> str:
    """Python twin of conversation._render_turn — same chat-template
    grammar byte-for-byte (pinned against the batch path in tests)."""
    head = f"<|{role}:{tool}|>" if tool else f"<|{role}|>"
    return f"{head}\n{text}\n<|end|>"


def _sft_fn(key, pdfs, state):
    """Per-conversation context-window assembly across micro-batches:
    state carries the last ≤k turns; every assistant turn with ≥1
    context turn emits one (prompt, completion) example at arrival, so
    the complete stream's output equals the batch sft_examples result
    exactly (split-invariant — no trailing-state subtraction).  Assumes
    per-conversation turn_idx order across micro-batches, like
    _turn_dedup_fn; within a batch the sort restores it."""
    import pandas as pd

    rows = pd.concat(list(pdfs)).sort_values("turn_idx")
    if state.exists:
        roles, texts, tools = state.get
        ctx = list(zip(list(roles), list(texts), list(tools)))
    else:
        ctx = []
    out = []
    for r in rows.itertuples(index=False):
        if r.role == "assistant" and ctx:
            prompt = "\n".join(
                _render_turn_py(cr, ct, cx) for cr, cx, ct in ctx
            )
            out.append(
                (key[0], int(r.turn_idx), prompt, r.text, len(ctx))
            )
        ctx.append((r.role, r.text, r.tool))
        ctx = ctx[-_SFT_K:]
    state.update(
        (
            [c[0] for c in ctx],
            [c[1] for c in ctx],
            [c[2] for c in ctx],
        )
    )
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "conv_id", "turn_idx", "prompt", "completion",
                "n_ctx_turns",
            ],
        )


def stream_sft_examples(
    spark: SparkSession,
    turns_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_sft_examples",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``conversation.sft_examples`` (custom stateful
    operator, applyInPandasWithState): emits one training example per
    arriving assistant turn, prompt = the last ≤3 earlier turns rendered
    in the chat template.  Unlike stream_turn_dedup there is no open
    trailing run — emission happens at the assistant turn itself — so
    the full stream reproduces the batch result EXACTLY and shares its
    DuckDB oracle.  State per conversation is the bounded ≤3-turn
    context window."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(turns_path)
    examples = (
        src.select("conv_id", "turn_idx", "role", "text", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _sft_fn,
            outputStructType=SFT_OUTPUT_SCHEMA,
            stateStructType=SFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        examples.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


# --------------------------------------------------------- stream_funnel

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("reached_ts", T.TimestampType()),
    ]
)

# State per user: highest stage reached + its anchor timestamp (epoch
# micros) — two scalars, O(active users) total, independent of events
# seen.  The stage list rides as a state field so the function stays a
# module-level picklable callable.
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType()),
        T.StructField("anchor_us", T.LongType()),
    ]
)

_FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel_fn(key, pdfs, state):
    """Greedy earliest-first funnel advancement per user: scanning
    events in ts order, advance to stage i+1 at the FIRST event of the
    needed type strictly after the current anchor.  Under an ordered
    feed this is exactly the batch first-touch semantics (stage i's
    anchor = min ts of qualifying events), so the streamed reach rows
    aggregate to the batch funnel counts byte-for-byte.  Tie order
    within an equal timestamp cannot change the outcome: a stage-(i+1)
    event at ts == anchor never qualifies (strict >), and an event for
    a not-yet-needed stage is skipped regardless of position."""
    import pandas as pd

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        stage, anchor_us = state.get
    else:
        stage, anchor_us = 0, None
    out = []
    for r in rows.itertuples(index=False):
        if stage >= len(_FUNNEL_STAGES):
            break
        if r.event_type != _FUNNEL_STAGES[stage]:
            continue
        ts_us = int(r.ts.value // 1000)  # pandas ns → µs
        if stage > 0 and ts_us <= anchor_us:
            continue
        stage += 1
        anchor_us = ts_us
        out.append((int(key[0]), stage, r.event_type, r.ts))
    state.update((stage, anchor_us))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "stage", "event_type", "reached_ts"]
        )


def stream_funnel(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_funnel",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``analytics.event_funnel`` (custom stateful
    operator, applyInPandasWithState): per-user funnel stage
    advancement as events arrive.  Unlike the run-length collapse ops,
    a reach event is FINAL the moment it happens — nothing stays
    censored in state — so the streamed rows aggregated to per-stage
    user counts equal the batch funnel exactly and the contract query
    SHARES the batch oracle verbatim (split-invariance pinned in
    tests/test_ops.py).  Assumes events arrive in ts order across
    micro-batches (ordered shard feeds); within a batch order is
    restored by the sort.

    Scale notes: state is two scalars per ACTIVE user (stage index +
    anchor), so memory is O(users mid-funnel), independent of stream
    length; completed users break out of the scan immediately.  For
    production add a state TTL via ``timeoutConf`` once a business
    funnel-expiry rule exists."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(events_path)
    reaches = (
        src.select("event_id", "ts", "user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        reaches.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_trending(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    output_path: str,
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming trending-topics: top-``k`` event types per closed
    window.  The STREAM side is the bounded-state windowed count
    (append mode + parquet sink — `stream_event_window_counts_append`);
    the top-k rank runs as a batch window over the SINK, not inside the
    streaming query.  That split is the production architecture, not a
    shortcut: under append semantics a window's rows emit exactly once,
    when the watermark closes the window — which is also the first
    moment a per-window rank is final — so ranking belongs to the
    serving read, where it costs one bounded per-window sort over ≤
    |event_types| rows, and the streaming state stays the mergeable
    count aggregate.  Ties break (n_events DESC, event_type ASC) so the
    emitted top-k is deterministic and oracle-checkable."""
    counts = stream_event_window_counts_append(
        spark, events_path, checkpoint_dir, output_path, window, watermark
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "event_type", "n_events", "rank")
    )


def stream_agg_merge(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    agg_store: str,
    key_cols: list,
    value_col: str = "value",
) -> None:
    """Continuous materialized-view maintenance — the streaming twin of
    ``lineage.agg_merge``: each arriving micro-batch's per-key
    aggregate merges into a persisted aggregate store; accumulated
    history is NEVER rescanned (the store is |keys|-sized, the batch
    is batch-sized — at 10^12 accumulated rows that asymmetry is the
    whole design).

    Retry idempotence without MERGE: foreachBatch is at-least-once on
    retry, and a blind read-merge-overwrite would double-count a
    re-delivered batch.  The store is therefore partitioned by
    ``ingest_batch``: each batch writes ONLY its own delta partition
    (dynamic-partition overwrite — a retry replaces exactly itself),
    and the serving read re-merges the (few, metadata-sized) batch
    partitions with one partial agg.  Compaction of old partitions
    into a consolidated ``ingest_batch=-1`` seed follows the
    ``lineage.compact_turns`` discipline; a table format with MERGE
    INTO would collapse this to one upsert.

    A run split across any number of micro-batches produces a store
    whose serving read equals the from-scratch aggregate — pinned by
    the split-invariance test; that is why this shares the batch
    oracle.
    """
    from engine.spark import lineage

    schema = (
        spark.read.parquet(events_path).schema
    )

    def _merge(batch_df, batch_id):
        (
            lineage.agg_snapshot(batch_df, key_cols, value_col)
            .withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(agg_store)
        )

    (
        # one file per micro-batch: availableNow would otherwise drain
        # the whole backlog into a single batch, collapsing the
        # delta-partition layout (and the split-invariance guarantee)
        # to one partition
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_agg_store(spark: SparkSession, agg_store: str, key_cols: list):
    """Serving read of the stream_agg_merge store: re-merge the batch
    delta partitions with one partial agg over the metadata-sized
    store (count/sum add, min/min, max/max — the mergeable contract)."""
    s = spark.read.parquet(agg_store)
    return s.groupBy(*key_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


# ------------------------------------------- streaming cluster maintenance


def _overwrite_version(df: DataFrame, path: str, version: int) -> None:
    """Versioned snapshot write for the streaming cluster store: each
    snapshot lands in its own ``version=<n>/`` partition via dynamic
    overwrite, so an at-least-once retry replaces exactly its own
    snapshot (same idempotence contract as ``_overwrite_batch_partition``)."""
    (
        df.withColumn("version", F.lit(version).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("version")
        .parquet(path)
    )


def read_cluster_store(spark: SparkSession, cluster_store: str) -> DataFrame:
    """Serving read of the streaming cluster store: the latest
    snapshot's ``(doc_id, cluster_id)`` rows.  The store holds only
    docs with at least one candidate pair (dup-graph-sized, far below
    corpus scale), so the single-row max(version) agg + broadcast
    filter is a metadata-scale operation; corpus-wide labels
    materialize only when the caller left-joins docs against this
    (singletons keep their own id)."""
    allv = spark.read.parquet(cluster_store)
    latest = allv.agg(F.max("version").alias("version"))
    return allv.join(F.broadcast(latest), "version").select(
        "doc_id", "cluster_id"
    )


def stream_dup_clusters(
    spark: SparkSession,
    docs_path: str,
    corpus_docs,
    checkpoint_dir: str,
    band_store: str,
    cluster_store: str,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
) -> None:
    """Continuously-maintained near-dup clusters over a document stream
    — the streaming twin of ``dedup.incremental_clusters`` and the
    full production loop for continuous-ingest dedup:

      1. seed once: the corpus's LSH band table persists to
         ``band_store`` and the corpus-only components to
         ``cluster_store`` (version = −1);
      2. each micro-batch is banded, probed against the accumulated
         store for candidate pairs (new×new + new×history — the store
         is only ever streamed, never shuffled), and the pairs merge
         into the standing cluster table by LABEL CONTRACTION: CC runs
         only on the contracted batch-sized graph, then one
         graph-sized equi-join relabels the store;
      3. the updated store lands as snapshot ``version = batch_id``
         and the batch's bands append under its own partition.

    A run split across any number of micro-batches converges to the
    same clusters as one from-scratch computation over the full pair
    history (labels stay component minima by induction — see
    ``incremental_clusters``), which is why the contract query shares
    the from-scratch recursive-CTE oracle.

    Retry idempotence: both sinks are partition-overwrite keyed by
    batch_id, and re-merging an already-merged pair set is a fixpoint
    (its edges contract to self-loops and drop), so an at-least-once
    redelivery rewrites identical snapshots.  The updated snapshot is
    persisted and materialized BEFORE overwriting — a retried batch
    reads its own prior snapshot as the latest version; a table-format
    sink would express steps 2-3 as one MERGE.  Snapshots accumulate
    one dup-graph-sized version per batch; production expires all but
    the last K (the serving read only ever touches max(version))."""
    from engine.spark import dedup

    (
        dedup.band_table(corpus_docs, num_perm, bands, n)
        .withColumn("origin", F.lit("corpus"))
        .withColumn("ingest_batch", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(band_store)
    )
    seed_pairs = dedup.minhash_lsh_pairs(corpus_docs, num_perm, bands, n)
    _overwrite_version(
        dedup.connected_components(seed_pairs.select("doc_a", "doc_b")),
        cluster_store,
        -1,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def _merge(batch_df, batch_id):
        ss = batch_df.sparkSession
        b_new = dedup.band_table(batch_df, num_perm, bands, n).persist()
        try:
            b_old = ss.read.parquet(band_store)
            pairs = dedup.incremental_pairs_from_bands(
                b_new, b_old, num_perm
            ).select("doc_a", "doc_b")
            old = read_cluster_store(ss, cluster_store)
            nodes = (
                old.select("doc_id")
                .unionByName(pairs.select(F.col("doc_a").alias("doc_id")))
                .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            updated = dedup.incremental_clusters(nodes, old, pairs).persist()
            updated.count()  # materialize before overwriting the source
            _overwrite_version(updated, cluster_store, batch_id)
            updated.unpersist()
            _overwrite_batch_partition(
                b_new.withColumn("origin", F.lit("stream")),
                band_store,
                batch_id,
            )
        finally:
            b_new.unpersist()

    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(docs_path)
    )
    q = (
        src.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------------ stream_agent_loops

LOOPS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("max_run", T.LongType()),
        T.StructField("period2_run", T.LongType()),
        T.StructField("loop_flag", T.BooleanType()),
    ]
)

# State per conversation: the last TWO step signatures plus five
# counters — O(1) bytes per active conversation, independent of length.
LOOPS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sig1", T.StringType()),   # previous turn
        T.StructField("sig2", T.StringType()),   # two back
        T.StructField("n", T.LongType()),
        T.StructField("cur_run", T.LongType()),
        T.StructField("max_run", T.LongType()),
        T.StructField("cur_s2", T.LongType()),
        T.StructField("max_s2", T.LongType()),
    ]
)

_LOOP_MIN_RUN = 4
_LOOP_MIN_ALT = 6


def _loops_fn(key, pdfs, state):
    """Per-conversation loop counters across micro-batches: the same
    recurrence as conversation.agent_loops, folded one turn at a time.
    Emits the conversation's CURRENT totals once per micro-batch that
    touches it (update-stream semantics); after the final batch the
    latest emission per conversation equals the batch operator's row
    exactly (pick it with max(n_turns) — n_turns is monotone).
    Signature = md5(role ␟ tool ␟ text), identical bytes to the batch
    twin.  Assumes per-conversation turn_idx order across micro-batches
    (like _sft_fn); within a batch the sort restores it."""
    import hashlib

    import pandas as pd

    rows = pd.concat(list(pdfs)).sort_values("turn_idx")
    if state.exists:
        sig1, sig2, n, cur_run, max_run, cur_s2, max_s2 = state.get
    else:
        sig1, sig2, n, cur_run, max_run, cur_s2, max_s2 = (
            None, None, 0, 0, 0, 0, 0,
        )
    for r in rows.itertuples(index=False):
        sig = hashlib.md5(
            f"{r.role}\x1f{r.tool}\x1f{r.text}".encode()
        ).hexdigest()
        n += 1
        cur_run = cur_run + 1 if sig == sig1 else 1
        max_run = max(max_run, cur_run)
        cur_s2 = cur_s2 + 1 if sig == sig2 else 0
        max_s2 = max(max_s2, cur_s2)
        sig2, sig1 = sig1, sig
    state.update((sig1, sig2, n, cur_run, max_run, cur_s2, max_s2))
    period2 = min(max_s2 + 2, n)
    yield pd.DataFrame(
        [
            (
                key[0],
                n,
                max_run,
                period2,
                bool(max_run >= _LOOP_MIN_RUN or period2 >= _LOOP_MIN_ALT),
            )
        ],
        columns=[
            "conv_id", "n_turns", "max_run", "period2_run", "loop_flag",
        ],
    )


def stream_agent_loops(
    spark: SparkSession,
    turns_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_agent_loops",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``conversation.agent_loops`` (custom stateful
    operator, applyInPandasWithState): per-conversation stuck-loop
    counters maintained incrementally with O(1) state — the last two
    step signatures and five counters — so a 10^6-turn conversation
    costs the same state as a 5-turn one.

    Emission is update-style (current totals per touched conversation
    per micro-batch); the returned frame keeps each conversation's
    latest emission (max n_turns — monotone), which after availableNow
    drains the source equals the batch operator's output exactly and
    shares its oracle."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(turns_path)
    totals = (
        src.select("conv_id", "turn_idx", "role", "text", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _loops_fn,
            outputStructType=LOOPS_OUTPUT_SCHEMA,
            stateStructType=LOOPS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        totals.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(sink_table)
    last = emitted.groupBy("conv_id").agg(
        F.max(
            F.struct("n_turns", "max_run", "period2_run", "loop_flag")
        ).alias("s")
    )
    return last.select(
        "conv_id", "s.n_turns", "s.max_run", "s.period2_run", "s.loop_flag"
    )


# ------------------------------------------------ stream_rolling_anomaly

ANOM_WINDOW = 24
ANOM_MIN_N = 5
ANOM_THRESHOLD = 2.0

ANOM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)
ANOM_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.DoubleType()))]
)


def _anom_fn(key, pdfs, state):
    """Per-user trailing-window z-score across micro-batches — the
    streaming twin of ``diagnose.rolling_zscore`` with IDENTICAL
    arithmetic: each stored value re-quantizes to DECIMAL 6 dp
    (ROUND_HALF_UP on the exact binary double — what Spark's
    cast(decimal(18,6)) and DuckDB's CAST do), the squared term
    quantizes per row BEFORE summing (mirroring the per-row
    decimal(38,6) cast), sums are exact Decimals, and the final
    mean/var/z chain runs in the same fixed IEEE order — so a z
    emitted here is bit-identical to the batch operator's.  State is
    the last ≤ANOM_WINDOW raw float64 values (exactness survives the
    round-trip because quantization re-derives from the exact stored
    double).  Assumes per-user time order across batches (ranged
    file-stream shards); within a batch the sort restores it."""
    import decimal
    import math

    import pandas as pd

    D = decimal.Decimal
    Q6 = D("1e-6")

    def d6(x: float) -> decimal.Decimal:
        return D(x).quantize(Q6, rounding=decimal.ROUND_HALF_UP)

    vals = list(state.get[0]) if state.exists else []
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = []
    for r in rows.itertuples(index=False):
        v = float(r.value)
        frame = vals[-ANOM_WINDOW:]
        n = len(frame)
        if n >= ANOM_MIN_N:
            ds = [d6(x) for x in frame]
            s = sum(ds)
            ssq = sum((d * d).quantize(Q6, rounding=decimal.ROUND_HALF_UP)
                      for d in ds)
            nd, sd, qd = float(n), float(s), float(ssq)
            var = (nd * qd - sd * sd) / (nd * nd)
            if var > 0:
                z = float(
                    D((v - sd / nd) / math.sqrt(var)).quantize(
                        Q6, rounding=decimal.ROUND_HALF_UP
                    )
                )
                if abs(z) >= ANOM_THRESHOLD:
                    out.append((int(key[0]), int(r.event_id), r.ts, v, z))
        vals.append(v)
        if len(vals) > ANOM_WINDOW:
            vals = vals[-ANOM_WINDOW:]
    state.update((vals,))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "value", "z"]
        )


def stream_rolling_anomaly(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_rolling_anomaly",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``diagnose.rolling_zscore`` (custom stateful
    operator, applyInPandasWithState): per-user trailing-24 z-score
    anomalies as events arrive.  Every row with ≥ANOM_MIN_N prior
    observations scores IMMEDIATELY (the statistic needs only the
    past), so the stream output over an in-order feed equals the batch
    operator's output exactly — the oracle IS the batch SQL, no
    trailing-openness carve-out.  State per user is one ≤24-double
    array: O(active users), independent of stream length."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(events_path)
    flagged = (
        src.where(F.col("value").isNotNull())
        .select("user_id", "event_id", F.col("ts").cast("timestamp"), "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _anom_fn,
            outputStructType=ANOM_OUTPUT_SCHEMA,
            stateStructType=ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)
