"""Conversation-level analytics over transcript tables.

The north rule's payload is multi-turn conversation / agent transcripts
(conv_id, turn_idx, role, text, tool, ts).  Beyond per-turn extraction
(engine/spark/pipeline.py) a training-data pipeline needs
conversation-shaped operators: per-conversation rollups, contract
validation (role alternation), chat-template rendering for SFT export,
context-window assembly (prompt = previous k turns), and gap-based
sessionization of event streams.  Everything here is pure Catalyst
column expressions — zero Python UDFs, whole-stage codegen throughout.

Scale notes (100 TB / 10^12 turns):
  * conv_stats / tool_usage — single partial-aggregating shuffle; a hot
    conversation combines map-side.
  * role_violations / sft_examples — one window exchange keyed on
    conv_id (cardinality grows with data, no low-card reducer trap);
    sft's frame is ROWS-bounded (k preceding), so reducer memory is
    O(k · turn size), never O(conversation).
  * chat_render — reuses the two-phase chunked ordered concat of
    assemble.assemble_docs: a 10^6-turn conversation never serialises
    onto one reducer in one piece.
  * sessionize — window and session rollup share one hash partitioning
    on user_id (HashPartitioning(user_id) satisfies the clustered
    distribution of groupBy(user_id, session_idx)), so the whole
    operator is ONE exchange; asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from engine.spark import assemble

#: Chat-template grammar shared with the DuckDB oracles (kept trivially
#: concatenative so both engines build it from the same string algebra):
#: ``<|role|>`` or ``<|role:tool|>`` header, body, ``<|end|>`` footer,
#: turns joined by a single newline.
TURN_END = "<|end|>"


def _render_turn(role: Column, tool: Column, text: Column) -> Column:
    header = F.concat(
        F.lit("<|"),
        role,
        F.when(tool != "", F.concat(F.lit(":"), tool)).otherwise(F.lit("")),
        F.lit("|>"),
    )
    return F.concat(header, F.lit("\n"), text, F.lit("\n" + TURN_END))


def conv_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation rollup in ONE partial-aggregating scan.

    Columns: turn counts (total + per role), tool-call count, distinct
    tools used, text-size stats, and wall-clock duration in seconds
    (epoch arithmetic → BIGINT, identical in Spark and DuckDB).
    """
    chars = F.length("text")
    return (
        turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias(
                "n_user"
            ),
            F.sum(
                F.when(F.col("role") == "assistant", 1).otherwise(0)
            ).alias("n_assistant"),
            F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias(
                "n_tool"
            ),
            F.sum(F.when(F.col("tool") != "", 1).otherwise(0)).alias(
                "n_tool_calls"
            ),
            F.size(F.array_remove(F.collect_set("tool"), ""))
            .cast("long")
            .alias("n_tools"),
            F.sum(chars).alias("total_chars"),
            F.max(chars).cast("long").alias("max_turn_chars"),
            (
                F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
            )
            .cast("long")
            .alias("duration_s"),
        )
    )


def role_violations(turns: DataFrame) -> DataFrame:
    """Turns that repeat the previous turn's role (alternation-contract
    violations — stuck agents, duplicated messages).  One window keyed
    on conv_id; per-conversation sort only."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    return (
        turns.select(
            "conv_id", "turn_idx", "role", prev.alias("prev_role")
        )
        .where(F.col("role") == F.col("prev_role"))
    )


def chat_render(turns: DataFrame, chunk: int = 1024) -> DataFrame:
    """Render each conversation to one chat-template string.

    Per-turn rendering is a codegen projection; the ordered concat
    reuses assemble_docs' two-phase chunked groupBy so reducer memory
    stays bounded for skewed 10^5-turn conversations.
    """
    rendered = turns.select(
        "conv_id",
        "turn_idx",
        _render_turn(F.col("role"), F.col("tool"), F.col("text")).alias(
            "markdown"
        ),
    )
    return assemble.assemble_docs(rendered, chunk=chunk, sep="\n").select(
        "conv_id", F.col("markdown").alias("chat")
    )


def sft_examples(turns: DataFrame, k: int = 3) -> DataFrame:
    """Context-window assembly: one training example per assistant turn
    with ≥1 context turn — prompt = previous ≤k turns rendered in the
    chat template, completion = the assistant text.

    The frame is ROWS BETWEEN k PRECEDING AND 1 PRECEDING, so the
    window buffer is O(k) rows regardless of conversation length —
    the bounded-frame shape that survives 10^12 turns.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    ctx = F.collect_list(
        F.struct(
            "turn_idx",
            _render_turn(F.col("role"), F.col("tool"), F.col("text")).alias(
                "r"
            ),
        )
    ).over(w)
    out = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("text").alias("completion"),
        ctx.alias("ctx"),
    )
    return (
        out.where((F.col("role") == "assistant") & (F.size("ctx") > 0))
        .select(
            "conv_id",
            "turn_idx",
            F.array_join(
                F.transform(F.array_sort("ctx"), lambda s: s["r"]), "\n"
            ).alias("prompt"),
            "completion",
            F.size("ctx").cast("int").alias("n_ctx_turns"),
        )
    )


def sessionize(
    events: DataFrame, gap_s: int = 1800, exact_value_sum: bool = False
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_s``.  Returns one row per session
    with start/end epoch seconds, event count, and summed value.

    Both the lag/cumsum window and the session rollup hash-partition on
    user_id, so Catalyst plans ONE exchange for the whole operator
    (plan-asserted).  user_id cardinality scales with the data — no
    low-cardinality reducer bottleneck.

    ``exact_value_sum`` sums value through DECIMAL(18,4) and rounds to
    2 places — order-independent across partitionings and engines (the
    repo's cross-engine double-sum convention).
    """
    sec = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy(sec, "event_id")
    gap = sec - F.lag(sec).over(w)
    flagged = events.select(
        "user_id",
        "event_id",
        "value",
        sec.alias("sec"),
        F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0).alias("is_new"),
    )
    run = F.sum("is_new").over(
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("session_idx", run)
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("sec").alias("session_start"),
            F.max("sec").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(18,4)")).cast(
                        "double"
                    ),
                    2,
                )
                if exact_value_sum
                else F.sum("value")
            ).alias("total_value"),
        )
        .withColumn(
            "duration_s", F.col("session_end") - F.col("session_start")
        )
    )


def tool_usage(turns: DataFrame) -> DataFrame:
    """Per-tool invocation stats over tool-role turns.  count(DISTINCT
    conv_id) under a low-cardinality group key plans as Spark's
    two-stage distinct aggregate — the partial stage keys on
    (tool, conv_id), so no single-reducer distinct set."""
    t = turns.where((F.col("role") == "tool") & (F.col("tool") != ""))
    return t.groupBy("tool").agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max(F.length("text")).cast("long").alias("max_chars"),
    )


def transcript_curation(
    turns: DataFrame,
    min_turns: int = 2,
    max_repeat_ratio: float = 0.5,
) -> DataFrame:
    """Composite transcript-corpus curation: per-conversation quality
    metrics and a keep/drop decision — the conversation-level analog of
    the document corpus_curation job.

    Metrics (one conv-keyed window + one rollup, sharing a single
    hash exchange on conv_id):
      * n_turns
      * n_runs — turns after run-length collapse of consecutive
        repeated (role, text) turns (mix.turn_dedup's change-point
        rule); repeat_ratio = 1 − n_runs/n_turns
      * n_violations — consecutive same-role turns
      * has_assistant — a conversation with no assistant turn is
        unusable as SFT supervision

    Drop precedence: too_short → no_assistant → repetitive.  keep=true
    rows carry drop_reason NULL.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_text = F.lag("text").over(w)
    flagged = turns.select(
        "conv_id",
        "role",
        F.when(
            prev_role.isNull()
            | (prev_role != F.col("role"))
            | (prev_text != F.col("text")),
            1,
        )
        .otherwise(0)
        .alias("is_new_run"),
        F.when(F.col("role") == prev_role, 1).otherwise(0).alias("viol"),
    )
    stats = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("is_new_run").alias("n_runs"),
        F.sum("viol").alias("n_violations"),
        F.max(
            F.when(F.col("role") == "assistant", 1).otherwise(0)
        ).alias("_has_asst"),
    )
    repeat_ratio = F.round(
        1.0 - F.col("n_runs").cast("double") / F.col("n_turns"), 6
    )
    reason = (
        F.when(F.col("n_turns") < min_turns, F.lit("too_short"))
        .when(F.col("_has_asst") == 0, F.lit("no_assistant"))
        .when(
            F.col("repeat_ratio") > max_repeat_ratio, F.lit("repetitive")
        )
    )
    return (
        stats.withColumn("repeat_ratio", repeat_ratio)
        .withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .select(
            "conv_id",
            "n_turns",
            "n_runs",
            "repeat_ratio",
            "n_violations",
            "keep",
            "drop_reason",
        )
    )


def context_trim(turns: DataFrame, budget_tokens: int = 60) -> DataFrame:
    """Context-window budget trimming — keep each conversation's
    LONGEST suffix of turns whose total whitespace-token count fits
    ``budget_tokens`` (the inference-serving prompt-assembly rule:
    newest context survives, oldest is evicted).  The final turn is
    always kept even when it alone busts the budget — a trimmer that
    emits an empty conversation is wrong.

    Shape: per-turn token counts are codegen projections; the suffix
    sum is ONE window cumsum per conv_id ordered by turn_idx DESC
    (reducer memory O(1) per row, state = running sum), sharing a
    single conv-keyed exchange with nothing else — at 10^12 turns the
    conv_id hash partitioning is the same key every other conversation
    op uses, so the exchange is reusable under co-partitioned layouts.

    Returns the kept turns with their token counts and the running
    suffix total.
    """
    from engine.spark.text import ws_token_count

    t = turns.withColumn("n_tokens", ws_token_count(F.col("text")))
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("suffix_tokens", F.sum("n_tokens").over(w)).withColumn(
        "_pos_from_end", F.row_number().over(
            Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
        )
    )
    return (
        t.filter(
            (F.col("suffix_tokens") <= budget_tokens)
            | (F.col("_pos_from_end") == 1)
        )
        .select(
            "conv_id",
            "turn_idx",
            "role",
            "n_tokens",
            F.col("suffix_tokens").cast("long").alias("suffix_tokens"),
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window`` — the
    built-in twin of :func:`sessionize`, exercising the API that also
    powers streaming session aggregation (the same expression works
    under ``readStream`` with a watermark, where the lag/cumsum form
    cannot run at all).

    Semantics note (pinned by a boundary unit test): the native
    operator MERGES an event landing exactly on the previous window's
    end (sessions split only when the gap strictly exceeds the
    threshold) — the same rule as ``sessionize``'s ``> gap_s`` lag
    test, so the two operators agree everywhere.  Emitted bounds are
    microsecond-exact integers (``unix_micros``), so no float epoch
    ever reaches the cross-engine compare; ``session_end`` is the
    native definition: last event + gap.

    Scale shape: one hash exchange on (user_id, session_window) with
    map-side partial session merging — Spark's dedicated
    MergingSessionsExec / session-window aggregation path, no window
    function and no per-user sort of the whole history.

    Columns: (user_id, start_us, end_us, n_events, value_sum).
    """
    sw = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy("user_id", sw)
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
                2,
            ).alias("value_sum"),
        )
        .select(
            "user_id",
            # parquet timestamps load as TIMESTAMP_NTZ; the session
            # runs UTC (session.py), so the cast is an identity
            # relabel, and unix_micros then yields the exact integer
            F.unix_micros(
                F.col("session_window.start").cast("timestamp")
            ).alias("start_us"),
            F.unix_micros(
                F.col("session_window.end").cast("timestamp")
            ).alias("end_us"),
            "n_events",
            "value_sum",
        )
    )


def agent_loops(
    turns: DataFrame, min_run: int = 3, min_alt: int = 6
) -> DataFrame:
    """Stuck-agent detection over transcripts: per conversation, the
    longest run of consecutive turns with an identical step signature
    (period-1 loop — an agent re-issuing the same action verbatim) and
    the longest alternating stretch where every turn equals the turn
    two back (period-2 loop — the A-B-A-B retry cycle).  Both are
    classic failure modes a training-data pipeline drops before SFT:
    a trajectory that spins in place teaches the model to spin.

    Step signature = md5(role ␟ tool ␟ text) — the 32-byte hash, not
    the payload, is what flows through the windows and rollups.

    Semantics:
      * ``max_run``      — longest gaps-and-islands run of equal
        adjacent signatures (≥ 1).
      * ``period2_run``  — longest stretch of turns in which each turn
        equals the one two positions back, +2 for the seed pair,
        capped at ``n_turns``.  An identical run also matches period 2
        by construction (A A A A has sig == lag2), so period2_run ≥
        min(max_run, n_turns).
      * ``loop_flag``    — max_run ≥ min_run OR period2_run ≥ min_alt.

    Scale shape (10^12 turns): ONE hash exchange on conv_id feeds both
    lag windows, run lengths are computed IN the same window pass as
    ``pos − last-boundary-pos`` running maxima (no per-island groupBy,
    so the corpus is never re-shuffled), and the final rollup on
    conv_id is satisfied by the window's own partitioning — the whole
    operator is a single shuffle with bounded per-conversation frames
    (key cardinality grows with data — no low-card reducer trap).
    Plan pinned in tests/test_plans.py (exactly one exchange).  The
    DuckDB oracle intentionally uses the classic gaps-and-islands
    formulation instead — two independent derivations, same values.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    sig = F.md5(F.concat_ws("\x1f", "role", "tool", "text"))
    t = turns.select("conv_id", "turn_idx", sig.alias("sig"))
    lag1 = F.lag("sig").over(w)
    lag2 = F.lag("sig", 2).over(w)
    marked = t.select(
        "conv_id",
        "turn_idx",
        F.when(lag1.isNull() | (F.col("sig") != lag1), F.lit(1))
        .otherwise(F.lit(0))
        .alias("chg"),
        F.when(F.col("sig") == lag2, F.lit(1))
        .otherwise(F.lit(0))
        .alias("m2"),
    )
    pos = F.row_number().over(w)
    run_start = F.max(F.when(F.col("chg") == 1, pos)).over(wcum)
    zero_pos = F.max(F.when(F.col("m2") == 0, pos)).over(wcum)
    lens = marked.select(
        "conv_id",
        "m2",
        (pos - run_start + 1).alias("run_len"),
        F.when(F.col("m2") == 1, pos - F.coalesce(zero_pos, F.lit(0)))
        .alias("streak_len"),
    )
    out = lens.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("run_len").alias("max_run"),
        F.max("streak_len").alias("max_streak"),
    )
    period2 = F.least(
        F.coalesce(F.col("max_streak"), F.lit(0)) + F.lit(2),
        F.col("n_turns"),
    )
    return out.select(
        "conv_id",
        "n_turns",
        F.col("max_run").cast("long").alias("max_run"),
        period2.cast("long").alias("period2_run"),
        (
            (F.col("max_run") >= min_run) | (period2 >= min_alt)
        ).alias("loop_flag"),
    )
