"""Training-mix assembly operators: deterministic corpus shuffling,
temperature-based source mixing, transcript turn de-repetition, and
bounded-shard JSONL export.

These are the last mile of a training-data pipeline — after cleaning /
dedup / curation, the corpus must be (a) collapsed of degenerate
repeated turns (transcripts' analog of line dedup), (b) blended across
sources with controlled proportions, (c) globally shuffled into
training shards deterministically (re-runs and cluster-size changes
must not change the order), and (d) exported as bounded-size JSONL
shards.

All hash-driven decisions use the portable md5-prefix hash
(``engine.spark.dedup.portable_hash60``) so every assignment is
byte-reproducible in the DuckDB oracle, and all arithmetic sticks to
IEEE-exact operations (divide by powers of two, sqrt, compare) —
never ``pow``/``exp``, whose last-ulp behaviour is libm-specific and
would silently break cross-engine hash parity at decision boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.spark.dedup import portable_hash60

# portable_hash60 yields 60-bit non-negatives; dividing by 2^60 gives a
# deterministic uniform in [0, 1) with exact float semantics in both
# engines (binary-power division is IEEE-exact)
_HASH_SPAN = float(1 << 60)


def turn_dedup(turns: DataFrame) -> DataFrame:
    """Collapse consecutive repeated turns within each conversation.

    Agent transcripts degenerate in a characteristic way: a stuck agent
    re-emits the same (role, text) turn dozens of times in a row
    (retry loops, tool-error loops).  Run-length collapsing keeps the
    first turn of each repeated run and counts how many copies it
    absorbed — the transcript analog of the line-dedup pass web
    pipelines run before training.

    Shape: one window pass partitioned by ``conv_id`` (high-cardinality
    — no hot reducer) computes change-points via lag, a running sum
    turns them into run ids, and a groupBy on (conv_id, run_id)
    finishes the runs.  ONE hash exchange total: hash partitioning on
    conv_id alone satisfies the (conv_id, run_id) clustering, so
    Catalyst runs the final aggregation in place on the window's
    partitioning (plan-asserted).  At 10^12 turns this scales linearly
    with executors.

    Returns one row per run: (conv_id, turn_idx of the first turn,
    role, text, n_repeats = run length).

    Expects non-null ``role``/``text`` (the transcript contract): the
    lag comparisons use standard three-valued logic, so a NULL field
    compares as "not a new run" and the row would merge into the
    preceding run — identically in Spark and the DuckDB oracle (its
    CASE falls through to 0), but not a meaningful grouping.  Scrub or
    quarantine NULL turns upstream.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    is_new = (
        F.lag("role").over(w).isNull()
        | (F.lag("role").over(w) != F.col("role"))
        | (F.lag("text").over(w) != F.col("text"))
    ).cast("int")
    runs = turns.withColumn(
        "run_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("conv_id", "run_id")
        .agg(
            F.min("turn_idx").alias("turn_idx"),
            F.first("role").alias("role"),
            F.first("text").alias("text"),
            F.count("*").alias("n_repeats"),
        )
        .drop("run_id")
    )


def shard_shuffle(
    docs: DataFrame,
    n_shards: int = 64,
    seed: str = "shuf",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Training wants the corpus in pseudo-random order, but the order
    must be REPRODUCIBLE — rerunning the job, or running it on a
    different cluster size, must place every document in the same shard
    at the same position (else a resumed training run sees a different
    data order).  RNG-based ``orderBy(rand())`` fails both tests; a
    hash order passes: key = portable_hash(seed:doc_id), shard =
    key mod n_shards, position = rank of key within the shard.

    Shape: one hash exchange on ``shard`` followed by a per-shard sort
    (row_number window).  With production n_shards (thousands), each
    shard is a bounded slice sorted independently — a plain distributed
    sort, no global coordination, no skew (md5 is uniform).  Changing
    ``seed`` draws an independent permutation.
    """
    key = portable_hash60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    d = docs.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return d.withColumn("pos", F.row_number().over(w)).drop("shuffle_key")


def mixture_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Temperature-0.5 source mixing: downsample dominant sources so the
    blended corpus follows n_s^0.5 proportions (the multilingual /
    multi-source reweighting used for training mixes), deterministically.

    A source with count n_s keeps each doc with probability
    r_s = sqrt(min_count / n_s) — the unique per-source rate that makes
    kept counts proportional to sqrt(n_s) while the smallest source
    keeps everything.  The decision is u < r_s with u = hash/2^60;
    sqrt and binary-power division are IEEE-exact, so the kept set is
    byte-identical in Spark and the DuckDB oracle (alpha is fixed at
    0.5 precisely because general pow() is NOT cross-libm exact).

    Shape: one tiny groupBy for per-source counts (map-side partial
    agg; |sources| rows), the min taken by an unpartitioned window over
    that already-aggregated frame (single-partition, but |sources| rows
    — metadata scale; a separate ``counts.agg(min)`` branch would make
    Catalyst duplicate the whole counts subtree and scan the corpus a
    second time), then a broadcast join back and a codegen'd filter —
    the corpus rows themselves are never shuffled.
    """
    counts = docs.groupBy(source_col).agg(F.count("*").alias("n_src"))
    min_n = F.min("n_src").over(Window.partitionBy())
    rates = F.broadcast(
        counts.select(
            source_col,
            F.sqrt(min_n / F.col("n_src")).alias("keep_rate"),
        )
    )
    u = portable_hash60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    ) / F.lit(_HASH_SPAN)
    return (
        docs.join(rates, source_col)
        .where(u < F.col("keep_rate"))
        .drop("keep_rate")
    )


def export_jsonl(
    docs: DataFrame,
    path: str,
    max_records_per_file: int = 10000,
    order_col: str | None = None,
) -> None:
    """Export the corpus as bounded-size JSONL shards — the interchange
    format training loaders consume.  ``maxRecordsPerFile`` caps each
    shard (the writer rolls files, so no single task produces an
    unboundedly large shard even under skewed partitions); pass
    ``order_col`` (e.g. shard_shuffle's ``shard``) to cluster output
    files by training shard.  Overwrite mode keeps the export
    idempotent under retries.
    """
    d = docs.repartition(order_col) if order_col else docs
    (
        d.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "s0",
) -> DataFrame:
    """Token-budgeted per-source sampling — the mixture builder's real
    unit is TOKENS, not documents: from each source keep documents in
    deterministic hash order until the source's running token total
    exceeds ``budget_tokens`` (the first budget-crossing document is
    kept, so every source with any data contributes and the overshoot
    is bounded by one document).

    Hash order (md5(seed:id)) makes the sample stable across reruns,
    cluster sizes and engines — rerunning tomorrow's mixture job keeps
    yesterday's picks for unchanged sources.  Shape: ONE window cumsum
    per source key (running sum state only); at 10^12 docs the
    source key is low-cardinality, so the window partitions by
    (source) but each row carries O(1) state — no per-source
    materialization — and sources parallelize across reducers.
    """
    from engine.spark.text import ws_token_count

    t = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
        F.md5(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ).alias("_sk"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("_sk").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        t.filter(
            (F.col("cum_tokens") - F.col("n_tokens")) < budget_tokens
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("id").alias(id_col),
            "n_tokens",
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


def preference_pairs(
    cands: DataFrame,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    score_col: str = "score",
) -> DataFrame:
    """Preference-pair (DPO/RLHF) construction: for each prompt, pair
    the best-scoring candidate response with every other candidate.

    Training a reward/DPO model needs (prompt, chosen, rejected)
    triples.  Given a candidates table — several scored responses per
    prompt (best-of-n sampling, multiple model snapshots, human
    ratings) — the chosen response is the per-prompt argmax of
    ``score_col`` with ties broken by the LARGER ``cand_col`` (the
    struct-max rule, reproducible in any engine as the max of the
    encoded (score, cand_id) key), and every other candidate becomes
    the rejected side of one pair with its score margin.

    Shape: ONE partial-aggregating shuffle on ``prompt_col`` computes
    the argmax (struct-max — never a per-prompt window sort), then one
    equi-join on ``prompt_col`` fans the winner back onto the
    candidates.  Both sides hash-partition on the prompt key, which is
    high-cardinality (one per prompt) — no hot reducer, no skew.  At
    10^12 candidates this is a plain two-exchange plan; AQE may
    broadcast the (much smaller, one-row-per-prompt) winner side.

    Returns (prompt_col, chosen_id, rejected_id, margin) with
    margin = chosen_score - rejected_score >= 0, one row per
    non-chosen candidate.  Integer scores stay integer-exact.
    """
    best = (
        cands.groupBy(prompt_col)
        .agg(
            F.max(F.struct(F.col(score_col), F.col(cand_col))).alias("_b")
        )
        .select(
            prompt_col,
            F.col(f"_b.{cand_col}").alias("chosen_id"),
            F.col(f"_b.{score_col}").alias("chosen_score"),
        )
    )
    return (
        cands.join(best, prompt_col)
        .where(F.col(cand_col) != F.col("chosen_id"))
        .select(
            prompt_col,
            "chosen_id",
            F.col(cand_col).alias("rejected_id"),
            (F.col("chosen_score") - F.col(score_col)).alias("margin"),
        )
    )


def length_buckets(
    docs: DataFrame,
    text_col: str = "text",
    bucket_size: int = 32,
) -> DataFrame:
    """Length-bucketed batching stats: bucket documents by whitespace
    token count and measure the padding waste of batching each bucket.

    Fixed-context inference/training batches pad every sequence to the
    batch max, so batching by length is the standard way to cut wasted
    FLOPs.  This operator quantifies it per bucket: ``pad_to_max`` is
    the padding cost of dynamic batching (pad to the bucket's observed
    max), ``pad_to_cap`` the cost of static batching (pad to the
    bucket's upper boundary).

    All arithmetic is integer-exact: the bucket index is
    (n - n % bucket_size) / bucket_size — the numerator is divisible
    by ``bucket_size`` so the double division is exact for ANY bucket
    size (no floor-of-inexact-quotient hazard), identically in Spark
    and the DuckDB oracle.

    Shape: one scan with map-side partial aggregation into at most
    max_tokens/bucket_size groups — the cheapest distributed shape
    there is; no window, no join, no skew (bucket count is bounded).
    """
    from engine.spark.text import ws_token_count

    n = ws_token_count(F.col(text_col))
    bs = F.lit(bucket_size)
    d = docs.select(
        ((n - F.pmod(n, bs)) / bs).cast("long").alias("bucket"),
        n.alias("n_tokens"),
    )
    return (
        d.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .withColumn(
            "pad_to_max",
            F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"),
        )
        .withColumn(
            "pad_to_cap",
            F.col("n_docs") * (F.col("bucket") + 1) * bucket_size
            - F.col("sum_tokens"),
        )
    )


def export_manifest(path: str) -> dict:
    """Dataset-snapshot manifest for an ``export_jsonl`` directory: one
    entry per shard file with its row count, byte size, and sha256 —
    written as ``_manifest.json`` beside the shards.

    Training runs pin their data by this manifest: a resumed or
    re-provisioned job verifies each shard's checksum before trusting
    a cached copy, and two exports are byte-identical iff their
    manifests are.  Driver-side cost is hashing the shard FILES (the
    export is already on local/disaggregated storage — at cluster
    scale this runs as a follow-up job over the file list; here the
    shard count is bounded by the writer's maxRecordsPerFile rolling).

    Returns the manifest dict (also written to disk):
    {"shards": [{"name", "rows", "bytes", "sha256"}...],
     "total_rows": N, "total_bytes": B}.
    """
    import hashlib
    import json as _json
    import os as _os

    shards = []
    for name in sorted(_os.listdir(path)):
        if not name.endswith(".json") or name.startswith("_"):
            continue
        fp = _os.path.join(path, name)
        h = hashlib.sha256()
        rows = 0
        with open(fp, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
                rows += chunk.count(b"\n")
        shards.append(
            {
                "name": name,
                "rows": rows,
                "bytes": _os.path.getsize(fp),
                "sha256": h.hexdigest(),
            }
        )
    manifest = {
        "shards": shards,
        "total_rows": sum(s["rows"] for s in shards),
        "total_bytes": sum(s["bytes"] for s in shards),
    }
    with open(_os.path.join(path, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    seed: str = "leak0",
    max_rounds: int = 25,
) -> DataFrame:
    """Near-dup-cluster-aware train/val/test split: every document in
    the same near-duplicate cluster lands on the same side.

    A per-document hash split (``text.deterministic_split``) silently
    leaks evaluation data — near-copies of a test doc end up in train,
    and the eval score measures memorization of the duplicate, not
    generalization (the Lee et al. 2022 dedup paper's core finding).
    The fix is to make the SPLIT UNIT the near-dup cluster: label
    components of the candidate-pair graph
    (``dedup.connected_components``, singletons keep their own id) and
    hash the CLUSTER id into split buckets, so a whole duplicate family
    moves together.

    Scale shape: the CC rounds are bounded star-contraction over the
    pair graph only (docs with no dup candidate never enter it); the
    cluster table is tiny relative to the corpus, so the label join
    broadcasts under AQE; the split decision itself is a zero-shuffle
    projection of the portable ``md5`` hash — reproducible across
    reruns, cluster sizes, and engines (oracle-checked in DuckDB).
    """
    from engine.spark.dedup import dup_clusters

    clusters = dup_clusters(
        docs.select(F.col(id_col).alias("doc_id")), pairs,
        max_rounds=max_rounds,
    )
    bucket = F.pmod(
        portable_hash60(
            F.concat(F.lit(seed + ":"), F.col("cluster_id").cast("string"))
        ),
        F.lit(100),
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.join(
            clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        .select(
            *docs.columns,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("split", split)
    )


def epoch_budget(
    docs: DataFrame,
    targets: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seed: str = "epoch",
) -> DataFrame:
    """Per-document repeat factors hitting per-source TOKEN budgets —
    the data-recipe assignment behind "2 epochs of books, 0.5 of web":
    a source whose target exceeds its actual token mass repeats
    ⌊target/actual⌋ times plus a deterministic hash-selected extra
    pass whose expected token mass equals the remainder; a
    downsampled source gets repeat 0 + the fractional selection.

    The extra-pass decision is ``u < frac_target/actual`` with
    u = portable_hash60/2⁶⁰ (the mixture_sample device — binary-power
    division and one exact-integer-ratio compare, byte-identical
    across engines, reruns, and cluster sizes; no per-source sort, no
    cumulative scan).  Shape: one tiny per-source token agg joined to
    the broadcast target list, rates broadcast back onto the corpus, a
    codegen'd filter-free projection — corpus rows never shuffle.
    Sources without a target are dropped (inner join — the recipe IS
    the source list).  Contract: a targeted source whose actual token
    mass is zero (or all-NULL) is dropped too, rather than emitting
    NULL repeat factors from a div-by-zero (advisor r5) — an empty
    source cannot absorb a token budget.  Output: (source, id,
    n_tokens, n_repeats).
    """
    spark = docs.sparkSession
    tgt = F.broadcast(
        spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(targets.items())],
            f"{source_col}: string, target: long",
        )
    )
    act = (
        docs.groupBy(source_col)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("actual"))
        .where(F.col("actual") > 0)
    )
    r = act.join(tgt, source_col).select(
        source_col,
        "actual",
        "target",
        F.expr("target DIV actual").alias("rep"),
        (F.col("target") - F.expr("target DIV actual") * F.col("actual"))
        .alias("frac_target"),
    )
    u = portable_hash60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    ) / F.lit(_HASH_SPAN)
    return (
        docs.join(F.broadcast(r), source_col)
        .select(
            source_col,
            id_col,
            F.col(tokens_col).cast("long").alias("n_tokens"),
            (
                F.col("rep")
                + F.when(
                    u
                    < F.col("frac_target").cast("double")
                    / F.col("actual").cast("double"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_repeats"),
        )
    )
