"""Temporal joins Spark lacks natively: as-of join and range join.

The reference has no joins at all (SURVEY §2.6 — these are scale-gap
operators a full engine needs).  Both are re-expressed as shuffle-
friendly compositions of built-in operators rather than inequality
joins, which Spark would otherwise plan as BroadcastNestedLoop /
cartesian products:

* as-of join  — union + keyed window with last(ignorenulls): ONE
  shuffle on the key, no join operator at all.  This is the standard
  distributed trades-and-quotes shape; cost is a sort within each key
  partition, independent of how far back the match lies.
* range join  — interval containment via time-bucket equi-join:
  intervals explode to the buckets they cover, points map to exactly
  one bucket, the join is equi on (key, bucket) and a cheap residual
  filter refines.  Blowup is bounded by interval_length/bucket, never
  |points| × |intervals|.

Cross-engine correctness: the DuckDB oracles use *different
algorithms* (native ASOF JOIN; a plain inequality join) — agreement is
a genuine two-implementation check, not a re-derivation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    suffix: str = "asof_",
    bucket_seconds: int | None = 86400,
    direction: str = "backward",
) -> DataFrame:
    """As-of join.  ``direction="backward"`` (default): each left row
    gets the most recent right row with ``right.ts <= left.ts`` for the
    same key (NULLs when no right row precedes it).
    ``direction="forward"``: the EARLIEST right row with ``right.ts >=
    left.ts`` — the symmetric next-quote lookup; implemented by
    flipping every ordering (desc time walk, min-payload bucket
    boundaries, following-bucket carry), so both directions share one
    code path and one shuffle count.  At equal timestamps the right row
    matches in either direction; duplicate right rows on (key, ts)
    de-tie by max payload (backward) / min payload (forward) —
    deterministic across runs and cluster sizes.

    Implementation: tag the sides, union by name, and carry the last
    non-null right payload along the time walk with a window — the
    scalable re-expression of an as-of join (an inequality join would
    plan as a nested loop).  The right row sorts before the left at
    equal timestamps, so a quote at exactly the trade's timestamp IS
    matched in both directions.

    Skew (``bucket_seconds``, the default path): a window partitioned by
    key alone serializes a hot key (one user, 10^9 events) onto a single
    reducer — AQE cannot split a window partition.  So the carry is
    two-phase: (1) window within ``(key, time_bucket)`` — partition size
    bounded by rows-per-key-per-bucket, not rows-per-key; (2) a compact
    per-(key, bucket) boundary table (last right payload in the bucket)
    is cumulated with a per-key window over O(#buckets) rows and joined
    back to fill bucket-initial gaps.  ``bucket_seconds=None`` selects
    the single-window path (fine for uniform keys; one less shuffle).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    back = direction == "backward"
    rcols = [c for c in right.columns if c not in (key, ts_col)]
    payload = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        F.col(key), F.col(ts_col), F.lit(0).alias("__side"),
        payload.alias("__r"),
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(r.schema["__r"].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # the walk direction: backward scans time ascending and keeps the
    # last (max) right payload seen; forward scans descending and keeps
    # the last seen = the EARLIEST right at-or-after the current row
    order = [
        F.col(ts_col).asc() if back else F.col(ts_col).desc(),
        F.col("__side").asc(),
        F.col("__r").asc_nulls_first()
        if back
        else F.col("__r").desc_nulls_first(),
    ]
    if bucket_seconds is None:
        w = (
            Window.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        u = u.withColumn(
            "__b",
            F.floor(
                F.col(ts_col).cast("timestamp").cast("long") / bucket_seconds
            ),
        )
        # boundary: the walk-last right payload per (key, bucket).  __r
        # leads with __rts, so max(__r) (backward) / min(__r) (forward)
        # IS the last right row in walk order — one partial-aggregated
        # shuffle on (key, bucket).
        boundary = u.groupBy(key, "__b").agg(
            (F.max("__r") if back else F.min("__r")).alias("__bl")
        )
        wb = (
            Window.partitionBy(key)
            .orderBy(F.col("__b").asc() if back else F.col("__b").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = boundary.select(
            key,
            "__b",
            F.last("__bl", ignorenulls=True).over(wb).alias("__carry"),
        )
        # join carry back, then window within (key, bucket): both hash on
        # the same (key, bucket) pair, so the exchange is shared
        u = u.join(carry, [key, "__b"])
        w = (
            Window.partitionBy(key, "__b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = u.withColumn(
            "__m",
            F.coalesce(
                F.last("__r", ignorenulls=True).over(w), F.col("__carry")
            ),
        ).drop("__b", "__carry")

    out = m.filter(F.col("__side") == 1)
    out = out.withColumn(f"{suffix}{ts_col}", F.col("__m.__rts"))
    for c in rcols:
        out = out.withColumn(f"{suffix}{c}", F.col(f"__m.{c}"))
    return out.drop("__side", "__r", "__m")


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval containment join (``point.ts BETWEEN start AND end``,
    inclusive, same key) as a bucketed equi-join.

    Each interval explodes to the epoch-time buckets it covers; each
    point lands in exactly one bucket, so a (point, interval) pair can
    meet at most once — no post-join dedup.  The shuffle key is
    (key, bucket): pick ``bucket_seconds`` near the typical interval
    length so intervals explode to O(1) buckets while buckets stay
    selective.  An inequality join here would be a nested loop.
    """
    # TIMESTAMP_NTZ has no direct long cast: hop via TIMESTAMP.  Any
    # monotonic epoch mapping works — buckets only gate candidates, the
    # residual filter below compares full-precision timestamps.
    def _epoch(c: Column) -> Column:
        return c.cast("timestamp").cast("long")

    pts = points.withColumn(
        "__bucket", F.floor(_epoch(F.col(ts_col)) / bucket_seconds)
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(F.col(start_col)) / bucket_seconds),
                F.floor(_epoch(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    joined = pts.alias("p").join(
        iv.alias("i"),
        (F.col(f"p.{key}") == F.col(f"i.{key}"))
        & (F.col("p.__bucket") == F.col("i.__bucket")),
    )
    refined = joined.filter(
        (F.col(f"p.{ts_col}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{ts_col}") <= F.col(f"i.{end_col}"))
    )
    # drop the interval side's join key and both bucket columns so the
    # result has no duplicate column names (a bare .select(key) on the
    # output would otherwise throw AMBIGUOUS_REFERENCE)
    return refined.drop(F.col(f"i.{key}")).drop("__bucket")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    bucket: int,
    start_col: str = "start",
    end_col: str = "end",
    suffixes: tuple = ("_a", "_b"),
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open [start, end) ranges,
    same key): emits each (a, b) pair with ``a.start < b.end AND
    b.start < a.end`` exactly once.

    Scale shape — the same bucket-explode discipline as
    ``range_join_bucketed``, extended to two interval sides: each
    interval explodes to the ``bucket``-sized cells it covers, the join
    is EQUI on (key, cell) — never an inequality join, which Spark
    plans as a nested loop — a residual filter refines to true
    overlaps, and the pair is kept only in its RESPONSIBILITY cell
    (the cell containing max(a.start, b.start), which both intervals
    cover whenever they overlap) so multi-cell co-occurrence never
    duplicates output.  Blowup is bounded by interval_length/bucket per
    row; pick ``bucket`` near the typical interval length.

    ``start_col``/``end_col`` must be integral (e.g. epoch seconds)
    with start < end: the standard overlap predicate treats an EMPTY
    interval [x, x) as overlapping anything that covers x (both this
    operator and any inequality-join twin share that convention), so
    filter empty intervals out first if they can occur.
    """
    def cells(df, tag):
        return df.select(
            F.col(key),
            F.col(start_col).alias(f"__s{tag}"),
            F.col(end_col).alias(f"__e{tag}"),
            *[
                F.col(c).alias(f"{c}{tag}")
                for c in df.columns
                if c not in (key, start_col, end_col)
            ],
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / bucket),
                    F.floor((F.col(end_col) - 1) / bucket),
                )
            ).alias("__cell"),
        )

    ta, tb = suffixes
    ca, cb = cells(a, ta), cells(b, tb)
    joined = ca.join(cb, [key, "__cell"]).where(
        (F.col(f"__s{ta}") < F.col(f"__e{tb}"))
        & (F.col(f"__s{tb}") < F.col(f"__e{ta}"))
        & (
            F.col("__cell")
            == F.floor(
                F.greatest(F.col(f"__s{ta}"), F.col(f"__s{tb}")) / bucket
            )
        )
    )
    return joined.select(
        key,
        F.col(f"__s{ta}").alias(f"{start_col}{ta}"),
        F.col(f"__e{ta}").alias(f"{end_col}{ta}"),
        F.col(f"__s{tb}").alias(f"{start_col}{tb}"),
        F.col(f"__e{tb}").alias(f"{end_col}{tb}"),
        *[
            F.col(f"{c}{ta}")
            for c in a.columns
            if c not in (key, start_col, end_col)
        ],
        *[
            F.col(f"{c}{tb}")
            for c in b.columns
            if c not in (key, start_col, end_col)
        ],
    )


# ------------------------------------------------- bloom-pruned semi-join
def bloom_filter_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    dim_key_col: str | None = None,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """Left-semi join with an explicit broadcast Bloom-filter prefilter
    — the shape Spark's own runtime row-group filters (and every
    warehouse's "join pruning") use, surfaced as an operator: build a
    tiny bitmap over the dim keys, evaluate it as a CODEGEN'D FILTER on
    the fact scan (k xxhash64 probes against an array literal — zero
    extra joins, zero Python), then refine the survivors with the exact
    semi-join.  The result is EXACTLY ``fact ⋉ dim`` for any bitmap
    size: false positives only cost refine work, never correctness.

    Why this matters at 100 TB: the semi-join shuffles every fact row
    that reaches it.  With a selective dim (say 0.1% of keys), a 1%-fp
    bloom drops ~99% of fact rows BEFORE the exchange — the shuffle
    shrinks by the filter's selectivity, and the filter itself rides
    the scan inside WholeStageCodegen.

    Sizing: fp ≈ (1 − e^(−k·n/m))^k; the default 2^16 bits / 5 hashes
    holds ~9k dim keys at ~1% fp.  The bitmap is folded into the plan
    as an array<long> literal of m/64 words, so keep m ≤ ~2^20 (16k
    words) — past that, production Spark should lean on AQE runtime
    filters or a broadcast hash join instead; the collect here is
    m/64 AGGREGATED words (metadata-scale, like the lineage bucket
    reads), never the dim rows themselves.
    """
    from functools import reduce as _reduce

    dkc = dim_key_col or key_col
    n_words = m_bits // 64
    keys = dim.select(F.col(dkc).alias("_k")).distinct()

    def _positions(col: Column) -> list[Column]:
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]

    words = (
        keys.select(F.explode(F.array(*_positions(F.col("_k")))).alias("p"))
        .select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    wmap = {r["w"]: r["word"] for r in words}
    bitmap = F.array(
        *[F.lit(wmap.get(i, 0)).cast("long") for i in range(n_words)]
    )
    # bit 63 must be the SIGNED long with only the sign bit set —
    # 1 << 63 overflows py4j's long marshalling
    bitmask = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(64)
        ]
    )

    def _probe(i: int) -> Column:
        p = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        word = F.get(bitmap, F.floor(p / 64).cast("int"))
        mask = F.get(bitmask, F.pmod(p, F.lit(64)).cast("int"))
        return word.bitwiseAND(mask) != 0

    pruned = fact.filter(
        _reduce(lambda a, b: a & b, [_probe(i) for i in range(k_hashes)])
    )
    return pruned.join(
        keys, pruned[key_col] == keys["_k"], "left_semi"
    )
