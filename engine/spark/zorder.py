"""Z-order (Morton) multi-dimensional data layout.

The reference has no storage-layout concept — its outputs are loose
``.md`` files on disk (mistralocr_app.py:718-743).  At 100 TB, layout IS
the query plan: a parquet file's min/max footer statistics can only
prune scans if each file covers a tight region of the predicate space.
``pipeline.write_clustered`` solves that for ONE sort key; this module
solves it for TWO-dimensional box predicates (e.g. ``value BETWEEN a
AND b AND user_id BETWEEN c AND d``) by sorting on the Morton
(Z-order) interleave of both dimensions, so every file covers a small
quad of the 2-D space and a box predicate prunes most files at
planning time — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea, built
from plain codegen'd bit arithmetic.

Everything here is JVM-side whole-stage-codegen expression work (bit
shifts and masks); the only data movement is the final
``repartitionByRange`` on the z-key, which a clustered write needs
anyway.  Global min/max normalization bounds are ONE single-row
aggregate broadcast back as literals (metadata-scale, the same pattern
as diagnose.py's profile ops).

Cross-engine determinism (for the DuckDB oracle): values are
micro-unit encoded (``round(v*1e6)`` as BIGINT), bucketed with exact
integer floor-division (remainder-subtraction, no float floor), and
interleaved with integer shift/mask ops — every step is bit-identical
in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bit-spreading schedule: 16-bit value -> even bits of a 32-bit word
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` onto the even bit positions of a
    32-bit word (0bxyz -> 0b0x0y0z) via the classic shift-or-mask
    cascade — pure codegen, no UDF."""
    for sh, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def morton_key(bx: Column, by: Column) -> Column:
    """Interleave two 16-bit bucket columns into one 32-bit Morton key
    (x on even bits, y on odd bits)."""
    return spread16(bx).bitwiseOR(F.shiftleft(spread16(by), 1))


def micro(c: Column) -> Column:
    """Exact micro-unit encoding shared with the oracle: round(v*1e6)
    as BIGINT (both engines compute the identical IEEE product then the
    identical half-up rounding for non-negative values)."""
    return F.round(c.cast("double") * 1e6, 0).cast("long")


def exact_floordiv(a: Column, b: Column) -> Column:
    """Integer floor-division for non-negative operands that is
    bit-identical in Spark and DuckDB: subtract the remainder, then one
    double division.  EXACT only while the numerator (a - a%b) stays
    below 2^53 — beyond that the BIGINT→double cast rounds and the
    quotient can be off by one vs the true floor (advisor r5); both
    engines run the identical IEEE chain, so cross-engine parity and
    monotonicity hold at any magnitude, but callers needing the true
    floor past 2^53 should use an integer `div` on both engines."""
    return ((a - a % b) / b).cast("long")


def _bucket(v: Column, mn: Column, mx: Column, bits: int) -> Column:
    scale = (1 << bits) - 1
    den = F.when(mx == mn, F.lit(1)).otherwise(mx - mn)
    return exact_floordiv((v - mn) * F.lit(scale), den)


def zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Append a Z-order key column interleaving ``x_col`` and ``y_col``.

    Each dimension is micro-unit encoded, min-max normalized into
    ``[0, 2^bits)`` with exact integer arithmetic, then bit-interleaved.
    Works for any non-negative-range numeric columns whose micro-unit
    span * (2^bits - 1) stays under 2^63 (span < ~1.4e8 natural units
    at bits=16) — ample for score/id/metric dimensions.

    Scale shape: one single-row min/max aggregate joined back as a
    broadcast literal (metadata, not data), then pure codegen bit math
    per row — no extra shuffle beyond whatever write/repartition the
    caller does with the key.
    """
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    enc = df.withColumn("_zx", micro(F.col(x_col))).withColumn(
        "_zy", micro(F.col(y_col))
    )
    mm = enc.agg(
        F.min("_zx").alias("_zminx"),
        F.max("_zx").alias("_zmaxx"),
        F.min("_zy").alias("_zminy"),
        F.max("_zy").alias("_zmaxy"),
    )
    j = enc.crossJoin(F.broadcast(mm))
    bx = _bucket(F.col("_zx"), F.col("_zminx"), F.col("_zmaxx"), bits)
    by = _bucket(F.col("_zy"), F.col("_zminy"), F.col("_zmaxy"), bits)
    return j.withColumn(out_col, morton_key(bx, by)).drop(
        "_zx", "_zy", "_zminx", "_zmaxx", "_zminy", "_zmaxy"
    )


# The clustered WRITE built on this key lives in
# pipeline.write_zordered (alongside write_clustered/write_bucketed,
# the repo's other layout writers) — one Morton implementation, one
# writer.
