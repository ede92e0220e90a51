"""Interval algebra — column-level, Catalyst-friendly.

The reference encodes strand orientation in the *sign* of interval
coordinates (SeqOriDescriptor, reference sequence.py:229-236; reverse
via __neg__, sequence.py:448-467): ``start >= 0`` means forward strand,
negative coords mean reverse strand of the same sequence, with
``(start, stop) = (-b, -a)`` denoting the reverse view of absolute
span ``[a, b)``.

We normalize at ingest to ``(start, stop, strand)`` with absolute
``0 <= start < stop`` and ``strand in {+1, -1}`` (SURVEY.md §7.3) and
keep sign-convention compatibility expressions for the reference's
golden tests (reference tests/nlmsa_test.py:14-22).

All functions here return Column expressions (no UDFs) so every rule
participates in predicate pushdown / codegen.

Semantics preserved from the reference:
  - intervals are half-open ``[start, stop)``;
  - empty intervals are forbidden (reference sequence.py:307-308) —
    ``require_nonempty`` encodes this;
  - construction clips to sequence bounds (sequence.py:302-306) —
    ``clip_expr``;
  - intersection of disjoint/different-seq intervals is NULL
    (sequence.py:426-442).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# sign-convention <-> normalized form
# ---------------------------------------------------------------------------


def signed_start(start: Column, stop: Column) -> Column:
    """Absolute start of a possibly sign-convention interval."""
    return F.when(start < 0, -stop).otherwise(start)


def signed_stop(start: Column, stop: Column) -> Column:
    return F.when(start < 0, -start).otherwise(stop)


def signed_strand(start: Column) -> Column:
    return F.when(start < 0, F.lit(-1)).otherwise(F.lit(1))


def normalize_signed(
    df: DataFrame, start: str, stop: str, out_prefix: str = ""
) -> DataFrame:
    """Add ``{p}start, {p}stop, {p}strand`` normalized columns."""
    s, e = F.col(start), F.col(stop)
    p = out_prefix
    return (
        df.withColumn(f"{p}strand", signed_strand(s))
        .withColumn(f"{p}start_n", signed_start(s, e))
        .withColumn(f"{p}stop_n", signed_stop(s, e))
        .withColumnRenamed(f"{p}start_n", f"{p}start" if p else "start_n")
        .withColumnRenamed(f"{p}stop_n", f"{p}stop" if p else "stop_n")
    )


def to_signed_start(start: Column, stop: Column, strand: Column) -> Column:
    """Normalized (start, stop, strand) -> sign-convention start."""
    return F.when(strand < 0, -stop).otherwise(start)


def to_signed_stop(start: Column, stop: Column, strand: Column) -> Column:
    return F.when(strand < 0, -start).otherwise(stop)


# ---------------------------------------------------------------------------
# predicates (reference sequence.py:405-424)
# ---------------------------------------------------------------------------


def overlaps(start1: Column, stop1: Column, start2: Column, stop2: Column) -> Column:
    """Half-open overlap: [s1,e1) ∩ [s2,e2) ≠ ∅."""
    return (start1 < stop2) & (start2 < stop1)


def contains(start1: Column, stop1: Column, start2: Column, stop2: Column) -> Column:
    """[s2,e2) ⊆ [s1,e1)  (reference __contains__, sequence.py:405-415)."""
    return (start1 <= start2) & (stop2 <= stop1)


# ---------------------------------------------------------------------------
# combining (reference sequence.py:426-505)
# ---------------------------------------------------------------------------


def intersect_start(start1: Column, start2: Column) -> Column:
    return F.greatest(start1, start2)


def intersect_stop(stop1: Column, stop2: Column) -> Column:
    return F.least(stop1, stop2)


def intersect_struct(
    start1: Column, stop1: Column, start2: Column, stop2: Column
) -> Column:
    """``struct(start, stop)`` of the intersection, NULL if disjoint
    (reference ``ival1 * ival2`` -> None, sequence.py:426-442)."""
    s = intersect_start(start1, start2)
    e = intersect_stop(stop1, stop2)
    return F.when(s < e, F.struct(s.alias("start"), e.alias("stop")))


def span_union_start(start1: Column, start2: Column) -> Column:
    """Span-union ``+`` (reference sequence.py:469-495): min/max cover."""
    return F.least(start1, start2)


def span_union_stop(stop1: Column, stop2: Column) -> Column:
    return F.greatest(stop1, stop2)


def clip_expr(coord: Column, lo: Column, hi: Column) -> Column:
    """Clip a coordinate into [lo, hi] (reference sequence.py:302-306)."""
    return F.greatest(lo, F.least(hi, coord))


def require_nonempty(df: DataFrame, start: str, stop: str) -> DataFrame:
    """Drop empty intervals — reference *raises* on construction
    (sequence.py:307-308); relationally we filter them out."""
    return df.filter(F.col(start) < F.col(stop))


# ---------------------------------------------------------------------------
# coordinate transforms (reference IntervalTransform, sequence.py:26-132)
# ---------------------------------------------------------------------------


def xform(
    x: Column,
    src_start: Column,
    src_stop: Column,
    dst_start: Column,
    dst_stop: Column,
) -> Column:
    """Linear map of coordinate ``x`` from src interval to dst interval
    (scale = len ratio, reference sequence.py:34,47-53). Integer result."""
    scale = (dst_stop - dst_start) / (src_stop - src_start)
    return (dst_start + F.round((x - src_start) * scale, 0)).cast("long")


def xform_int(
    x: Column,
    src_start: Column,
    src_stop: Column,
    dst_start: Column,
    dst_stop: Column,
) -> Column:
    """Engine-portable IntervalTransform: floor-division linear map
    ``dst_start + floor((x - src_start)·dst_len / src_len)``. Exact
    for |numerator| < 2^53 (integer float64 division never rounds
    across an integer boundary there), and floor matches SQL ``//``
    on every engine including negative numerators — unlike
    :func:`xform`'s round-half-up, which is not portable."""
    num = ((x - src_start) * (dst_stop - dst_start)).cast("double")
    den = (src_stop - src_start).cast("double")
    return (dst_start + F.floor(num / den)).cast("long")


def before_stop(start: Column) -> Column:
    """Complement helper: ``before()`` is [0, start) (sequence.py:497-505)."""
    return start


def after_start(stop: Column) -> Column:
    return stop
