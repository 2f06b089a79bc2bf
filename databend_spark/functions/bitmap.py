"""Bitmap type + functions (SURVEY.md §1.2, §2.8).

Reference: roaring-bitmap column type
(``/root/reference/src/query/expression/src/types/bitmap.rs``) with
~20 scalar functions (``scalars/bitmap.rs``) and 11 aggregate variants.
No roaring library ships in this container, so the engine models a
bitmap as a **sorted distinct array<bigint>** — semantically equivalent
for the whole function surface, JVM-side via array built-ins. At 100 TB
you'd swap the representation for roaring bytes behind the same API
(the call sites don't change).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def build_bitmap(values: Column) -> Column:
    """build_bitmap(array) — normalize to sorted distinct."""
    return F.array_sort(F.array_distinct(values))


def to_bitmap(*values: Column) -> Column:
    return build_bitmap(F.array(*values))


def bitmap_count(b: Column) -> Column:
    return F.size(b).cast("bigint")


def bitmap_contains(b: Column, v: Column) -> Column:
    return F.array_contains(b, v)


def bitmap_and(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_intersect(a, b))


def bitmap_or(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_union(a, b))


def bitmap_xor(a: Column, b: Column) -> Column:
    return F.array_sort(
        F.array_union(F.array_except(a, b), F.array_except(b, a))
    )


def bitmap_not(a: Column, b: Column) -> Column:
    """bitmap_and_not: elements of a missing from b."""
    return F.array_sort(F.array_except(a, b))


def sub_bitmap(b: Column, start: Column, length: Column) -> Column:
    return F.slice(b, start + 1, length)


def bitmap_min(b: Column) -> Column:
    return F.array_min(b)


def bitmap_max(b: Column) -> Column:
    return F.array_max(b)


# aggregate forms (group_bitmap_* in the reference)
def group_bitmap_agg(v: Column) -> Column:
    """Aggregate values into a bitmap (group_bitmap in reference)."""
    return F.array_sort(F.collect_set(v))


def group_bitmap_count(v: Column) -> Column:
    return F.size(F.collect_set(v)).cast("bigint")
